#!/usr/bin/env python3
"""Differential probe: ring-buffer distance short codes (0-15), initial
ring contents, implicit distance-0 commands, and the push rule — vs the
reference decoder.

Streams: insert a 40-byte aperiodic pattern, then a sequence of copy
commands whose distances are recovered from the output.
"""
import brotlicffi

PAT = bytes(33 + (i * 7 + i // 4) % 64 for i in range(40))
assert all(PAT.find(PAT[i:i+8]) == i for i in range(len(PAT) - 8))

class BW:
    def __init__(self):
        self.bits = []
    def w(self, v, n):
        for k in range(n):
            self.bits.append((v >> k) & 1)
    def code(self, c, n):   # canonical prefix code emitted MSB-first
        for k in range(n - 1, -1, -1):
            self.bits.append((c >> k) & 1)
    def bytes(self):
        out = bytearray((len(self.bits) + 7) // 8)
        for i, b in enumerate(self.bits):
            out[i >> 3] |= b << (i & 7)
        return bytes(out)

COPY_BASE = [2,3,4,5,6,7,8,9,10,12,14,18,22,30,38,54,70,102,134,198,326,582,1094,2118]
COPY_EXTRA = [0,0,0,0,0,0,0,0,1,1,2,2,3,3,4,4,5,5,6,7,8,9,10,24]
INS_BASE = [0,1,2,3,4,5,6,8,10,14,18,26,34,50,66,98,130,194,322,578,1090,2114,6210,22594]
INS_EXTRA = [0,0,0,0,0,0,1,1,2,2,3,3,4,4,5,5,6,7,8,9,10,12,14,24]
INS_RANGE = [0, 0, 8, 8, 0, 16, 8, 16, 16]
CPY_RANGE = [0, 8, 0, 8, 16, 0, 16, 8, 16]

def cmd_code(icode, ccode, implicit):
    if implicit:
        assert icode < 8 and ccode < 16
        return (ccode // 8) * 64 + (icode << 3) + (ccode & 7)
    cell = next(c for c in range(9)
                if INS_RANGE[c] <= icode < INS_RANGE[c] + 8
                and CPY_RANGE[c] <= ccode < CPY_RANGE[c] + 8)
    return 128 + 64 * cell + ((icode - INS_RANGE[cell]) << 3) + (ccode - CPY_RANGE[cell])

def craft(steps):
    """steps: list of (dcode_or_None, extra, nbits) copy commands; None
    dcode = implicit distance-0 command. First command inserts PAT.
    Uses a 2-symbol distance code listing the distinct explicit dcodes
    (or a 1-symbol one). Copy length 4 each. Returns (stream, mlen).
    """
    explicit = sorted({s[0] for s in steps if s[0] is not None})
    copy = 4
    mlen = len(PAT) + copy * len(steps)
    bw = BW()
    bw.w(0, 1); bw.w(1, 1); bw.w(0, 1); bw.w(0, 2)
    bw.w(mlen - 1, 16)
    bw.w(0, 1); bw.w(0, 1); bw.w(0, 1)
    bw.w(0, 2)              # NPOSTFIX 0
    bw.w(0, 4)              # NDIRECT 0
    bw.w(0, 2)              # ctx mode LSB6
    bw.w(0, 1); bw.w(0, 1)  # NTREES 1/1
    # literal code: simple NSYM=1 is useless (literals vary) — use a
    # complex... keep simple: literals are raw 64-symbol? Use NSYM=4 over
    # a 2-bit alphabet is too small for PAT's 64 values. Instead emit the
    # insert via an uncompressed FIRST metablock? Simpler: literal code
    # over 256 symbols via simple code can list only 4. So use a separate
    # craft: PAT via one uncompressed metablock, copies in a second
    # compressed metablock. Rebuild below.
    raise SystemExit('unused')

def craft2(steps):
    explicit = sorted({s[0] for s in steps if s[0] is not None})
    copy = 4
    bw = BW()
    bw.w(0, 1)              # WBITS 16
    # metablock 1: uncompressed PAT
    bw.w(0, 1)              # ISLAST=0
    bw.w(0, 2)              # MNIBBLES=4
    bw.w(len(PAT) - 1, 16)
    bw.w(1, 1)              # ISUNCOMPRESSED
    while len(bw.bits) % 8:
        bw.w(0, 1)
    for ch in PAT:
        bw.w(ch, 8)
    # metablock 2: compressed, the copy commands
    mlen = copy * len(steps)
    bw.w(1, 1)              # ISLAST
    bw.w(0, 1)              # ISLASTEMPTY=0
    bw.w(0, 2)              # MNIBBLES=4
    bw.w(mlen - 1, 16)
    bw.w(0, 1); bw.w(0, 1); bw.w(0, 1)
    bw.w(0, 2); bw.w(0, 4)  # NPOSTFIX/NDIRECT
    bw.w(0, 2)              # ctx mode
    bw.w(0, 1); bw.w(0, 1)  # NTREES
    # literal code: never used — simple NSYM=1 sym 0
    bw.w(1, 2); bw.w(0, 2); bw.w(0, 8)
    # command code: need up to 2 distinct commands (implicit & explicit,
    # both insert 0 / copy 4): implicit cmd = cmd_code(0,2,True),
    # explicit = cmd_code(0,2,False)
    icmd = cmd_code(0, 2, True)
    ecmd = cmd_code(0, 2, False)
    use = sorted({icmd if s[0] is None else ecmd for s in steps})
    if len(use) == 1:
        bw.w(1, 2); bw.w(0, 2); bw.w(use[0], 10)
        cmdbits = {use[0]: (0, 0)}
    else:
        bw.w(1, 2); bw.w(1, 2)
        for c in use:
            bw.w(c, 10)
        cmdbits = {use[0]: (0, 1), use[1]: (1, 1)}
    # distance code over the explicit dcodes
    if not explicit:
        bw.w(1, 2); bw.w(0, 2); bw.w(0, 6)
        dbits = {}
    elif len(explicit) == 1:
        bw.w(1, 2); bw.w(0, 2); bw.w(explicit[0], 6)
        dbits = {explicit[0]: (0, 0)}
    else:
        assert len(explicit) <= 4
        n = len(explicit)
        bw.w(1, 2); bw.w(n - 1, 2)
        for d in explicit:
            bw.w(d, 6)
        if n == 4:
            bw.w(0, 1)      # tree-select: 2,2,2,2
        if n == 2:
            dbits = {explicit[0]: (0, 1), explicit[1]: (1, 1)}
        elif n == 3:
            dbits = {explicit[0]: (0b0, 1), explicit[1]: (0b10, 2),
                     explicit[2]: (0b11, 2)}
        else:
            dbits = {d: (k, 2) for k, d in enumerate(explicit)}
    # data
    for (dc, extra, nbits) in steps:
        c = icmd if dc is None else ecmd
        cb, cn = cmdbits[c]
        bw.code(cb, cn)
        # insert extra (none: icode 0), copy extra (ccode 2: none)
        if dc is not None:
            db, dn = dbits[dc]
            bw.code(db, dn)
            if nbits:
                bw.w(extra, nbits)
    return bw.bytes(), mlen

def run(steps):
    s, mlen = craft2(steps)
    out = brotlicffi.decompress(s)
    # recover each copy's distance
    res = []
    pos = len(PAT)
    for _ in steps:
        seg = out[pos:pos+4]
        # distance d reproduces out[pos-d:pos-d+4] (with overlap)
        d = next(dd for dd in range(1, pos + 1)
                 if bytes(out[pos - dd + (i % dd)] for i in range(4)) == seg)
        res.append(d)
        pos += 4
    return res

# initial ring: first command implicit d0 -> which distance?
print('implicit d0 first:', run([(None, 0, 0)]))
# explicit short codes 0..3 as the FIRST command
for dc in range(4):
    print(f'dcode {dc} first:', run([(dc, 0, 0)]))
# short codes 4..15 as first command (deltas off initial ring)
for dc in range(4, 16):
    try:
        print(f'dcode {dc} first:', run([(dc, 0, 0)]))
    except Exception as e:
        print(f'dcode {dc} first: ERR {e}')
# push rule: explicit 16 (distance 1+extra... dcode16 nbits1) then ring reads
# dcode 16 extra0 -> distance 1; then dcode 0 (last), dcode 1 (2nd last)
print('push seq a:', run([(16, 0, 1), (0, 0, 0), (1, 0, 0)]))
print('push seq b:', run([(16, 1, 1), (2, 0, 0), (3, 0, 0)]))
# implicit then explicit ring read: does implicit-0 push? expect not
print('implicit no-push:', run([(17, 0, 1), (None, 0, 0), (1, 0, 0)]))
# short-code result IS pushed? dcode 4 (last-1) then dcode 0
print('short push:', run([(16, 1, 1), (4, 0, 0), (0, 0, 0), (1, 0, 0)]))
