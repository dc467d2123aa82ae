#!/usr/bin/env python3
"""Differential probe: is the engine's distance formula (dcode -> distance,
under NPOSTFIX/NDIRECT) identical to the reference decoder's?

Crafts streams: one command inserting an aperiodic 20-byte pattern over
{a,b,c,d} followed by one copy command with an explicit distance code,
decodes with brotlicffi, and recovers the ACTUAL distance from the copied
slice. Compares with the formula's prediction.
"""
import brotlicffi

PAT = b'aabacadbbcbdccddabcd'   # aperiodic: any 8-byte window is unique
assert all(PAT.find(PAT[i:i+8]) == i for i in range(len(PAT) - 8))

class BW:
    def __init__(self):
        self.bits = []
    def w(self, v, n):
        for k in range(n):
            self.bits.append((v >> k) & 1)
    def bytes(self):
        out = bytearray((len(self.bits) + 7) // 8)
        for i, b in enumerate(self.bits):
            out[i >> 3] |= b << (i & 7)
        return bytes(out)

COPY_BASE = [2,3,4,5,6,7,8,9,10,12,14,18,22,30,38,54,70,102,134,198,326,582,1094,2118]
COPY_EXTRA = [0,0,0,0,0,0,0,0,1,1,2,2,3,3,4,4,5,5,6,7,8,9,10,24]
INS_BASE = [0,1,2,3,4,5,6,8,10,14,18,26,34,50,66,98,130,194,322,578,1090,2114,6210,22594]
INS_EXTRA = [0,0,0,0,0,0,1,1,2,2,3,3,4,4,5,5,6,7,8,9,10,12,14,24]

def my_distance(dcode, extra, P, ND):
    """The engine's formula for dcode >= 16+ND."""
    x = dcode - ND - 16
    ndistbits = 1 + (x >> (P + 1))
    hcode = x >> P
    lcode = x & ((1 << P) - 1)
    offset = ((2 + (hcode & 1)) << ndistbits) - 4
    return ((offset + extra) << P) + lcode + ND + 1, ndistbits

def craft(P, nd4, dcode, extra, nbits):
    ND = nd4 << P
    ins = len(PAT)
    copy = 8
    # command: insert 20 copy 8, explicit distance
    icode = max(c for c in range(24) if INS_BASE[c] <= ins)
    iex = ins - INS_BASE[icode]
    ccode = max(c for c in range(24) if COPY_BASE[c] <= copy)
    cex = copy - COPY_BASE[ccode]
    INS_RANGE = [0, 0, 8, 8, 0, 16, 8, 16, 16]
    CPY_RANGE = [0, 8, 0, 8, 16, 0, 16, 8, 16]
    cell = next(c for c in range(9)
                if INS_RANGE[c] <= icode < INS_RANGE[c] + 8
                and CPY_RANGE[c] <= ccode < CPY_RANGE[c] + 8)
    cmd = 128 + 64 * cell + ((icode - INS_RANGE[cell]) << 3) + (ccode - CPY_RANGE[cell])
    bw = BW()
    bw.w(0, 1)              # WBITS 16
    bw.w(1, 1)              # ISLAST
    bw.w(0, 1)              # ISLASTEMPTY=0
    bw.w(0, 2)              # MNIBBLES=4
    bw.w(ins + copy - 1, 16)
    bw.w(0, 1); bw.w(0, 1); bw.w(0, 1)   # one block type each
    bw.w(P, 2)
    bw.w(nd4, 4)
    bw.w(0, 2)              # ctx mode LSB6
    bw.w(0, 1)              # NTREES_L=1
    bw.w(0, 1)              # NTREES_D=1
    # literal code: simple NSYM=4, tree-select 0 (2 bits each), sorted abcd
    bw.w(1, 2); bw.w(3, 2)
    for s in b'abcd':
        bw.w(s, 8)
    bw.w(0, 1)              # tree-select
    # command code: simple NSYM=1
    bw.w(1, 2); bw.w(0, 2); bw.w(cmd, 10)
    # distance code: simple NSYM=1
    alphabet = 16 + ND + (48 << P)
    abits = max(1, (alphabet - 1).bit_length())
    bw.w(1, 2); bw.w(0, 2); bw.w(dcode, abits)
    # data: command(0 bits), insert extra, literals, copy extra, dist extra
    bw.w(iex, INS_EXTRA[icode])
    for ch in PAT:
        k = b'abcd'.index(bytes([ch]))
        # canonical 2-bit codes, emitted MSB-first (decoder index = rev(code))
        bw.w(k >> 1, 1)
        bw.w(k & 1, 1)
    bw.w(cex, COPY_EXTRA[ccode])
    if nbits:
        bw.w(extra, nbits)
    return bw.bytes()

bad = 0
tested = 0
for P in range(4):
    for nd4 in (0, 3, 15):
        ND = nd4 << P
        alphabet = 16 + ND + (48 << P)
        for dcode in range(16 + ND, alphabet):
            pred, nbits = my_distance(dcode, 0, P, ND)
            for extra in {0, 1, (1 << nbits) - 1}:
                if extra >= (1 << nbits):
                    continue
                pred, _ = my_distance(dcode, extra, P, ND)
                if pred > len(PAT):   # can't observe beyond the insert
                    continue
                tested += 1
                s = craft(P, nd4, dcode, extra, nbits)
                try:
                    out = brotlicffi.decompress(s)
                except brotlicffi.error as e:
                    print(f'P={P} ND={ND} dcode={dcode} extra={extra}: '
                          f'reference REJECTS (pred {pred})')
                    bad += 1
                    continue
                exp = bytearray(PAT)
                for _ in range(8):
                    exp.append(exp[-pred])
                if out != bytes(exp):
                    print(f'P={P} ND={ND} dcode={dcode} extra={extra}: '
                          f'pred {pred} got {out[len(PAT):]!r}')
                    bad += 1
        # direct codes
        for dcode in range(16, 16 + ND):
            pred = dcode - 16 + 1
            if pred > len(PAT):
                continue
            tested += 1
            s = craft(P, nd4, dcode, 0, 0)
            try:
                out = brotlicffi.decompress(s)
            except brotlicffi.error:
                print(f'P={P} ND={ND} direct dcode={dcode}: reference REJECTS')
                bad += 1
                continue
            exp = bytearray(PAT)
            for _ in range(8):
                exp.append(exp[-pred])
            if out != bytes(exp):
                print(f'P={P} ND={ND} direct dcode={dcode}: pred {pred} got {out[len(PAT):]!r}')
                bad += 1
print(f'tested {tested}, disagreements {bad}')
