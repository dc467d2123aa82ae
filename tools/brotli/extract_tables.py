#!/usr/bin/env python3
"""Recover the RFC 7932 (brotli) standard data tables from the locally
installed brotli library and write them as one engine resource.

The brotli format fixes four data blocks that are impractical to type in
by hand but are pure public-standard constants (RFC 7932 appendices):

  - the 122,784-byte static dictionary (Appendix A) — identified inside
    libbrotlicommon.so by its well-known first bytes ("timedownlifeleft")
    and pinned by its published SHA-256
    20e42eb1b511c21806d4d227d07e5dd06877d8ce7b3a817f378f313653f35c70
    (the same digest the W3C WOFF2 spec cites for the shared dictionary);
  - the 2048-byte context lookup table (Section 7.1: four modes x
    (lut0 | lut1)) — anchored by the LSB6 ramp (i & 63) and the MSB6 ramp
    (i >> 2), which are arithmetically checkable;
  - the 217-byte transform prefix/suffix pool (Appendix B), 50
    length-prefixed segments;
  - the 121 x 3 transform triples (prefix idx, transform kind, suffix
    idx) of Appendix B.

Every recovered transform triple is then VERIFIED against the reference
decoder behaviorally: for each transform id 0..120 this script crafts a
minimal valid brotli stream whose single command is a static-dictionary
reference carrying that transform id, decompresses it with brotlicffi,
and asserts the output equals prefix + kind(word) + suffix from the
recovered tables. The dictionary content itself is cross-checked the
same way on identity transforms over every word length 4..24.

Output: src/main/resources/graft/brotli.bin =
  dict(122784) || context(2048) || prefixSuffix(217) || transforms(363)
"""
import hashlib
import struct
import sys

import brotlicffi

SO = '/root/miniconda/lib/libbrotlicommon.so.1.2.0'
OUT = '/root/repo/src/main/resources/graft/brotli.bin'

DICT_SHA256 = '20e42eb1b511c21806d4d227d07e5dd06877d8ce7b3a817f378f313653f35c70'
# words per length 4..24, as log2 (RFC 7932 Appendix A layout)
NDBITS = [0, 0, 0, 0, 10, 10, 11, 11, 10, 10, 10, 10, 10, 9, 9, 8, 7,
          7, 8, 7, 7, 6, 6, 5, 5]

data = open(SO, 'rb').read()

# ---------------------------------------------------------------- dict
di = data.find(b'timedownlifeleft')
assert di >= 0, 'dictionary anchor not found'
DICT = data[di:di + 122784]
assert hashlib.sha256(DICT).hexdigest() == DICT_SHA256, 'dictionary hash'
OFFSETS = [0] * 25
for l in range(4, 25):
    OFFSETS[l] = OFFSETS[l - 1] + ((l - 1) << NDBITS[l - 1]) if l > 4 else 0
# recompute cleanly
off = 0
OFFSETS = {}
for l in range(4, 25):
    OFFSETS[l] = off
    off += l << NDBITS[l]
assert off == 122784

def word(l, wid):
    return DICT[OFFSETS[l] + l * wid: OFFSETS[l] + l * (wid + 1)]

# ------------------------------------------------------------- context
lsb6 = bytes(i & 63 for i in range(256))
msb6 = bytes(i >> 2 for i in range(256))
ci = data.find(lsb6)
assert ci >= 0 and data[ci + 512:ci + 768] == msb6, 'context table layout'
CTX = data[ci:ci + 2048]
assert CTX[256:512] == bytes(256), 'LSB6 lut1 must be zeros'
assert CTX[768:1024] == bytes(256), 'MSB6 lut1 must be zeros'

# ---------------------------------------------------- prefix/suffix pool
pi = data.find(b'\x01 \x02, \x08 of the ')
assert pi >= 0, 'prefix/suffix pool not found'
PS = data[pi:pi + 217]
SEGS = []
o = 0
while o < 217:
    n = PS[o]
    SEGS.append(PS[o + 1:o + 1 + n])
    o += 1 + n
assert o == 217 and len(SEGS) == 50 and SEGS[49] == b''

# ------------------------------------------------------------ transforms
ti = data.find(bytes([49, 0, 49, 49, 0, 0, 0, 0, 0, 49, 12, 49]))
assert ti >= 0, 'transforms data not found'
TRANS = data[ti:ti + 363]
assert all(TRANS[j * 3] <= 49 and TRANS[j * 3 + 1] <= 20
           and TRANS[j * 3 + 2] <= 49 for j in range(121))

# expected transform semantics (RFC 7932 Appendix B kinds)
def ferment(b, pos):
    """Uppercase the 'character' at pos (UTF-8 aware per the RFC);
    returns bytes-consumed."""
    c = b[pos]
    if c < 192:
        if 97 <= c <= 122:
            b[pos] ^= 32
        return 1
    if c < 224:
        if pos + 1 < len(b):
            b[pos + 1] ^= 32
        return 2
    if pos + 2 < len(b):
        b[pos + 2] ^= 5
    return 3

def apply_transform(w, t):
    p = SEGS[TRANS[t * 3]]
    kind = TRANS[t * 3 + 1]
    s = SEGS[TRANS[t * 3 + 2]]
    w = bytearray(w)
    if 1 <= kind <= 9:            # OmitLast1..9
        w = w[:max(0, len(w) - kind)]
    elif 12 <= kind <= 20:        # OmitFirst1..9
        w = w[min(len(w), kind - 11):]
    elif kind == 10:              # UppercaseFirst
        if w:
            ferment(w, 0)
    elif kind == 11:              # UppercaseAll
        i = 0
        while i < len(w):
            i += ferment(w, i)
    return p + bytes(w) + s

# --------------------------------------------- minimal brotli stream writer
class BitWriter:
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

def simple1(bw, sym, abits):
    """Simple prefix code with a single symbol (reads 0 data bits)."""
    bw.w(1, 2)        # "simple" marker
    bw.w(0, 2)        # NSYM - 1 = 0
    bw.w(sym, abits)

COPY_BASE = [2, 3, 4, 5, 6, 7, 8, 9, 10, 12, 14, 18, 22, 30, 38, 54,
             70, 102, 134, 198, 326, 582, 1094, 2118]
COPY_EXTRA = [0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5,
              6, 7, 8, 9, 10, 24]

def copy_code(l):
    for c in range(23, -1, -1):
        if COPY_BASE[c] <= l:
            return c, l - COPY_BASE[c], COPY_EXTRA[c]
    raise ValueError(l)

def dist_code(d):
    """NPOSTFIX=0, NDIRECT=0 inversion of the distance formula."""
    for nb in range(1, 25):
        for h in (0, 1):
            base = ((2 + h) << nb) - 4 + 1
            if base <= d < base + (1 << nb):
                return 16 + 2 * (nb - 1) + h, d - base, nb
    raise ValueError(d)

def craft(l, wid, t, mlen):
    """One-metablock stream: a single insert0/copy-l command whose
    distance points at static-dictionary word (l, wid) with transform t.
    """
    d = 1 + wid + (t << NDBITS[l])     # max_distance = 0 at stream start
    cc, cextra, cbits = copy_code(l)
    dc, dextra, dbits = dist_code(d)
    cmd = 128 + cc if cc < 8 else 192 + (cc - 8)   # insert code 0
    bw = BitWriter()
    bw.w(0, 1)                 # WBITS = 16
    bw.w(1, 1)                 # ISLAST
    bw.w(0, 1)                 # ISLASTEMPTY = 0
    bw.w(0, 2)                 # MNIBBLES code 0 -> 4 nibbles
    bw.w(mlen - 1, 16)         # MLEN - 1
    bw.w(0, 1)                 # NBLTYPES_L = 1
    bw.w(0, 1)                 # NBLTYPES_I = 1
    bw.w(0, 1)                 # NBLTYPES_D = 1
    bw.w(0, 2)                 # NPOSTFIX = 0
    bw.w(0, 4)                 # NDIRECT = 0
    bw.w(0, 2)                 # context mode (LSB6) for the one L type
    bw.w(0, 1)                 # NTREES_L = 1
    bw.w(0, 1)                 # NTREES_D = 1
    simple1(bw, 97, 8)         # literal code (never used)
    simple1(bw, cmd, 10)       # command code
    simple1(bw, dc, 6)         # distance code
    # data: the lone command (0 bits) + copy extra + dist extra
    bw.w(cextra, cbits)
    bw.w(dextra, dbits)
    return bw.bytes()

def dict_ref(l, wid, t):
    """Decode a crafted dictionary reference via the reference decoder,
    brute-forcing MLEN (the transform output length is what we are
    recovering, so it cannot be written into the header a priori)."""
    for mlen in range(1, 64):
        try:
            return brotlicffi.decompress(craft(l, wid, t, mlen))
        except brotlicffi.error:
            continue
    raise AssertionError(f'no MLEN decodes for l={l} wid={wid} t={t}')

# identity transform across every word length pins dictionary placement
for l in range(4, 25):
    for wid in (0, 1, (1 << NDBITS[l]) - 1):
        got = dict_ref(l, wid, 0)
        assert got == word(l, wid), (l, wid, got, word(l, wid))
print('dictionary placement verified across lengths 4..24')

# every transform id, on a few words, against the recovered table; the
# length-24 case keeps every transform's output non-empty, the short
# cases additionally pin the omit-clamps (an all-omitted word with empty
# prefix+suffix yields an empty stream our one-command crafting cannot
# express, so those are skipped — identity coverage above already pins
# short words)
for t in range(121):
    for (l, wid) in ((5, 0), (10, 37), (24, 3)):
        want = apply_transform(word(l, wid), t)
        if not want:
            continue
        got = dict_ref(l, wid, t)
        assert got == want, (t, l, wid, got, want)
print('all 121 transforms verified against the reference decoder')

blob = DICT + CTX + PS + TRANS
assert len(blob) == 122784 + 2048 + 217 + 363
import os
os.makedirs(os.path.dirname(OUT), exist_ok=True)
open(OUT, 'wb').write(blob)
print('wrote', OUT, len(blob), 'bytes, sha256',
      hashlib.sha256(blob).hexdigest())
