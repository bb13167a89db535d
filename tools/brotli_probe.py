#!/usr/bin/env python3
"""Hand-craft minimal RFC 7932 streams and decode them with the
REFERENCE decoder (brotlicffi) to pin down bitstream semantics that
the prose leaves easy to misread: the initial distance ring buffer
order, the short-code index/delta mapping, and push behavior.

Run with the container's /root/miniconda/bin/python3 (has brotlicffi).
"""
import sys
import brotlicffi

PREFIX = b"abcdefghijklmnopqrstuvwxyz012345"  # 32 distinct bytes


class W:
    def __init__(self):
        self.bits = []

    def b(self, value, n):
        for i in range(n):
            self.bits.append((value >> i) & 1)

    def bytes_(self):
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            v = 0
            for j, bit in enumerate(self.bits[i:i + 8]):
                v |= bit << j
            out.append(v)
        return bytes(out)

    def align(self):
        while len(self.bits) % 8:
            self.bits.append(0)


def simple_tree(w, alphabet_size, syms):
    """Emit a simple prefix code; for len(syms)==4 uses the flat shape."""
    abits = max(1, (alphabet_size - 1).bit_length())
    w.b(1, 2)                 # simple
    w.b(len(syms) - 1, 2)
    for s in syms:
        w.b(s, abits)
    if len(syms) == 4:
        w.b(0, 1)             # flat {2,2,2,2}


def make_stream(commands, ndirect_nib=15, mlen2=None):
    """PREFIX as an uncompressed metablock, then one compressed
    metablock of `commands`: list of (cmd_code, dist_sym_index, extra)
    where dist_syms are the distance-tree symbols in sorted order.
    All commands are insert-0/copy-4 unless cmd given explicitly."""
    dist_syms = sorted({d for _, d, _ in commands})
    cmd_syms = sorted({c for c, _, _ in commands})
    w = W()
    w.b(0, 1)                             # WBITS = 16
    # metablock 1: uncompressed
    w.b(0, 1)                             # ISLAST=0
    w.b(0, 2)                             # MNIBBLES=4
    w.b(len(PREFIX) - 1, 16)
    w.b(1, 1)                             # ISUNCOMPRESSED
    w.align()
    for byte in PREFIX:
        w.b(byte, 8)
    # metablock 2: last, compressed
    w.b(1, 1)                             # ISLAST
    w.b(0, 1)                             # ISLASTEMPTY
    w.b(0, 2)                             # MNIBBLES=4
    total = mlen2 if mlen2 is not None else 4 * len(commands)
    w.b(total - 1, 16)
    w.b(0, 1)                             # NBLTYPESL=1
    w.b(0, 1)                             # NBLTYPESI=1
    w.b(0, 1)                             # NBLTYPESD=1
    w.b(0, 2)                             # NPOSTFIX=0
    w.b(ndirect_nib, 4)                   # NDIRECT
    w.b(0, 2)                             # context mode literal type 0
    w.b(0, 1)                             # NTREESL=1
    w.b(0, 1)                             # NTREESD=1
    simple_tree(w, 256, [ord('z')])       # literal tree (unused)
    simple_tree(w, 704, cmd_syms)         # command tree
    dist_alpha = 16 + ndirect_nib + 48
    simple_tree(w, dist_alpha, dist_syms)
    for cmd, dist, extra in commands:
        ci = cmd_syms.index(cmd)
        if len(cmd_syms) == 2:
            w.b(ci, 1)
        elif len(cmd_syms) == 1:
            pass
        else:
            raise AssertionError("use 1-2 distinct commands")
        # insert/copy codes 0-7 carry no extra bits for copy<=9
        if cmd >= 128:                    # explicit distance
            di = dist_syms.index(dist)
            # canonical code bits are read MSB-first: emit in that order
            if len(dist_syms) == 2:
                w.b(di, 1)
            elif len(dist_syms) == 3:
                if di == 0:
                    w.b(0, 1)             # code '0'
                else:
                    w.b(1, 1)             # '10' or '11'
                    w.b(di - 1, 1)
            elif len(dist_syms) == 4:
                w.b(di >> 1, 1)
                w.b(di & 1, 1)
            if extra is not None:
                w.b(*extra)               # (value, nbits)
    w.align()
    return w.bytes_()


CPY4 = 128 + 2          # insert 0, copy 4, explicit distance


def dec(stream):
    try:
        return brotlicffi.decompress(stream)
    except Exception as e:
        return b"<ERROR: %s>" % str(e).encode()


def show(label, commands, **kw):
    s = make_stream(commands, **kw)
    out = dec(s)
    print(f"{label:30s} -> {out[32:]!r}")
    return out


print("prefix:", PREFIX)
print("pos 32; copy=4 each; direct codes 16+d -> distance d+1 (NDIRECT=15)")
# initial ring buffer: which distance does each short code give?
for code in range(4):
    show(f"short code {code}", [(CPY4, code, None)])
# codes 4..15 at initial state
for code in range(4, 16):
    show(f"short code {code}", [(CPY4, code, None)])
# push then re-read: push distance 5 (direct code 20), then each short code
for code in range(4):
    show(f"push5 then code {code}", [(CPY4, 20, None), (CPY4, code, None)],
         mlen2=8)
# push 5 then 7, then short codes
for code in range(4):
    show(f"push5,7 then code {code}",
         [(CPY4, 20, None), (CPY4, 22, None), (CPY4, code, None)], mlen2=12)
# does code 0 (last) itself push? push 5, code 0, then code 1:
show("push5, c0, c1", [(CPY4, 20, None), (CPY4, 0, None), (CPY4, 1, None)],
     mlen2=12)
# does a short-code-derived distance push? push5, code4 (last-1=4), code1
show("push5, c4, c1", [(CPY4, 20, None), (CPY4, 4, None), (CPY4, 1, None)],
     mlen2=12)
# implied distance-0 command (cmd<128): insert 0 impossible; use ins0copy4
# range 0: cmd = (ins<<3)|copy with insCode 0 copyCode 2
show("push5 then implied cmd 2", [(CPY4, 20, None), (2, 0, None)], mlen2=8)
