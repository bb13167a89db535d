#!/usr/bin/env python3
"""Vendor a corpus of REFERENCE-encoded brotli streams (round 17,
ADVICE r16): BrotliSpec's roundtrip coverage was gated on a live
brotlicffi interpreter — on a machine without it the whole suite
silently skipped. This tool compresses a deterministic corpus (the
same shapes BrotliSpec reconstructs in Scala) with the reference
encoder and writes fixtures/brotli_ref_streams.tsv, so the
decoder-vs-reference check runs everywhere, python or not.

Also builds and REFERENCE-VERIFIES the two ADVICE edge streams:
  - 0x1a: a last+metadata meta-block — the reference decoder accepts
    it and yields b'' (our decoder used to refuse);
  - a complex prefix code whose read lengths collapse to one nonzero
    symbol — the reference decoder refuses it (our decoder used to
    accept it as a degenerate 0-bit code).

Run: /root/miniconda/bin/python3 tools/brotli_fixtures.py
"""
import brotlicffi

DICT_WORDS = ("time down life left back code data show only site "
              "city open just like free work the of and that with from this have")
HTML = ('<html><body class="main"><p>This is a test of the '
        'emergency broadcast system.</p><a href="https://example.com/">'
        'link</a></body></html>') * 5
UTF8 = ('naïve café résumé — Привет мир — こんにちは'
        '世界 — mañana übergroß ÉCOLE Über ') * 8


def shapes():
    """Deterministic corpus; mirrored byte-for-byte in BrotliSpec."""
    mask = (1 << 64) - 1
    return [
        ("empty", b""),
        ("one-byte", b"x"),
        ("short-ascii", b"hello world"),
        ("dict-words", (DICT_WORDS + " " + DICT_WORDS.upper() + ". " +
                        "The quick brown fox jumps over the lazy dog. " +
                        "Attachment forwarding notification available immediately. " +
                        DICT_WORDS.capitalize()).encode("utf-8")),
        ("html", HTML.encode("utf-8")),
        ("utf8", UTF8.encode("utf-8")),
        ("repetitive", b"abcabcabc" * 500),
        ("runs", bytes([7]) * 4096),
        ("noise-2k", bytes(((i * 6364136223846793005 + 1442695040888963407)
                            & mask) >> 33 & 0xFF for i in range(2048))),
        ("binary-8k", bytes((i * 2654435761 >> 13) & 0xFF for i in range(8192))),
    ]


def main():
    rows = []
    for name, data in shapes():
        for q, lgwin in [(1, 10), (1, 22), (5, 18), (11, 10), (11, 22)]:
            comp = brotlicffi.compress(data, quality=q, lgwin=lgwin)
            assert brotlicffi.decompress(comp) == data
            rows.append((name, q, lgwin, "generic", comp))
        for mode in ("TEXT", "FONT"):
            comp = brotlicffi.compress(
                data, quality=11, lgwin=22,
                mode=getattr(brotlicffi, "MODE_" + mode))
            assert brotlicffi.decompress(comp) == data
            rows.append((name, 11, 22, mode.lower(), comp))

    with open("fixtures/brotli_ref_streams.tsv", "w") as f:
        f.write("# label\tquality\tlgwin\tmode\tcomp_hex — reference "
                "brotlicffi output over BrotliSpec's deterministic corpus\n")
        for name, q, lgwin, mode, comp in rows:
            f.write(f"{name}\t{q}\t{lgwin}\t{mode}\t{comp.hex()}\n")
    total = sum(len(c) for _, _, _, _, c in rows)
    print(f"wrote {len(rows)} streams, {total} compressed bytes")

    # --- edge stream 1: last + metadata meta-block (must decode to b'')
    meta_last = bytes([0x1A])
    assert brotlicffi.decompress(meta_last) == b"", \
        brotlicffi.decompress(meta_last)
    print("0x1a (last+metadata) -> b'' [reference accepts]")

    # --- edge stream 2: complex prefix code collapsing to ONE nonzero
    # length (literal tree of a 1-byte metablock). The reference decoder
    # must REFUSE it: the code-length space is not exactly consumed.
    bits = []

    def b(value, n):
        for i in range(n):
            bits.append((value >> i) & 1)

    b(0, 1)        # WBITS = 16
    b(1, 1)        # ISLAST
    b(0, 1)        # ISLASTEMPTY
    b(0, 2)        # MNIBBLES = 4
    b(0, 16)       # MLEN = 1
    b(0, 1)        # NBLTYPESL = 1
    b(0, 1)        # NBLTYPESI = 1
    b(0, 1)        # NBLTYPESD = 1
    b(0, 2)        # NPOSTFIX = 0
    b(0, 4)        # NDIRECT = 0
    b(0, 2)        # context mode for literal type 0
    b(0, 1)        # NTREESL = 1
    b(0, 1)        # NTREESD = 1
    # literal tree, complex form, HSKIP=0. CL-code lengths read in the
    # fixed order [1,2,3,4,0,5,...] via the {2,4,3,2,2,4} code:
    #   value 1 -> '1110', value 0 -> '00'
    # giving CL lengths {0:1, 1:1} (space exactly consumed at 2 syms).
    b(0, 2)                     # complex, HSKIP=0
    b(0b0111, 4)                # order[0]=1: CL value 1 (code 1110 MSB-first)
    b(0b00, 2)                  # order[1]=2: CL value 0
    b(0b00, 2)                  # order[2]=3: CL value 0
    b(0b00, 2)                  # order[3]=4: CL value 0
    b(0b0111, 4)                # order[4]=0: CL value 1 -> space = 0, stop
    # symbol lengths via the {0:'0', 1:'1'} CL code: 65 zeros, one
    # length-1 (symbol 'A'), 190 zeros -> exactly one nonzero length,
    # Kraft space left over.
    for _ in range(65):
        b(0, 1)
    b(1, 1)
    for _ in range(190):
        b(0, 1)
    # nothing further matters: a conforming decoder has already refused
    out = bytearray()
    for i in range(0, len(bits), 8):
        v = 0
        for j, bit in enumerate(bits[i:i + 8]):
            v |= bit << j
        out.append(v)
    degenerate = bytes(out)
    try:
        got = brotlicffi.decompress(degenerate)
        raise SystemExit(
            f"reference ACCEPTED degenerate complex code: {got!r} — "
            f"stream {degenerate.hex()}")
    except brotlicffi.error:
        print(f"degenerate complex code refused by reference; "
              f"hex={degenerate.hex()}")


if __name__ == "__main__":
    main()
