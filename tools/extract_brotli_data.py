#!/usr/bin/env python3
"""Extract the RFC 7932 static data tables from the public brotli
shared library (libbrotlicommon) via its exported C API:

  - the 122,784-byte static dictionary (RFC 7932 Appendix A)
  - the 121 word transforms: (prefix, type, suffix) (Appendix B)
  - the 2,048-byte literal-context lookup table (Appendix C)
  - size_bits_by_length / offsets_by_length

All of this data is NORMATIVE spec content (the RFC appendices define
it byte for byte); the library is just a convenient machine-readable
carrier.  Every extracted transform is cross-validated by calling the
library's own BrotliTransformDictionaryWord against a pure-python
re-implementation, so a wrong struct-layout guess fails loudly here
rather than producing corrupt Scala tables.

Outputs:
  src/main/resources/graft/brotli_dict.bin   (raw 122,784 bytes)
  /tmp/brotli_tables.scala                   (paste-ready Scala arrays)

Usage: python3 tools/extract_brotli_data.py
"""
import ctypes, hashlib, struct, sys

LIB = "/root/miniconda/lib/libbrotlicommon.so"
lib = ctypes.CDLL(LIB)

# --- dictionary ------------------------------------------------------
# struct BrotliDictionary { uint8 size_bits_by_length[32];
#   uint32 offsets_by_length[32]; size_t data_size; const uint8* data; }
lib.BrotliGetDictionary.restype = ctypes.c_void_p
dptr = lib.BrotliGetDictionary()
raw = ctypes.string_at(dptr, 32 + 128 + 8 + 8)
size_bits = list(raw[:32])
offsets = list(struct.unpack("<32I", raw[32:160]))
data_size, data_ptr = struct.unpack("<QQ", raw[160:176])
assert data_size == 122784, f"unexpected dictionary data_size {data_size}"
dict_data = ctypes.string_at(data_ptr, data_size)
print("size_bits_by_length =", size_bits)
print("offsets_by_length   =", offsets)
print("dict sha256 =", hashlib.sha256(dict_data).hexdigest())
# sanity: the first length-4 words are known from the RFC appendix
assert dict_data[offsets[4]:offsets[4] + 16] == b"timedownlifeleft", \
    dict_data[offsets[4]:offsets[4] + 16]

# --- transforms ------------------------------------------------------
# struct BrotliTransforms { uint16 prefix_suffix_size; const uint8* prefix_suffix;
#   const uint16* prefix_suffix_map; uint32 num_transforms;
#   const uint8* transforms; const uint8* params; int16 cutOffTransforms[10]; }
lib.BrotliGetTransforms.restype = ctypes.c_void_p
tptr = lib.BrotliGetTransforms()
traw = ctypes.string_at(tptr, 48)
ps_size = struct.unpack("<H", traw[0:2])[0]
ps_ptr, map_ptr = struct.unpack("<QQ", traw[8:24])
num_transforms = struct.unpack("<I", traw[24:28])[0]
tr_ptr = struct.unpack("<Q", traw[32:40])[0]
assert num_transforms == 121, f"num_transforms={num_transforms}"
prefix_suffix = ctypes.string_at(ps_ptr, ps_size)
triples = list(ctypes.string_at(tr_ptr, num_transforms * 3))
max_idx = max(triples[0::3] + triples[2::3])
psmap = list(struct.unpack(f"<{max_idx+1}H",
                           ctypes.string_at(map_ptr, (max_idx + 1) * 2)))

def entry(idx):
    """prefix_suffix entries are length-prefixed (first byte = n, then
    n content bytes); the map points at the length byte."""
    off = psmap[idx]
    n = prefix_suffix[off]
    return prefix_suffix[off + 1:off + 1 + n]

transforms = []
for i in range(num_transforms):
    p, t, s = triples[3 * i: 3 * i + 3]
    transforms.append((entry(p), t, entry(s)))

# --- cross-validate against BrotliTransformDictionaryWord ------------
def upper(b, pos):
    c = b[pos]
    if c < 0xC0:
        if ord('a') <= c <= ord('z'):
            b[pos] = c ^ 32
        return 1
    if c < 0xE0:
        b[pos + 1] ^= 32
        return 2
    b[pos + 2] ^= 5
    return 3

def apply_transform(word, idx):
    prefix, t, suffix = transforms[idx]
    w = bytearray(word)
    if 12 <= t <= 20:            # OmitFirst1..9
        w = w[t - 11:]
    elif 1 <= t <= 9:            # OmitLast1..9
        w = w[:max(0, len(w) - t)]
    if t == 10 and len(w) > 0:   # UppercaseFirst
        upper(w, 0)
    elif t == 11:                # UppercaseAll
        pos = 0
        while pos < len(w):
            pos += upper(w, pos)
    return bytes(prefix) + bytes(w) + bytes(suffix)

lib.BrotliTransformDictionaryWord.restype = ctypes.c_int
out = ctypes.create_string_buffer(64)
words = [b"time", b"attachment", b"\xc3\xa9cole intl", b"abcDEFghiJKLmno"]
checked = 0
for idx in range(num_transforms):
    for w in words:
        n = lib.BrotliTransformDictionaryWord(
            out, ctypes.c_char_p(w), ctypes.c_int(len(w)),
            ctypes.c_void_p(tptr), ctypes.c_int(idx))
        got = out.raw[:n]
        want = apply_transform(w, idx)
        assert got == want, (idx, w, got, want)
        checked += 1
print(f"transform cross-validation OK ({checked} cases)")

# --- context lookup table (Appendix C) -------------------------------
lut = ctypes.string_at(
    ctypes.addressof(ctypes.c_uint8.in_dll(lib, "_kBrotliContextLookupTable")),
    2048)
print("context LUT sha256 =", hashlib.sha256(lut).hexdigest())

# --- emit ------------------------------------------------------------
with open("src/main/resources/graft/brotli_dict.bin", "wb") as f:
    f.write(dict_data)
print("wrote src/main/resources/graft/brotli_dict.bin")

def scala_bytes(name, data, per=20):
    lines = [f"  val {name}: Array[Byte] = Array[Byte]("]
    row = []
    for i, b in enumerate(data):
        v = b - 256 if b > 127 else b
        row.append(str(v))
        if len(row) == per:
            lines.append("    " + ", ".join(row) + ",")
            row = []
    if row:
        lines.append("    " + ", ".join(row) + ",")
    lines[-1] = lines[-1].rstrip(",")
    lines.append("  )")
    return "\n".join(lines)

with open("/tmp/brotli_tables.scala", "w") as f:
    f.write("  // size_bits_by_length (word-count log2 per word length 0-31)\n")
    f.write("  val SizeBitsByLength: Array[Int] = Array(%s)\n\n"
            % ", ".join(map(str, size_bits)))
    f.write("  val OffsetsByLength: Array[Int] = Array(%s)\n\n"
            % ", ".join(map(str, offsets)))
    f.write("  // 121 transforms as (prefix, type, suffix); strings are\n")
    f.write("  // ISO-8859-1 so each char is one byte\n")
    f.write("  val Transforms: Array[(String, Int, String)] = Array(\n")
    for p, t, s in transforms:
        pp = "".join("\\u%04x" % c if c < 32 or c > 126 or chr(c) in '"\\'
                     else chr(c) for c in p)
        ss = "".join("\\u%04x" % c if c < 32 or c > 126 or chr(c) in '"\\'
                     else chr(c) for c in s)
        f.write(f'    ("{pp}", {t}, "{ss}"),\n')
    f.write("  )\n\n")
    f.write(scala_bytes("ContextLut", lut) + "\n")
print("wrote /tmp/brotli_tables.scala")
