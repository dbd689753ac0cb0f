#!/usr/bin/env python3
"""Extract the RFC 7932 static dictionary + Appendix B transforms from the
system libbrotli (the same libbrotli 1.2.0 the BrotliInflateSpec pins were
generated from) and emit:

  src/main/resources/graft/brotli_dict.bin   -- the 122,784 dictionary bytes
  src/main/scala/graft/functions/BrotliDictData.scala -- generated tables

Every extracted transform is cross-checked against the library's own
BrotliTransformDictionaryWord on probe words (ASCII + UTF-8 2/3-byte) so the
Scala reimplementation semantics (ferment, omit-first/last) are pinned to the
reference behavior, not to a reading of the spec.
"""
import ctypes, ctypes.util, os, sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

common = ctypes.CDLL(ctypes.util.find_library('brotlicommon'))

# struct BrotliDictionary (brotli/common/dictionary.h):
#   uint8_t  size_bits_by_length[32];
#   uint32_t offsets_by_length[32];
#   size_t   data_size;
#   const uint8_t* data;
class BrotliDictionary(ctypes.Structure):
    _fields_ = [
        ('size_bits_by_length', ctypes.c_uint8 * 32),
        ('offsets_by_length', ctypes.c_uint32 * 32),
        ('data_size', ctypes.c_size_t),
        ('data', ctypes.POINTER(ctypes.c_uint8)),
    ]

# struct BrotliTransforms (brotli/common/transform.h):
class BrotliTransforms(ctypes.Structure):
    _fields_ = [
        ('prefix_suffix_size', ctypes.c_uint16),
        ('prefix_suffix', ctypes.POINTER(ctypes.c_uint8)),
        ('prefix_suffix_map', ctypes.POINTER(ctypes.c_uint16)),
        ('num_transforms', ctypes.c_uint32),
        ('transforms', ctypes.POINTER(ctypes.c_uint8)),
        ('params', ctypes.POINTER(ctypes.c_uint8)),
        ('cutOffTransforms', ctypes.c_int16 * 10),
    ]

common.BrotliGetDictionary.restype = ctypes.POINTER(BrotliDictionary)
common.BrotliGetTransforms.restype = ctypes.POINTER(BrotliTransforms)
common.BrotliTransformDictionaryWord.restype = ctypes.c_int
common.BrotliTransformDictionaryWord.argtypes = [
    ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
    ctypes.c_int, ctypes.POINTER(BrotliTransforms), ctypes.c_int]

d = common.BrotliGetDictionary().contents
size_bits = list(d.size_bits_by_length)
offsets = list(d.offsets_by_length)
assert d.data_size == 122784, d.data_size
assert offsets[31] == d.data_size or offsets[25] == d.data_size, offsets
data = bytes(ctypes.cast(d.data, ctypes.POINTER(ctypes.c_uint8 * d.data_size)).contents)
# cross-check offsets: offset[i+1] == offset[i] + (bits[i] ? i << bits[i] : 0)
for i in range(31):
    step = (i << size_bits[i]) if size_bits[i] else 0
    assert offsets[i + 1] == offsets[i] + step, (i, offsets[i], size_bits[i])

t = common.BrotliGetTransforms().contents
assert t.num_transforms == 121, t.num_transforms
pfx_blob = bytes(ctypes.cast(t.prefix_suffix,
                 ctypes.POINTER(ctypes.c_uint8 * t.prefix_suffix_size)).contents)
n_ids = max(ctypes.cast(t.transforms,
            ctypes.POINTER(ctypes.c_uint8 * (3 * 121))).contents) + 1
pmap = list(ctypes.cast(t.prefix_suffix_map,
            ctypes.POINTER(ctypes.c_uint16 * 256)).contents)
triples = list(ctypes.cast(t.transforms,
               ctypes.POINTER(ctypes.c_uint8 * (3 * 121))).contents)

def ps(idx):
    off = pmap[idx]
    ln = pfx_blob[off]
    return pfx_blob[off + 1: off + 1 + ln]

transforms = []
for i in range(121):
    pid, typ, sid = triples[3 * i: 3 * i + 3]
    transforms.append((ps(pid), typ, ps(sid)))

# ---- verify against BrotliTransformDictionaryWord ----
IDENT, OMIT_LAST = 0, lambda n: n          # types 1..9
UPPER_FIRST, UPPER_ALL = 10, 11            # ferment
OMIT_FIRST = lambda n: 11 + n              # types 12..20

def ferment(b, upto):
    b = bytearray(b)
    i = 0
    while i < len(b) and (upto is None or i == 0):
        c = b[i]
        if c < 192:
            if 97 <= c <= 122:
                b[i] ^= 32
            i += 1
        elif c < 224:
            if i + 1 < len(b):
                b[i + 1] ^= 32
            i += 2
        else:
            if i + 2 < len(b):
                b[i + 2] ^= 5
            i += 3
    return bytes(b)

def ferment_all(b):
    b = bytearray(b)
    i = 0
    while i < len(b):
        c = b[i]
        if c < 192:
            if 97 <= c <= 122:
                b[i] ^= 32
            i += 1
        elif c < 224:
            if i + 1 < len(b):
                b[i + 1] ^= 32
            i += 2
        else:
            if i + 2 < len(b):
                b[i + 2] ^= 5
            i += 3
    return bytes(b)

def my_transform(word, pfx, typ, sfx):
    if typ == 0:
        mid = word
    elif 1 <= typ <= 9:
        mid = word[:max(0, len(word) - typ)]
    elif typ == 10:
        mid = ferment(word, upto=1)
    elif typ == 11:
        mid = ferment_all(word)
    elif 12 <= typ <= 20:
        cut = typ - 11
        mid = word[min(cut, len(word)):]
    else:
        raise ValueError(typ)
    return pfx + mid + sfx

probes = [b'abcdEFgh ijKL', b'hello', u'été 中文x'.encode('utf-8'),
          b'a', data[offsets[4]:offsets[4] + 4], data[offsets[24]:offsets[24] + 24]]
dst = (ctypes.c_uint8 * 256)()
mismatch = 0
for i, (pfx, typ, sfx) in enumerate(transforms):
    for w in probes:
        src = (ctypes.c_uint8 * len(w))(*w)
        n = common.BrotliTransformDictionaryWord(dst, src, len(w),
                                                 ctypes.byref(t), i)
        ref = bytes(dst[:n])
        mine = my_transform(w, pfx, typ, sfx)
        if ref != mine:
            mismatch += 1
            print(f'MISMATCH t={i} typ={typ} w={w!r} ref={ref!r} mine={mine!r}')
assert mismatch == 0, f'{mismatch} transform mismatches'
print(f'all {len(transforms)} transforms verified on {len(probes)} probes')

# ---- emit resources ----
res = os.path.join(ROOT, 'src/main/resources/graft')
os.makedirs(res, exist_ok=True)
with open(os.path.join(res, 'brotli_dict.bin'), 'wb') as f:
    f.write(data)
print('wrote brotli_dict.bin', len(data))

def scala_bytes(b):
    # printable-safe Scala string literal of raw bytes (all are <128 here?)
    out = []
    for c in b:
        if c == 92: out.append('\\\\')
        elif c == 34: out.append('\\"')
        elif 32 <= c < 127: out.append(chr(c))
        else: out.append('\\u%04x' % c)
    return '"' + ''.join(out) + '"'

lines = []
lines.append('package graft.functions')
lines.append('')
lines.append('/** GENERATED by tools/extract_brotli_dict.py from the system')
lines.append('  * libbrotli 1.2.0 (`BrotliGetDictionary`/`BrotliGetTransforms`) --')
lines.append('  * the RFC 7932 Appendix A dictionary geometry and the Appendix B')
lines.append('  * transform table, verified triple-by-triple against')
lines.append('  * `BrotliTransformDictionaryWord` at extraction time. Do not edit.')
lines.append('  */')
lines.append('private[functions] object BrotliDictData {')
lines.append('  /** NDBITS by copy length (RFC 7932 section 8); 0 = no words. */')
lines.append('  val SizeBits: Array[Int] = Array(%s)' % ', '.join(map(str, size_bits[:25])))
lines.append('  /** Byte offset of the first word of each length. */')
lines.append('  val Offsets: Array[Int] = Array(%s)' % ', '.join(map(str, offsets[:26])))
lines.append('  /** Transform triples: (prefix, type, suffix); type 0=identity,')
lines.append('    * 1..9=omit-last-N, 10=ferment-first, 11=ferment-all,')
lines.append('    * 12..20=omit-first-(N-11). */')
lines.append('  val TransformTypes: Array[Int] = Array(%s)' %
             ', '.join(str(typ) for _, typ, _ in transforms))
lines.append('  val TransformPrefixes: Array[String] = Array(')
for i in range(0, 121, 6):
    chunk = ', '.join(scala_bytes(p) for p, _, _ in transforms[i:i+6])
    lines.append('    ' + chunk + (',' if i + 6 < 121 else ''))
lines.append('  )')
lines.append('  val TransformSuffixes: Array[String] = Array(')
for i in range(0, 121, 6):
    chunk = ', '.join(scala_bytes(s) for _, _, s in transforms[i:i+6])
    lines.append('    ' + chunk + (',' if i + 6 < 121 else ''))
lines.append('  )')
lines.append('}')
with open(os.path.join(ROOT, 'src/main/scala/graft/functions/BrotliDictData.scala'), 'w') as f:
    f.write('\n'.join(lines) + '\n')
print('wrote BrotliDictData.scala')
print('size_bits[4..24] =', size_bits[4:25])
print('non-ascii prefix/suffix bytes:',
      [i for i, (p, _, s) in enumerate(transforms) if any(c > 126 or c < 32 for c in p + s)])
