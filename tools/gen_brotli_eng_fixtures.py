#!/usr/bin/env python3
"""Generate dictionary-exercising brotli fixtures with the system
libbrotlienc (same libbrotli 1.2.0 as every other BrotliInflateSpec pin).
Real English prose at q5/q9/q11 makes the encoder emit static-dictionary
references (word + transform) constantly — the decode path this round added.
"""
import ctypes, ctypes.util, os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RES = os.path.join(ROOT, 'src/test/resources/brotli')

enc = ctypes.CDLL(ctypes.util.find_library('brotlienc'))
enc.BrotliEncoderCompress.restype = ctypes.c_int
enc.BrotliEncoderCompress.argtypes = [
    ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_size_t,
    ctypes.c_char_p, ctypes.POINTER(ctypes.c_size_t), ctypes.c_char_p]
dec = ctypes.CDLL(ctypes.util.find_library('brotlidec'))
dec.BrotliDecoderDecompress.restype = ctypes.c_int
dec.BrotliDecoderDecompress.argtypes = [
    ctypes.c_size_t, ctypes.c_char_p, ctypes.POINTER(ctypes.c_size_t),
    ctypes.c_char_p]

def compress(data, q, lgwin=22):
    out_len = ctypes.c_size_t(len(data) * 2 + 1024)
    out = ctypes.create_string_buffer(out_len.value)
    ok = enc.BrotliEncoderCompress(q, lgwin, 0, len(data), data,
                                   ctypes.byref(out_len), out)
    assert ok == 1
    comp = out.raw[:out_len.value]
    # round-trip through libbrotlidec to validate the fixture itself
    back_len = ctypes.c_size_t(len(data) + 16)
    back = ctypes.create_string_buffer(back_len.value)
    assert dec.BrotliDecoderDecompress(len(comp), comp,
                                       ctypes.byref(back_len), back) == 1
    assert back.raw[:back_len.value] == data
    return comp

# Prose dense in dictionary words and transform triggers: sentence-initial
# capitals (ferment-first), ALL-CAPS (ferment-all), quoted/suffixed words
# (prefix/suffix transforms), and plural/-ing/-ed forms (omit-last).
PROSE = (b"The information about the development of the government was "
  b"published on the website. Because the university provided additional "
  b"description, the community considered whether the performance of the "
  b"technology would be different. However, the management of the company "
  b"announced that the president received the documents. INTERNATIONAL "
  b"organizations, including the association and the department, were "
  b"available throughout the conference. \"Education\", she said, \"is the "
  b"foundation of everything important in the world.\" Children understand "
  b"the experience of working with computers, and the software industry "
  b"continues developing applications. According to the following analysis, "
  b"the position of the administration changed significantly during the "
  b"second quarter; nevertheless, the individual responsibilities remained "
  b"the same. Information technologies: communication, entertainment, "
  b"advertising, insurance, investment, equipment, environment, statement. "
  b"The business required further consideration before the beginning of the "
  b"season, because everything depended on the relationship between the "
  b"customer and the professional services offered by the corporation. ") * 4

for name, q in (('Q5Eng', 5), ('Q9Eng', 9), ('Q11Eng', 11)):
    comp = compress(PROSE, q)
    with open(os.path.join(RES, f'{name}.hex'), 'w') as f:
        f.write(comp.hex())
    with open(os.path.join(RES, f'{name}_payload.hex'), 'w') as f:
        f.write(PROSE.hex())
    print(name, 'q', q, 'payload', len(PROSE), '-> compressed', len(comp))
