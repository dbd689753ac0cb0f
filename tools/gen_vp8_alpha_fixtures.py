#!/usr/bin/env python3
"""Lossy-WebP-with-alpha (VP8X + ALPH + VP8) fixtures via libwebp's
advanced encoder: alpha compression raw/VP8L, alpha filters
none/fast/best, plus a lossless-alpha default. Pins WebPDecodeRGBA md5s
(alpha participates) into lossy_pins.json with an `alpha255: false`
marker."""
import ctypes, hashlib, json, math, os

exec(open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
     'gen_vp8_fixtures_adv.py')).read().split('def img_photo')[0])

lib.WebPPictureImportRGBA.restype = ctypes.c_int

def encode_rgba(rgba, w, h, **kw):
    cfg = WebPConfig()
    assert lib.WebPConfigInitInternal(ctypes.byref(cfg), 0, ctypes.c_float(75.0), ENC_ABI)
    for k, v in kw.items():
        setattr(cfg, k, type(getattr(cfg, k))(v) if k == 'quality' else v)
    pic = WebPPicture()
    assert lib.WebPPictureInitInternal(ctypes.byref(pic), ENC_ABI)
    pic.width = w
    pic.height = h
    assert lib.WebPPictureImportRGBA(ctypes.byref(pic), rgba, w * 4)
    mw = WebPMemoryWriter()
    lib.WebPMemoryWriterInit(ctypes.byref(mw))
    pic.writer = ctypes.cast(lib.WebPMemoryWrite, WriterFunc)
    pic.custom_ptr = ctypes.cast(ctypes.byref(mw), ctypes.c_void_p)
    ok = lib.WebPEncode(ctypes.byref(cfg), ctypes.byref(pic))
    assert ok, f'encode failed err={pic.error_code}'
    out = bytes(ctypes.cast(mw.mem, ctypes.POINTER(ctypes.c_uint8 * mw.size)).contents)
    lib.WebPMemoryWriterClear(ctypes.byref(mw))
    lib.WebPPictureFree(ctypes.byref(pic))
    return out

def img_rgba(w, h, alpha_kind):
    px = bytearray()
    for y in range(h):
        for x in range(w):
            r = int(127 + 120 * math.sin(x * 0.11) * math.cos(y * 0.07))
            g = int(127 + 120 * math.sin((x + y) * 0.05))
            b = int(127 + 120 * math.cos(x * 0.03 + y * 0.09))
            if alpha_kind == 'grad':
                a = (x * 255) // max(1, w - 1)
            elif alpha_kind == 'blocky':
                a = 255 if ((x // 8) + (y // 8)) % 2 == 0 else 64
            else:  # noisy-ish deterministic
                a = (x * 37 + y * 101) % 256
            px += bytes([max(0, min(255, r)), max(0, min(255, g)),
                         max(0, min(255, b)), a])
    return bytes(px)

W, H = 96, 64
VECTORS = [
    ('alpha_default', 'grad', dict(quality=75.0)),
    ('alpha_raw', 'blocky', dict(alpha_compression=0, quality=60.0)),
    ('alpha_nofilter', 'noise', dict(alpha_filtering=0, quality=60.0)),
    ('alpha_best', 'grad', dict(alpha_filtering=2, quality=60.0)),
    ('alpha_blocky', 'blocky', dict(quality=50.0)),
]

RES = '/root/repo/src/test/resources/webp'
pins = json.load(open(f'{RES}/lossy_pins.json'))
for name, kind, kw in VECTORS:
    rgba_in = img_rgba(W, H, kind)
    webp = encode_rgba(rgba_in, W, H, **kw)
    # report chunk layout + ALPH header byte for the spec doc
    chunks = []
    p = 12
    alph_hdr = None
    while p + 8 <= len(webp):
        four = webp[p:p+4].decode('latin1')
        size = int.from_bytes(webp[p+4:p+8], 'little')
        chunks.append(four)
        if four == 'ALPH':
            alph_hdr = webp[p+8]
        p += 8 + size + (size & 1)
    ww, hh, stride, rgba = decode(webp, MODE_RGBA)
    assert (ww, hh) == (W, H)
    with open(f'{RES}/{name}.hex', 'w') as f:
        f.write(webp.hex())
    pins[name] = dict(w=W, h=H, rgba_md5=hashlib.md5(rgba).hexdigest(),
        sum_r=sum(rgba[0::4]), sum_g=sum(rgba[1::4]), sum_b=sum(rgba[2::4]),
        alpha255=all(a == 255 for a in rgba[3::4]),
        sum_a=sum(rgba[3::4]))
    hdr = alph_hdr if alph_hdr is not None else -1
    print(name, len(webp), 'chunks', chunks,
          f'alph_hdr=0b{hdr:08b}' if hdr >= 0 else 'NO ALPH',
          pins[name]['rgba_md5'], 'alpha255:', pins[name]['alpha255'])

with open(f'{RES}/lossy_pins.json', 'w') as f:
    json.dump(pins, f, indent=1, sort_keys=True)
print('total pins:', len(pins))

# ---- hand-built vertical/gradient-filtered ALPH variants: take the raw
# (method 0, no-filter) file, forward-filter its plane, splice it back,
# and let libwebp itself produce the reference decode ----
raw_file = bytes.fromhex(open(f'{RES}/alpha_raw.hex').read().strip())
p = 12
parts = []
alph_idx = None
while p + 8 <= len(raw_file):
    four = raw_file[p:p+4]
    size = int.from_bytes(raw_file[p+4:p+8], 'little')
    data = raw_file[p+8:p+8+size]
    if four == b'ALPH':
        alph_idx = len(parts)
    parts.append([four, data])
    p += 8 + size + (size & 1)
hdr0, plane = parts[alph_idx][1][0], parts[alph_idx][1][1:]
assert hdr0 == 0 and len(plane) == W * H

def fwd_filter(plane, mode):
    out = bytearray(len(plane))
    for y in range(H):
        for x in range(W):
            i = y * W + x
            if mode == 2:   # vertical: first row falls back to horizontal
                pred = (plane[i-1] if x else 0) if y == 0 else plane[i-W]
            else:           # gradient
                if y == 0:
                    pred = plane[i-1] if x else 0
                elif x == 0:
                    pred = plane[i-W]
                else:
                    pred = max(0, min(255, plane[i-1] + plane[i-W] - plane[i-W-1]))
            out[i] = (plane[i] - pred) & 0xff
    return bytes(out)

for name, mode in (('alpha_vfilt', 2), ('alpha_gfilt', 3)):
    newdata = bytes([mode << 2]) + fwd_filter(plane, mode)
    chunks = b''
    for i, (four, data) in enumerate(parts):
        d = newdata if i == alph_idx else data
        chunks += four + len(d).to_bytes(4, 'little') + d
        if len(d) & 1:
            chunks += b'\x00'
    webp = b'RIFF' + (4 + len(chunks)).to_bytes(4, 'little') + b'WEBP' + chunks
    ww, hh, stride, rgba = decode(webp, MODE_RGBA)
    assert (ww, hh) == (W, H)
    with open(f'{RES}/{name}.hex', 'w') as f:
        f.write(webp.hex())
    pins[name] = dict(w=W, h=H, rgba_md5=hashlib.md5(rgba).hexdigest(),
        sum_r=sum(rgba[0::4]), sum_g=sum(rgba[1::4]), sum_b=sum(rgba[2::4]),
        alpha255=all(a == 255 for a in rgba[3::4]), sum_a=sum(rgba[3::4]))
    print(name, len(webp), pins[name]['rgba_md5'], 'alpha255:', pins[name]['alpha255'])

with open(f'{RES}/lossy_pins.json', 'w') as f:
    json.dump(pins, f, indent=1, sort_keys=True)
print('total pins:', len(pins))
