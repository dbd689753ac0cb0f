#!/usr/bin/env python3
"""Generate lossy-WebP (VP8) fixtures with the system libwebp (the same
library the VP8L pins came from): deterministic RGB images encoded via
WebPEncodeRGB across qualities, with reference outputs at four stages --
 (1) YUV planes with bypass_filtering=1  (parse/tokens/IDCT/prediction)
 (2) YUV planes filtered                 (+ loop filter)
 (3) RGBA with no_fancy_upsampling=1     (+ YUV->RGB fixed point)
 (4) RGBA default                        (+ fancy upsampling)
Stage 4 md5s get committed as spec pins (src/test/resources/webp/);
stages 1-3 go to /tmp/vp8_ref/ for the development diff loop.
"""
import ctypes, ctypes.util, hashlib, json, os

lib = ctypes.CDLL('libwebp.so.7')

lib.WebPEncodeRGB.restype = ctypes.c_size_t
lib.WebPEncodeRGB.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
    ctypes.c_int, ctypes.c_float, ctypes.POINTER(ctypes.c_void_p)]
lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
lib.WebPDecodeRGBA.argtypes = [ctypes.c_char_p, ctypes.c_size_t,
    ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
lib.WebPFree.argtypes = [ctypes.c_void_p]

# ---- advanced decoder API (decode.h, ABI-probed) ----
class Features(ctypes.Structure):
    _fields_ = [('width', ctypes.c_int), ('height', ctypes.c_int),
                ('has_alpha', ctypes.c_int), ('has_animation', ctypes.c_int),
                ('format', ctypes.c_int), ('pad', ctypes.c_uint32 * 5)]
class Options(ctypes.Structure):
    _fields_ = [('bypass_filtering', ctypes.c_int),
                ('no_fancy_upsampling', ctypes.c_int),
                ('use_cropping', ctypes.c_int),
                ('crop_left', ctypes.c_int), ('crop_top', ctypes.c_int),
                ('crop_width', ctypes.c_int), ('crop_height', ctypes.c_int),
                ('use_scaling', ctypes.c_int),
                ('scaled_width', ctypes.c_int), ('scaled_height', ctypes.c_int),
                ('use_threads', ctypes.c_int),
                ('dithering_strength', ctypes.c_int),
                ('flip', ctypes.c_int),
                ('alpha_dithering_strength', ctypes.c_int),
                ('pad', ctypes.c_uint32 * 5)]
class RGBABuffer(ctypes.Structure):
    _fields_ = [('rgba', ctypes.POINTER(ctypes.c_uint8)),
                ('stride', ctypes.c_int), ('size', ctypes.c_size_t)]
class YUVABuffer(ctypes.Structure):
    _fields_ = [('y', ctypes.POINTER(ctypes.c_uint8)),
                ('u', ctypes.POINTER(ctypes.c_uint8)),
                ('v', ctypes.POINTER(ctypes.c_uint8)),
                ('a', ctypes.POINTER(ctypes.c_uint8)),
                ('y_stride', ctypes.c_int), ('u_stride', ctypes.c_int),
                ('v_stride', ctypes.c_int), ('a_stride', ctypes.c_int),
                ('y_size', ctypes.c_size_t), ('u_size', ctypes.c_size_t),
                ('v_size', ctypes.c_size_t), ('a_size', ctypes.c_size_t)]
class BufUnion(ctypes.Union):
    _fields_ = [('RGBA', RGBABuffer), ('YUVA', YUVABuffer)]
class DecBuffer(ctypes.Structure):
    _fields_ = [('colorspace', ctypes.c_int), ('width', ctypes.c_int),
                ('height', ctypes.c_int), ('is_external_memory', ctypes.c_int),
                ('u', BufUnion), ('pad', ctypes.c_uint32 * 4),
                ('private_memory', ctypes.POINTER(ctypes.c_uint8))]
class DecoderConfig(ctypes.Structure):
    # decode.h order: input, OUTPUT, options (output is second!)
    _fields_ = [('input', Features), ('output', DecBuffer),
                ('options', Options)]

lib.WebPInitDecoderConfigInternal.restype = ctypes.c_int
lib.WebPDecode.restype = ctypes.c_int
lib.WebPFreeDecBuffer.argtypes = [ctypes.c_void_p]

ABI = None
for v in range(0x0200, 0x0212):
    cfg = DecoderConfig()
    if lib.WebPInitDecoderConfigInternal(ctypes.byref(cfg), v):
        ABI = v
        break
assert ABI is not None, 'no decoder ABI version accepted'
print('decoder ABI', hex(ABI))

MODE_RGBA = 1   # WEBP_CSP_MODE: MODE_RGB=0, MODE_RGBA=1, ..., MODE_YUV=11?
MODE_YUV = 11   # probed below

def decode(webp, mode, bypass=0, nofancy=0):
    cfg = DecoderConfig()
    assert lib.WebPInitDecoderConfigInternal(ctypes.byref(cfg), ABI)
    cfg.options.bypass_filtering = bypass
    cfg.options.no_fancy_upsampling = nofancy
    cfg.output.colorspace = mode
    rc = lib.WebPDecode(webp, len(webp), ctypes.byref(cfg))
    assert rc == 0, f'WebPDecode rc={rc} mode={mode}'
    w, h = cfg.output.width, cfg.output.height
    if mode == MODE_RGBA:
        buf = cfg.output.u.RGBA
        out = bytes(ctypes.cast(buf.rgba,
              ctypes.POINTER(ctypes.c_uint8 * buf.size)).contents)
        res = (w, h, buf.stride, out)
    else:
        yb = cfg.output.u.YUVA
        def plane(ptr, stride, ww, hh):
            raw = bytes(ctypes.cast(ptr,
                  ctypes.POINTER(ctypes.c_uint8 * (stride * hh))).contents)
            return b''.join(raw[r*stride:r*stride+ww] for r in range(hh))
        cw, ch = (w + 1) // 2, (h + 1) // 2
        res = (w, h, plane(yb.y, yb.y_stride, w, h),
               plane(yb.u, yb.u_stride, cw, ch),
               plane(yb.v, yb.v_stride, cw, ch))
    lib.WebPFreeDecBuffer(ctypes.byref(cfg.output))
    return res

def encode(rgb, w, h, q):
    out = ctypes.c_void_p()
    n = lib.WebPEncodeRGB(rgb, w, h, w * 3, float(q), ctypes.byref(out))
    assert n > 0
    data = bytes(ctypes.cast(out.value,
          ctypes.POINTER(ctypes.c_uint8 * n)).contents)
    lib.WebPFree(out)
    return data

# probe MODE_YUV: try values until YUVA planes look sane on a test image
def probe_mode_yuv(webp, w, h):
    global MODE_YUV
    for m in (11, 12, 10, 9):
        try:
            r = decode(webp, m)
            if len(r) == 5 and len(r[2]) == w * h:
                MODE_YUV = m
                return
        except AssertionError:
            pass
    raise RuntimeError('MODE_YUV not found')

# ---- deterministic images ----
def img_flat(w, h):
    return bytes([70, 140, 210]) * (w * h)
def img_gradient(w, h):
    px = bytearray()
    for y in range(h):
        for x in range(w):
            px += bytes([(x * 255) // max(1, w - 1),
                         (y * 255) // max(1, h - 1),
                         ((x + y) * 255) // max(1, w + h - 2)])
    return bytes(px)
def img_stripes(w, h):
    pal = [(200, 30, 30), (30, 200, 30), (30, 30, 200), (220, 220, 40)]
    px = bytearray()
    for y in range(h):
        for x in range(w):
            px += bytes(pal[(x // 4) % 4])
    return bytes(px)
def img_noise(w, h):
    s = 123456789
    px = bytearray()
    for _ in range(w * h * 3):
        s = (1103515245 * s + 12345) & 0x7fffffff
        px.append((s >> 16) & 0xff)
    return bytes(px)
def img_photo(w, h):
    import math
    px = bytearray()
    for y in range(h):
        for x in range(w):
            r = int(127 + 120 * math.sin(x * 0.11) * math.cos(y * 0.07))
            g = int(127 + 120 * math.sin((x + y) * 0.05))
            b = int(127 + 120 * math.cos(x * 0.03 + y * 0.09))
            px += bytes([max(0, min(255, r)), max(0, min(255, g)),
                         max(0, min(255, b))])
    return bytes(px)

VECTORS = [
    ('lossy_flat', img_flat, 32, 24, [75]),
    ('lossy_tiny', img_gradient, 5, 3, [75]),
    ('lossy_grad', img_gradient, 64, 48, [10, 50, 90]),
    ('lossy_stripes', img_stripes, 48, 32, [50]),
    ('lossy_noise', img_noise, 40, 40, [50]),
    ('lossy_photo', img_photo, 176, 144, [10, 75]),
    ('lossy_odd', img_photo, 17, 13, [75]),
]

RES = '/root/repo/src/test/resources/webp'
REF = '/tmp/vp8_ref'
os.makedirs(REF, exist_ok=True)
pins = {}
probed = False
for name, fn, w, h, qs in VECTORS:
    rgb = fn(w, h)
    for q in qs:
        vec = f'{name}_q{q}'
        webp = encode(rgb, w, h, q)
        if not probed:
            probe_mode_yuv(webp, w, h); probed = True
            print('MODE_YUV =', MODE_YUV)
        with open(f'{RES}/{vec}.hex', 'w') as f:
            f.write(webp.hex())
        ww, hh, stride, rgba = decode(webp, MODE_RGBA)
        assert (ww, hh) == (w, h) and stride == w * 4
        pins[vec] = dict(w=w, h=h, rgba_md5=hashlib.md5(rgba).hexdigest(),
            sum_r=sum(rgba[0::4]), sum_g=sum(rgba[1::4]),
            sum_b=sum(rgba[2::4]), alpha255=all(a == 255 for a in rgba[3::4]))
        # development references
        for tag, kw in (('nofilter', dict(bypass=1)), ('filtered', {})):
            _, _, y, u, v = decode(webp, MODE_YUV, **kw)
            open(f'{REF}/{vec}_{tag}_y.bin', 'wb').write(y)
            open(f'{REF}/{vec}_{tag}_u.bin', 'wb').write(u)
            open(f'{REF}/{vec}_{tag}_v.bin', 'wb').write(v)
        _, _, _, rgba_simple = decode(webp, MODE_RGBA, nofancy=1)
        open(f'{REF}/{vec}_rgba_simple.bin', 'wb').write(rgba_simple)
        open(f'{REF}/{vec}_rgba_fancy.bin', 'wb').write(rgba)
        print(vec, len(webp), 'bytes', pins[vec]['rgba_md5'])

with open(f'{RES}/lossy_pins.json', 'w') as f:
    json.dump(pins, f, indent=1, sort_keys=True)
print('wrote', len(pins), 'pins')
