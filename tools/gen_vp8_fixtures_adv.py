#!/usr/bin/env python3
"""Feature-forcing lossy-WebP vectors via libwebp's advanced encoder API:
token partitions > 1, simple loop filter, zero filter, high sharpness,
autofilter, single-segment, method extremes. Appends to lossy_pins.json
and dumps the same staged references as gen_vp8_fixtures.py."""
import ctypes, hashlib, json, os, math

lib = ctypes.CDLL('libwebp.so.7')

class WebPConfig(ctypes.Structure):
    _fields_ = [('lossless', ctypes.c_int), ('quality', ctypes.c_float),
        ('method', ctypes.c_int), ('image_hint', ctypes.c_int),
        ('target_size', ctypes.c_int), ('target_PSNR', ctypes.c_float),
        ('segments', ctypes.c_int), ('sns_strength', ctypes.c_int),
        ('filter_strength', ctypes.c_int), ('filter_sharpness', ctypes.c_int),
        ('filter_type', ctypes.c_int), ('autofilter', ctypes.c_int),
        ('alpha_compression', ctypes.c_int), ('alpha_filtering', ctypes.c_int),
        ('alpha_quality', ctypes.c_int), ('pass_', ctypes.c_int),
        ('show_compressed', ctypes.c_int), ('preprocessing', ctypes.c_int),
        ('partitions', ctypes.c_int), ('partition_limit', ctypes.c_int),
        ('emulate_jpeg_size', ctypes.c_int), ('thread_level', ctypes.c_int),
        ('low_memory', ctypes.c_int), ('near_lossless', ctypes.c_int),
        ('exact', ctypes.c_int), ('use_delta_palette', ctypes.c_int),
        ('use_sharp_yuv', ctypes.c_int), ('qmin', ctypes.c_int),
        ('qmax', ctypes.c_int)]

class WebPMemoryWriter(ctypes.Structure):
    _fields_ = [('mem', ctypes.POINTER(ctypes.c_uint8)),
                ('size', ctypes.c_size_t), ('max_size', ctypes.c_size_t),
                ('pad', ctypes.c_uint32 * 1)]

WriterFunc = ctypes.CFUNCTYPE(ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
                              ctypes.c_size_t, ctypes.c_void_p)

class WebPPicture(ctypes.Structure):
    _fields_ = [('use_argb', ctypes.c_int), ('colorspace', ctypes.c_int),
        ('width', ctypes.c_int), ('height', ctypes.c_int),
        ('y', ctypes.POINTER(ctypes.c_uint8)), ('u', ctypes.POINTER(ctypes.c_uint8)),
        ('v', ctypes.POINTER(ctypes.c_uint8)),
        ('y_stride', ctypes.c_int), ('uv_stride', ctypes.c_int),
        ('a', ctypes.POINTER(ctypes.c_uint8)), ('a_stride', ctypes.c_int),
        ('pad1', ctypes.c_uint32 * 2),
        ('argb', ctypes.POINTER(ctypes.c_uint32)), ('argb_stride', ctypes.c_int),
        ('pad2', ctypes.c_uint32 * 3),
        ('writer', WriterFunc), ('custom_ptr', ctypes.c_void_p),
        ('extra_info_type', ctypes.c_int),
        ('extra_info', ctypes.POINTER(ctypes.c_uint8)),
        ('stats', ctypes.c_void_p), ('error_code', ctypes.c_int),
        ('progress_hook', ctypes.c_void_p), ('user_data', ctypes.c_void_p),
        ('pad3', ctypes.c_uint32 * 3),
        ('pad4', ctypes.POINTER(ctypes.c_uint8)), ('pad5', ctypes.POINTER(ctypes.c_uint8)),
        ('pad6', ctypes.c_uint32 * 8),
        ('memory_', ctypes.c_void_p), ('memory_argb_', ctypes.c_void_p),
        ('pad7', ctypes.c_void_p * 2)]

lib.WebPConfigInitInternal.restype = ctypes.c_int
lib.WebPPictureInitInternal.restype = ctypes.c_int
lib.WebPPictureImportRGB.restype = ctypes.c_int
lib.WebPEncode.restype = ctypes.c_int
lib.WebPMemoryWrite.restype = ctypes.c_int

ENC_ABI = None
for v in range(0x0200, 0x0212):
    cfg = WebPConfig()
    if lib.WebPConfigInitInternal(ctypes.byref(cfg), 0, ctypes.c_float(75.0), v):
        ENC_ABI = v
        break
assert ENC_ABI, 'no encoder ABI accepted'
print('encoder ABI', hex(ENC_ABI))

def encode_adv(rgb, w, h, **kw):
    cfg = WebPConfig()
    assert lib.WebPConfigInitInternal(ctypes.byref(cfg), 0, ctypes.c_float(75.0), ENC_ABI)
    for k, v in kw.items():
        setattr(cfg, k, type(getattr(cfg, k))(v) if k == 'quality' else v)
    pic = WebPPicture()
    assert lib.WebPPictureInitInternal(ctypes.byref(pic), ENC_ABI)
    pic.width = w
    pic.height = h
    assert lib.WebPPictureImportRGB(ctypes.byref(pic), rgb, w * 3)
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

# reuse decode helpers from the simple generator
import importlib.util
spec = importlib.util.spec_from_file_location('g', os.path.join(
    os.path.dirname(os.path.abspath(__file__)), 'gen_vp8_fixtures.py'))
# (can't import: it runs main) -- inline the decode bits
exec(open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
     'gen_vp8_fixtures.py')).read().split('# probe MODE_YUV')[0])

def img_photo(w, h):
    px = bytearray()
    for y in range(h):
        for x in range(w):
            r = int(127 + 120 * math.sin(x * 0.11) * math.cos(y * 0.07))
            g = int(127 + 120 * math.sin((x + y) * 0.05))
            b = int(127 + 120 * math.cos(x * 0.03 + y * 0.09))
            px += bytes([max(0, min(255, r)), max(0, min(255, g)),
                         max(0, min(255, b))])
    return bytes(px)

W, H = 160, 128
RGB = img_photo(W, H)
VECTORS = [
    ('lossy_parts8', dict(partitions=3, quality=60.0)),
    ('lossy_simplefilter', dict(filter_type=0, filter_strength=50, quality=60.0)),
    ('lossy_nofilterenc', dict(filter_strength=0, autofilter=0, quality=60.0)),
    ('lossy_sharp7', dict(filter_sharpness=7, filter_strength=60, quality=60.0)),
    ('lossy_autofilter', dict(autofilter=1, quality=40.0)),
    ('lossy_seg1', dict(segments=1, quality=60.0)),
    ('lossy_method0', dict(method=0, quality=60.0)),
    ('lossy_method6', dict(method=6, quality=95.0)),
    ('lossy_q1', dict(quality=1.0)),
    ('lossy_q100', dict(quality=100.0)),
]

RES = '/root/repo/src/test/resources/webp'
REF = '/tmp/vp8_ref'
pins = json.load(open(f'{RES}/lossy_pins.json'))
probe_done = False
for name, kw in VECTORS:
    webp = encode_adv(RGB, W, H, **kw)
    MODE_YUV = 11  # probed by gen_vp8_fixtures.py on this libwebp
    with open(f'{RES}/{name}.hex', 'w') as f:
        f.write(webp.hex())
    ww, hh, stride, rgba = decode(webp, MODE_RGBA)
    assert (ww, hh) == (W, H)
    pins[name] = dict(w=W, h=H, rgba_md5=hashlib.md5(rgba).hexdigest(),
        sum_r=sum(rgba[0::4]), sum_g=sum(rgba[1::4]), sum_b=sum(rgba[2::4]),
        alpha255=all(a == 255 for a in rgba[3::4]))
    for tag, kw2 in (('nofilter', dict(bypass=1)), ('filtered', {})):
        _, _, y, u, v = decode(webp, MODE_YUV, **kw2)
        open(f'{REF}/{name}_{tag}_y.bin', 'wb').write(y)
        open(f'{REF}/{name}_{tag}_u.bin', 'wb').write(u)
        open(f'{REF}/{name}_{tag}_v.bin', 'wb').write(v)
    open(f'{REF}/{name}_rgba_fancy.bin', 'wb').write(rgba)
    # record stream facts for the spec doc: partition count + filter type
    tag3 = webp[20] if webp[12:16] == b'VP8 ' else None
    print(name, len(webp), 'bytes', pins[name]['rgba_md5'])

with open(f'{RES}/lossy_pins.json', 'w') as f:
    json.dump(pins, f, indent=1, sort_keys=True)
print('total pins:', len(pins))
