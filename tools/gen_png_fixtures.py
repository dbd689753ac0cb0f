#!/usr/bin/env python3
"""Hand-construct PNG fixtures across color types (gray 1/2/4/8,
palette 1/2/4/8, RGB, gray+alpha, RGBA) and Adam7 interlace, with
python zlib for the IDAT stream. The spec decodes each with the JDK's
ImageIO (an independent reader covering all these forms) as the
reference and pins our decoder against it — so these constructions are
validated by a real decoder, not by our own code."""
import zlib, struct, os

RES = '/root/repo/src/test/resources/png'
os.makedirs(RES, exist_ok=True)

def chunk(typ, data):
    return (struct.pack('>I', len(data)) + typ + data +
            struct.pack('>I', zlib.crc32(typ + data) & 0xffffffff))

def build_png(w, h, color, depth, pixfn, interlace=0, palette=None,
              filters=None):
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color]
    bits = channels * depth  # depth 16: pixfn yields 16-bit samples
    def scan(pw, ph, coords):
        # coords: list of (x, y) image positions per pass row-major
        out = bytearray()
        rowlen = (pw * bits + 7) // 8
        prev = bytearray(rowlen)
        idx = 0
        for r in range(ph):
            rowpix = coords[idx:idx + pw]
            idx += pw
            rawrow = bytearray(rowlen)
            bitpos = 0
            for (x, y) in rowpix:
                for samp in pixfn(x, y):
                    if depth == 16:
                        rawrow[bitpos // 8] = (samp >> 8) & 0xff
                        rawrow[bitpos // 8 + 1] = samp & 0xff
                        bitpos += 16
                    elif depth == 8:
                        rawrow[bitpos // 8] = samp & 0xff
                        bitpos += 8
                    else:
                        shift = 8 - depth * ((bitpos // depth) % (8 // depth) + 1)
                        rawrow[bitpos // 8] |= (samp & ((1 << depth) - 1)) << shift
                        bitpos += depth
            ft = (filters or [0])[r % len(filters or [0])]
            bpp = max(1, bits // 8)
            f = bytearray(rowlen)
            for i in range(rowlen):
                rawv = rawrow[i]
                left = rawrow[i - bpp] if i >= bpp else 0
                up = prev[i]
                if ft == 0: f[i] = rawv
                elif ft == 1: f[i] = (rawv - left) & 0xff
                elif ft == 2: f[i] = (rawv - up) & 0xff
                elif ft == 3: f[i] = (rawv - ((left + up) >> 1)) & 0xff
                else:
                    ul = prev[i - bpp] if i >= bpp else 0
                    p = left + up - ul
                    pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                    pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
                    f[i] = (rawv - pred) & 0xff
            out.append(ft)
            out += f
            prev = rawrow
        return bytes(out)
    raw = b''
    if interlace == 0:
        coords = [(x, y) for y in range(h) for x in range(w)]
        raw = scan(w, h, coords)
    else:
        XS = [0,4,0,2,0,1,0]; YS = [0,0,4,0,2,0,1]
        XP = [8,8,4,4,2,2,1]; YP = [8,8,8,4,4,2,2]
        for i in range(7):
            pw = (w - XS[i] + XP[i] - 1)//XP[i] if w > XS[i] else 0
            ph = (h - YS[i] + YP[i] - 1)//YP[i] if h > YS[i] else 0
            if pw and ph:
                coords = [(XS[i] + xx*XP[i], YS[i] + yy*YP[i])
                          for yy in range(ph) for xx in range(pw)]
                raw += scan(pw, ph, coords)
    ihdr = struct.pack('>IIBBBBB', w, h, depth, color, 0, 0, interlace)
    body = chunk(b'IHDR', ihdr)
    if palette is not None:
        body += chunk(b'PLTE', b''.join(bytes(c) for c in palette))
    body += chunk(b'IDAT', zlib.compress(raw, 6))
    body += chunk(b'IEND', b'')
    return b'\x89PNG\r\n\x1a\n' + body

PAL16 = [((i*17) & 0xff, (255 - i*13) & 0xff, (i*29) & 0xff) for i in range(16)]
PAL4 = PAL16[:4]
PAL2 = [(10, 200, 30), (240, 16, 99)]
PAL256 = [((i*7) & 0xff, (i*11) & 0xff, (i*13) & 0xff) for i in range(256)]

VECTORS = [
    ('rgba8', 21, 13, 6, 8, lambda x, y: (x*9 % 256, y*23 % 256, (x+y)*5 % 256, (x*y) % 256), 0, None, [0,1,2,3,4]),
    ('gray8', 33, 21, 0, 8, lambda x, y: ((x*y+7) % 256,), 0, None, [4,3,2,1,0]),
    ('gray4', 17, 9, 0, 4, lambda x, y: ((x+y) % 16,), 0, None, [0,1]),
    ('gray2', 11, 7, 0, 2, lambda x, y: ((x+y) % 4,), 0, None, [0,2]),
    ('gray1', 23, 5, 0, 1, lambda x, y: ((x ^ y) & 1,), 0, None, [0]),
    ('graya8', 19, 11, 4, 8, lambda x, y: (x*13 % 256, y*31 % 256), 0, None, [1,2,3,4]),
    ('pal8', 25, 17, 3, 8, lambda x, y: ((x*y) % 256,), 0, PAL256, [0,1,4]),
    ('pal4', 15, 10, 3, 4, lambda x, y: ((x+2*y) % 16,), 0, PAL16, [0,3]),
    ('pal2', 9, 6, 3, 2, lambda x, y: ((x+y) % 4,), 0, PAL4, [0]),
    ('pal1', 12, 8, 3, 1, lambda x, y: ((x ^ y) & 1,), 0, PAL2, [0,1]),
    ('rgb8_adam7', 29, 18, 2, 8, lambda x, y: (x*3 % 256, y*7 % 256, (x*y) % 256), 1, None, [0,1,2,3,4]),
    ('rgba8_adam7', 13, 9, 6, 8, lambda x, y: (x*9 % 256, y*23 % 256, (x+y)*5 % 256, 255), 1, None, [2,4]),
    ('gray8_adam7', 10, 10, 0, 8, lambda x, y: ((x*29+y*3) % 256,), 1, None, [3]),
    ('pal8_adam7', 7, 5, 3, 8, lambda x, y: ((3*x+y) % 256,), 1, PAL256, [1]),
    ('tiny_adam7', 3, 2, 2, 8, lambda x, y: (x*80 % 256, y*90 % 256, 7), 1, None, [0]),
    ('rgb16', 14, 9, 2, 16, lambda x, y: (x*4799 % 65536, y*9973 % 65536, (x*y*311) % 65536), 0, None, [0,1,2,3,4]),
    ('gray16', 12, 8, 0, 16, lambda x, y: ((x*9241+y*337) % 65536,), 0, None, [2,4]),
    ('rgba16_adam7', 11, 7, 6, 16, lambda x, y: (x*4799 % 65536, y*9973 % 65536, (x+y)*55 % 65536, 65535), 1, None, [3,1]),
]

for name, w, h, color, depth, fn, il, pal, filts in VECTORS:
    png = build_png(w, h, color, depth, fn, il, pal, filts)
    with open(f'{RES}/{name}.hex', 'w') as f:
        f.write(png.hex())
    print(name, w, h, 'color', color, 'depth', depth, 'interlace', il, len(png), 'bytes')
print('done')
