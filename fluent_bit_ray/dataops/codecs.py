"""Pure-stdlib/numpy image/audio codecs: PNG (zlib), WAV (RIFF PCM)
and baseline JPEG (ITU-T T.81).

The container has no PIL/ffmpeg/soundfile, but PNG is just zlib-
compressed filtered scanlines, WAV is a RIFF header over raw PCM, and
baseline JPEG is Huffman-coded quantized DCT blocks — all decodable
with stdlib + numpy. These codecs make the multimodal decode stages
REAL for png/jpeg/wav/flac payloads and mp4 CONTAINER demux (sample
table + access-unit slicing; the h264 payload stays opaque — video
codec decode needs ffmpeg),
with deterministic encoders so tests and synthetic tables can
round-trip.

PNG subset (the universal baseline): 8-bit greyscale (color type 0)
and RGB/RGBA (2/6), non-interlaced, all five scanline filters
(0 none, 1 sub, 2 up, 3 average, 4 paeth — the spec's complete
filter set, so images from any standard encoder decode). Encoder
emits filter 0 scanlines in one IDAT.

WAV subset: PCM (format 1), 8/16-bit, any channel count; chunks other
than fmt/data are skipped per the RIFF spec.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 6: 4}  # color type -> samples per pixel


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))


def encode_png(arr: np.ndarray) -> bytes:
    """uint8 array (h, w) | (h, w, 3) | (h, w, 4) → PNG bytes."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        color, ch = 0, 1
        a = a[:, :, None]
    elif a.ndim == 3 and a.shape[2] == 3:
        color, ch = 2, 3
    elif a.ndim == 3 and a.shape[2] == 4:
        color, ch = 6, 4
    else:
        raise ValueError(f"unsupported array shape {arr.shape}")
    h, w = a.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    rows = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8),          # filter byte 0
         a.reshape(h, w * ch)], axis=1)
    idat = zlib.compress(rows.tobytes(), 6)
    return (_PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat)
            + _chunk(b"IEND", b""))


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    ai, bi, ci = (x.astype(np.int16) for x in (a, b, c))
    p = ai + bi - ci
    pa_, pb, pc = np.abs(p - ai), np.abs(p - bi), np.abs(p - ci)
    out = np.where((pa_ <= pb) & (pa_ <= pc), a,
                   np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → uint8 array (h, w) or (h, w, ch). Subset: 8-bit
    color types 0/2/6, non-interlaced; all 5 filters un-applied."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, w = 8, None
    idat = bytearray()
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            w, h, depth, color, comp, filt, inter = \
                struct.unpack(">IIBBBBB", body)
            if depth != 8 or color not in _CHANNELS or inter != 0:
                raise NotImplementedError(
                    f"PNG subset: 8-bit color type 0/2/6 non-interlaced "
                    f"(got depth={depth} color={color} interlace={inter})")
            ch = _CHANNELS[color]
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG data length mismatch")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    filters = rows[:, 0]
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        cur = rows[y, 1:].copy()
        f = filters[y]
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.uint8)
        if f == 0:
            out[y] = cur
        elif f == 2:                      # up
            out[y] = cur + prev
        elif f in (1, 3, 4):              # sub/average/paeth need left
            row = out[y]
            left = np.zeros(ch, dtype=np.uint8)
            for x in range(0, stride, ch):
                seg = cur[x:x + ch]
                if f == 1:
                    val = seg + left
                elif f == 3:
                    val = seg + ((left.astype(np.int16)
                                  + prev[x:x + ch]) // 2).astype(np.uint8)
                else:
                    ul = (out[y - 1, x - ch:x] if (y and x) else
                          np.zeros(ch, dtype=np.uint8))
                    val = seg + _paeth(left, prev[x:x + ch], ul)
                row[x:x + ch] = val
                left = val
        else:
            raise ValueError(f"bad PNG filter {f}")
    img = out.reshape(h, w, ch)
    return img[:, :, 0] if ch == 1 else img


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize (the deterministic, lib-free kernel)."""
    h, w = img.shape[:2]
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return img[ys][:, xs]


# --------------------------------------------------------------- WAV
def encode_wav(pcm: np.ndarray, sample_rate: int = 16000) -> bytes:
    """int16 (n,) or (n, channels) PCM → WAV bytes."""
    a = np.asarray(pcm, dtype="<i2")
    nch = 1 if a.ndim == 1 else a.shape[1]
    payload = a.tobytes()
    byte_rate = sample_rate * nch * 2
    fmt = struct.pack("<HHIIHH", 1, nch, sample_rate, byte_rate, nch * 2, 16)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(payload)) + payload)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (int16 array (n,) or (n, ch), sample_rate).
    PCM 8/16-bit only; unknown chunks are skipped (RIFF rule)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos = 12
    nch = rate = bits = None
    pcm = None
    while pos + 8 <= len(data):
        tag = data[pos:pos + 4]
        (ln,) = struct.unpack("<I", data[pos + 4:pos + 8])
        body = data[pos + 8:pos + 8 + ln]
        pos += 8 + ln + (ln & 1)          # chunks are word-aligned
        if tag == b"fmt ":
            audio_fmt, nch, rate, _, _, bits = \
                struct.unpack("<HHIIHH", body[:16])
            if audio_fmt != 1:
                raise NotImplementedError(f"WAV subset: PCM only "
                                          f"(format {audio_fmt})")
        elif tag == b"data":
            pcm = body
    if nch is None or pcm is None:
        raise ValueError("WAV missing fmt/data chunk")
    if bits == 16:
        a = np.frombuffer(pcm, dtype="<i2")
    elif bits == 8:                        # 8-bit WAV is unsigned
        a = (np.frombuffer(pcm, dtype=np.uint8).astype(np.int16)
             - 128) * 256
    else:
        raise NotImplementedError(f"WAV subset: 8/16-bit (got {bits})")
    if nch > 1:
        a = a[: (len(a) // nch) * nch].reshape(-1, nch)
    return a, rate


# -------------------------------------------------------------- JPEG
# Baseline sequential JPEG (ITU-T T.81 / ISO 10918-1), pure
# numpy+stdlib. Decoder subset: SOF0 (baseline DCT, 8-bit), 1 or 3
# components, sampling factors 1–2 (4:4:4 / 4:2:2 / 4:2:0), restart
# intervals, Huffman tables read from the file. Progressive (SOF2),
# arithmetic coding and 12-bit raise NotImplementedError — honest
# subset boundaries, like the PNG/WAV codecs above. The encoder emits
# 4:4:4 with the Annex K tables so tests have real compressed vectors.

_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K.1 / K.2 quantization tables (row-major)
_QT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64)
_QT_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99] + [99] * 32, dtype=np.int64)

# Annex K.3 Huffman table specs: (BITS[1..16], HUFFVAL)
_DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
           list(range(12)))
_DC_CHROM = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
             list(range(12)))
_AC_LUM = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_AC_CHROM = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])


def _dct_matrix() -> np.ndarray:
    """C[u, x] = c(u)/2 · cos((2x+1)uπ/16); DCT = C f Cᵀ, IDCT = Cᵀ F C."""
    u = np.arange(8)[:, None]
    x = np.arange(8)[None, :]
    c = np.where(u == 0, 1.0 / np.sqrt(2.0), 1.0) / 2.0
    return c * np.cos((2 * x + 1) * u * np.pi / 16.0)


_DCTM = _dct_matrix()


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical codes: symbol → (code, length)."""
    out, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_decode_map(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) → symbol, for the bit-at-a-time reader."""
    out, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[(ln, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


def _to_blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) with H,W multiples of 8 → (n_blocks, 8, 8) row-major."""
    h, w = plane.shape
    return (plane.reshape(h // 8, 8, w // 8, 8)
            .transpose(0, 2, 1, 3).reshape(-1, 8, 8))


def _from_blocks(blocks: np.ndarray, h: int, w: int) -> np.ndarray:
    return (blocks.reshape(h // 8, w // 8, 8, 8)
            .transpose(0, 2, 1, 3).reshape(h, w))


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.nbits -= 8
            self.buf.append(b)
            if b == 0xFF:                 # byte stuffing
                self.buf.append(0x00)

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits
        return bytes(self.buf)


def _mag_bits(v: int) -> tuple[int, int]:
    """Signed coefficient → (category t, t magnitude bits)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    t = a.bit_length()
    return t, (v if v > 0 else v + (1 << t) - 1)


def _encode_block(zz: np.ndarray, dc_prev: int, dc_tab, ac_tab,
                  bw: _BitWriter) -> int:
    dc = int(zz[0])
    t, bits = _mag_bits(dc - dc_prev)
    code, ln = dc_tab[t]
    bw.write(code, ln)
    if t:
        bw.write(bits, t)
    nz = np.flatnonzero(zz[1:])
    run_from = 0
    for pos in nz:
        run = int(pos) - run_from
        while run >= 16:
            code, ln = ac_tab[0xF0]       # ZRL
            bw.write(code, ln)
            run -= 16
        t, bits = _mag_bits(int(zz[1 + pos]))
        code, ln = ac_tab[(run << 4) | t]
        bw.write(code, ln)
        bw.write(bits, t)
        run_from = int(pos) + 1
    if run_from < 63:
        code, ln = ac_tab[0x00]           # EOB
        bw.write(code, ln)
    return dc


def _quant_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg quality scaling of the Annex K tables."""
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for base in (_QT_LUM, _QT_CHROM):
        t = (base * scale + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int64))
    return out[0], out[1]


def encode_jpeg(arr: np.ndarray, quality: int = 75) -> bytes:
    """uint8 (h, w) grayscale or (h, w, 3) RGB → baseline JPEG bytes
    (4:4:4, Annex K tables scaled by ``quality``)."""
    a = np.asarray(arr, dtype=np.uint8)
    gray = a.ndim == 2
    if not gray and (a.ndim != 3 or a.shape[2] != 3):
        raise ValueError(f"unsupported array shape {arr.shape}")
    h, w = a.shape[:2]
    qt_l, qt_c = _quant_tables(quality)

    if gray:
        planes = [a.astype(np.float64) - 128.0]
    else:
        r, g, b = (a[:, :, i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y - 128.0, cb - 128.0, cr - 128.0]

    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    qts = [qt_l] + [qt_c] * (len(planes) - 1)
    coeffs = []
    for p, qt in zip(planes, qts):
        p = np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
        blocks = _to_blocks(p)
        f = np.einsum("ux,nxy,vy->nuv", _DCTM, blocks, _DCTM)
        zz = np.round(f.reshape(-1, 64)[:, _ZIGZAG]
                      / qt[_ZIGZAG]).astype(np.int64)
        coeffs.append(zz)

    dc_l = _huff_codes(*_DC_LUM)
    ac_l = _huff_codes(*_AC_LUM)
    dc_c = _huff_codes(*_DC_CHROM)
    ac_c = _huff_codes(*_AC_CHROM)
    bw = _BitWriter()
    nblk = coeffs[0].shape[0]
    dc_prev = [0] * len(planes)
    for bi in range(nblk):                # 4:4:4 → MCU = one block each
        for ci in range(len(planes)):
            dc_prev[ci] = _encode_block(
                coeffs[ci][bi], dc_prev[ci],
                dc_l if ci == 0 else dc_c,
                ac_l if ci == 0 else ac_c, bw)
    scan = bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xFF\xD8")          # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0]) + bytes(qt_l[_ZIGZAG].astype(np.uint8)))
    if not gray:
        out += seg(0xDB, bytes([1]) + bytes(qt_c[_ZIGZAG].astype(np.uint8)))
    ncomp = 1 if gray else 3
    sof = bytearray(struct.pack(">BHHB", 8, h, w, ncomp))
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out += seg(0xC0, bytes(sof))

    def dht(cls: int, tid: int, spec) -> bytes:
        bits, vals = spec
        return seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits)
                   + bytes(vals))

    out += dht(0, 0, _DC_LUM) + dht(1, 0, _AC_LUM)
    if not gray:
        out += dht(0, 1, _DC_CHROM) + dht(1, 1, _AC_CHROM)
    sos = bytearray([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += b"\x00\x3F\x00"
    out += seg(0xDA, bytes(sos))
    out += scan
    out += b"\xFF\xD9"                    # EOI
    return bytes(out)


class _BitReader:
    """MSB-first reader over one entropy-coded segment (already
    de-stuffed: no 0xFF00 / restart markers inside)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0                      # bit position

    def bit(self) -> int:
        byte = self.data[self.pos >> 3]
        b = (byte >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return b

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def _extend(v: int, t: int) -> int:
    """T.81 F.12 EXTEND: magnitude bits → signed value."""
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _read_symbol(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, ln = 0, 0
    while ln < 16:
        code = (code << 1) | br.bit()
        ln += 1
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JPEG bytes → uint8 (h, w) or (h, w, 3).

    Subset: SOF0 8-bit, 1 or 3 components, sampling factors 1–2,
    restart intervals honored; SOF2 progressive / arithmetic coding
    raise NotImplementedError.
    """
    if data[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG (no SOI)")
    pos = 2
    qts: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}   # (class, id) → decode map
    comps: list[dict] = []
    h = w = None
    restart = 0
    scan_comps: list[tuple[int, int, int]] = []
    scan_start = None
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at {pos}")
        marker = data[pos + 1]
        if marker == 0xD9:                # EOI
            break
        (ln,) = struct.unpack(">H", data[pos + 2:pos + 4])
        body = data[pos + 4:pos + 2 + ln]
        pos += 2 + ln
        if marker == 0xDB:                # DQT (may hold several tables)
            bp = 0
            while bp < len(body):
                pq, tq = body[bp] >> 4, body[bp] & 0xF
                if pq != 0:
                    raise NotImplementedError("JPEG subset: 8-bit DQT only")
                t = np.zeros(64, dtype=np.int64)
                t[_ZIGZAG] = np.frombuffer(
                    body[bp + 1:bp + 65], dtype=np.uint8).astype(np.int64)
                qts[tq] = t
                bp += 65
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG subset: baseline SOF0 only (got SOF marker "
                f"0x{marker:02X} — progressive/extended/arithmetic)")
        elif marker == 0xC0:              # SOF0
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError("JPEG subset: 8-bit precision")
            for ci in range(nc):
                cid, hv, tq = body[6 + 3 * ci:9 + 3 * ci]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF,
                              "tq": tq})
            if any(c["h"] not in (1, 2) or c["v"] not in (1, 2)
                   for c in comps):
                raise NotImplementedError("JPEG subset: sampling 1–2")
        elif marker == 0xC4:              # DHT (may hold several)
            bp = 0
            while bp < len(body):
                cls, tid = body[bp] >> 4, body[bp] & 0xF
                bits = list(body[bp + 1:bp + 17])
                n = sum(bits)
                vals = list(body[bp + 17:bp + 17 + n])
                huff[(cls, tid)] = _huff_decode_map(bits, vals)
                bp += 17 + n
        elif marker == 0xDD:              # DRI
            (restart,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:              # SOS
            ns = body[0]
            for si in range(ns):
                cid, tda = body[1 + 2 * si:3 + 2 * si]
                scan_comps.append((cid, tda >> 4, tda & 0xF))
            scan_start = pos
            break
        # APPn / COM / others: skipped via their length
    if scan_start is None or h is None:
        raise ValueError("JPEG missing SOF/SOS")

    # split the entropy-coded data into restart segments, de-stuffed
    segs: list[bytearray] = [bytearray()]
    p = scan_start
    while p < len(data):
        b = data[p]
        if b != 0xFF:
            segs[-1].append(b)
            p += 1
            continue
        m = data[p + 1]
        if m == 0x00:
            segs[-1].append(0xFF)
            p += 2
        elif 0xD0 <= m <= 0xD7:           # RSTn
            segs.append(bytearray())
            p += 2
        else:                             # EOI or next marker
            break

    maxh = max(c["h"] for c in comps)
    maxv = max(c["v"] for c in comps)
    mcux = -(-w // (8 * maxh))
    mcuy = -(-h // (8 * maxv))
    order = []                            # scan order: comp idx per scan comp
    for cid, td, ta in scan_comps:
        ci = next(i for i, c in enumerate(comps) if c["id"] == cid)
        order.append((ci, td, ta))
    nblocks = [mcux * c["h"] * mcuy * c["v"] for c in comps]
    coeff = [np.zeros((nb, 64), dtype=np.int64) for nb in nblocks]
    bw_per = [mcux * c["h"] for c in comps]  # blocks per row, per comp

    seg_i = 0
    br = _BitReader(bytes(segs[seg_i]))
    dc_prev = [0] * len(comps)
    for mi in range(mcux * mcuy):
        if restart and mi and mi % restart == 0:
            seg_i += 1
            br = _BitReader(bytes(segs[seg_i]))
            dc_prev = [0] * len(comps)
        my, mx = divmod(mi, mcux)
        for ci, td, ta in order:
            c = comps[ci]
            dtab, atab = huff[(0, td)], huff[(1, ta)]
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    zz = coeff[ci][
                        (my * c["v"] + by) * bw_per[ci]
                        + mx * c["h"] + bx]
                    t = _read_symbol(br, dtab)
                    diff = _extend(br.bits(t), t) if t else 0
                    dc_prev[ci] += diff
                    zz[0] = dc_prev[ci]
                    k = 1
                    while k < 64:
                        rs = _read_symbol(br, atab)
                        r, s = rs >> 4, rs & 0xF
                        if s == 0:
                            if r == 15:   # ZRL
                                k += 16
                                continue
                            break         # EOB
                        k += r
                        zz[k] = _extend(br.bits(s), s)
                        k += 1

    planes = []
    for ci, c in enumerate(comps):
        qt = qts[c["tq"]]
        f = np.zeros((nblocks[ci], 64), dtype=np.float64)
        f[:, _ZIGZAG] = coeff[ci] * qt[_ZIGZAG]
        f = f.reshape(-1, 8, 8)
        sp = np.einsum("xu,nuv,yv->nxy", _DCTM.T, f, _DCTM.T) + 128.0
        ph, pw = mcuy * c["v"] * 8, mcux * c["h"] * 8
        plane = _from_blocks(sp, ph, pw)
        # chroma upsample to full resolution
        plane = np.repeat(np.repeat(plane, maxv // c["v"], axis=0),
                          maxh // c["h"], axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# --------------------------------------------------------- MP4 demux
# ISO base media file format (ISO/IEC 14496-12) container DEMUX: walk
# the box tree and rebuild the per-sample table (file offset, size,
# decode timestamp, sync flag) from the stbl child boxes
# (stsz/stsc/stco|co64/stts/stss). No codec decode happens here — a
# frame-sampling stage needs exactly this table to slice the encoded
# access units out of mdat and ship every k-th one to a downstream
# decoder; the h264/h265 payloads stay opaque bytes.

def _mp4_boxes(data: bytes, start: int, end: int):
    """Yield (type, body_start, body_end) for boxes in [start, end)."""
    pos = start
    while pos + 8 <= end:
        size = struct.unpack_from(">I", data, pos)[0]
        btype = data[pos + 4:pos + 8]
        hdr = 8
        if size == 1:                      # 64-bit largesize
            size = struct.unpack_from(">Q", data, pos + 8)[0]
            hdr = 16
        elif size == 0:                    # box extends to end
            size = end - pos
        if size < hdr or pos + size > end:
            raise ValueError(f"mp4: bad box size {size} at {pos}")
        yield btype, pos + hdr, pos + size
        pos += size


def _mp4_child(data, start, end, *path):
    """Descend container boxes by type path; None when absent."""
    for btype, b0, b1 in _mp4_boxes(data, start, end):
        if btype == path[0]:
            if len(path) == 1:
                return b0, b1
            return _mp4_child(data, b0, b1, *path[1:])
    return None


def demux_mp4(data: bytes) -> list[dict]:
    """MP4/MOV bytes → one dict per track:
    ``{"track_id", "handler", "codec", "timescale", "offsets",
    "sizes", "dts", "sync"}`` (numpy arrays, one entry per sample;
    ``dts`` in timescale units; ``sync`` True on random-access
    samples — all True when no stss box is present, per 14496-12)."""
    if len(data) < 12:
        raise ValueError("mp4: truncated")
    head = {b for b, _, _ in _mp4_boxes(data, 0, len(data))}
    if b"moov" not in head:
        raise ValueError("mp4: no moov box (not an MP4 or streaming-"
                         "fragmented layout)")
    moov = _mp4_child(data, 0, len(data), b"moov")
    tracks = []
    for btype, t0, t1 in _mp4_boxes(data, *moov):
        if btype != b"trak":
            continue
        tkhd = _mp4_child(data, t0, t1, b"tkhd")
        track_id = 0
        if tkhd:
            ver = data[tkhd[0]]
            track_id = struct.unpack_from(
                ">I", data, tkhd[0] + (20 if ver else 12))[0]
        mdia = _mp4_child(data, t0, t1, b"mdia")
        if not mdia:
            continue
        mdhd = _mp4_child(data, *mdia, b"mdhd")
        timescale = 0
        if mdhd:
            ver = data[mdhd[0]]
            timescale = struct.unpack_from(
                ">I", data, mdhd[0] + (20 if ver else 12))[0]
        hdlr = _mp4_child(data, *mdia, b"hdlr")
        handler = (data[hdlr[0] + 8:hdlr[0] + 12].decode("latin1")
                   if hdlr else "")
        stbl = _mp4_child(data, *mdia, b"minf", b"stbl")
        if not stbl:
            continue

        def full(box):  # skip FullBox version+flags
            return (box[0] + 4, box[1]) if box else None

        codec = ""
        stsd = full(_mp4_child(data, *stbl, b"stsd"))
        if stsd:
            n = struct.unpack_from(">I", data, stsd[0])[0]
            if n:
                codec = data[stsd[0] + 8:stsd[0] + 12].decode("latin1")

        stsz = full(_mp4_child(data, *stbl, b"stsz"))
        if not stsz:
            continue
        fixed, count = struct.unpack_from(">II", data, stsz[0])
        if fixed:
            sizes = np.full(count, fixed, dtype=np.int64)
        else:
            sizes = np.frombuffer(data, ">u4", count,
                                  stsz[0] + 8).astype(np.int64)

        co = full(_mp4_child(data, *stbl, b"stco"))
        if co:
            nch = struct.unpack_from(">I", data, co[0])[0]
            chunk_off = np.frombuffer(data, ">u4", nch,
                                      co[0] + 4).astype(np.int64)
        else:
            co = full(_mp4_child(data, *stbl, b"co64"))
            if not co:
                continue
            nch = struct.unpack_from(">I", data, co[0])[0]
            chunk_off = np.frombuffer(data, ">u8", nch,
                                      co[0] + 4).astype(np.int64)

        stsc = full(_mp4_child(data, *stbl, b"stsc"))
        per_chunk = np.ones(nch, dtype=np.int64)
        if stsc:
            ne = struct.unpack_from(">I", data, stsc[0])[0]
            ent = np.frombuffer(data, ">u4", ne * 3,
                                stsc[0] + 4).reshape(ne, 3)
            # runs: entry i applies to chunks first_chunk_i .. next-1
            for i in range(ne):
                first = int(ent[i, 0]) - 1
                last = int(ent[i + 1, 0]) - 1 if i + 1 < ne else nch
                per_chunk[first:last] = int(ent[i, 1])
        # per-sample offset: chunk base + cumulative sizes within chunk
        chunk_idx = np.repeat(np.arange(nch), per_chunk)[:count]
        cum = np.cumsum(sizes) - sizes   # exclusive prefix sum
        starts = np.zeros(count, dtype=np.int64)
        first_of_chunk = np.cumsum(per_chunk) - per_chunk
        valid = first_of_chunk < count
        starts[first_of_chunk[valid]] = 1
        chunk_first = np.maximum.accumulate(
            np.where(starts > 0, np.arange(count), 0))
        offsets = (chunk_off[chunk_idx]
                   + (cum - cum[chunk_first]))

        stts = full(_mp4_child(data, *stbl, b"stts"))
        dts = np.zeros(count, dtype=np.int64)
        if stts:
            ne = struct.unpack_from(">I", data, stts[0])[0]
            ent = np.frombuffer(data, ">u4", ne * 2,
                                stts[0] + 4).reshape(ne, 2)
            deltas = np.repeat(ent[:, 1].astype(np.int64),
                               ent[:, 0].astype(np.int64))[:count]
            dts[1:] = np.cumsum(deltas)[:-1]

        sync = np.ones(count, dtype=bool)
        stss = full(_mp4_child(data, *stbl, b"stss"))
        if stss:
            ne = struct.unpack_from(">I", data, stss[0])[0]
            sn = np.frombuffer(data, ">u4", ne, stss[0] + 4)
            sync[:] = False
            sync[sn.astype(np.int64) - 1] = True

        tracks.append({"track_id": track_id, "handler": handler,
                       "codec": codec, "timescale": timescale,
                       "offsets": offsets, "sizes": sizes,
                       "dts": dts, "sync": sync})
    return tracks


def mp4_sample_bytes(data: bytes, track: dict, idx: int) -> bytes:
    """Slice one encoded sample (access unit) out of the file bytes."""
    o, s = int(track["offsets"][idx]), int(track["sizes"][idx])
    if o + s > len(data):
        raise ValueError(f"mp4: sample {idx} extends past EOF")
    return data[o:o + s]


# -------------------------------------------------------------- FLAC
# Free Lossless Audio Codec (public spec, RFC 9639 / xiph format doc).
# Pure-python DECODER covering the mandatory feature set: STREAMINFO,
# frames with fixed or variable blocking, all four subframe types
# (CONSTANT, VERBATIM, FIXED order 0-4, LPC order 1-32), RICE and
# RICE2 partitioned residuals incl. escape partitions, wasted bits,
# and the four channel assignments (independent, left/side,
# right/side, mid/side). CRC-8 (header) and CRC-16 (frame) are
# verified. The ENCODER is intentionally simple (verbatim or fixed
# predictors, one rice partition, independent channels) — it exists
# so tests and synthetic tables can round-trip; any spec-conformant
# decoder reads its output.

_CRC8_TAB = None
_CRC16_TAB = None


def _crc_tables():
    global _CRC8_TAB, _CRC16_TAB
    if _CRC8_TAB is None:
        t8 = np.zeros(256, dtype=np.uint8)
        for i in range(256):
            c = i
            for _ in range(8):
                c = ((c << 1) ^ 0x07 if c & 0x80 else c << 1) & 0xFF
            t8[i] = c
        t16 = np.zeros(256, dtype=np.uint16)
        for i in range(256):
            c = i << 8
            for _ in range(8):
                c = ((c << 1) ^ 0x8005 if c & 0x8000 else c << 1) & 0xFFFF
            t16[i] = c
        _CRC8_TAB, _CRC16_TAB = t8, t16
    return _CRC8_TAB, _CRC16_TAB


def _crc8(data: bytes) -> int:
    t8, _ = _crc_tables()
    c = 0
    for b in data:
        c = t8[c ^ b]
    return int(c)


def _crc16(data: bytes) -> int:
    _, t16 = _crc_tables()
    c = 0
    for b in data:
        c = int(t16[(c >> 8) ^ b]) ^ ((c << 8) & 0xFFFF)
    return c


class _MsbReader:
    """MSB-first bit reader over a byte buffer.

    ``read`` is arithmetic on the byte slice (O(bytes spanned), no
    per-bit Python); ``unary`` binary-searches a precomputed index of
    one-bit positions (the naive per-call ``flatnonzero(bits[p:])``
    rescans to end-of-stream on EVERY rice sample — quadratic)."""

    def __init__(self, data: bytes, pos_bits: int = 0):
        self.data = data
        self._ones = np.flatnonzero(
            np.unpackbits(np.frombuffer(data, dtype=np.uint8)))
        self.pos = pos_bits

    def read(self, n: int) -> int:
        p = self.pos
        end = p + n
        b1 = (end + 7) >> 3
        v = int.from_bytes(self.data[p >> 3:b1], "big")
        v >>= b1 * 8 - end
        self.pos = end
        return v & ((1 << n) - 1)

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >> (n - 1) else v

    def unary(self) -> int:
        i = np.searchsorted(self._ones, self.pos)
        if i >= len(self._ones):
            raise ValueError("flac: ran off the end in unary code")
        one = int(self._ones[i])
        q = one - self.pos
        self.pos = one + 1
        return q

    def align_byte(self):
        self.pos = (self.pos + 7) & ~7


def _utf8_coded(br: _MsbReader) -> int:
    """FLAC frame/sample number: UTF-8-style variable-length uint."""
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    while b0 & (0x80 >> n):
        n += 1
    v = b0 & (0x7F >> n)
    for _ in range(n - 1):
        v = (v << 6) | (br.read(8) & 0x3F)
    return v


_FLAC_BLOCKSIZES = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
                    13: 8192, 14: 16384, 15: 32768}
_FLAC_BPS = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _flac_residual(br: _MsbReader, blocksize: int, order: int) -> np.ndarray:
    method = br.read(2)
    if method > 1:
        raise ValueError(f"flac: reserved residual method {method}")
    pbits, escape = (4, 0xF) if method == 0 else (5, 0x1F)
    porder = br.read(4)
    nparts = 1 << porder
    out = np.empty(blocksize - order, dtype=np.int64)
    w = 0
    for p in range(nparts):
        n = (blocksize >> porder) - (order if p == 0 else 0)
        param = br.read(pbits)
        if param == escape:
            raw = br.read(5)
            for i in range(n):
                out[w + i] = br.read_signed(raw) if raw else 0
        else:
            for i in range(n):
                q = br.unary()
                v = (q << param) | br.read(param)
                out[w + i] = (v >> 1) ^ -(v & 1)  # zigzag
        w += n
    return out


_FIXED_COEF = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _flac_subframe(br: _MsbReader, blocksize: int, bps: int) -> np.ndarray:
    if br.read(1):
        raise ValueError("flac: subframe padding bit set")
    ftype = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.unary() + 1
        bps -= wasted
    if ftype == 0:                       # CONSTANT
        out = np.full(blocksize, br.read_signed(bps), dtype=np.int64)
    elif ftype == 1:                     # VERBATIM
        out = np.array([br.read_signed(bps) for _ in range(blocksize)],
                       dtype=np.int64)
    elif 8 <= ftype <= 12:               # FIXED order 0-4
        order = ftype - 8
        warm = [br.read_signed(bps) for _ in range(order)]
        res = _flac_residual(br, blocksize, order)
        out = np.empty(blocksize, dtype=np.int64)
        out[:order] = warm
        coef = _FIXED_COEF[order]
        for i in range(order, blocksize):
            acc = res[i - order]
            for j, c in enumerate(coef):
                acc += c * out[i - 1 - j]
            out[i] = acc
    elif ftype >= 32:                    # LPC order 1-32
        order = ftype - 31
        warm = [br.read_signed(bps) for _ in range(order)]
        prec = br.read(4) + 1
        if prec == 16:
            raise ValueError("flac: invalid qlp precision")
        shift = br.read_signed(5)
        coef = [br.read_signed(prec) for _ in range(order)]
        res = _flac_residual(br, blocksize, order)
        out = np.empty(blocksize, dtype=np.int64)
        out[:order] = warm
        for i in range(order, blocksize):
            acc = 0
            for j in range(order):
                acc += coef[j] * out[i - 1 - j]
            out[i] = res[i - order] + (acc >> shift)
    else:
        raise ValueError(f"flac: reserved subframe type {ftype}")
    if wasted:
        out <<= wasted
    return out


def decode_flac(data: bytes) -> tuple[np.ndarray, int]:
    """FLAC bytes → (int array (n,) or (n, ch), sample_rate)."""
    if data[:4] != b"fLaC":
        raise ValueError("not a FLAC stream (no fLaC magic)")
    pos = 4
    sinfo = None
    while True:                          # metadata blocks
        hdr = data[pos:pos + 4]
        last, btype = hdr[0] >> 7, hdr[0] & 0x7F
        ln = int.from_bytes(hdr[1:4], "big")
        if btype == 0:
            sinfo = data[pos + 4:pos + 4 + ln]
        pos += 4 + ln
        if last:
            break
    if sinfo is None:
        raise ValueError("flac: missing STREAMINFO")
    si = _MsbReader(sinfo)
    si.read(16); si.read(16); si.read(24); si.read(24)  # noqa: E702
    s_rate = si.read(20)
    s_chans = si.read(3) + 1
    s_bps = si.read(5) + 1
    total = si.read(36)

    chans_out: list[list[np.ndarray]] = [[] for _ in range(s_chans)]
    got = 0
    br = _MsbReader(data)  # ONE reader: the ones-index builds once
    while got < total and pos < len(data):
        frame_start = pos
        br.pos = pos * 8
        if br.read(14) != 0x3FFE:
            raise ValueError(f"flac: lost frame sync at byte {pos}")
        br.read(1)                        # reserved
        br.read(1)                        # blocking strategy
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        bps_code = br.read(3)
        br.read(1)                        # reserved
        _utf8_coded(br)                   # frame/sample number
        if bs_code == 6:
            blocksize = br.read(8) + 1
        elif bs_code == 7:
            blocksize = br.read(16) + 1
        else:
            blocksize = _FLAC_BLOCKSIZES.get(bs_code)
            if blocksize is None:
                raise ValueError("flac: reserved blocksize code")
        if sr_code == 12:
            br.read(8)
        elif sr_code in (13, 14):
            br.read(16)
        bps = _FLAC_BPS.get(bps_code, s_bps)
        hdr_end = (br.pos + 7) // 8       # absolute byte of the CRC-8
        if _crc8(data[pos:hdr_end + 1]) != 0:
            raise ValueError("flac: frame header CRC-8 mismatch")
        br.pos = (hdr_end + 1) * 8

        if ch_code < 8:
            nch = ch_code + 1
            subs = [_flac_subframe(br, blocksize, bps)
                    for _ in range(nch)]
        elif ch_code in (8, 9, 10):
            nch = 2
            # the SIDE channel carries one extra bit
            if ch_code == 8:              # left/side
                left = _flac_subframe(br, blocksize, bps)
                side = _flac_subframe(br, blocksize, bps + 1)
                subs = [left, left - side]
            elif ch_code == 9:            # right/side
                side = _flac_subframe(br, blocksize, bps + 1)
                right = _flac_subframe(br, blocksize, bps)
                subs = [right + side, right]
            else:                         # mid/side
                mid = _flac_subframe(br, blocksize, bps)
                side = _flac_subframe(br, blocksize, bps + 1)
                m2 = (mid << 1) | (side & 1)
                subs = [(m2 + side) >> 1, (m2 - side) >> 1]
        else:
            raise ValueError(f"flac: reserved channel assignment {ch_code}")
        if nch != s_chans:
            raise ValueError("flac: frame channel count != STREAMINFO")
        br.align_byte()
        frame_end = br.pos // 8 + 2       # absolute, + CRC-16
        if _crc16(data[frame_start:frame_end]) != 0:
            raise ValueError("flac: frame CRC-16 mismatch")
        for c in range(nch):
            chans_out[c].append(subs[c])
        got += blocksize
        pos = frame_end

    chans = [np.concatenate(c)[:total] for c in chans_out]
    out = chans[0] if s_chans == 1 else np.stack(chans, axis=1)
    return out, s_rate


class _MsbWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, v: int, n: int):
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.nacc += n
        while self.nacc >= 8:
            self.nacc -= 8
            self.out.append((self.acc >> self.nacc) & 0xFF)
        self.acc &= (1 << self.nacc) - 1

    def align(self):
        if self.nacc:
            self.write(0, 8 - self.nacc)

    def bytes(self) -> bytes:
        assert self.nacc == 0
        return bytes(self.out)


def encode_flac(pcm: np.ndarray, sample_rate: int = 16000,
                bps: int = 16, blocksize: int = 4096,
                fixed_order: int = 2) -> bytes:
    """Spec-conformant (minimal) FLAC encoder: independent channels,
    FIXED-predictor subframes (order auto-capped), single rice
    partition with a per-subframe parameter sweep, escape fallback."""
    a = np.asarray(pcm, dtype=np.int64)
    if a.ndim == 1:
        a = a[:, None]
    lim = 1 << (bps - 1)
    if len(a) and (a.min() < -lim or a.max() >= lim):
        raise ValueError(f"sample out of range for {bps}-bit FLAC")
    total, nch = a.shape
    w = _MsbWriter()
    w.out += b"fLaC"
    # STREAMINFO (last metadata block)
    si = _MsbWriter()
    si.write(blocksize, 16)
    si.write(blocksize, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(nch - 1, 3)
    si.write(bps - 1, 5)
    si.write(total, 36)
    sib = si.bytes() + b"\x00" * 16       # md5 unset (zeros allowed)
    w.out += bytes([0x80]) + len(sib).to_bytes(3, "big") + sib

    for fno, start in enumerate(range(0, total, blocksize)):
        blk = a[start:start + blocksize]
        n = len(blk)
        f = _MsbWriter()
        f.write(0x3FFE, 14)
        f.write(0, 1)
        f.write(0, 1)                     # fixed blocking
        f.write(7, 4)                     # blocksize-1 in 16 bits
        f.write(0, 4)                     # rate from STREAMINFO
        f.write(nch - 1, 4)               # independent channels
        f.write({8: 1, 12: 2, 16: 4, 20: 5, 24: 6}[bps], 3)
        f.write(0, 1)
        # UTF-8 coded frame number (supports the 2-byte form)
        if fno < 0x80:
            f.write(fno, 8)
        else:
            f.write(0xC0 | (fno >> 6), 8)
            f.write(0x80 | (fno & 0x3F), 8)
        f.write(n - 1, 16)
        hdr = f.bytes()
        f = _MsbWriter()
        f.out += hdr + bytes([_crc8(hdr)])
        for c in range(nch):
            sig = blk[:, c]
            order = min(fixed_order, max(0, n - 1))
            res = sig.copy()
            for _ in range(order):        # repeated first difference
                res = np.diff(res)
            res = res.astype(np.int64)
            f.write(0, 1)
            f.write(8 + order, 6)         # FIXED subframe
            f.write(0, 1)                 # no wasted bits
            for v in sig[:order]:
                f.write(int(v), bps)
            f.write(0, 2)                 # rice (4-bit params)
            f.write(0, 4)                 # one partition
            zz = (np.abs(res) << 1) - (res < 0).astype(np.int64)
            best_k, best_cost = None, None
            for k in range(15):
                cost = int(np.sum(zz >> k)) + len(zz) * (k + 1)
                if best_cost is None or cost < best_cost:
                    best_k, best_cost = k, cost
            raw_bits = int(max(zz.max() if len(zz) else 0, 1)
                           ).bit_length() + 1
            if best_cost > len(zz) * raw_bits + 5:
                f.write(0xF, 4)           # escape: raw residuals
                f.write(raw_bits, 5)
                for v in res:
                    f.write(int(v), raw_bits)
            else:
                f.write(best_k, 4)
                for v in zz:
                    q = int(v) >> best_k
                    f.write(0, q)
                    f.write(1, 1)
                    f.write(int(v), best_k)
        f.align()
        frame = f.bytes()
        w.out += frame + _crc16(frame).to_bytes(2, "big")
    return bytes(w.out)
