"""Pure-stdlib image/audio codecs: PNG (zlib) and WAV (RIFF PCM).

The container has no PIL/ffmpeg/soundfile, but PNG is just zlib-
compressed filtered scanlines and WAV is a RIFF header over raw PCM —
both fully decodable with the standard library. These codecs make the
multimodal decode stages REAL for png/wav payloads (jpeg/flac/mp4
still raise — honest stubs), with deterministic encoders so tests and
synthetic tables can round-trip.

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
