"""Self-contained media codecs (stdlib + numpy — no PIL/ffmpeg in this
container, so the decoders are implemented from the public format specs).

Supported for REAL decode/encode:
- PNG  (spec: https://www.w3.org/TR/png-3/): 8-bit gray / RGB / RGBA /
  palette, all five scanline filters; encoder writes filter-0 RGB(A)/gray.
- BMP  (BITMAPINFOHEADER, 24-bit uncompressed bottom-up).
- PPM/PGM (binary P6/P5, maxval 255).
- WAV  (PCM 8/16-bit via the stdlib ``wave`` module).

Video containers genuinely require ffmpeg — video decode stays a declared
stub in operators/multimodal.py; everything image/audio below is real.

All functions are pure (bytes → numpy array → bytes), deterministic, and
locale-free, so the multimodal pipeline keeps the byte-identical-per-input
property the extraction stage pins.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def sniff_format(content: bytes | None) -> str | None:
    """Magic-byte format sniffing → 'png' | 'bmp' | 'ppm' | 'pgm' | 'wav' | None."""
    if not content or len(content) < 12:
        return None
    if content[:8] == PNG_MAGIC:
        return "png"
    if content[:2] == b"BM":
        return "bmp"
    if content[:2] == b"P6":
        return "ppm"
    if content[:2] == b"P5":
        return "pgm"
    if content[:4] == b"RIFF" and content[8:12] == b"WAVE":
        return "wav"
    return None


# ---------------------------------------------------------------- PNG


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor, vectorized across a row (png-3 §9.4)."""
    p = a.astype(np.int16) + b.astype(np.int16) - c.astype(np.int16)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def decode_png(content: bytes) -> np.ndarray:
    """PNG bytes → uint8 array (h, w, channels). 8-bit depth only; color
    types 0 (gray), 2 (RGB), 3 (palette), 6 (RGBA); no interlacing."""
    if content[:8] != PNG_MAGIC:
        raise ValueError("not a PNG")
    pos, width = 8, None
    idat, plte = bytearray(), None
    while pos + 8 <= len(content):
        (length,), ctype = struct.unpack(">I", content[pos:pos + 4]), content[pos + 4:pos + 8]
        data = content[pos + 8:pos + 8 + length]
        pos += 12 + length  # len + type + data + crc
        if ctype == b"IHDR":
            width, height, depth, color, _comp, _filt, interlace = struct.unpack(">IIBBBBB", data)
            if depth != 8:
                raise ValueError(f"unsupported PNG bit depth {depth}")
            if interlace:
                raise ValueError("interlaced PNG unsupported")
            channels = {0: 1, 2: 3, 3: 1, 6: 4}.get(color)
            if channels is None:
                raise ValueError(f"unsupported PNG color type {color}")
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG data length mismatch")
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    filters, rows = arr[:, 0], arr[:, 1:]
    out = np.zeros((height, stride), dtype=np.uint8)
    bpp = channels
    for y in range(height):
        f, cur = filters[y], rows[y].copy()
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.uint8)
        if f == 0:
            out[y] = cur
        elif f == 1:  # Sub — sequential in x by bpp blocks
            for x in range(stride):
                left = out[y, x - bpp] if x >= bpp else 0
                out[y, x] = (int(cur[x]) + int(left)) & 0xFF
        elif f == 2:  # Up — fully vectorized
            out[y] = (cur.astype(np.int16) + prev.astype(np.int16)).astype(np.uint8)
        elif f == 3:  # Average
            for x in range(stride):
                left = out[y, x - bpp] if x >= bpp else 0
                out[y, x] = (int(cur[x]) + (int(left) + int(prev[x])) // 2) & 0xFF
        elif f == 4:  # Paeth
            for x in range(stride):
                a = out[y, x - bpp] if x >= bpp else 0
                c = prev[x - bpp] if x >= bpp else 0
                out[y, x] = (int(cur[x]) + int(_paeth(
                    np.uint8(a), prev[x], np.uint8(c)))) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {f}")
    px = out.reshape(height, width, channels)
    if plte is not None:
        px = plte[px[:, :, 0]]
    return px


def encode_png(px: np.ndarray) -> bytes:
    """uint8 (h, w) or (h, w, c∈{1,3,4}) → PNG bytes (filter 0, fixed zlib
    level 6 — deterministic for a given input)."""
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, c = px.shape
    color = {1: 0, 3: 2, 4: 6}[c]
    raw = b"".join(b"\x00" + px[y].tobytes() for y in range(h))

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------- BMP / PPM


def decode_bmp(content: bytes) -> np.ndarray:
    """24-bit uncompressed BITMAPINFOHEADER BMP → uint8 (h, w, 3) RGB."""
    if content[:2] != b"BM":
        raise ValueError("not a BMP")
    data_offset = struct.unpack("<I", content[10:14])[0]
    header_size = struct.unpack("<I", content[14:18])[0]
    if header_size < 40:
        raise ValueError("unsupported BMP header")
    w, h = struct.unpack("<ii", content[18:26])
    planes, bpp = struct.unpack("<HH", content[26:30])
    compression = struct.unpack("<I", content[30:34])[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    flipped = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3  # rows padded to 4 bytes
    px = np.zeros((h, w, 3), dtype=np.uint8)
    for y in range(h):
        row = np.frombuffer(content[data_offset + y * stride:data_offset + y * stride + w * 3],
                            dtype=np.uint8).reshape(w, 3)
        px[h - 1 - y if flipped else y] = row[:, ::-1]  # BGR → RGB
    return px


def decode_ppm(content: bytes) -> np.ndarray:
    """Binary P6 (RGB) / P5 (gray) netpbm, maxval 255."""
    parts, pos, tokens = content, 2, []
    while len(tokens) < 3:
        while pos < len(parts) and parts[pos:pos + 1].isspace():
            pos += 1
        if parts[pos:pos + 1] == b"#":
            while pos < len(parts) and parts[pos:pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(parts) and not parts[pos:pos + 1].isspace():
            pos += 1
        tokens.append(int(parts[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = tokens
    if maxval != 255:
        raise ValueError("only maxval 255 supported")
    c = 3 if content[:2] == b"P6" else 1
    px = np.frombuffer(content[pos:pos + w * h * c], dtype=np.uint8).reshape(h, w, c)
    return px


# ---------------------------------------------------------------- WAV


def decode_wav(content: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (samples float32 in [-1, 1] shaped (n, channels), rate)."""
    with wave.open(io.BytesIO(content), "rb") as wf:
        rate, nch, sw = wf.getframerate(), wf.getnchannels(), wf.getsampwidth()
        raw = wf.readframes(wf.getnframes())
    if sw == 2:
        samples = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif sw == 1:
        samples = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported WAV sample width {sw}")
    return samples.reshape(-1, nch), rate


# ---------------------------------------------------------------- transforms


def resize_nearest(px: np.ndarray, width: int, height: int) -> np.ndarray:
    """Deterministic nearest-neighbor resize (same index math as PIL's
    NEAREST: src = floor((dst + 0.5) * scale))."""
    h, w = px.shape[:2]
    ys = np.minimum(((np.arange(height) + 0.5) * (h / height)).astype(np.int64), h - 1)
    xs = np.minimum(((np.arange(width) + 0.5) * (w / width)).astype(np.int64), w - 1)
    return px[ys][:, xs]


def image_features(px: np.ndarray, dim: int = 16) -> list[float]:
    """Deterministic feature vector from decoded pixels: luminance mean/std,
    per-channel means, aspect ratio, then an 8-bin luminance histogram —
    padded/truncated to ``dim`` floats in [0, 1]."""
    if px.ndim == 2:
        px = px[:, :, None]
    f = px.astype(np.float32) / 255.0
    lum = f.mean(axis=2)
    chans = [float(f[:, :, i].mean()) for i in range(min(px.shape[2], 4))]
    hist, _ = np.histogram(lum, bins=8, range=(0.0, 1.0))
    hist = (hist / max(1, lum.size)).tolist()
    h, w = px.shape[:2]
    feats = [float(lum.mean()), float(lum.std()), min(1.0, w / max(1, h) / 4.0), *chans]
    feats = (feats + hist + [0.0] * dim)[:dim]
    return [float(round(v, 6)) for v in feats]


def audio_features(samples: np.ndarray, rate: int, dim: int = 16) -> list[float]:
    """Deterministic audio features: RMS, zero-crossing rate, peak, duration
    (capped), then an 8-bin amplitude histogram."""
    mono = samples.mean(axis=1) if samples.ndim == 2 else samples
    if mono.size == 0:
        return [0.0] * dim
    rms = float(np.sqrt(np.mean(mono**2)))
    zcr = float(np.mean(np.abs(np.diff(np.signbit(mono).astype(np.int8)))))
    peak = float(np.abs(mono).max())
    dur = min(1.0, mono.size / rate / 60.0)
    hist, _ = np.histogram(np.abs(mono), bins=8, range=(0.0, 1.0))
    hist = (hist / mono.size).tolist()
    feats = ([rms, zcr, peak, dur] + hist + [0.0] * dim)[:dim]
    return [float(round(v, 6)) for v in feats]
