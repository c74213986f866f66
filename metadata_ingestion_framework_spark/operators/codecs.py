"""Dependency-free media codecs (pure stdlib + numpy).

The container has no PIL/librosa/ffmpeg, but two classic formats are simple
enough to decode with nothing but ``struct`` and numpy:

- BMP (Windows V3, 24-bit uncompressed): 14-byte file header + 40-byte
  BITMAPINFOHEADER, bottom-up BGR rows padded to 4 bytes.
- WAV (RIFF PCM, 16-bit): RIFF container, ``fmt `` + ``data`` chunks.

These give the multimodal operators (``extract_features`` /
``resize_images``) a REAL decode path — actual pixels / PCM samples, not
byte histograms — while staying runnable anywhere. Real-world codecs
(JPEG/PNG/FLAC) drop into the same ``decode_fn`` slots via PIL/librosa.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# BMP (24-bit uncompressed, bottom-up)
# ---------------------------------------------------------------------------


def encode_bmp(pixels: np.ndarray) -> bytes:
    """RGB uint8 array (H, W, 3) -> 24-bit BMP bytes."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("expected (H, W, 3) RGB array")
    h, w, _ = arr.shape
    row_size = (w * 3 + 3) & ~3  # each row padded to a 4-byte boundary
    img_size = row_size * h
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 14 + 40)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    rows = bytearray()
    bgr = arr[:, :, ::-1]  # BMP stores BGR
    pad = b"\x00" * (row_size - w * 3)
    for y in range(h - 1, -1, -1):  # bottom-up
        rows += bgr[y].tobytes() + pad
    return header + info + bytes(rows)


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP bytes -> RGB uint8 array (H, W, 3)."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    if len(payload) < 54:  # 14-byte file header + 40-byte BITMAPINFOHEADER
        # Text bytes starting with 'BM' would otherwise hit struct.error,
        # which ValueError-only fallbacks don't catch (ADVICE r2).
        raise ValueError("truncated BMP: shorter than the 54-byte header")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    header_size, w, h = struct.unpack_from("<Iii", payload, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP: bpp={bpp} compression={compression}")
    bottom_up = h > 0
    h = abs(h)
    if w <= 0 or h == 0:
        raise ValueError(f"invalid BMP dimensions: {w}x{h}")
    row_size = (w * 3 + 3) & ~3
    if data_offset < 0 or data_offset + row_size * h > len(payload):
        raise ValueError("truncated BMP: pixel data extends past payload")
    raw = np.frombuffer(payload, dtype=np.uint8, count=row_size * h, offset=data_offset)
    rows = raw.reshape(h, row_size)[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


def resize_bmp(payload: bytes, width: int, height: int) -> bytes:
    """Nearest-neighbor resize, BMP in -> BMP out (pure numpy indexing)."""
    px = decode_bmp(payload)
    h, w = px.shape[:2]
    ys = (np.arange(height) * h // height).clip(0, h - 1)
    xs = (np.arange(width) * w // width).clip(0, w - 1)
    return encode_bmp(px[ys][:, xs])


def bmp_features(payload: bytes) -> list[float]:
    """8 real image features: per-channel mean and std (RGB, /255),
    overall brightness, and aspect ratio."""
    px = decode_bmp(payload).astype(np.float64) / 255.0
    means = px.mean(axis=(0, 1))
    stds = px.std(axis=(0, 1))
    h, w = px.shape[:2]
    return [
        float(means[0]), float(means[1]), float(means[2]),
        float(stds[0]), float(stds[1]), float(stds[2]),
        float(px.mean()), float(w) / float(h),
    ]


# ---------------------------------------------------------------------------
# WAV (RIFF, 16-bit PCM)
# ---------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """int16 mono sample array -> RIFF/WAVE PCM bytes."""
    pcm = np.asarray(samples, dtype=np.int16).tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(pcm)) + pcm
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """RIFF PCM16 bytes -> (sample_rate, int16 sample array)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, rate, samples = 12, None, None
    while pos + 8 <= len(payload):
        cid, size = payload[pos : pos + 4], struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:  # truncated chunk -> ValueError, not struct.error
                raise ValueError("truncated WAV fmt chunk")
            audio_fmt, channels, rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if audio_fmt != 1 or bits != 16:
                raise ValueError(f"unsupported WAV: fmt={audio_fmt} bits={bits}")
        elif cid == b"data":
            samples = np.frombuffer(body, dtype=np.int16)
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    return rate, samples


def wav_features(payload: bytes) -> list[float]:
    """8 real audio features: RMS, peak, mean, zero-crossing rate,
    duration (s), sample rate (kHz), and first two quartiles of |x|."""
    rate, x = decode_wav(payload)
    xf = x.astype(np.float64) / 32768.0
    if len(xf) == 0:
        return [0.0] * 8
    zc = float(np.mean(np.abs(np.diff(np.signbit(xf).astype(np.int8))))) if len(xf) > 1 else 0.0
    q1, q2 = np.percentile(np.abs(xf), [25, 50])
    return [
        float(np.sqrt(np.mean(xf**2))), float(np.max(np.abs(xf))), float(np.mean(xf)),
        zc, len(xf) / rate, rate / 1000.0, float(q1), float(q2),
    ]


# ---------------------------------------------------------------------------
# Sniffing dispatcher — the decode_fn for mixed-media tables
# ---------------------------------------------------------------------------


def media_features(payload: bytes) -> list[float]:
    """Magic-byte dispatch: BMP -> pixel stats, WAV -> PCM stats.
    Raises on unknown formats (callers filter by kind / use strict=False
    paths for opaque payloads)."""
    if payload[:2] == b"BM":
        return bmp_features(payload)
    if payload[:4] == b"RIFF":
        return wav_features(payload)
    raise ValueError("unknown media format (magic bytes)")
