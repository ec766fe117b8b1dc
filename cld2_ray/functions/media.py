"""Pure-python media codecs for the multimodal stages.

No codec libraries exist in this environment, but two formats need
none: uncompressed 24-bit BMP (fixed little-endian headers + padded
BGR rows) and PCM WAV (RIFF chunks). These give the multimodal
pipeline a REAL decode path — dimensions, channels and pixel/sample
statistics come from parsing actual bytes, not from a stub.

Encoders exist so tests and the driver-facing media query can
synthesize deterministic fixtures; decoders are the product surface.
"""

from __future__ import annotations

import struct

import numpy as np


# --------------------------------------------------------------------------
# BMP (Windows BITMAPINFOHEADER, 24-bit BI_RGB, bottom-up rows)
# --------------------------------------------------------------------------

def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> BMP bytes."""
    h, w, _ = pixels.shape
    row_size = (w * 3 + 3) & ~3
    image_size = row_size * h
    header = struct.pack("<2sIHHI", b"BM", 54 + image_size, 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, image_size,
                      2835, 2835, 0, 0)
    rows = bytearray()
    pad = b"\x00" * (row_size - w * 3)
    bgr = pixels[:, :, ::-1]  # BMP stores BGR
    for y in range(h - 1, -1, -1):  # bottom-up
        rows += bgr[y].tobytes() + pad
    return header + dib + bytes(rows)


def _parse_bmp(data: bytes):
    """Shared header parse + pixel-row view: -> (w, height, nch,
    h_signed, rows[height, w*nch]) or None if not a parseable
    uncompressed 24/32-bit BMP. Single source of truth for what byte
    streams the two decoders accept."""
    if len(data) < 54 or data[:2] != b"BM":
        return None
    try:
        offset = struct.unpack_from("<I", data, 10)[0]
        dib_size = struct.unpack_from("<I", data, 14)[0]
        if dib_size < 40:
            return None
        w, h = struct.unpack_from("<ii", data, 18)
        planes, bpp = struct.unpack_from("<HH", data, 26)
        compression = struct.unpack_from("<I", data, 30)[0]
    except struct.error:
        return None
    if planes != 1 or compression != 0 or bpp not in (24, 32) \
            or w <= 0 or abs(h) == 0:
        return None
    nch = bpp // 8
    height = abs(h)
    row_size = (w * nch + 3) & ~3
    if len(data) < offset + row_size * height:
        return None
    rows = np.frombuffer(data, dtype=np.uint8,
                         count=row_size * height, offset=offset)
    return w, height, nch, h, rows.reshape(height, row_size)[:, : w * nch]


def decode_bmp(data: bytes):
    """BMP bytes -> (width, height, channels, mean_pixel 0..1) or None
    if not a parseable uncompressed 24/32-bit BMP."""
    parsed = _parse_bmp(data)
    if parsed is None:
        return None
    w, height, nch, _, rows = parsed
    return int(w), int(height), int(nch), float(rows.mean() / 255.0)


def decode_bmp_pixels(data: bytes):
    """BMP bytes -> (h, w, 3) uint8 RGB array (top-down) or None.
    Same format support as decode_bmp; 32-bit BGRA drops alpha."""
    parsed = _parse_bmp(data)
    if parsed is None:
        return None
    w, height, nch, h, rows = parsed
    px = rows.reshape(height, w, nch)[:, :, :3][:, :, ::-1]  # BGR(A)->RGB
    if h > 0:                                   # bottom-up storage
        px = px[::-1]
    return np.ascontiguousarray(px)


def resize_nearest(px: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize of an (h, w, 3) uint8 array to
    (out_h, out_w, 3) — pure-numpy index sampling (src index =
    floor(dst * src_len / dst_len), the classic NN mapping)."""
    h, w, _ = px.shape
    yi = np.minimum(np.arange(out_h) * h // out_h, h - 1)
    xi = np.minimum(np.arange(out_w) * w // out_w, w - 1)
    return np.ascontiguousarray(px[yi[:, None], xi[None, :]])


# --------------------------------------------------------------------------
# WAV (RIFF / PCM16)
# --------------------------------------------------------------------------

def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """int16 mono samples -> WAV bytes."""
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    return (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)


def decode_wav(data: bytes):
    """WAV bytes -> (sample_rate, n_samples, rms 0..1) or None. Walks
    RIFF chunks; PCM16 mono/stereo only."""
    if len(data) < 44 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        return None
    pos = 12
    sample_rate = None
    n_channels = 1
    samples = None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        body = data[pos + 8: pos + 8 + size]
        if cid == b"fmt " and len(body) >= 16:
            fmt_tag, n_channels, sample_rate, _, _, bits = \
                struct.unpack_from("<HHIIHH", body, 0)
            if fmt_tag != 1 or bits != 16:
                return None
        elif cid == b"data":
            samples = np.frombuffer(body[: len(body) & ~1], dtype="<i2")
        pos += 8 + size + (size & 1)
    if sample_rate is None or samples is None:
        return None
    n = len(samples) // max(n_channels, 1)
    rms = float(np.sqrt(np.mean((samples.astype(np.float64) / 32768) ** 2))
                if len(samples) else 0.0)
    return int(sample_rate), int(n), rms


# --------------------------------------------------------------------------
# Deterministic fixtures (media synthesized from an integer id)
# --------------------------------------------------------------------------

def bmp_dims_for(media_id: int) -> tuple[int, int]:
    """The fixture contract shared with the SQL oracle: dimensions are
    a pure function of the id, so an oracle can verify that decode
    really parsed the bytes."""
    return 16 + media_id % 64, 16 + (media_id * 7) % 64


def make_bmp(media_id: int) -> bytes:
    w, h = bmp_dims_for(media_id)
    y, x = np.mgrid[0:h, 0:w]
    px = np.stack([(x * 3 + media_id) % 256, (y * 5) % 256,
                   (x + y + media_id) % 256], axis=2).astype(np.uint8)
    return encode_bmp(px)


def wav_params_for(media_id: int) -> tuple[int, int]:
    """(sample_rate, n_samples) fixture contract."""
    return 16000, 800 + (media_id % 32) * 400


def make_wav(media_id: int) -> bytes:
    sr, n = wav_params_for(media_id)
    t = np.arange(n)
    freq = 100 + (media_id % 20) * 50
    samples = (np.sin(2 * np.pi * freq * t / sr) * 12000).astype(np.int16)
    return encode_wav(samples, sr)


# --------------------------------------------------------------------------
# Y4M (YUV4MPEG2) — uncompressed video, plain-text header + raw frames
# --------------------------------------------------------------------------

def encode_y4m(frames: np.ndarray, fps: tuple[int, int] = (25, 1)) -> bytes:
    """(n, h, w) uint8 LUMA frames -> Y4M bytes (C420jpeg: chroma
    planes are the mean-pooled luma halves here — enough for a real
    container round-trip without a color model)."""
    n, h, w = frames.shape
    assert h % 2 == 0 and w % 2 == 0
    head = f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 C420jpeg\n"
    out = [head.encode("ascii")]
    for f in frames:
        c = f.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3)) \
            .astype(np.uint8)
        out.append(b"FRAME\n")
        out.append(f.tobytes())
        out.append(c.tobytes())   # Cb
        out.append(c.tobytes())   # Cr
    return b"".join(out)


def decode_y4m(data: bytes, sample_every: int = 1):
    """Y4M bytes -> (width, height, fps_num, fps_den, n_frames,
    sampled_frames list of (h, w) uint8 luma arrays) or None. Walks
    the stream header and every FRAME marker; 4:2:0 only."""
    if not data.startswith(b"YUV4MPEG2"):
        return None
    nl = data.find(b"\n")
    if nl < 0:
        return None
    w = h = fn = fd = None
    try:
        for tok in data[10:nl].split(b" "):
            if tok.startswith(b"W"):
                w = int(tok[1:])
            elif tok.startswith(b"H"):
                h = int(tok[1:])
            elif tok.startswith(b"F"):
                fn, fd = (int(x) for x in tok[1:].split(b":"))
            elif tok.startswith(b"C") and not tok.startswith(b"C420"):
                return None           # 4:2:0 only
    except ValueError:                # malformed numeric token
        return None
    if not w or not h or not fn:
        return None
    frame_bytes = w * h + 2 * (w // 2) * (h // 2)
    pos = nl + 1
    n_frames = 0
    sampled: list[np.ndarray] = []
    while pos < len(data):
        nl2 = data.find(b"\n", pos)
        if nl2 < 0 or data[pos:pos + 5] != b"FRAME":
            return None               # corrupt frame marker
        body = nl2 + 1
        if body + frame_bytes > len(data):
            return None               # truncated frame
        if n_frames % sample_every == 0:
            luma = np.frombuffer(data, np.uint8, count=w * h,
                                 offset=body).reshape(h, w)
            sampled.append(luma)
        n_frames += 1
        pos = body + frame_bytes
    return int(w), int(h), int(fn), int(fd), n_frames, sampled


def y4m_params_for(media_id: int) -> tuple[int, int, int]:
    """(width, height, n_frames) fixture contract (SQL-checkable)."""
    return (16 + (media_id % 8) * 2, 16 + (media_id % 5) * 4,
            4 + media_id % 12)


def make_y4m(media_id: int) -> bytes:
    w, h, n = y4m_params_for(media_id)
    t = np.arange(n)[:, None, None]
    y, x = np.mgrid[0:h, 0:w]
    frames = ((x[None] * 3 + y[None] * 5 + t * 17 + media_id)
              % 256).astype(np.uint8)
    return encode_y4m(frames)
