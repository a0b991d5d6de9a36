"""Pure-numpy media codecs for the multimodal pipeline.

Two REAL container formats are decodable with no external libraries:

- WAV (RIFF, 16-bit PCM) — header is plain struct fields, samples are
  an int16 array.
- BMP (BITMAPINFOHEADER, uncompressed 24-bit BI_RGB) — header is plain
  struct fields, pixels are bottom-up BGR rows padded to 4 bytes.

These give ``extract_features(decoder="real")`` an honest decode path
for uncompressed media; codec formats (JPEG/MP3/H.264) still raise at
the exact point a library call belongs (mimir's analogue: media is
opaque bytes to the index, GATE plugins own decoding —
SURVEY.md §2.9).

Encoders exist so the synthetic fixture can emit genuine files and the
tests can assert exact sample/pixel round-trips.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# WAV (RIFF / 16-bit PCM)
# ---------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int = 8000,
               n_channels: int = 1) -> bytes:
    """Minimal canonical RIFF/WAVE file: fmt chunk + data chunk.
    ``samples`` is int16, interleaved if multi-channel."""
    pcm = np.ascontiguousarray(samples, dtype="<i2").tobytes()
    byte_rate = sample_rate * n_channels * 2
    block_align = n_channels * 2
    fmt = struct.pack("<HHIIHH", 1, n_channels, sample_rate, byte_rate,
                      block_align, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(pcm)) + pcm)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[np.ndarray, int, int]:
    """-> (samples int16 [n, channels], sample_rate, n_channels).
    Walks RIFF chunks, so extra chunks (LIST/INFO) are tolerated."""
    if len(payload) < 12 or payload[:4] != b"RIFF" \
            or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, end = 12, 8 + struct.unpack("<I", payload[4:8])[0]
    end = min(end, len(payload))
    fmt = None
    data = None
    while pos + 8 <= end:
        cid = payload[pos:pos + 4]
        size = struct.unpack("<I", payload[pos + 4:pos + 8])[0]
        chunk = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            if len(chunk) < 16:
                raise ValueError(f"fmt chunk truncated ({len(chunk)} bytes)")
            fmt = struct.unpack("<HHIIHH", chunk[:16])
        elif cid == b"data":
            data = chunk
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _, _, bits = fmt
    if audio_format != 1 or bits != 16:
        raise NotImplementedError(
            f"only 16-bit PCM supported (format={audio_format}, bits={bits})")
    if n_channels < 1 or sample_rate < 1:
        raise ValueError(
            f"invalid fmt: channels={n_channels} rate={sample_rate}")
    samples = np.frombuffer(data, dtype="<i2")
    n = len(samples) - len(samples) % max(n_channels, 1)
    return samples[:n].reshape(-1, n_channels), sample_rate, n_channels


def audio_features(samples: np.ndarray, sample_rate: int,
                   dim: int = 16) -> np.ndarray:
    """Fixed-dim feature vector from PCM: [duration_s, rms, zcr,
    peak] + (dim-4) log-spaced |FFT| band energies, all float32 and
    deterministic."""
    mono = samples.astype(np.float64).mean(axis=1) / 32768.0
    n = len(mono)
    head = np.array([
        n / sample_rate,
        float(np.sqrt(np.mean(mono ** 2))) if n else 0.0,
        float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
        if n > 1 else 0.0,
        float(np.max(np.abs(mono))) if n else 0.0,
    ])
    k = dim - len(head)
    if k <= 0 or n < 2:
        return np.concatenate([head, np.zeros(max(k, 0))])[:dim] \
            .astype(np.float32)
    spec = np.abs(np.fft.rfft(mono))
    edges = np.unique(np.geomspace(1, len(spec), k + 1).astype(int))
    bands = np.add.reduceat(spec, edges[:-1])
    bands = np.pad(bands, (0, k - len(bands)))[:k]
    bands = bands / (np.max(bands) + 1e-12)
    return np.concatenate([head, bands]).astype(np.float32)


# ---------------------------------------------------------------------------
# BMP (uncompressed 24-bit BI_RGB, BITMAPINFOHEADER)
# ---------------------------------------------------------------------------


def encode_bmp(pixels: np.ndarray) -> bytes:
    """``pixels`` is uint8 [h, w, 3] RGB (row 0 = top). Canonical
    bottom-up 24-bit BMP with 4-byte-padded rows."""
    h, w, _ = pixels.shape
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    bgr = pixels[::-1, :, ::-1]  # bottom-up, RGB -> BGR
    rows = np.zeros((h, row_bytes + pad), dtype=np.uint8)
    rows[:, :row_bytes] = bgr.reshape(h, row_bytes)
    data = rows.tobytes()
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data),
                       2835, 2835, 0, 0)
    offset = 14 + len(info)
    header = b"BM" + struct.pack("<IHHI", offset + len(data), 0, 0, offset)
    return header + info + data


def decode_bmp(payload: bytes) -> np.ndarray:
    """-> uint8 [h, w, 3] RGB (row 0 = top)."""
    if len(payload) < 34 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = struct.unpack("<I", payload[10:14])[0]
    hdr_size = struct.unpack("<I", payload[14:18])[0]
    if hdr_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER not supported")
    w, h = struct.unpack("<ii", payload[18:26])
    planes, bits = struct.unpack("<HH", payload[26:30])
    compression = struct.unpack("<I", payload[30:34])[0]
    if bits != 24 or compression != 0:
        raise NotImplementedError(
            f"only uncompressed 24-bit BMP supported (bits={bits}, "
            f"compression={compression})")
    bottom_up = h > 0
    h = abs(h)
    if w < 1 or h < 1:
        raise ValueError(f"invalid BMP dimensions {w}x{h}")
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)
    if offset + stride * h > len(payload):
        raise ValueError("BMP pixel data truncated")
    rows = np.frombuffer(payload, dtype=np.uint8,
                         count=stride * h, offset=offset)
    rows = rows.reshape(h, stride)[:, :row_bytes].reshape(h, w, 3)
    if bottom_up:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


def resize_nearest(pixels: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize with numpy fancy indexing (the decode /
    feature-extract / resize surface of the brief, library-free)."""
    h, w = pixels.shape[:2]
    yi = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xi = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return pixels[yi][:, xi]


def image_features(pixels: np.ndarray, dim: int = 16) -> np.ndarray:
    """Fixed-dim features: per-channel mean + std (6) + (dim-6)-bin
    luminance histogram over a nearest-neighbor thumbnail, float32."""
    px = resize_nearest(pixels, 32, 32).astype(np.float64) / 255.0
    head = np.concatenate([px.mean(axis=(0, 1)), px.std(axis=(0, 1))])
    k = dim - len(head)
    if k <= 0:
        return head[:dim].astype(np.float32)
    luma = px @ np.array([0.299, 0.587, 0.114])
    hist, _ = np.histogram(luma, bins=k, range=(0.0, 1.0))
    hist = hist / luma.size
    return np.concatenate([head, hist]).astype(np.float32)


# ---------------------------------------------------------------------------
# dispatch
# ---------------------------------------------------------------------------


def sniff_kind(payload: bytes) -> str | None:
    """Container sniffing by magic bytes (authoritative over the
    table's ``kind`` column, which is user-supplied metadata)."""
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:2] == b"BM":
        return "bmp"
    return None


def decode_features(payload: bytes, dim: int = 16) -> np.ndarray | None:
    """Real decode dispatch: WAV/BMP -> features; unknown container ->
    None (the caller decides whether opaque payloads are an error)."""
    kind = sniff_kind(payload)
    if kind == "wav":
        samples, rate, _ = decode_wav(payload)
        return audio_features(samples, rate, dim)
    if kind == "bmp":
        return image_features(decode_bmp(payload), dim)
    return None
