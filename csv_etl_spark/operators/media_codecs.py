"""REAL media codecs with zero external dependencies — the production
kernels for the multimodal operators, for every format stdlib can decode.

The multimodal plumbing (``operators/multimodal.py``) takes decode/resize
kernels by injection.  This module provides real ones:

* **BMP** (Windows DIB, uncompressed 24/32-bit BI_RGB) — struct header
  parse + numpy row unpack.  The format is a plain pixel matrix; parsing
  it is arithmetic, not a codec dependency.
* **PPM** (P6 binary) — the simplest interchange image format.
* **WAV** (PCM) — stdlib ``wave`` + numpy ``frombuffer``.

JPEG/PNG/MP3/video stay behind the injected-kernel gate (entropy coding
needs a real codec library — PIL/ffmpeg in production); the dispatchers
below sniff magic bytes and raise ``NotImplementedError`` for those, so
the honest capability boundary is explicit per item, not per job.

Everything here runs inside Arrow-batched ``mapInPandas`` workers: bytes
in, numpy in the middle, bytes/features out — never on the driver.
"""

from __future__ import annotations

import struct
import wave
from io import BytesIO

import numpy as np

# ---------------------------------------------------------------------------
# BMP
# ---------------------------------------------------------------------------


def decode_bmp(content: bytes) -> np.ndarray:
    """Uncompressed 24/32-bit BI_RGB BMP → (height, width, 3) uint8 RGB."""
    if len(content) < 54 or content[:2] != b"BM":
        raise ValueError("not a BMP file")
    pixel_off = struct.unpack_from("<I", content, 10)[0]
    hdr_size, width, height = struct.unpack_from("<IiiH", content, 14)[:3]
    planes, bpp = struct.unpack_from("<HH", content, 26)
    compression = struct.unpack_from("<I", content, 30)[0]
    if compression != 0:
        raise NotImplementedError("compressed BMP requires a codec library")
    if bpp not in (24, 32):
        raise NotImplementedError(f"{bpp}-bit BMP not supported (24/32 only)")
    bottom_up = height > 0
    height = abs(height)
    nch = bpp // 8
    row_raw = width * nch
    stride = (row_raw + 3) & ~3  # rows pad to 4 bytes
    px = np.frombuffer(content, dtype=np.uint8, count=stride * height, offset=pixel_off)
    rows = px.reshape(height, stride)[:, :row_raw].reshape(height, width, nch)
    if bottom_up:
        rows = rows[::-1]
    # BGR(A) → RGB: first three channels, reversed
    return np.ascontiguousarray(rows[:, :, :3][:, :, ::-1])


def encode_bmp(rgb: np.ndarray) -> bytes:
    """(height, width, 3) uint8 RGB → 24-bit BI_RGB BMP bytes."""
    h, w, _ = rgb.shape
    row_raw = w * 3
    stride = (row_raw + 3) & ~3
    body = np.zeros((h, stride), dtype=np.uint8)
    body[:, :row_raw] = rgb[::-1, :, ::-1].reshape(h, row_raw)  # bottom-up BGR
    data = body.tobytes()
    file_size = 54 + len(data)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    return header + data


# ---------------------------------------------------------------------------
# PPM (P6)
# ---------------------------------------------------------------------------


def decode_ppm(content: bytes) -> np.ndarray:
    """Binary P6 PPM → (height, width, 3) uint8 RGB."""
    if not content.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    # header: magic, width, height, maxval — whitespace/comment separated
    fields: list[int] = []
    pos = 2
    while len(fields) < 3:
        while pos < len(content) and content[pos : pos + 1].isspace():
            pos += 1
        if content[pos : pos + 1] == b"#":  # comment to EOL
            while pos < len(content) and content[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(content) and not content[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(content[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise NotImplementedError("16-bit PPM not supported")
    px = np.frombuffer(content, dtype=np.uint8, count=w * h * 3, offset=pos)
    return px.reshape(h, w, 3)


def encode_ppm(rgb: np.ndarray) -> bytes:
    h, w, _ = rgb.shape
    return b"P6\n%d %d\n255\n" % (w, h) + rgb.astype(np.uint8).tobytes()


# ---------------------------------------------------------------------------
# WAV
# ---------------------------------------------------------------------------


def decode_wav(content: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV → (float32 samples in [-1, 1] shaped (n, channels), rate)."""
    with wave.open(BytesIO(content), "rb") as wf:
        nch, sw, rate, nframes = (
            wf.getnchannels(),
            wf.getsampwidth(),
            wf.getframerate(),
            wf.getnframes(),
        )
        raw = wf.readframes(nframes)
    if sw == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif sw == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise NotImplementedError(f"{8 * sw}-bit WAV not supported (8/16 only)")
    return x.reshape(-1, nch), rate


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """float samples in [-1, 1] shaped (n,) or (n, channels) → 16-bit PCM."""
    if samples.ndim == 1:
        samples = samples[:, None]
    pcm = np.clip(samples, -1.0, 1.0)
    ints = (pcm * 32767.0).astype("<i2")
    buf = BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(samples.shape[1])
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(ints.tobytes())
    return buf.getvalue()


# ---------------------------------------------------------------------------
# Kernels for the multimodal injection seams
# ---------------------------------------------------------------------------


def _decode_image(content: bytes) -> np.ndarray:
    if content[:2] == b"BM":
        return decode_bmp(content)
    if content[:2] == b"P6":
        return decode_ppm(content)
    raise NotImplementedError(
        "image format needs a codec library (PIL) — only BMP/PPM decode here"
    )


def real_decoder(kind: str, content: bytes) -> list[float]:
    """Real feature kernel for ``extract_features(decoder=...)``.

    image (BMP/PPM): [width, height, channels, mean R, mean G, mean B,
    grayscale std, aspect ratio].
    audio (WAV):     [n_samples, channels, rate, duration s, RMS, peak,
    zero-crossing rate, DC offset].
    video: no stdlib container parser exists — stays gated."""
    if kind == "image":
        img = _decode_image(content)
        h, w, c = img.shape
        means = img.reshape(-1, c).mean(axis=0)
        gray = img.astype(np.float32).mean(axis=2)
        return [
            float(w),
            float(h),
            float(c),
            float(means[0]),
            float(means[1]),
            float(means[2]),
            float(gray.std()),
            float(w / h),
        ]
    if kind == "audio":
        x, rate = decode_wav(content)
        mono = x.mean(axis=1)
        zc = float(np.mean(np.abs(np.diff(np.signbit(mono).astype(np.int8))))) if len(mono) > 1 else 0.0
        return [
            float(x.shape[0]),
            float(x.shape[1]),
            float(rate),
            float(x.shape[0] / rate),
            float(np.sqrt(np.mean(mono**2))),
            float(np.abs(mono).max(initial=0.0)),
            zc,
            float(mono.mean()),
        ]
    raise NotImplementedError(f"no stdlib decoder for media kind {kind!r}")


def real_resizer(kind: str, content: bytes, width: int, height: int) -> bytes:
    """Real nearest-neighbor resize for BMP/PPM, re-encoded in the input
    format — plugs into ``resize_media(resizer=...)``."""
    if kind != "image":
        raise NotImplementedError(f"resize not defined for kind {kind!r}")
    is_bmp = content[:2] == b"BM"
    img = _decode_image(content)
    h, w, _ = img.shape
    yi = (np.arange(height) * h // height).clip(0, h - 1)
    xi = (np.arange(width) * w // width).clip(0, w - 1)
    out = img[yi][:, xi]
    return encode_bmp(out) if is_bmp else encode_ppm(out)
