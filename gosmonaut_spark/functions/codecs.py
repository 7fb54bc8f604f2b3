"""Pure-Python media codecs: PNG (encode + full decode) and WAV PCM.

Real wire formats, zero external codec libraries — PNG needs only zlib
(stdlib) plus the filter algebra implemented here; WAV is plain RIFF
framing over PCM samples. These back the multimodal operators' non-stub
path: payload columns hold genuine PNG/WAV bytes and feature extraction
decodes them for real. Video remains the one honestly-stubbed kind (a
pure-Python H.264 is out of scope anywhere).

Scope (documented contract): PNG 8-bit depth, color types gray(0),
RGB(2), RGBA(6), non-interlaced, all five scanline filters on decode;
WAV PCM16 mono/stereo.
"""

from __future__ import annotations

import struct
import zlib
from binascii import crc32

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

_COLOR_CHANNELS = {0: 1, 2: 3, 6: 4}


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", crc32(tag + data) & 0xFFFFFFFF)
    )


def png_encode(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """Encode a uint8 array (h,w) gray / (h,w,3) RGB / (h,w,4) RGBA as a
    valid PNG. ``filter_type`` 0 (None) or 2 (Up) selects the per-scanline
    filter — two distinct wire forms of the same pixels."""
    if arr.dtype != np.uint8:
        raise ValueError("png_encode wants uint8 pixels")
    if filter_type not in (0, 2):
        raise ValueError("encoder implements filter 0 (None) and 2 (Up)")
    if arr.ndim == 2:
        ch, color = 1, 0
    elif arr.ndim == 3 and arr.shape[2] == 3:
        ch, color = 3, 2
    elif arr.ndim == 3 and arr.shape[2] == 4:
        ch, color = 4, 6
    else:
        raise ValueError(f"unsupported shape {arr.shape}")
    h, w = arr.shape[0], arr.shape[1]
    rows = arr.reshape(h, w * ch)
    raw = bytearray()
    prev = np.zeros(w * ch, dtype=np.uint8)
    for r in range(h):
        row = rows[r]
        raw.append(filter_type)
        if filter_type == 0:
            raw.extend(row.tobytes())
        else:  # Up
            raw.extend(((row.astype(np.int16) - prev) % 256).astype(np.uint8).tobytes())
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def png_parse_header(data: bytes) -> dict:
    """IHDR fields without decoding pixel data (the cheap metadata path)."""
    if data[:8] != PNG_MAGIC:
        raise ValueError("not a PNG (bad signature)")
    length, tag = struct.unpack(">I4s", data[8:16])
    if tag != b"IHDR" or length != 13:
        raise ValueError("first chunk must be IHDR")
    w, h, depth, color, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", data[16:29]
    )
    if depth != 8 or color not in _COLOR_CHANNELS:
        raise ValueError(f"unsupported PNG (depth={depth}, color={color})")
    if interlace:
        raise ValueError("interlaced PNG unsupported")
    return {
        "width": w,
        "height": h,
        "bit_depth": depth,
        "color_type": color,
        "channels": _COLOR_CHANNELS[color],
    }


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def png_decode(data: bytes) -> np.ndarray:
    """Full decode: chunk walk (CRC-checked) -> inflate -> unfilter all
    five scanline filter types. Returns uint8 (h,w) or (h,w,ch)."""
    hdr = png_parse_header(data)
    w, h, ch = hdr["width"], hdr["height"], hdr["channels"]
    pos = 8
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {tag!r} chunk")
        if tag == b"IDAT":
            idat.extend(body)
        pos += 12 + length
        if tag == b"IEND":
            break
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("scanline data size mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    for r in range(h):
        ft = raw[r * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=r * (stride + 1) + 1
        ).astype(np.int32)
        if ft == 0:
            cur = line
        elif ft == 2:  # Up
            cur = (line + prev) % 256
        elif ft in (1, 3, 4):  # Sub / Average / Paeth: sequential in x
            cur = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = cur[x - ch] if x >= ch else 0
                b = prev[x]
                c = prev[x - ch] if x >= ch else 0
                if ft == 1:
                    base = a
                elif ft == 3:
                    base = (a + b) // 2
                else:
                    base = _paeth(int(a), int(b), int(c))
                cur[x] = (line[x] + base) % 256
        else:
            raise ValueError(f"unknown filter type {ft}")
        out[r] = cur.astype(np.uint8)
        prev = cur
    return out.reshape((h, w) if ch == 1 else (h, w, ch))


# ---------------------------------------------------------------------------
# WAV (RIFF PCM)
# ---------------------------------------------------------------------------


def wav_encode(samples: np.ndarray, sample_rate: int, channels: int = 1) -> bytes:
    """PCM16 WAV. ``samples``: int16, mono 1-D or interleaved (n, channels)."""
    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 2:
        channels = s.shape[1]
        s = s.reshape(-1)
    data = s.tobytes()
    byte_rate = sample_rate * channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, byte_rate, channels * 2, 16
    )
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_parse(data: bytes) -> dict:
    """Parse RIFF framing + PCM16 samples. Returns sample_rate, channels,
    bits, n_frames, duration_ms, samples (int16 ndarray, interleaved)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    pcm = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + length]
        if tag == b"fmt ":
            audio_fmt, channels, rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if audio_fmt != 1 or bits != 16:
                raise ValueError("only PCM16 supported")
            fmt = (channels, rate, bits)
        elif tag == b"data":
            pcm = body
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if fmt is None or pcm is None:
        raise ValueError("missing fmt/data chunk")
    channels, rate, bits = fmt
    samples = np.frombuffer(pcm, dtype="<i2")
    n_frames = samples.size // channels
    return {
        "sample_rate": rate,
        "channels": channels,
        "bits": bits,
        "n_frames": n_frames,
        "duration_ms": int(round(n_frames * 1000 / rate)) if rate else 0,
        "samples": samples,
    }
