"""Pure-Python media codecs: PNG (encode + full decode), WAV PCM, and
Y4M (YUV4MPEG2) video.

Real wire formats, zero external codec libraries — PNG needs only zlib
(stdlib) plus the filter algebra implemented here; WAV is plain RIFF
framing over PCM samples; Y4M is the standard uncompressed video
container (ASCII stream/frame headers + raw planar YUV). These back the
multimodal operators' non-stub path: payload columns hold genuine
PNG/WAV/Y4M bytes and feature extraction decodes them for real.
Compressed video (H.264 etc.) stays out of scope — a pure-Python decoder
is unreasonable anywhere.

Scope (documented contract): PNG 8-bit depth, color types gray(0),
RGB(2), RGBA(6), non-interlaced, all five scanline filters on decode;
WAV PCM16 mono/stereo; Y4M encode Cmono/C444, parse additionally the
C420 family and C422.
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


# -- Y4M (YUV4MPEG2) ---------------------------------------------------------
# The standard uncompressed video container (mjpegtools/ffmpeg -f yuv4mpeg):
# one ASCII stream header "YUV4MPEG2 W<w> H<h> F<num>:<den> [I? A? C?]\n",
# then per frame an ASCII "FRAME[ params]\n" marker followed by raw planar
# samples. Supported colorspaces: Cmono (Y only), C444 (full-res Y,U,V),
# C420 / C420jpeg / C420mpeg2 / C420paldv (quarter-res chroma).

Y4M_MAGIC = b"YUV4MPEG2"

_Y4M_CHROMA_DIV = {
    # colorspace tag -> (x_div, y_div, n_chroma_planes)
    "mono": (1, 1, 0),
    "444": (1, 1, 2),
    "422": (2, 1, 2),
    "420": (2, 2, 2),
    "420jpeg": (2, 2, 2),
    "420mpeg2": (2, 2, 2),
    "420paldv": (2, 2, 2),
}


def y4m_encode(
    frames: np.ndarray,
    fps_num: int = 25,
    fps_den: int = 1,
    colorspace: str | None = None,
) -> bytes:
    """Encode frames to Y4M. ``frames``: uint8 ndarray of shape
    (n, h, w) for mono or (n, h, w, 3) for planar YUV (stored as C444).
    C420 encode is intentionally out of scope (it would need chroma
    subsampling policy); parse supports it for foreign files."""
    frames = np.asarray(frames, dtype=np.uint8)
    if frames.ndim == 3:
        cs = colorspace or "mono"
    elif frames.ndim == 4 and frames.shape[3] == 3:
        cs = colorspace or "444"
    else:
        raise ValueError("frames must be (n,h,w) or (n,h,w,3) uint8")
    if cs not in ("mono", "444"):
        raise ValueError(f"y4m_encode supports Cmono/C444, not C{cs}")
    n, h, w = frames.shape[:3]
    out = bytearray(
        f"YUV4MPEG2 W{w} H{h} F{fps_num}:{fps_den} Ip A1:1 C{cs}\n".encode()
    )
    for i in range(n):
        out += b"FRAME\n"
        if cs == "mono":
            out += frames[i].tobytes()
        else:
            for c in range(3):  # planar, not interleaved
                out += frames[i, :, :, c].tobytes()
    return bytes(out)


def y4m_parse(data: bytes) -> dict:
    """Parse a Y4M stream. Returns width, height, fps (float), fps_num,
    fps_den, colorspace, interlacing, n_frames, duration_ms, and
    ``y_planes``: uint8 ndarray (n_frames, h, w) of luma (chroma planes
    are validated for size but not returned). Raises on truncated frames
    or unknown colorspace."""
    nl = data.find(b"\n")
    if not data.startswith(Y4M_MAGIC + b" ") or nl < 0:
        raise ValueError("not a YUV4MPEG2 stream")
    w = h = None
    fps_num, fps_den = 25, 1
    interlacing = "?"
    cs = "420jpeg"  # spec default when C is absent
    for tok in data[len(Y4M_MAGIC) + 1 : nl].decode("ascii").split():
        tag, val = tok[0], tok[1:]
        if tag == "W":
            w = int(val)
        elif tag == "H":
            h = int(val)
        elif tag == "F":
            fps_num, fps_den = (int(x) for x in val.split(":"))
        elif tag == "I":
            interlacing = val
        elif tag == "C":
            cs = val
        # A (aspect) and X (extensions) tolerated, unused
    if not w or not h:
        raise ValueError("Y4M header missing W/H")
    if cs not in _Y4M_CHROMA_DIV:
        raise ValueError(f"unsupported Y4M colorspace C{cs}")
    xd, yd, n_chroma = _Y4M_CHROMA_DIV[cs]
    y_size = w * h
    chroma_size = ((w + xd - 1) // xd) * ((h + yd - 1) // yd)
    frame_size = y_size + n_chroma * chroma_size

    planes = []
    pos = nl + 1
    while pos < len(data):
        fnl = data.find(b"\n", pos)
        if fnl < 0 or data[pos : pos + 5] != b"FRAME":
            raise ValueError(f"bad FRAME marker at byte {pos}")
        pos = fnl + 1
        if pos + frame_size > len(data):
            raise ValueError("truncated Y4M frame")
        planes.append(
            np.frombuffer(data, dtype=np.uint8, count=y_size, offset=pos).reshape(
                h, w
            )
        )
        pos += frame_size
    fps = fps_num / fps_den if fps_den else 0.0
    n_frames = len(planes)
    return {
        "width": w,
        "height": h,
        "fps_num": fps_num,
        "fps_den": fps_den,
        "fps": fps,
        "colorspace": cs,
        "interlacing": interlacing,
        "n_frames": n_frames,
        "duration_ms": int(round(n_frames * 1000 / fps)) if fps else 0,
        "y_planes": (
            np.stack(planes) if planes else np.empty((0, h, w), np.uint8)
        ),
    }
