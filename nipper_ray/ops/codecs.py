"""From-scratch pure-Python media codecs for three PUBLIC bit formats:

- BMP   — Windows bitmap, 24-bit uncompressed BI_RGB,
          BITMAPFILEHEADER (14 B) + BITMAPINFOHEADER (40 B),
          rows bottom-up, BGR byte order, rows padded to 4 bytes.
- WAV   — RIFF/WAVE, PCM (format tag 1), 16-bit mono little-endian.
- Y4M   — YUV4MPEG2 uncompressed video: ASCII stream header, then
          b"FRAME\\n" + planar YUV 4:2:0 per frame.

These make the multimodal codec boundary REAL: the container ships no
PIL/soundfile/pyav, but these formats are simple enough to implement
from the public specifications (~60 LoC each), so decode / resize /
frame-sample stages operate on genuine encoded payloads.  Formats NOT
implemented here (JPEG/PNG/MP3/H.264...) still raise at the boundary.
"""

from __future__ import annotations

import struct

import numpy as np


class CodecError(ValueError):
    pass


# -- BMP ---------------------------------------------------------------------
def encode_bmp(pixels: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> 24-bit BI_RGB .bmp bytes."""
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise CodecError("encode_bmp expects (H, W, 3)")
    h, w, _ = pixels.shape
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    stride = row_bytes + pad
    img_size = stride * h
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + img_size, 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size,
                       2835, 2835, 0, 0)
    body = bytearray(img_size)
    bgr = pixels[:, :, ::-1]  # RGB -> BGR
    for y in range(h):
        row = bgr[h - 1 - y].tobytes()  # bottom-up
        body[y * stride:y * stride + row_bytes] = row
    return header + info + bytes(body)


def decode_bmp(data: bytes) -> np.ndarray:
    """24-bit BI_RGB .bmp bytes -> (H, W, 3) uint8 RGB."""
    if len(data) < 54 or data[:2] != b"BM":
        raise CodecError("not a BMP payload")
    off = struct.unpack_from("<I", data, 10)[0]
    size, w, h, planes, bpp, comp = struct.unpack_from("<IiiHHI", data, 14)
    if size < 40 or planes != 1 or bpp != 24 or comp != 0:
        raise CodecError("unsupported BMP variant (need 24-bit BI_RGB)")
    bottom_up = h > 0
    h = abs(h)
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)
    if len(data) < off + stride * h:
        raise CodecError("truncated BMP")
    out = np.empty((h, w, 3), dtype=np.uint8)
    for y in range(h):
        row = np.frombuffer(data, np.uint8, row_bytes, off + y * stride)
        out[h - 1 - y if bottom_up else y] = row.reshape(w, 3)[:, ::-1]
    return out


# -- WAV ---------------------------------------------------------------------
def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """int16 mono samples -> RIFF/WAVE PCM bytes."""
    pcm = np.asarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    chunks = (b"WAVE"
              + b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + b"data" + struct.pack("<I", len(pcm)) + pcm)
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def decode_wav(data: bytes):
    """RIFF/WAVE PCM bytes -> (int16 np.ndarray mono, rate).  Walks the
    chunk list, so extra chunks (LIST/fact/...) are tolerated."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise CodecError("not a WAV payload")
    pos, rate, pcm = 12, None, None
    while pos + 8 <= len(data):
        cid, clen = data[pos:pos + 4], struct.unpack_from("<I", data,
                                                          pos + 4)[0]
        body = data[pos + 8:pos + 8 + clen]
        if cid == b"fmt ":
            tag, channels, rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", body, 0)
            if tag != 1 or channels != 1 or bits != 16:
                raise CodecError("unsupported WAV (need 16-bit mono PCM)")
        elif cid == b"data":
            pcm = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if rate is None or pcm is None:
        raise CodecError("WAV missing fmt/data chunk")
    return np.frombuffer(pcm, dtype="<i2"), rate


# -- Y4M (YUV4MPEG2) ----------------------------------------------------------
def encode_y4m(frames, w: int, h: int, fps=(25, 1)) -> bytes:
    """List of (H, W) uint8 luma planes -> YUV4MPEG2 4:2:0 bytes
    (chroma planes constant 128 = grey)."""
    if w % 2 or h % 2:
        raise CodecError("Y4M 4:2:0 needs even dimensions")
    head = ("YUV4MPEG2 W%d H%d F%d:%d Ip A1:1 C420jpeg\n"
            % (w, h, fps[0], fps[1])).encode("ascii")
    chroma = bytes([128]) * ((w // 2) * (h // 2))
    out = [head]
    for f in frames:
        f = np.asarray(f, dtype=np.uint8)
        if f.shape != (h, w):
            raise CodecError("frame shape mismatch")
        out.append(b"FRAME\n" + f.tobytes() + chroma + chroma)
    return b"".join(out)


def decode_y4m(data: bytes):
    """YUV4MPEG2 bytes -> (list of (H, W) uint8 luma planes, w, h).
    Chroma planes are parsed (skipped) but not returned."""
    nl = data.find(b"\n")
    if nl < 0 or not data.startswith(b"YUV4MPEG2"):
        raise CodecError("not a YUV4MPEG2 payload")
    w = h = None
    for tok in data[:nl].split(b" ")[1:]:
        if tok[:1] == b"W":
            w = int(tok[1:])
        elif tok[:1] == b"H":
            h = int(tok[1:])
    if not w or not h:
        raise CodecError("Y4M header missing W/H")
    ysz, csz = w * h, (w // 2) * (h // 2)
    frames, pos = [], nl + 1
    while pos < len(data):
        fnl = data.find(b"\n", pos)
        if fnl < 0 or data[pos:pos + 5] != b"FRAME":
            raise CodecError("bad FRAME marker")
        start = fnl + 1
        if start + ysz + 2 * csz > len(data):
            raise CodecError("truncated Y4M frame")
        frames.append(np.frombuffer(data, np.uint8, ysz,
                                    start).reshape(h, w).copy())
        pos = start + ysz + 2 * csz
    return frames, w, h
