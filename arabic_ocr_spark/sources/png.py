"""Minimal from-scratch PNG decoder (W3C PNG spec, stdlib zlib only).

Exists because the execution environment has no image libraries (no cv2 /
PIL), which until now left the reference's own pattern artwork
(/root/reference/patterns/*.png, 13 tiny 8-bit RGBA glyph templates)
unreadable — the one reference artifact the engine could not consume.
This decoder reads exactly the subset those artifacts (and ordinary
screenshots/glyph art) use: 8-bit samples, colour types 0/2/3/4/6, all
five scanline filters, no interlacing.  Implemented from the public
specification; nothing here derives from any image library's source.

Scale note: decoding runs inside whatever task calls it (e.g. a template
source loaded once per run and broadcast, kernel/reference_templates.py) —
it is a driver/setup-time artifact reader, not a per-row hot path.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = ["decode_png", "png_to_gray", "encode_png_gray"]

_MAGIC = b"\x89PNG\r\n\x1a\n"
# samples per pixel by colour type: gray, -, rgb, palette-index, gray+a, rgb+a
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor (spec §9.4): nearest of left/up/up-left to a+b-c."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(data: bytes) -> np.ndarray:
    """Decode a PNG byte string to a uint8 array: (h, w) for grayscale,
    (h, w, c) otherwise (palette images expand to their RGB triples).
    Raises ValueError on non-PNG input or features outside the supported
    subset (sample depths != 8, interlacing)."""
    if data[:8] != _MAGIC:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = None
    depth = ctype = interlace = None
    palette = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        pos += 12 + length  # length + tag + body + CRC (CRC not verified)
        if tag == b"IHDR":
            width, height, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
        elif tag == b"PLTE":
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("no IHDR chunk")
    if depth != 8:
        raise ValueError(f"unsupported bit depth {depth} (only 8 supported)")
    if ctype not in _CHANNELS:
        raise ValueError(f"unsupported colour type {ctype}")
    if interlace:
        raise ValueError("interlaced PNG not supported")

    channels = _CHANNELS[ctype]
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("IDAT payload size mismatch")

    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    bpp = channels  # bytes per pixel at depth 8
    at = 0
    for y in range(height):
        ftype = raw[at]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=at + 1).astype(np.int32)
        at += stride + 1
        if ftype == 0:  # None
            cur = line
        elif ftype == 1:  # Sub
            cur = line.copy()
            for i in range(bpp, stride):
                cur[i] = (cur[i] + cur[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype == 3:  # Average
            cur = line.copy()
            for i in range(stride):
                left = cur[i - bpp] if i >= bpp else 0
                cur[i] = (cur[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = line.copy()
            for i in range(stride):
                left = int(cur[i - bpp]) if i >= bpp else 0
                ul = int(prev[i - bpp]) if i >= bpp else 0
                cur[i] = (cur[i] + _paeth(left, int(prev[i]), ul)) & 0xFF
        else:
            raise ValueError(f"unknown scanline filter {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur

    img = out.reshape(height, width, channels) if channels > 1 else out.reshape(height, width)
    if ctype == 3:
        if palette is None:
            raise ValueError("palette image without PLTE")
        img = palette[img]
    return img


def png_to_gray(data: bytes) -> np.ndarray:
    """Decode + reduce to single-channel uint8 exactly the way the
    reference pipeline sees its pattern art: alpha dropped, colour reduced
    with OpenCV's fixed-point BT.601 luma (utils.py:37 cvtColor BGR2GRAY ==
    (4899*R + 9617*G + 1868*B + 8192) >> 14) so a binarize-at-127 of the
    result matches the reference's template bitmaps bit for bit."""
    img = decode_png(data)
    if img.ndim == 2:
        return img
    if img.shape[2] == 2:  # gray + alpha
        return img[:, :, 0]
    rgb = img[:, :, :3].astype(np.int64)
    luma = (4899 * rgb[:, :, 0] + 9617 * rgb[:, :, 1] + 1868 * rgb[:, :, 2] + 8192) >> 14
    return luma.astype(np.uint8)


def encode_png_gray(img: np.ndarray) -> bytes:
    """Tiny grayscale-8 encoder (filter 0 only) — exists for round-trip
    tests of the decoder and for writing debug artifacts; not a general
    encoder."""
    if img.ndim != 2 or img.dtype != np.uint8:
        raise ValueError("encode_png_gray wants a 2-D uint8 array")
    h, w = img.shape

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))
    return (_MAGIC + chunk(b"IHDR", ihdr) + chunk(b"IDAT", zlib.compress(raw, 9))
            + chunk(b"IEND", b""))
