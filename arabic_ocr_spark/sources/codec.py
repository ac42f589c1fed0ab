"""Payload envelope codec for the `text` column of the transcripts table.

The input_hint table carries each turn's embedded document as a string
column.  We define a self-describing, PNG-free envelope (no image libs in
the target environment):

    base64( b"GRY1" + u16le height + u16le width + height*width u8 pixels )

Pixels are grayscale, 0 = black background, 255-ish = paper/ink depending on
the renderer; binarization semantics live in the kernel, not here.  An empty
or non-conforming string decodes to ``None`` (blank-turn edge case).
"""

from __future__ import annotations

import base64
import binascii
import struct

import numpy as np

MAGIC = b"GRY1"
_HEADER = struct.Struct("<4sHH")


def encode_payload(img: np.ndarray) -> str:
    """uint8 HxW grayscale image -> envelope string."""
    if img.dtype != np.uint8 or img.ndim != 2:
        raise ValueError("payload must be a 2-D uint8 array")
    h, w = img.shape
    raw = _HEADER.pack(MAGIC, h, w) + img.tobytes()
    return base64.b64encode(raw).decode("ascii")


def decode_payload(text: str | None) -> np.ndarray | None:
    """Envelope string -> uint8 HxW image, or None for blank/invalid."""
    if not text:
        return None
    try:
        raw = base64.b64decode(text.encode("ascii"), validate=True)
    except (binascii.Error, UnicodeEncodeError, ValueError):
        return None
    if len(raw) < _HEADER.size:
        return None
    magic, h, w = _HEADER.unpack_from(raw)
    if magic != MAGIC or len(raw) != _HEADER.size + h * w or h == 0 or w == 0:
        return None
    return np.frombuffer(raw, dtype=np.uint8, offset=_HEADER.size).reshape(h, w)
