"""rgb8 — raw lossless codec: b"RGB8" + u16le(w) + u16le(h) + RGB bytes."""

from __future__ import annotations

import struct

import numpy as np

MAGIC = b"RGB8"


def encode(pixels: np.ndarray) -> bytes:
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    return MAGIC + struct.pack("<HH", w, h) + pixels.tobytes()


def decode(payload: bytes) -> np.ndarray:
    assert bytes(payload[:4]) == MAGIC, "bad rgb8 magic"
    w, h = struct.unpack("<HH", bytes(payload[4:8]))
    arr = np.frombuffer(payload, dtype=np.uint8, offset=8)
    return arr.reshape(h, w, 3).copy()
