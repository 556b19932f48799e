"""rle8 — lossless per-channel planar run-length codec.

Layout: b"RLE8" + u16le(w) + u16le(h), then for channel c in 0,1,2 the
row-major flattened plane encoded as (run:uint8 in [1,255], value:uint8)
pairs. Channel boundaries are implicit (each plane decodes exactly w*h
pixels). Encode/decode are fully vectorized numpy (SEMANTICS.md §3).
"""

from __future__ import annotations

import struct

import numpy as np

MAGIC = b"RLE8"


def _encode_plane(plane: np.ndarray) -> np.ndarray:
    """flat uint8 plane → interleaved (run, value) uint8 array."""
    n = plane.size
    # run boundaries: positions where value changes
    change = np.flatnonzero(plane[1:] != plane[:-1])
    starts = np.concatenate(([0], change + 1))
    ends = np.concatenate((change + 1, [n]))
    lengths = ends - starts
    values = plane[starts]
    # split runs longer than 255 into ⌈L/255⌉ chunks
    n_chunks = (lengths + 254) // 255
    out_values = np.repeat(values, n_chunks)
    out_lengths = np.full(int(n_chunks.sum()), 255, dtype=np.int64)
    # last chunk of each run gets the remainder
    last_idx = np.cumsum(n_chunks) - 1
    rem = lengths - (n_chunks - 1) * 255
    out_lengths[last_idx] = rem
    pairs = np.empty(out_values.size * 2, dtype=np.uint8)
    pairs[0::2] = out_lengths.astype(np.uint8)
    pairs[1::2] = out_values
    return pairs


def encode(pixels: np.ndarray) -> bytes:
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    parts = [MAGIC, struct.pack("<HH", w, h)]
    for ch in range(3):
        parts.append(_encode_plane(np.ascontiguousarray(pixels[:, :, ch]).ravel()).tobytes())
    return b"".join(parts)


def decode(payload: bytes) -> np.ndarray:
    assert bytes(payload[:4]) == MAGIC, "bad rle8 magic"
    w, h = struct.unpack("<HH", bytes(payload[4:8]))
    n = w * h
    pairs = np.frombuffer(payload, dtype=np.uint8, offset=8)
    runs = pairs[0::2].astype(np.int64)
    vals = pairs[1::2]
    flat = np.repeat(vals, runs)
    assert flat.size == 3 * n, "rle8 payload length mismatch"
    planes = flat.reshape(3, h, w)
    return np.ascontiguousarray(np.moveaxis(planes, 0, 2))
