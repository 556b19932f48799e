"""Deterministic corpus-row synthesis shared by the fixture generator,
the oracle and the tests (docs/SEMANTICS.md §3, FIXTURES.md §2).

Everything derives from the canonical URL string via xxh64 — the same
values the Spark engine computes JVM-side with ``F.xxhash64``.
"""

from __future__ import annotations

import functools
import hashlib

import numpy as np

from ccrawler_spark import codecs
from ccrawler_spark.functions.hashing import to_unsigned64, ushift, xxhash64_str

from .wordlist import WORDLIST

FMTS = ("rgb8", "rle8", "dct8")


def image_id(canonical_url: str) -> str:
    return hashlib.sha256(canonical_url.encode("utf-8")).hexdigest()[:16]


def dims(canonical_url: str) -> tuple[int, int]:
    k = xxhash64_str(canonical_url)
    ku = to_unsigned64(k)
    w = 16 + (ku % 4) * 16
    h = 16 + (ushift(k, 8) % 4) * 16
    return w, h


def fmt_of(canonical_url: str) -> str:
    return FMTS[to_unsigned64(xxhash64_str(canonical_url)) % 3]


@functools.lru_cache(maxsize=4096)
def _pixels_pattern(km: int, w: int, h: int) -> np.ndarray:
    y, x, c = np.ogrid[0:h, 0:w, 0:3]
    px = ((km + 31 * y + 17 * x + 97 * c) % 256).astype(np.uint8)
    px.setflags(write=False)  # cached: callers must not mutate
    return px


def pixels_of(canonical_url: str) -> np.ndarray:
    """uint8[h, w, 3]: pixels[y,x,c] = (k_u + 31y + 17x + 97c) % 256.

    k_u is reduced mod 256 before the numpy broadcast — mathematically
    identical, and avoids numpy's silent int→float64 promotion for
    k_u ≥ 2^63 which would destroy the low bits. Only (km, w, h)
    determine the image, so there are ≤ 256·4·4 distinct patterns —
    LRU-cached (read-only) because the decode invariant regenerates
    the expected image for every fetched row (O41 hot path).
    """
    w, h = dims(canonical_url)
    km = int(to_unsigned64(xxhash64_str(canonical_url)) % 256)
    return _pixels_pattern(km, w, h)


def caption_of(canonical_url: str) -> str:
    """8-16 words from the fixed 256-word list (SEMANTICS.md §3)."""
    ku = to_unsigned64(xxhash64_str(canonical_url))
    n_words = 8 + (ku % 9)
    words = [
        WORDLIST[to_unsigned64(xxhash64_str(f"cap|{canonical_url}|{i}")) % 256]
        for i in range(n_words)
    ]
    return " ".join(words)


def phash_of(pixels: np.ndarray) -> int:
    """64-bit mean-threshold perceptual hash (SEMANTICS.md §3), signed.

    The channel mean is computed as an exact uint16 sum divided by 3.0
    — the sum of three uint8 values is exact in both formulations, so
    this is bit-identical to ``astype(float64).mean(axis=2)`` while
    skipping the (h, w, 3) float64 temporary (per-fetch hot path)."""
    gray = pixels.sum(axis=2, dtype=np.uint16) / 3.0
    h, w = gray.shape
    th, tw = h // 8, w // 8
    cells = gray.reshape(8, th, 8, tw).mean(axis=(1, 3))
    bits = (cells > cells.mean()).ravel()  # row-major, MSB-first
    v = int.from_bytes(np.packbits(bits).tobytes(), "big")
    return v - (1 << 64) if v >= (1 << 63) else v


def corpus_row(canonical_url: str) -> dict:
    """Full corpus row for a canonical URL (FIXTURES.md §2 schema)."""
    px = pixels_of(canonical_url)
    f = fmt_of(canonical_url)
    payload = codecs.encode(px, f)
    w, h = dims(canonical_url)
    if f == "dct8":
        p = codecs.psnr(px, codecs.decode(payload, f))
        assert 40.0 <= p < float("inf"), (canonical_url, p)
    return {
        "image_id": image_id(canonical_url),
        "bytes": payload,
        "w": w,
        "h": h,
        "fmt": f,
        "caption": caption_of(canonical_url),
        "phash": phash_of(px),
    }
