"""T1: codec unit tests (SURVEY.md §5.3)."""

import numpy as np
import pytest

from ccrawler_spark import codecs
from ccrawler_spark.fixtures import corpus


def _px(i: int) -> np.ndarray:
    return corpus.pixels_of(f"http://h{i % 17}.example/p/{i * 7}")


@pytest.mark.parametrize("fmt", ["rgb8", "rle8"])
def test_lossless_roundtrip_exact(fmt):
    for i in range(40):
        px = _px(i)
        assert np.array_equal(codecs.decode(codecs.encode(px, fmt), fmt), px)


def test_dct8_psnr_in_band():
    """Lossy for real, but >= 40 dB (BASELINE.json:15, FIXTURES.md §2)."""
    for i in range(40):
        px = _px(i)
        d = codecs.decode(codecs.encode(px, "dct8"), "dct8")
        p = codecs.psnr(px, d)
        assert 40.0 <= p < float("inf"), p


def test_rle8_long_runs():
    px = np.full((32, 48, 3), 7, dtype=np.uint8)  # runs of 1536 > 255
    assert np.array_equal(codecs.decode(codecs.encode(px, "rle8"), "rle8"), px)


def test_decode_auto_dispatch():
    px = _px(3)
    for fmt in codecs.FORMATS:
        d = codecs.decode_auto(codecs.encode(px, fmt))
        assert d.shape == px.shape


def test_phash_is_stable_int64():
    for i in range(20):
        ph = corpus.phash_of(_px(i))
        assert -(2**63) <= ph < 2**63


def test_corpus_row_schema():
    r = corpus.corpus_row("http://h0.example/p/0")
    assert set(r) == {"image_id", "bytes", "w", "h", "fmt", "caption", "phash"}
    assert len(r["image_id"]) == 16
    assert 8 <= len(r["caption"].split()) <= 16
