"""T1: URL canonicalization table-driven cases (SEMANTICS.md §2.1)."""

import pytest

from ccrawler_spark.fixtures.gen import denormalize
from ccrawler_spark.urlnorm.normalize import canonicalize, host_of

CASES = [
    ("http://H3.EXAMPLE/p/1", "http://h3.example/p/1"),
    ("HTTP://h3.example/p/1", "http://h3.example/p/1"),
    ("http://h3.example:80/p/1", "http://h3.example/p/1"),
    ("https://h3.example:443/p/1", "https://h3.example/p/1"),
    ("http://h3.example:8080/p/1", "http://h3.example:8080/p/1"),
    ("http://h3.example/p/1#frag", "http://h3.example/p/1"),
    ("http://h3.example/a/./b", "http://h3.example/a/b"),
    ("http://h3.example/a/b/../c", "http://h3.example/a/c"),
    ("http://h3.example/../a", "http://h3.example/a"),
    ("http://h3.example/%70/1", "http://h3.example/p/1"),
    ("http://h3.example/%2Fx", "http://h3.example/%2Fx"),
    ("http://h3.example/%2fx", "http://h3.example/%2Fx"),
    ("http://h3.example", "http://h3.example/"),
    ("http://h3.example?q=1", "http://h3.example/?q=1"),
    ("http://h3.example/p/1?a=%41", "http://h3.example/p/1?a=A"),
    ("ftp://h3.example/p/1", None),
    ("not a url", None),
    ("http://h3.example/a/.", "http://h3.example/a/"),
    ("http://h3.example/a/b/..", "http://h3.example/a/"),
]


@pytest.mark.parametrize("raw,expected", CASES)
def test_canonicalize(raw, expected):
    assert canonicalize(raw) == expected


def test_idempotent():
    for raw, expected in CASES:
        if expected is not None:
            assert canonicalize(expected) == expected


def test_denormalize_roundtrip():
    for i in range(200):
        u = f"http://h{i % 23}.example/p/{i * 3}"
        assert canonicalize(denormalize(u)) == u, denormalize(u)


def test_host_of():
    assert host_of("http://h3.example/p/1") == "h3.example"
