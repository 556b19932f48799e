"""JVM-side column expressions shared across the engine.

These are Catalyst-native (whole-stage-codegen) implementations of the
pinned hash/arithmetic conventions in docs/SEMANTICS.md §1-2 — the
Python twins live in ``hashing.py``; ``tests/test_hashing.py`` proves
they agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_LOW32 = (1 << 32) - 1


def umod_long(col: Column, m: int) -> Column:
    """Unsigned ``k_u % m`` of a signed int64 column (SEMANTICS.md §1).

    k_u = hi*2^32 + lo with hi = k >>> 32 (non-negative) and
    lo = k & 0xFFFFFFFF, so k_u % m = (hi*(2^32 % m) + lo) % m.
    All intermediates < 2^32 * m + 2^32 — no int64 overflow for m ≤ 2^31.
    """
    hi = F.shiftrightunsigned(col, 32)
    lo = col.bitwiseAND(F.lit(_LOW32))
    return F.pmod(hi * F.lit((1 << 32) % m) + lo, F.lit(m)).cast("long")


def ushift_long(col: Column, bits: int) -> Column:
    """Logical right shift (mirrors hashing.ushift)."""
    return F.shiftrightunsigned(col, bits)


def url_hash(url_col: Column) -> Column:
    """url_hash(u) = xxh64(canonical url), signed int64."""
    return F.xxhash64(url_col)


def host_from_url(url_col: Column) -> Column:
    """Authority of an already-canonical URL (SEMANTICS.md §2)."""
    return F.substring_index(F.substring_index(url_col, "://", -1), "/", 1)


def path_from_url(url_col: Column) -> Column:
    """'/'-prefixed path+query of a canonical URL (canonical form always
    has a path — normalize() guarantees it)."""
    return F.regexp_extract(url_col, r"^[a-z]+://[^/]+(/.*)$", 1)


def host_bucket(host_col: Column, buckets: int) -> Column:
    return umod_long(F.xxhash64(host_col), buckets).cast("int")


def priority_of(url_col: Column) -> Column:
    """priority(u) = umod(xxh64('prio|' + u), 3) — SEMANTICS.md §2."""
    return umod_long(F.xxhash64(F.concat(F.lit("prio|"), url_col)), 3).cast("int")


def image_id_of(url_col: Column) -> Column:
    """First 16 hex chars of sha256(canonical url), lowercase."""
    return F.lower(F.substring(F.sha2(url_col.cast("binary"), 256), 1, 16))


def expected_caption(url_col: Column) -> Column:
    """Reference caption of a canonical URL (SEMANTICS.md §3), fully
    JVM-side: n_words = 8 + umod(xxh64(u), 9); word i =
    WORDLIST[umod(xxh64(f"cap|{u}|{i}"), 256)]. Spark's ``xxhash64``
    IS the pinned hash, so the caption invariant check needs no Python
    at all — it used to cost ~70 µs/row of pure-Python xxh64 inside
    the decode UDF (12 hash calls per row)."""
    from ccrawler_spark.fixtures.wordlist import WORDLIST

    wl = F.array(*[F.lit(w) for w in WORDLIST])
    n_words = (umod_long(F.xxhash64(url_col), 9) + 8).cast("int")
    word = lambda i: F.element_at(
        wl,
        (
            umod_long(
                F.xxhash64(
                    F.concat(F.lit("cap|"), url_col, F.lit("|"), i.cast("string"))
                ),
                256,
            )
            + 1
        ).cast("int"),
    )
    return F.concat_ws(" ", F.transform(F.sequence(F.lit(0), n_words - 1), word))
