"""Deduplication operators for large-scale training-data pipelines.

Exact (hash-groupBy), MinHash+LSH (shingle→minhash→band→bucket-join),
SimHash, and n-gram Jaccard — all over a ``documents``-shaped table
(doc_id, text, ...). Every operator is pure DataFrame/Catalyst (scalar
array lambdas — array_min/transform — instead of explode+shuffle where
possible), so the shuffle count is: exact dedup = 1 (groupBy hash),
minhash signatures = 0, LSH pair generation = 1 (band-bucket
self-join). At 100 TB the signature pass streams the corpus once and
the join only shuffles (band, bucket, doc_id) triples, never text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .hashing import phash60

N_MINHASH = 16
N_BANDS = 8  # 2 rows per band
SHINGLE_K = 3


def tokens_col(text_col):
    """Whitespace tokenization, shared by several ops (matches DuckDB
    ``regexp_split_to_array(trim(text), '\\s+')``)."""
    return F.split(F.trim(text_col), r"\s+")


def word_shingles(text_col, k: int = SHINGLE_K):
    """Array of k-word shingles (space-joined), distinct."""
    w = tokens_col(text_col)
    n = F.size(w)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    shingle = lambda i: F.concat_ws(
        " ", *[F.element_at(w, (i + j + 1).cast("int")) for j in range(k)]
    )
    return F.array_distinct(
        F.when(n >= k, F.transform(idx, shingle)).otherwise(F.array(w[0]))
    )


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Exact content dedup: one survivor (min doc_id) per text hash.
    The groupBy key is the 60-bit portable hash, not the text — the
    shuffle moves 8-byte keys, not documents."""
    return (
        docs.withColumn("text_hash", phash60(F.col("text")))
        .groupBy("text_hash")
        .agg(F.min("doc_id").alias("doc_id"), F.count("*").alias("dup_count"))
    )


MINHASH_M = (1 << 31) - 1  # Mersenne prime 2^31-1: products stay < 2^62,
# safe under both Spark's wrapping and DuckDB's checked BIGINT arithmetic


def minhash_mix_params(i: int) -> tuple[int, int]:
    """Deterministic (a_i, b_i) for the i-th universal-hash mix, derived
    from the portable hash so Spark/DuckDB/Python agree."""
    from .hashing import phash60_py

    return (phash60_py(f"mh_a|{i}") % (MINHASH_M - 1) + 1,
            phash60_py(f"mh_b|{i}") % MINHASH_M)


def minhash_signatures(docs: DataFrame, n_hashes: int = N_MINHASH) -> DataFrame:
    """(doc_id, sig: array<long>) — one portable md5 per *shingle*
    (h0 = phash60(shingle) mod M), then 16 universal-hash mixes
    sig_i = min over shingles of (a_i·h0 + b_i) mod M. Scalar per row,
    zero shuffles, and 16× fewer md5 evaluations than hashing each
    (shingle, seed) pair."""
    h0s = F.transform(
        word_shingles(F.col("text")),
        lambda s: F.pmod(phash60(s), F.lit(MINHASH_M)),
    )

    def mix(i: int):
        a, b = minhash_mix_params(i)
        return lambda h: F.pmod(h * F.lit(a) + F.lit(b), F.lit(MINHASH_M))

    sig = F.array(
        *[F.array_min(F.transform(h0s, mix(i))) for i in range(n_hashes)]
    )
    return docs.select("doc_id", sig.alias("sig"))


def lsh_candidate_pairs(
    docs: DataFrame, n_hashes: int = N_MINHASH, n_bands: int = N_BANDS
) -> DataFrame:
    """MinHash-LSH near-dup candidates: docs sharing any band bucket.

    Bands of r = n_hashes/n_bands signature rows are hashed to a bucket;
    the self-join shuffles only (band, bucket, doc_id). Returns distinct
    pairs (doc_a < doc_b) with their estimated Jaccard (matching
    signature fraction).
    """
    r = n_hashes // n_bands
    sigs = minhash_signatures(docs, n_hashes)
    band_cols = [
        phash60(
            F.concat_ws(
                ",", *[F.col("sig")[b * r + j].cast("string") for j in range(r)]
            )
        ).alias(f"band_{b}")
        for b in range(n_bands)
    ]
    banded = sigs.select(
        "doc_id", "sig",
        F.posexplode(F.array(*band_cols)).alias("band", "bucket"),
    ).persist()  # both sides of the self-join reuse the signatures
    a = banded.select(
        F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"),
        "band", "bucket",
    )
    b = banded.select(
        F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b"),
        "band", "bucket",
    )
    pairs = (
        a.join(b, on=["band", "bucket"], how="inner")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a", "doc_b",
            (
                F.size(
                    F.filter(
                        F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                        lambda m: m,
                    )
                )
                / F.lit(16.0)
            ).alias("est_jaccard"),
        )
        .distinct()
    )
    return pairs


def ngram_jaccard_pairs(docs: DataFrame, threshold: float = 0.2) -> DataFrame:
    """Exact n-gram Jaccard over LSH candidates: join texts back for the
    candidate pairs only (never all-pairs), compute
    |A∩B| / |A∪B| on distinct shingle sets."""
    cands = lsh_candidate_pairs(docs)
    sh = docs.select(
        "doc_id", word_shingles(F.col("text")).alias("shingles")
    )
    j = (
        cands.join(sh.withColumnRenamed("doc_id", "doc_a")
                     .withColumnRenamed("shingles", "sh_a"), on="doc_a")
        .join(sh.withColumnRenamed("doc_id", "doc_b")
                .withColumnRenamed("shingles", "sh_b"), on="doc_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (
        j.select(
            "doc_a", "doc_b",
            F.round(inter / union, 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


SIMHASH_BITS = 60  # the portable hash supplies 60 bits


def simhash64(docs: DataFrame) -> DataFrame:
    """SimHash over whitespace tokens: bit b of the fingerprint is the
    sign of Σ_tokens (±1 by bit b of phash60(token)). Pure scalar array
    math (transform/aggregate), literal shift amounts — zero shuffles,
    stays in codegen."""
    toks = tokens_col(F.col("text"))
    th = F.transform(toks, lambda t: phash60(t))

    def vote(b: int):
        def f(acc, h):
            is_one = F.shiftrightunsigned(h, b).bitwiseAND(F.lit(1)) == 1
            return acc + F.when(is_one, 1).otherwise(-1)

        return f

    fp = F.lit(0).cast("long")
    for b in range(SIMHASH_BITS):
        fp = fp + F.when(
            F.aggregate(th, F.lit(0), vote(b)) > 0,
            F.lit(1 << b).cast("long"),
        ).otherwise(F.lit(0).cast("long"))
    return docs.select("doc_id", fp.alias("simhash"))


def phash_near_pairs(df: DataFrame, id_col: str = "image_id",
                     phash_col: str = "phash", max_hamming: int = 6) -> DataFrame:
    """O18 (SURVEY.md §2): perceptual-hash Hamming clustering over the
    corpus — banded LSH on the 64-bit phash (4 bands × 16 bits) so the
    self-join never goes O(n²); exact distance check afterwards with
    ``bit_count(a ^ b)``. By pigeonhole, any pair within Hamming ≤ 3 is
    guaranteed to share a band; larger distances are found with high
    probability."""
    bands = [
        F.shiftrightunsigned(F.col(phash_col), 16 * b)
        .bitwiseAND(F.lit((1 << 16) - 1))
        .alias(f"b{b}")
        for b in range(4)
    ]
    banded = df.select(
        F.col(id_col), F.col(phash_col),
        F.posexplode(F.array(*bands)).alias("band", "key"),
    )
    a = banded.select(F.col(id_col).alias("id_a"),
                      F.col(phash_col).alias("h_a"), "band", "key")
    b = banded.select(F.col(id_col).alias("id_b"),
                      F.col(phash_col).alias("h_b"), "band", "key")
    return (
        a.join(b, on=["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def simhash_near_pairs(docs: DataFrame, max_hamming: int = 8) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, banded to avoid the
    O(n²) self-join: 4 bands of 15 bits each — any pair within Hamming
    ≤ 8 of a 60-bit fingerprint shares at least one exact band with
    good probability (exact guarantee at ≤ 3 by pigeonhole)."""
    sh = simhash64(docs)
    bands = [
        F.shiftrightunsigned(F.col("simhash"), 15 * b)
        .bitwiseAND(F.lit((1 << 15) - 1))
        .alias(f"b{b}")
        for b in range(4)
    ]
    banded = sh.select("doc_id", "simhash", F.posexplode(F.array(*bands)).alias("band", "key"))
    a = banded.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("h_a"), "band", "key")
    b = banded.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("h_b"), "band", "key")
    return (
        a.join(b, on=["band", "key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a", "doc_b",
            F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
