"""Similarity search over an embedding column (array<float>).

Brute-force cosine top-k is the exact baseline; the LSH-bucketed
variant (deterministic sign-random-projection) is the scale path —
candidate generation touches only the query's bucket ring instead of
the full corpus. Dot products are JVM-side ``F.zip_with`` +
``F.aggregate`` (whole-stage codegen) — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .hashing import phash60_py


def _dot(a, b):
    # each element is cast to double BEFORE the multiply: float32 inputs
    # must not multiply in float32, or the result structurally diverges
    # from the DuckDB oracle's CAST(embedding AS DOUBLE[]) semantics
    # (a cosine landing on a round(,4) or threshold boundary could flip)
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def cosine_to_query(embeddings: DataFrame, query_vec: list[float],
                    vec_col: str = "embedding") -> DataFrame:
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qn = sum(x * x for x in query_vec) ** 0.5
    cos = _dot(F.col(vec_col), q) / (_norm(F.col(vec_col)) * F.lit(qn))
    return embeddings.withColumn("cosine", F.round(cos, 4))


def ann_topk_bruteforce(embeddings: DataFrame, query_vec: list[float], k: int = 10,
                        id_col: str = "vec_id") -> DataFrame:
    """Exact top-k by cosine (ties by id) — TakeOrderedAndProject, the
    scan is never materialized or shuffled."""
    scored = cosine_to_query(embeddings, query_vec)
    return (
        scored.select(id_col, "label", "cosine")
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def _hyperplanes(dim: int, n_planes: int, table: int = 0) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes from the portable hash —
    reproducible across engines and sessions (no RNG state). ``table``
    seeds independent plane sets for OR-amplified multi-table LSH."""
    planes = []
    for p in range(n_planes):
        v = [
            ((phash60_py(f"plane|{table}|{p}|{d}") % 2001) - 1000) / 1000.0
            for d in range(dim)
        ]
        planes.append(v)
    return planes


def lsh_bucket_col(vec_col, planes: list[list[float]]):
    """Sign-random-projection bucket id: bit p = 1 iff v · plane_p > 0."""
    bits = [
        F.when(_dot(vec_col, F.array(*[F.lit(x) for x in plane])) > 0,
               F.lit(1 << p)).otherwise(F.lit(0))
        for p, plane in enumerate(planes)
    ]
    out = F.lit(0)
    for b in bits:
        out = out + b
    return out.cast("int")


def ann_topk_lsh(embeddings: DataFrame, query_vec: list[float], k: int = 10,
                 n_planes: int = 8, id_col: str = "vec_id") -> DataFrame:
    """Approximate top-k: score only vectors whose SRP bucket is within
    Hamming ≤ 1 of the query's bucket (bucket ring). At 100 TB the
    bucket column is precomputed+partitioned-by, so a query prunes to
    (n_planes+1)/2^n_planes of the corpus; here it is computed inline.
    """
    dim = len(query_vec)
    planes = _hyperplanes(dim, n_planes)
    qbits = 0
    for p, plane in enumerate(planes):
        if sum(q * x for q, x in zip(query_vec, plane)) > 0:
            qbits |= 1 << p
    ring = [qbits] + [qbits ^ (1 << p) for p in range(n_planes)]
    bucketed = embeddings.withColumn(
        "bucket", lsh_bucket_col(F.col("embedding"), planes)
    )
    cands = bucketed.filter(F.col("bucket").isin(ring))
    return ann_topk_bruteforce(cands.drop("bucket"), query_vec, k, id_col)


def srp_buckets(embeddings: DataFrame, dim: int, n_planes: int = 8,
                n_tables: int = 4, id_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """(id, table, bucket) triples: each vector's SRP bucket in L
    independent tables. Ids only — vectors never leave the scan.

    All n_tables × n_planes dot products run in whole-stage codegen:
    posexplode the vector once, multiply each component against the
    literal plane matrix (constant-folded arrays), and hash-aggregate
    the partial sums per vector. HOF lambdas (zip_with/aggregate) are
    CodegenFallback and cost ~10 µs per element eval interpreted —
    measured 6× slower than this explode+agg shape even though the
    latter adds a (256 B/vector after map-side combine) shuffle.
    Summation stays in row order (explode output is contiguous per
    vector, partial agg folds in input order), so the result is
    bit-identical to a sequential dot product — the DuckDB oracle
    twin relies on that."""
    planes = {
        t: _hyperplanes(dim, n_planes, t) for t in range(n_tables)
    }
    exploded = embeddings.select(
        id_col, F.posexplode(vec_col).alias("_d", "_x")
    )
    dots = [
        F.sum(
            F.col("_x")
            * F.element_at(
                F.array(*[F.lit(v) for v in planes[t][p]]), F.col("_d") + 1
            )
        ).alias(f"_dot_{t}_{p}")
        for t in range(n_tables)
        for p in range(n_planes)
    ]
    agg = exploded.groupBy(id_col).agg(*dots)
    bucket_of = [
        sum(
            (
                F.when(F.col(f"_dot_{t}_{p}") > 0, F.lit(1 << p)).otherwise(
                    F.lit(0)
                )
                for p in range(n_planes)
            ),
            start=F.lit(0),
        ).cast("int")
        for t in range(n_tables)
    ]
    return agg.select(
        id_col, F.posexplode(F.array(*bucket_of)).alias("table", "bucket")
    )


def ivf_centroids(dim: int, n_cells: int = 64) -> list[list[float]]:
    """Deterministic unit-norm coarse centroids from the portable hash
    (no RNG state, reproducible across engines). Hash-derived centroids
    are the training-free IVF baseline: at warehouse scale they would
    be replaced by k-means centroids persisted as a dim table, with the
    assignment/probe plan below unchanged."""
    cells = []
    for c in range(n_cells):
        v = [
            ((phash60_py(f"ivf|{c}|{d}") % 2001) - 1000) / 1000.0
            for d in range(dim)
        ]
        n = sum(x * x for x in v) ** 0.5
        cells.append([x / n for x in v])
    return cells


def ivf_assign(embeddings: DataFrame, dim: int, n_cells: int = 64,
               id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """(id, cell): nearest coarse centroid by dot product (centroids are
    unit-norm, so argmax dot = argmax cosine); ties → smallest cell id.

    Same whole-stage-codegen shape as ``srp_buckets``: one posexplode
    of the vector, n_cells aggregated dot products against the
    constant-folded centroid matrix (summation in row order ⇒
    bit-identical to a sequential dot product, which the DuckDB oracle
    twin reproduces), then a scalar argmax."""
    cents = ivf_centroids(dim, n_cells)
    exploded = embeddings.select(
        id_col, F.posexplode(vec_col).alias("_d", "_x")
    )
    dots = [
        F.sum(
            F.col("_x")
            * F.element_at(F.array(*[F.lit(v) for v in cents[c]]), F.col("_d") + 1)
        ).alias(f"_dot_{c}")
        for c in range(n_cells)
    ]
    agg = exploded.groupBy(id_col).agg(*dots)
    arr = F.array(*[F.col(f"_dot_{c}") for c in range(n_cells)])
    return agg.select(
        id_col,
        (F.array_position(arr, F.array_max(arr)) - 1).cast("int").alias("cell"),
    )


def ann_topk_ivf(embeddings: DataFrame, query_vec: list[float], k: int = 10,
                 n_cells: int = 64, n_probe: int = 8,
                 id_col: str = "vec_id") -> DataFrame:
    """IVF-flat approximate top-k: score only vectors whose coarse cell
    is among the query's n_probe nearest centroids. At 100 TB the cell
    column is precomputed and the table partitioned by it, so a query
    scans n_probe/n_cells of the corpus; here assignment runs inline."""
    dim = len(query_vec)
    cents = ivf_centroids(dim, n_cells)
    qd = [
        (sum(q * x for q, x in zip(query_vec, c)), i)
        for i, c in enumerate(cents)
    ]
    probe = [i for _, i in sorted(qd, key=lambda t: (-t[0], t[1]))[:n_probe]]
    assigned = ivf_assign(embeddings, dim, n_cells, id_col)
    cands = embeddings.join(
        assigned.filter(F.col("cell").isin(probe)).select(id_col), on=id_col
    )
    return ann_topk_bruteforce(cands, query_vec, k, id_col)


def embedding_near_dup_pairs(embeddings: DataFrame, dim: int,
                             threshold: float = 0.95,
                             n_planes: int = 8, n_tables: int = 4) -> DataFrame:
    """Embedding-cosine near-dup: OR-amplified SRP blocking — L
    independent hash tables (a true pair at cos≈0.99 lands in the same
    bucket of at least one table with P ≈ 1-(1-0.96^k)^L > 0.999),
    self-join per (table, bucket), then exact cosine ≥ threshold.

    Scale shape: the blocking self-join carries (table, bucket, id)
    triples ONLY; full vectors are re-joined per pair side after the
    pair-distinct, so the wide arrays touch O(|candidate pairs|) rows.
    ``dim`` is a parameter (schema knowledge), not a driver action.
    ``n_planes`` must grow with corpus size — buckets per table are
    2^n_planes, so pick n_planes ≈ log2(N / target_bucket_size); the
    default 8 suits ~10^5-10^6 vectors, not 10^9 (where ~20 planes and
    a persisted+partitioned bucket column are the plan)."""
    b = srp_buckets(embeddings, dim, n_planes, n_tables)
    left = b.select(F.col("vec_id").alias("id_a"), "table", "bucket")
    right = b.select(F.col("vec_id").alias("id_b"), "table", "bucket")
    pairs = (
        left.join(right, on=["table", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    # norms once per VECTOR (codegen explode+agg, same float-product /
    # sequential-sum bits as the per-pair _norm it replaces), not once
    # per pair — at 10^9 vectors that is the difference between O(N)
    # and O(|pairs|) norm computations
    norms = (
        embeddings.select("vec_id", F.posexplode("embedding").alias("_d", "_x"))
        .groupBy("vec_id")
        # cast-then-multiply, matching _dot / the DOUBLE[] oracle
        .agg(F.sum(F.col("_x").cast("double") * F.col("_x").cast("double"))
             .alias("_n2"))
        .select("vec_id", F.sqrt("_n2").alias("_norm"))
    )
    vecn = embeddings.select("vec_id", "embedding").join(norms, on="vec_id")
    va = vecn.select(F.col("vec_id").alias("id_a"),
                     F.col("embedding").alias("v_a"),
                     F.col("_norm").alias("_norm_a"))
    vb = vecn.select(F.col("vec_id").alias("id_b"),
                     F.col("embedding").alias("v_b"),
                     F.col("_norm").alias("_norm_b"))
    cos = _dot(F.col("v_a"), F.col("v_b")) / (F.col("_norm_a") * F.col("_norm_b"))
    return (
        pairs.join(va, on="id_a")
        .join(vb, on="id_b")
        .withColumn("cosine", F.round(cos, 4))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
