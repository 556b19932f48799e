"""Composable DataFrame stages of the scheduling round (SURVEY.md §3 E2).

Each function is a declarative DataFrame→DataFrame transform; Catalyst
fuses them into one plan per round (one action: the snapshot write).
Python crossings are exactly: URL normalization tail (O6), bloom probe
(O11), image decode (O41) — all Arrow-batched, never row-at-a-time
(BASELINE.json:15). Everything else is JVM-side whole-stage codegen.

Determinism discipline (docs/SEMANTICS.md §8): every window/sort here
orders by the total key ORD = (priority, discover_ts, url_hash, url).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType, StringType

from ccrawler_spark.conf import CrawlConf
from ccrawler_spark.functions.spark_exprs import (
    host_bucket,
    host_from_url,
    image_id_of,
    path_from_url,
    priority_of,
    umod_long,
    ushift_long,
)

ORD_COLS = ["priority", "discover_ts", "url_hash", "url"]


def _ord(df_or_prefix: str | None = None) -> list[Column]:
    if df_or_prefix:
        return [F.col(f"{df_or_prefix}.{c}") for c in ORD_COLS]
    return [F.col(c) for c in ORD_COLS]


# --------------------------------------------------------------- O6: normalize
def normalize_urls(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Replace ``url_col`` with its canonical form via the batch
    pandas_udf over the shared pure canonicalizer (O6); drop
    out-of-scope rows."""
    from ccrawler_spark.functions.udfs import canonical_url_udf

    return (
        df.withColumn(url_col, canonical_url_udf(F.col(url_col)))
        .filter(F.col(url_col).isNotNull())
    )


def with_url_derivations(df: DataFrame, conf: CrawlConf) -> DataFrame:
    """Attach url_hash/host/host_bucket/image_id to canonical ``url``."""
    return (
        df.withColumn("url_hash", F.xxhash64("url"))
        .withColumn("host", host_from_url(F.col("url")))
        .withColumn("host_bucket", host_bucket(F.col("host"), conf.host_buckets))
        .withColumn("image_id", image_id_of(F.col("url")))
    )


# ---------------------------------------------------------- O13/O14: robots
def robots_active(robots: DataFrame, version: int) -> DataFrame:
    """As-of the configured version: max version ≤ v per host (O14)."""
    w = Window.partitionBy("host").orderBy(F.col("version").desc())
    return (
        robots.filter(F.col("version") <= version)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def robots_gate(frontier: DataFrame, active_rules: DataFrame, conf: CrawlConf) -> DataFrame:
    """Attach ``allowed`` + ``crawl_delay_ms`` via a broadcast join and a
    pure-Catalyst longest-prefix match over the rules array (O13):
    filter the rules to prefix matches, array_max on (length, allow)
    structs picks the longest. No UDF, no shuffle."""
    path = path_from_url(F.col("url"))
    best = F.array_max(
        F.transform(
            F.filter("rules", lambda r: F.startswith(path, r["pattern"])),
            lambda r: F.struct(
                F.length(r["pattern"]).alias("l"), r["allow"].alias("allow")
            ),
        )
    )
    return (
        frontier.join(F.broadcast(active_rules), on="host", how="left")
        .withColumn("allowed", F.coalesce(best["allow"], F.lit(True)))
        .withColumn(
            "crawl_delay_ms",
            F.coalesce(F.col("crawl_delay_ms"), F.lit(conf.default_crawl_delay_ms)),
        )
        .drop("rules", "version")
    )


# ------------------------------------------------- O24/O26/O27/O31: dequeue
def dequeue(allowed: DataFrame, conf: CrawlConf,
            n_hosts: int | None = None) -> DataFrame:
    """Per-host top-k → global budget K → politeness slots.

    Skew handling (O24, "hot-host skew via salted repartitioning",
    B:6): a two-phase top-k — phase 1 ranks within (host, salt) where
    salt = umod(url_hash, fanout), keeping k rows per salt; phase 2
    ranks the ≤ k·fanout survivors per host. Exact because each salt
    keeps ≥ k candidates, and the phase-2 ordering is the same total
    ORD. A hot host's frontier rows are spread over ``fanout``
    partitions instead of one straggler task (AQE can split skewed
    *joins* but not skewed *windows* — SURVEY.md §4.1).
    """
    ord_cols = _ord()
    if conf.salting_enabled and conf.salt_fanout > 1:
        salt = umod_long(F.col("url_hash"), conf.salt_fanout)
        w1 = Window.partitionBy("host", salt).orderBy(*ord_cols)
        allowed = (
            allowed.withColumn("_rn1", F.row_number().over(w1))
            .filter(F.col("_rn1") <= conf.per_host_k)
            .drop("_rn1")
        )
    w2 = Window.partitionBy("host").orderBy(*ord_cols)
    topk = (
        allowed.withColumn("_rn", F.row_number().over(w2))
        .filter(F.col("_rn") <= conf.per_host_k)
        .drop("_rn")
    )
    # O31 global budget. When the per-host cap already bounds the round
    # below K (n_hosts × k ≤ K), the limit is statically a no-op — skip
    # it: for K in the millions Spark plans orderBy+limit as a
    # single-partition GlobalLimit, a pure serial stage. The binding
    # case keeps the sort+limit (exercised by the budget-binding parity
    # test).
    if n_hosts is not None and n_hosts * conf.per_host_k <= conf.round_budget:
        budget = topk
    else:
        budget = topk.orderBy(*ord_cols).limit(conf.round_budget)
    # O27 politeness slots: virtual time within the round, per host
    return budget.withColumn("slot_ms", slots_col())


def slots_col() -> Column:
    """O27 politeness slots: virtual time within the round, per host."""
    w3 = Window.partitionBy("host").orderBy(*_ord())
    return ((F.row_number().over(w3) - F.lit(1)) * F.col("crawl_delay_ms")).cast("long")


def rank_per_host(allowed: DataFrame, conf: CrawlConf, m: int,
                  salted: bool) -> DataFrame:
    """Attach ``_rn`` = exact per-host rank (1-based, total order ORD),
    keeping only rank ≤ m. ``salted`` uses the two-phase skew-safe form
    (phase 1 keeps m rows per (host, salt) — exact because each salt
    retains ≥ m candidates; see ``dequeue``): required over the full
    frontier where a hot host may hold millions of rows; unnecessary
    over the head cache, whose per-host size is capped at m."""
    ord_cols = _ord()
    if salted and conf.salting_enabled and conf.salt_fanout > 1:
        salt = umod_long(F.col("url_hash"), conf.salt_fanout)
        w1 = Window.partitionBy("host", salt).orderBy(*ord_cols)
        allowed = (
            allowed.withColumn("_rn1", F.row_number().over(w1))
            .filter(F.col("_rn1") <= m)
            .drop("_rn1")
        )
    w2 = Window.partitionBy("host").orderBy(*ord_cols)
    return (
        allowed.withColumn("_rn", F.row_number().over(w2))
        .filter(F.col("_rn") <= m)
    )


def split_ranked(ranked: DataFrame, conf: CrawlConf,
                 n_hosts: int) -> tuple[DataFrame, DataFrame]:
    """O26/O31/O27 dequeue over a ``rank_per_host`` frame that also
    yields the next head cache (docs/SEMANTICS.md §6b): the one ranked
    pass serves both the schedule (rank ≤ k, then the global budget)
    and the head survivors (rank ≤ m minus the scheduled rows). The
    scheduled set is bit-identical to ``dequeue``'s — phase-2 top-k of
    a superset that still contains the true top-k is the same top-k.
    Callers cache ``ranked``: both outputs consume it."""
    topk = ranked.filter(F.col("_rn") <= conf.per_host_k)
    if n_hosts * conf.per_host_k <= conf.round_budget:
        # statically non-binding budget (see dequeue): survivors are
        # exactly the rank window (k, m]
        scheduled = topk.drop("_rn")
        survivors = ranked.filter(F.col("_rn") > conf.per_host_k).drop("_rn")
    else:
        scheduled = topk.drop("_rn").orderBy(*_ord()).limit(conf.round_budget)
        # budget may skip arbitrary topk rows — recover survivors
        # exactly as head ∖ scheduled (scheduled ≤ K rows, broadcast)
        survivors = ranked.drop("_rn").join(
            F.broadcast(scheduled.select("url_hash", "url")),
            on=["url_hash", "url"], how="left_anti",
        )
    return scheduled.withColumn("slot_ms", slots_col()), survivors


SEQ_KEY = ["slot_ms", "host_bucket", "host", "url_hash", "url"]


SEQ_GROUP = ["slot_ms", "host_bucket"]  # prefix of SEQ_KEY ⇒ order-compatible


def with_fetch_sequence(scheduled: DataFrame, round_no: int, seq_offset: int,
                        small_budget: bool = False) -> DataFrame:
    """O29: total fetch order (slot_ms, host_bucket, host, url_hash, url).

    ``small_budget`` (round 8, guide §1.2 "remove unnecessary passes"):
    when the caller's round budget statically bounds the schedule to a
    few thousand rows, the group prefix-sum below spends three extra
    plan stages (counts aggregate + offsets window + broadcast join —
    with AQE, three serialized scheduler jobs per round) to
    parallelize a sort that fits trivially in one task. The small
    branch ranks the whole schedule in a single-partition window over
    the SAME total key, producing identical seq values (row_number
    over a total order ≡ group prefix-sum over its prefix groups);
    the engine gates it on conf.round_budget ≤ ID_PUSHDOWN_CAP, the
    same static bound the schedule-metadata collect uses.

    Distributed global ranking as a deterministic group prefix-sum:
    rows are grouped on (slot_ms, host_bucket) — a *prefix* of the
    total key, so every row of an earlier group precedes every row of
    a later group — ranked within the group by the key's remainder,
    and shifted by the cumulative count of earlier groups. Every
    boundary is a pure function of data values: unlike
    ``repartitionByRange`` (whose sampled boundaries vary per job, so
    reading the partitioning twice can mis-align offsets and ranks),
    this cannot produce duplicate or gapped seq at any scale or
    parallelism (T4 guards this).

    Cost: one hash shuffle of ``scheduled`` on the group key; the
    offsets side is |distinct (slot_ms, host_bucket)| rows — in a
    politeness-sloted schedule that is O(per_host_k × #crawl_delays ×
    B) ≪ K, so it broadcasts. Group sizes are ~|hosts scheduled at
    that slot| / B — naturally balanced, no hot key.
    """
    if small_budget:
        w_all = Window.partitionBy(F.lit(0)).orderBy(*SEQ_KEY)
        return (
            scheduled.withColumn(
                "seq",
                (F.row_number().over(w_all) - 1 + F.lit(seq_offset))
                .cast("long"),
            )
            .withColumn("round", F.lit(round_no))
        )
    counts = scheduled.groupBy(*SEQ_GROUP).count()
    # single-partition window — intentional: its input is the AGGREGATED
    # counts side, |distinct (slot_ms, host_bucket)| ≤ per_host_k ×
    # |distinct crawl_delay values| × B rows (≈ 64k worst case at bench
    # conf), never the K scheduled rows. partitionBy(lit(0)) is
    # plan-identical (hashpartitioning on a constant = one partition,
    # by construction) but keeps WindowExec's "No Partition Defined"
    # WARN wall out of the official bench artifact (VERDICT r7 #5). If
    # per-host crawl_delay overrides ever multiply distinct slot values
    # past ~10^6, replace with a two-level prefix-sum (per-slot_ms
    # partial sums, then a slot_ms-level scan).
    w_off = Window.partitionBy(F.lit(0)).orderBy(*SEQ_GROUP).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.select(
        *SEQ_GROUP,
        F.coalesce(F.sum("count").over(w_off), F.lit(0)).alias("_goff"),
    )
    w = Window.partitionBy(*SEQ_GROUP).orderBy("host", "url_hash", "url")
    return (
        scheduled.join(F.broadcast(offsets), on=SEQ_GROUP, how="inner")
        .withColumn(
            "seq",
            (F.row_number().over(w) - 1 + F.col("_goff") + F.lit(seq_offset))
            .cast("long"),
        )
        .drop("_goff")
        .withColumn("round", F.lit(round_no))
    )


# ------------------------------------------------------------ O39: discovery
def discover_links(fetched: DataFrame, hosts: DataFrame, conf: CrawlConf, H: int,
                   round_ts_micros: int) -> DataFrame:
    """Deterministic outlink expansion (SEMANTICS.md §4), fully JVM-side.

    deg ≤ 5, so the five candidate structs are built with *literal*
    shift amounts and sliced to deg — keeps everything inside
    whole-stage codegen (no UDF, no expr-string shifts). The hosts dim
    (≤ 10^4 rows) is broadcast for the pages_i lookup. H = |hosts|.
    """
    k = F.col("url_hash")
    deg = (umod_long(k, 5) + F.lit(1)).cast("int")
    link_structs = [
        F.struct(
            F.lit(t).alias("t"),
            umod_long(ushift_long(k, 8 * t), H).cast("int").alias("host_idx"),
            ushift_long(k, 4 * t).alias("jraw"),
        )
        for t in range(5)
    ]
    parents = fetched.select(
        F.col("url").alias("src_url"),
        F.col("url_hash").alias("src_hash"),
        F.col("depth").alias("src_depth"),
        F.col("slot_ms"),
        F.slice(F.array(*link_structs), 1, deg).alias("links"),
    ).filter(F.col("src_depth") + 1 <= F.lit(conf.max_depth))  # O9 scope
    exploded = parents.select(
        "src_url", "src_hash", "src_depth", "slot_ms",
        F.posexplode("links").alias("t", "link"),
    )
    joined = exploded.withColumn("host_idx", F.col("link.host_idx")).join(
        F.broadcast(
            hosts.select(
                F.col("host_index").cast("int").alias("host_idx"),
                F.col("pages"),
                F.col("host").alias("target_host"),
            )
        ),
        on="host_idx",
        how="inner",
    )
    page = umod_long_col(F.col("link.jraw"), F.col("pages"))
    return joined.select(
        F.concat(
            F.lit("http://"), F.col("target_host"), F.lit("/p/"), page.cast("string")
        ).alias("url"),
        (F.col("src_depth") + 1).cast("int").alias("depth"),
        F.timestamp_micros(
            F.lit(round_ts_micros) + F.col("slot_ms") * F.lit(1000)
        ).alias("discover_ts"),
        F.col("src_hash"),
        F.col("t"),
    )


def umod_long_col(col: Column, m: Column) -> Column:
    """Unsigned k_u % m with a *column* modulus (SEMANTICS.md §1; valid
    for m < 2^31 — pages counts satisfy this by construction)."""
    hi = F.shiftrightunsigned(col, 32)
    lo = col.bitwiseAND(F.lit((1 << 32) - 1))
    return F.pmod(hi * F.pmod(F.lit(1 << 32), m) + lo, m)


def dedup_in_round(candidates: DataFrame) -> DataFrame:
    """O28: deterministic keep-one per canonical url — smallest
    (discover_ts, src_hash, t); never bare dropDuplicates."""
    w = Window.partitionBy("url").orderBy("discover_ts", "src_hash", "t")
    return (
        candidates.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "src_hash", "t")
    )


def as_frontier_rows(fresh: DataFrame, conf: CrawlConf) -> DataFrame:
    """Attach queue keys to fresh candidates (priority per SEMANTICS §2)."""
    df = with_url_derivations(fresh, conf)
    return df.withColumn("priority", priority_of(F.col("url"))).select(
        "url", "url_hash", "host", "host_bucket", "priority",
        "discover_ts", "depth", "image_id",
    )
