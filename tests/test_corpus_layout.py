"""Fetch-path corpus layout (io/corpus_layout): engine parity with the
flat corpus, plan-level pushdown proof, and metadata-level row-group
skipping proof."""

import pathlib
import tempfile

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def layout_dir(spark, tiny_fixtures):
    from ccrawler_spark.fixtures.gen import ensure_corpus_layout

    return str(ensure_corpus_layout(spark, tiny_fixtures))


def _run(spark, fdir, rounds=3, corpus_layout=None):
    from ccrawler_spark.scheduler.cli import make_engine

    out = tempfile.mkdtemp(prefix="layout-parity-")
    engine, store = make_engine(
        spark, str(fdir), out, size="tiny", corpus_layout=corpus_layout
    )
    engine.bootstrap(spark.read.parquet(f"{fdir}/seeds.parquet"))
    for r in range(1, rounds + 1):
        engine.run_round(r)
    return store


def _sorted_rows(df):
    return [tuple(r) for r in df.orderBy(*df.columns).collect()]


def test_engine_parity_layout_on_off(spark, tiny_fixtures, layout_dir):
    """The pruned fetch path is purely physical: fetch_log and frontier
    must be byte-identical with and without the layout."""
    s_flat = _run(spark, tiny_fixtures)
    s_lay = _run(spark, tiny_fixtures, corpus_layout=layout_dir)
    n = s_flat.latest()
    assert s_lay.latest() == n
    assert _sorted_rows(s_flat.read_fetch_log(n)) == _sorted_rows(
        s_lay.read_fetch_log(n)
    )
    assert _sorted_rows(s_flat.read_frontier(n)) == _sorted_rows(
        s_lay.read_frontier(n)
    )


def test_pruned_scan_pushes_filters(spark, layout_dir):
    """Plan proof: host_bucket hits PartitionFilters (whole directories
    pruned), host_key/image_id IN lists hit PushedFilters (row-group
    skipping via the sorted layout's min/max stats)."""
    from ccrawler_spark.io.corpus_layout import pruned_corpus

    spark.conf.set("spark.sql.parquet.pushdown.inFilterThreshold", "4096")
    hosts = [f"h{i}.example" for i in range(12)]  # > default threshold 10
    df = pruned_corpus(spark, layout_dir, buckets=[1, 2, 3], hosts=hosts)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [host_bucket" in plan
    assert "In(host_key" in plan.split("PushedFilters")[1]
    # the id pushdown, on its own scan (the plan string truncates the
    # filter list, so both INs are not visible in one dump)
    ids = [f"{i:016x}" for i in range(12)]
    df2 = pruned_corpus(spark, layout_dir, ids=ids)
    plan2 = df2._jdf.queryExecution().executedPlan().toString()
    assert "In(image_id" in plan2.split("PushedFilters")[1]


def test_pruned_values_match_flat(spark, tiny_fixtures, layout_dir):
    """Value proof: pruning by (bucket, host) returns exactly the flat
    corpus rows of those hosts."""
    from ccrawler_spark.functions.hashing import umod, xxhash64_str
    from ccrawler_spark.fixtures.gen import universe_urls_df
    from ccrawler_spark.io.corpus_layout import pruned_corpus

    hosts = ["h0.example", "h7.example"]
    buckets = {umod(xxhash64_str(h), 64) for h in hosts}
    got = pruned_corpus(
        spark, layout_dir, buckets=buckets, hosts=hosts
    ).select("image_id", "fmt", "phash")
    url_map = universe_urls_df(spark, str(tiny_fixtures))
    from ccrawler_spark.functions.spark_exprs import image_id_of

    want_ids = url_map.filter(F.col("host").isin(hosts)).select(
        image_id_of(F.col("url")).alias("image_id")
    )
    flat = spark.read.parquet(f"{tiny_fixtures}/corpus.parquet")
    want = flat.join(want_ids, on="image_id").select(
        "image_id", "fmt", "phash"
    )
    assert _sorted_rows(got) == _sorted_rows(want)


def test_row_group_stats_enable_skipping(spark, tiny_fixtures):
    """Metadata proof: with the clustered sort order, a single host's
    rows concentrate in few row groups — the [min,max] host_key stats
    of most groups exclude it, so a pushed host_key filter skips them.
    The flat corpus (hash order) has no such structure."""
    import pyarrow.parquet as pq

    from ccrawler_spark.fixtures.gen import universe_urls_df
    from ccrawler_spark.functions.spark_exprs import image_id_of
    from ccrawler_spark.io.corpus_layout import (
        host_key_py, write_corpus_layout,
    )

    out = tempfile.mkdtemp(prefix="layout-rg-") + "/layout"
    corpus = spark.read.parquet(f"{tiny_fixtures}/corpus.parquet")
    url_map = universe_urls_df(spark, str(tiny_fixtures)).select(
        image_id_of(F.col("url")).alias("image_id"), "host"
    )
    # tiny rows → tiny row groups so the 1000-row corpus has many
    write_corpus_layout(corpus, url_map, out, row_group_bytes=16 * 1024)
    total, touched = 0, 0
    target = host_key_py("h19.example", 64)  # a tail host, few pages
    for pf in pathlib.Path(out).glob("host_bucket=*/*.parquet"):
        md = pq.ParquetFile(pf).metadata
        for rg in range(md.num_row_groups):
            col = next(
                md.row_group(rg).column(i)
                for i in range(md.row_group(rg).num_columns)
                if md.row_group(rg).column(i).path_in_schema == "host_key"
            )
            total += 1
            st = col.statistics
            if st.min <= target <= st.max:
                touched += 1
    assert total >= 8  # the knob actually produced many row groups
    assert touched < total  # stats exclude the host from most groups


def test_layout_bucket_mismatch_fails_loudly(spark, tiny_fixtures,
                                             layout_dir):
    """ADVICE r4 (medium): a layout written with a different bucket
    count than conf.host_buckets must be rejected at engine init —
    the mismatched partition filter would otherwise silently drop
    scheduled corpus rows (fetches would look like legitimate misses)."""
    import json
    import shutil

    from ccrawler_spark.conf import CrawlConf
    from ccrawler_spark.io.corpus_layout import META_FILE, read_layout_meta
    from ccrawler_spark.scheduler.cli import make_engine

    meta = read_layout_meta(layout_dir)
    assert meta is not None and meta["buckets"] == 64

    # engine conf with host_buckets != layout buckets → loud failure
    out = tempfile.mkdtemp(prefix="layout-mismatch-")
    with pytest.raises(ValueError, match="host_buckets=32"):
        make_engine(
            spark, str(tiny_fixtures), out,
            conf=CrawlConf(host_buckets=32), corpus_layout=layout_dir,
        )

    # a layout with no metadata sidecar is unverifiable → also loud
    legacy = tempfile.mkdtemp(prefix="layout-legacy-") + "/layout"
    shutil.copytree(layout_dir, legacy)
    (pathlib.Path(legacy) / META_FILE).unlink()
    with pytest.raises(ValueError, match="no _layout_meta"):
        make_engine(
            spark, str(tiny_fixtures), out, size="tiny",
            corpus_layout=legacy,
        )

    # matching bucket count passes (and json is well-formed)
    assert json.loads(
        (pathlib.Path(layout_dir) / META_FILE).read_text()
    )["cluster_keys"] == ["host_bucket", "host_key.bp2", "image_id"]


def test_engine_parity_layout_recrawl(spark, tiny_fixtures, layout_dir):
    """Recrawl mode re-schedules fetched URLs (due predicate); the
    pruned fetch path must stay byte-neutral there too."""
    from ccrawler_spark.conf import CrawlConf
    from ccrawler_spark.scheduler.cli import make_engine

    conf = CrawlConf(round_budget=50, recrawl_interval_micros=90_000_000)
    stores = []
    for lay in (None, layout_dir):
        out = tempfile.mkdtemp(prefix="layout-recrawl-")
        engine, store = make_engine(
            spark, str(tiny_fixtures), out, conf=conf, corpus_layout=lay
        )
        engine.bootstrap(spark.read.parquet(f"{tiny_fixtures}/seeds.parquet"))
        for r in range(1, 4):
            engine.run_round(r)
        stores.append(store)
    flat, lay = stores
    n = flat.latest()
    assert lay.latest() == n
    assert _sorted_rows(flat.read_fetch_log(n)) == _sorted_rows(
        lay.read_fetch_log(n)
    )
    assert _sorted_rows(flat.read_frontier(n)) == _sorted_rows(
        lay.read_frontier(n)
    )


def test_wide_host_split_pruning(spark, tiny_fixtures):
    """r5 two-scan split: the layout metadata records wide hosts (runs
    spanning ≥ WIDE_MIN_GROUPS row groups); a schedule whose full id
    set exceeds the pushdown cap can still push the wide hosts' ids on
    a second scan. Values must equal the flat corpus rows of the
    scheduled hosts (with the wide host restricted to scheduled ids)."""
    from ccrawler_spark.fixtures.gen import universe_urls_df
    from ccrawler_spark.functions.hashing import umod, xxhash64_str
    from ccrawler_spark.functions.spark_exprs import image_id_of
    from ccrawler_spark.io.corpus_layout import (
        host_key_py, pruned_corpus_split, read_layout_meta,
        split_hosts_by_width, write_corpus_layout,
    )

    out = tempfile.mkdtemp(prefix="layout-wide-") + "/layout"
    corpus = spark.read.parquet(f"{tiny_fixtures}/corpus.parquet")
    url_map = universe_urls_df(spark, str(tiny_fixtures)).select(
        image_id_of(F.col("url")).alias("image_id"), "host"
    )
    # tiny row groups -> the Zipf-head host h0 spans many groups
    write_corpus_layout(corpus, url_map, out, row_group_bytes=8 * 1024)
    meta = read_layout_meta(out)
    assert meta["wide_host_keys"], "head host should be wide at 8KiB groups"
    assert host_key_py("h0.example", 64) in meta["wide_host_keys"]

    sched_hosts = {"h0.example", "h5.example", "h19.example"}
    narrow, wide = split_hosts_by_width(meta, sched_hosts)
    assert "h0.example" in wide and "h19.example" in narrow

    # schedule: 5 specific ids of the wide host + all of the narrow ones
    flat = spark.read.parquet(f"{tiny_fixtures}/corpus.parquet")
    hosted = flat.join(url_map, on="image_id")
    wide_ids = {
        r["image_id"]
        for r in hosted.filter(F.col("host").isin(sorted(wide)))
        .select("image_id").limit(5).collect()
    }
    got = pruned_corpus_split(
        spark, out, narrow_hosts=narrow, wide_hosts=wide,
        wide_ids=wide_ids,
        buckets_of=lambda h: umod(xxhash64_str(h), 64),
    ).select("image_id", "fmt", "phash")
    want = hosted.filter(
        F.col("host").isin(sorted(narrow))
        | F.col("image_id").isin(sorted(wide_ids))
    ).select("image_id", "fmt", "phash")
    assert _sorted_rows(got) == _sorted_rows(want)
    # and the wide scan's id filter actually restricted the wide host
    n_wide_rows = got.join(
        url_map.filter(F.col("host").isin(sorted(wide))), on="image_id"
    ).count()
    assert n_wide_rows == len(wide_ids)


def test_sched_metadata_plans_wide_split(spark, tiny_fixtures, layout_dir):
    """Engine-side split planning (_sched_metadata): with a large-round
    conf (budget > ID_PUSHDOWN_CAP) and a host-only pushdown, wide
    hosts from the layout metadata get their ids collected (free-bound
    gated) and the plan comes back as the two-scan split dict."""
    import json

    from ccrawler_spark.conf import CrawlConf
    from ccrawler_spark.io.corpus_layout import (
        META_FILE, host_key_py, read_layout_meta,
    )
    from ccrawler_spark.scheduler.cli import make_engine

    # force h0 to be "wide" in a copy of the layout's metadata
    import shutil

    lay = tempfile.mkdtemp(prefix="layout-splitplan-") + "/layout"
    shutil.copytree(layout_dir, lay)
    meta = read_layout_meta(lay)
    meta["wide_host_keys"] = [host_key_py("h0.example", 64)]
    (pathlib.Path(lay) / META_FILE).write_text(json.dumps(meta))

    out = tempfile.mkdtemp(prefix="splitplan-")
    conf = CrawlConf(round_budget=8192, per_host_k=64)
    engine, _ = make_engine(spark, str(tiny_fixtures), out, conf=conf,
                            corpus_layout=lay)
    # pin the JVM-split regime: with the set-based arrow scan enabled
    # (r6 default) this schedule size would plan the arrow path instead
    engine.arrow_pushdown_cap = 0
    # > ID_PUSHDOWN_CAP total rows so the full id set cannot push, but
    # the wide host's share can (free bound |wide| x per_host_k)
    rows = [
        (f"h{1 + i % 100}.example", f"{i:016x}", i % 64)
        for i in range(4100)
    ] + [("h0.example", f"aa{j:014x}", 7) for j in range(50)]
    sched = spark.createDataFrame(
        rows, "host string, image_id string, host_bucket int",
    )
    counts, push = engine._sched_metadata(sched)
    assert sum(counts.values()) == 4150
    assert "narrow" in push, f"expected split plan, got {push}"
    assert push["wide"] == {"h0.example"}
    assert len(push["wide_ids"]) == 50
    assert "h1.example" in push["narrow"] and "h99.example" in push["narrow"]
    # and the corpus side builds (plan only) without error
    df = engine._corpus_side(counts, push)
    assert "image_id" in df.columns

    # free bound violated (too many wide hosts x per_host_k) -> no split
    meta["wide_host_keys"] = [
        host_key_py(f"h{i}.example", 64) for i in range(200)
    ]
    (pathlib.Path(lay) / META_FILE).write_text(json.dumps(meta))
    big = spark.createDataFrame(
        [(f"h{i % 200}.example", f"{i:016x}", i % 64) for i in range(4200)],
        "host string, image_id string, host_bucket int",
    )
    conf2 = CrawlConf(round_budget=8192, per_host_k=64)
    engine2, _ = make_engine(spark, str(tiny_fixtures), out, conf=conf2,
                             corpus_layout=lay)
    engine2.arrow_pushdown_cap = 0
    _, push2 = engine2._sched_metadata(big)
    # host-only plan: 200 wide hosts x 64 = 12,800 ids breaks the bound
    assert push2 is not None and "narrow" not in push2
    assert push2["ids"] is None and len(push2["hosts"]) == 200


def test_arrow_scan_matches_jvm_and_flat(spark, tiny_fixtures, layout_dir):
    """r6 set-based reader (io/arrow_scan): for the same (hosts, ids)
    predicates, pruned_corpus_arrow must return exactly the JVM pruned
    scan's rows — and both must equal the flat corpus filtered by id —
    in every mode (hosts+ids, hosts-only, ids-only)."""
    from ccrawler_spark.fixtures.gen import universe_urls_df
    from ccrawler_spark.functions.spark_exprs import image_id_of
    from ccrawler_spark.io.arrow_scan import pruned_corpus_arrow
    from ccrawler_spark.io.corpus_layout import pruned_corpus

    url_map = universe_urls_df(spark, str(tiny_fixtures)).select(
        image_id_of(F.col("url")).alias("image_id"), "host"
    )
    hosts = {"h0.example", "h5.example", "h19.example"}
    ids = {
        r["image_id"]
        for r in url_map.filter(F.col("host").isin(sorted(hosts)))
        .select("image_id").limit(40).collect()
    }
    cols = ["image_id", "fmt", "phash", "host_bucket"]
    for kw in ({"hosts": hosts, "ids": ids}, {"hosts": hosts},
               {"ids": ids}):
        a = pruned_corpus_arrow(spark, layout_dir, **kw).select(*cols)
        j = pruned_corpus(spark, layout_dir, **kw).select(*cols)
        assert _sorted_rows(a) == _sorted_rows(j), f"mode {set(kw)}"
    # host-scoped mode (the engine's arrow plan): the (host → ids)
    # pairing must return exactly the global hosts+ids rows — scoping
    # only sharpens row-group SKIPPING, never the row set
    pair_rows = url_map.filter(
        F.col("host").isin(sorted(hosts))
        & F.col("image_id").isin(sorted(ids))
    ).collect()
    h_ids: dict[str, set] = {}
    for r in pair_rows:
        h_ids.setdefault(r["host"], set()).add(r["image_id"])
    a = pruned_corpus_arrow(spark, layout_dir, host_ids=h_ids).select(*cols)
    j = pruned_corpus(spark, layout_dir, hosts=hosts, ids=ids).select(*cols)
    assert _sorted_rows(a) == _sorted_rows(j), "host-scoped mode"
    # and the schema is interchangeable with the JVM layout scan
    assert (
        pruned_corpus_arrow(spark, layout_dir, hosts=hosts).schema
        == spark.read.parquet(layout_dir).schema
    )
    # ids-only mode equals the flat corpus filtered by id (end-to-end
    # value proof against the un-laid-out source of truth)
    flat = spark.read.parquet(f"{tiny_fixtures}/corpus.parquet")
    got = pruned_corpus_arrow(spark, layout_dir, ids=ids).select(
        "image_id", "fmt", "phash"
    )
    want = flat.filter(F.col("image_id").isin(sorted(ids))).select(
        "image_id", "fmt", "phash"
    )
    assert _sorted_rows(got) == _sorted_rows(want)


def test_sched_metadata_plans_arrow_scan(spark, tiny_fixtures, layout_dir):
    """Engine planning (r6): a schedule whose id set exceeds
    ID_PUSHDOWN_CAP but fits the arrow cap plans the set-based scan —
    full host AND id sets, no Or-tree, no split."""
    from ccrawler_spark.conf import CrawlConf
    from ccrawler_spark.scheduler.cli import make_engine

    out = tempfile.mkdtemp(prefix="arrowplan-")
    conf = CrawlConf(round_budget=8192, per_host_k=64)
    engine, _ = make_engine(spark, str(tiny_fixtures), out, conf=conf,
                            corpus_layout=layout_dir)
    sched = spark.createDataFrame(
        [(f"h{i % 100}.example", f"{i:016x}", i % 64) for i in range(4200)],
        "host string, image_id string, host_bucket int",
    )
    counts, push = engine._sched_metadata(sched)
    assert sum(counts.values()) == 4200
    assert push is not None and push.get("arrow") is True
    assert len(push["ids"]) == 4200 and len(push["hosts"]) == 100
    # the host-scoped pairing rides along for admits_scoped
    assert set(push["host_ids"]) == push["hosts"]
    assert sum(len(v) for v in push["host_ids"].values()) == 4200
    df = engine._corpus_side(counts, push)
    assert "image_id" in df.columns and "host_bucket" in df.columns
    # above the arrow cap the plan falls back to the JVM host-only path
    engine.arrow_pushdown_cap = 4100
    _, push2 = engine._sched_metadata(sched)
    assert push2 is not None and not push2.get("arrow")


def test_engine_parity_arrow_path(spark, tiny_fixtures, layout_dir,
                                  monkeypatch):
    """End-to-end byte equality through the arrow fetch path: shrink
    ID_PUSHDOWN_CAP so every round's schedule overflows the JVM cap and
    routes through pruned_corpus_arrow, then compare fetch_log and
    frontier against the flat-corpus run."""
    from ccrawler_spark.io import corpus_layout as cl

    monkeypatch.setattr(cl, "ID_PUSHDOWN_CAP", 4)
    s_flat = _run(spark, tiny_fixtures)
    s_arrow = _run(spark, tiny_fixtures, corpus_layout=layout_dir)
    n = s_flat.latest()
    assert s_arrow.latest() == n
    assert _sorted_rows(s_flat.read_fetch_log(n)) == _sorted_rows(
        s_arrow.read_fetch_log(n)
    )
    assert _sorted_rows(s_flat.read_frontier(n)) == _sorted_rows(
        s_arrow.read_frontier(n)
    )


def test_arrow_scan_soundness_randomized(spark, tiny_fixtures, layout_dir):
    """Property test for the admission logic in io/arrow_scan (bisect
    over footer [min,max] + host-scoped id sets): for ANY schedule
    assembled from real (host → its ids) pairings — plus phantom hosts
    and ids that exist nowhere, hosts with empty id sets, and tiny or
    empty schedules — the pruned arrow read must equal the flat corpus
    filtered by the same id set. Row-group skipping may only remove
    groups that cannot match; hypothesis hunts the off-by-one bisect /
    range-edge cases a fixed schedule would never hit."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from ccrawler_spark.fixtures.gen import universe_urls_df
    from ccrawler_spark.functions.spark_exprs import image_id_of
    from ccrawler_spark.io.arrow_scan import pruned_corpus_arrow

    url_rows = universe_urls_df(spark, str(tiny_fixtures)).select(
        image_id_of(F.col("url")).alias("image_id"), "host"
    ).collect()
    by_host: dict[str, list] = {}
    for r in url_rows:
        by_host.setdefault(r["host"], []).append(r["image_id"])
    hosts_all = sorted(by_host)
    flat = spark.read.parquet(f"{tiny_fixtures}/corpus.parquet")

    def rows(df, ids):
        return sorted(
            tuple(r) for r in df.filter(
                F.col("image_id").isin(sorted(ids)) if ids
                else F.lit(False)
            ).select("image_id", "fmt", "phash").collect()
        )

    @settings(max_examples=8, deadline=None,
              suppress_health_check=list(HealthCheck))
    @given(data=st.data())
    def prop(data):
        picked = data.draw(st.lists(
            st.sampled_from(hosts_all), max_size=6, unique=True))
        sched: dict[str, set] = {}
        all_ids: set = set()
        for h in picked:
            ids = set(data.draw(st.lists(
                st.sampled_from(by_host[h]), max_size=8, unique=True)))
            sched[h] = ids
            all_ids |= ids
        # phantom host (bucket may not even have files) + phantom ids:
        # must never admit anything extra, never crash
        if data.draw(st.booleans()):
            sched["no-such-host.invalid"] = {"ffffffffffffffff"}
        if sched and data.draw(st.booleans()):
            k = data.draw(st.sampled_from(sorted(sched)))
            sched[k] = set(sched[k]) | {"0000000000000000"}
        got = sorted(
            tuple(r)
            for r in pruned_corpus_arrow(
                spark, layout_dir, host_ids=sched
            ).select("image_id", "fmt", "phash").collect()
        )
        assert got == rows(flat, all_ids)

    prop()


def test_arrow_scan_statless_footers_admit_everything(spark, tmp_path):
    """VERDICT r6 optional #7: ``admits()``/``admits_scoped()`` must
    KEEP row groups whose column chunks carry no min/max statistics (a
    writer may disable or truncate them) — correctness then rests on
    the residual ``is_in`` filter alone. Hand-builds a layout with
    (a) a file with NO statistics at all and (b) a file with host_key
    stats but no image_id stats (pins the partial-stats branch), three
    rows per group: nothing may be wrongly skipped, and the returned
    rows are exactly the scheduled ids."""
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ccrawler_spark.io.arrow_scan import pruned_corpus_arrow
    from ccrawler_spark.io.corpus_layout import META_FILE, host_key_py

    buckets = 64
    host = "h0.example"
    k = host_key_py(host, buckets)
    bk = k >> 57
    root = tmp_path / "statless_layout"
    d = root / f"host_bucket={bk}"
    d.mkdir(parents=True)

    def mk(ids, fname, stats):
        tbl = pa.table({
            "image_id": pa.array(ids, pa.string()),
            "fmt": pa.array(["png"] * len(ids), pa.string()),
            "host_key": pa.array([k] * len(ids), pa.int64()),
        })
        pq.write_table(tbl, d / fname, write_statistics=stats,
                       row_group_size=3)

    ids_a = [f"a{i:015x}" for i in range(9)]
    ids_b = [f"b{i:015x}" for i in range(9)]
    mk(ids_a, "part-0.parquet", False)           # no stats anywhere
    mk(ids_b, "part-1.parquet", ["host_key"])    # id stats absent only
    (root / META_FILE).write_text(json.dumps({"buckets": buckets}))

    want = {ids_a[1], ids_a[7], ids_b[4]}
    got = pruned_corpus_arrow(
        spark, str(root), host_ids={host: want}
    ).select("image_id", "fmt", "host_bucket").collect()
    assert sorted(r["image_id"] for r in got) == sorted(want)
    assert all(r["host_bucket"] == bk and r["fmt"] == "png" for r in got)
