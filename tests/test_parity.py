"""T2/T3: exact crawl-ordering + seen-set parity vs the oracle
(BASELINE.json:6; SURVEY.md §5.3), plus per-row fetch invariants."""

import pytest

from ccrawler_spark import testing as tt


@pytest.fixture(scope="module")
def tiny_run(spark, tiny_fixtures, tmp_path_factory):
    out = tmp_path_factory.mktemp("tiny_store")
    engine, store, stats = tt.engine_run(spark, "tiny", str(out), rounds=3)
    oracle = tt.oracle_run("tiny", rounds=3)
    return store, oracle, stats


def test_fetch_ordering_exact(tiny_run):
    """The fetch_log sequence equals the oracle's, element by element."""
    store, oracle, _ = tiny_run
    eng = tt.engine_fetch_sequence(store)
    orc = tt.oracle_fetch_sequence(oracle)
    assert len(eng) == len(orc)
    for e, o in zip(eng, orc):
        assert e == o, f"engine {e} != oracle {o}"


def test_seen_set_exact(tiny_run):
    store, oracle, _ = tiny_run
    assert tt.engine_seen(store, store.latest()) == oracle.seen


def test_frontier_contents_per_round(tiny_run):
    store, oracle, _ = tiny_run
    for r in range(0, 4):
        eng = tt.engine_frontier_urls(store, r)
        orc = {row.url for row in oracle.frontier_after[r]}
        assert eng == orc, f"frontier mismatch after round {r}"


def test_denied_counts(tiny_run):
    store, oracle, stats = tiny_run
    assert sum(s.denied for s in stats) == len(oracle.denied)


def test_per_row_fetch_invariants(tiny_run):
    """T3 (BASELINE.json:15): every fetched row decodes, matches the
    reference pixels (exact / PSNR>=40), caption and phash agree."""
    store, _, _ = tiny_run
    rows = store.read_fetch_log().collect()
    assert rows
    for r in rows:
        assert r["fetch_ok"], r["url"]
        assert r["pixels_ok"], r["url"]
        assert r["caption_ok"], r["url"]
        assert r["phash_ok"], r["url"]
        assert r["psnr_db"] >= 40.0


def test_lineage_offsets_match_frontier(tiny_run):
    """Manifest per-partition lineage (frontier offsets) must agree with
    the actual composed frontier (BASELINE.json:6 resumability)."""
    store, _, _ = tiny_run
    n = store.latest()
    m = store.read_manifest(n)
    actual = {
        int(r["host_bucket"]): int(r["count"])
        for r in store.read_frontier(n).groupBy("host_bucket").count().collect()
    }
    manifest = {
        int(b): v["frontier_offset"]
        for b, v in m["lineage"].items()
        if v["frontier_offset"] != 0
    }
    assert manifest == actual


def test_budget_binding_parity(spark, tiny_fixtures, tmp_path_factory):
    """O31 with the global budget actually binding (round_budget below
    hosts x per_host_k, so the orderBy+limit path runs): fetch ordering
    must still match the oracle exactly."""
    import dataclasses

    from ccrawler_spark.conf import TINY

    conf = dataclasses.replace(TINY, round_budget=7)
    out = tmp_path_factory.mktemp("budget_store")
    _, store, _ = tt.engine_run(spark, "tiny", str(out), rounds=3, conf=conf)
    oracle = tt.oracle_run("tiny", rounds=3, conf=conf)
    assert tt.engine_fetch_sequence(store) == tt.oracle_fetch_sequence(oracle)
    assert tt.engine_seen(store, store.latest()) == oracle.seen
