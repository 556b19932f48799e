"""snapshot_frontier Python data source (SURVEY.md §4.1): manifest-level
file planning + pushed-filter bucket pruning + task-local sequence-aware
equality deletes must reproduce the engine's native merge-on-read
composition byte-for-byte — including the recrawl add→remove→re-add
lifecycle across compaction."""

import dataclasses

import pytest
from pyspark.sql import functions as F

from ccrawler_spark import testing as tt
from ccrawler_spark.conf import TINY
from ccrawler_spark.io.datasource import (
    SnapshotFrontierDataSource,
    SnapshotFrontierReader,
)
from ccrawler_spark.scheduler.engine import FRONTIER_COLS

ROUNDS = 4
RECRAWL = dataclasses.replace(TINY, recrawl_interval_micros=150_000_000)


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(SnapshotFrontierDataSource)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    return spark


def _rows(df):
    return sorted(
        tuple(r) for r in df.select(*FRONTIER_COLS).collect()
    )


@pytest.fixture(scope="module", params=["plain", "recrawl"])
def run(registered, tiny_fixtures, tmp_path_factory, request):
    conf = TINY if request.param == "plain" else RECRAWL
    out = tmp_path_factory.mktemp(f"ds_{request.param}")
    _, store, _ = tt.engine_run(registered, "tiny", str(out), rounds=ROUNDS,
                                conf=conf)
    # threshold low enough that the recrawl variant compacts mid-run
    return registered, store


def test_matches_native_composition_every_snapshot(run):
    spark, store = run
    for n in range(ROUNDS + 1):
        via_ds = spark.read.format("snapshot_frontier").option(
            "path", str(store.root)
        ).option("snapshot", n).load()
        assert _rows(via_ds) == _rows(store.read_frontier(n)), f"snapshot {n}"


def test_default_snapshot_is_latest(run):
    spark, store = run
    via_ds = spark.read.format("snapshot_frontier").option(
        "path", str(store.root)
    ).load()
    assert _rows(via_ds) == _rows(store.read_frontier(store.latest()))


def test_bucket_filter_correct_and_pruned(run):
    spark, store = run
    n = store.latest()
    native = store.read_frontier(n)
    bucket = native.select("host_bucket").first()["host_bucket"]
    via_ds = spark.read.format("snapshot_frontier").option(
        "path", str(store.root)
    ).option("snapshot", n).load().filter(F.col("host_bucket") == bucket)
    assert _rows(via_ds) == _rows(
        native.filter(F.col("host_bucket") == bucket)
    )
    # planning-level proof: the pushed filter prunes partitions
    from pyspark.sql.datasource import EqualTo

    reader = SnapshotFrontierReader(str(store.root), n)
    all_files = sum(len(p.files) for p in reader.partitions())
    unhandled = list(reader.pushFilters([EqualTo(("host_bucket",), bucket)]))
    assert unhandled == []  # fully handled by pruning
    pruned = reader.partitions()
    pruned_files = [f for p in pruned for f in p.files]
    assert 0 < len(pruned_files) < all_files
    assert all(b == bucket for (_, b, _) in pruned_files)
