"""Shared helpers for parity tests and the bench: run the engine and the
oracle on the same fixture and hand back comparable structures."""

from __future__ import annotations

import duckdb

from ccrawler_spark import conf as confmod
from ccrawler_spark.fixtures.gen import SIZES, ensure_fixtures
from ccrawler_spark.oracle.ccrawler_sim import OracleResult, run_oracle

SIZE_CONF = {"tiny": confmod.TINY, "small": confmod.SMALL, "bench": confmod.BENCH}


def load_fixture_meta(size: str):
    fdir = ensure_fixtures(size)
    con = duckdb.connect()
    seeds = [
        r[0]
        for r in con.execute(f"SELECT url FROM '{fdir}/seeds.parquet'").fetchall()
    ]
    hp = con.execute(
        f"SELECT host, pages FROM '{fdir}/hosts.parquet' ORDER BY host_index"
    ).fetchall()
    con.close()
    return fdir, seeds, [h for h, _ in hp], [p for _, p in hp]


def oracle_run(size: str, rounds: int | None = None, conf=None) -> OracleResult:
    _, seeds, hosts, pages = load_fixture_meta(size)
    rounds = rounds if rounds is not None else SIZES[size][3]
    return run_oracle(seeds, hosts, pages, conf or SIZE_CONF[size], rounds)


def engine_run(spark, size: str, out_dir: str, rounds: int | None = None,
               conf=None):
    """Bootstrap + rounds; returns (engine, store, stats list)."""
    from ccrawler_spark.scheduler.cli import make_engine

    fdir, _, _, _ = load_fixture_meta(size)
    rounds = rounds if rounds is not None else SIZES[size][3]
    engine, store = make_engine(spark, str(fdir), out_dir, conf=conf, size=size)
    seeds = spark.read.parquet(f"{fdir}/seeds.parquet")
    stats = [engine.bootstrap(seeds)]
    for r in range(1, rounds + 1):
        stats.append(engine.run_round(r))
    return engine, store, stats


def engine_fetch_sequence(store, upto: int | None = None) -> list[tuple]:
    """(round, seq, url, host, slot_ms) ascending by seq."""
    df = store.read_fetch_log(upto).select("round", "seq", "url", "host", "slot_ms")
    return [
        (int(r["round"]), int(r["seq"]), r["url"], r["host"], int(r["slot_ms"]))
        for r in df.orderBy("seq").collect()
    ]


def oracle_fetch_sequence(res: OracleResult) -> list[tuple]:
    return [(f.round, f.seq, f.url, f.host, f.slot_ms) for f in res.fetch_log]


def engine_seen(store, n: int) -> set[str]:
    return {r["url"] for r in store.read_seen(n).select("url").collect()}


def engine_frontier_urls(store, n: int) -> set[str]:
    return {r["url"] for r in store.read_frontier(n).select("url").collect()}
