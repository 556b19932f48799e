"""T4 (SURVEY.md §5.3): partition-order independence and resume
idempotence. Different local[N] masters need separate JVMs, so the
engine runs as CLI subprocesses; stores are compared logically with
DuckDB (parquet layout may differ, content must not)."""

import subprocess
import sys

import duckdb
import pytest

REPO = "/root/repo"


def run_cli(args: list[str]) -> str:
    p = subprocess.run(
        [sys.executable, "-m", "ccrawler_spark.scheduler.cli", *args],
        cwd=REPO, capture_output=True, text=True, timeout=600,
    )
    assert p.returncode == 0, p.stderr[-3000:]
    return p.stdout


def fetch_rows(store: str):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT round, seq, url, host, slot_ms FROM '{store}/data/fetch_log/*/*.parquet' ORDER BY seq"
    ).fetchall()
    con.close()
    return rows


def seen_rows(store: str):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT url FROM '{store}/data/seen/*/*/*.parquet' ORDER BY url"
    ).fetchall()
    con.close()
    return rows


@pytest.mark.slow
def test_parallelism_independence(tiny_fixtures, tmp_path):
    """local[8] and local[32] must produce identical fetch_log + seen."""
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    run_cli(["--size", "tiny", "--rounds", "3", "--out", a, "--cores", "8"])
    run_cli(["--size", "tiny", "--rounds", "3", "--out", b, "--cores", "32"])
    assert fetch_rows(a) == fetch_rows(b)
    assert seen_rows(a) == seen_rows(b)


@pytest.mark.slow
def test_resume_identical_to_uninterrupted(tiny_fixtures, tmp_path):
    """Crash after round 2 + resume == uninterrupted 3 rounds (E3)."""
    full, part = str(tmp_path / "full"), str(tmp_path / "part")
    run_cli(["--size", "tiny", "--rounds", "3", "--out", full, "--cores", "8"])
    run_cli(["--size", "tiny", "--rounds", "2", "--out", part, "--cores", "8"])
    run_cli(["--size", "tiny", "--rounds", "3", "--out", part, "--cores", "8",
             "--resume"])
    assert fetch_rows(full) == fetch_rows(part)
    assert seen_rows(full) == seen_rows(part)


def test_mid_round_write_failure_then_retry_is_clean(spark, tiny_fixtures,
                                                     tmp_path):
    """An exception inside the round's overlap pool (a delta write
    failing while sibling writes are in flight) must not poison a retry
    of the same round: run_round's try/finally drains the pool before
    the error propagates (ADVICE r5), the crashed round stays invisible
    (no manifest), and re-running round r on the SAME engine yields
    byte-identical output to an engine that never failed."""
    from ccrawler_spark.scheduler.cli import make_engine

    seeds = spark.read.parquet(f"{tiny_fixtures}/seeds.parquet")

    clean_out = str(tmp_path / "clean")
    eng_a, store_a = make_engine(spark, str(tiny_fixtures), clean_out,
                                 size="tiny")
    eng_a.bootstrap(seeds)
    eng_a.run_round(1)
    eng_a.run_round(2)

    flaky_out = str(tmp_path / "flaky")
    eng_b, store_b = make_engine(spark, str(tiny_fixtures), flaky_out,
                                 size="tiny")
    eng_b.bootstrap(seeds)
    eng_b.run_round(1)

    orig = store_b.write_parquet

    def flaky_write(df, *parts, **kw):
        # the seen delta is one of several write-phase pool jobs
        # submitted together — failing it leaves siblings in flight
        if parts and parts[0] == "seen":
            raise RuntimeError("injected seen-delta write failure")
        return orig(df, *parts, **kw)

    store_b.write_parquet = flaky_write
    with pytest.raises(RuntimeError, match="injected"):
        eng_b.run_round(2)
    store_b.write_parquet = orig

    # the failed round committed nothing: latest() still at round 1
    assert store_b.latest() == 1

    # retry the same round on the same engine — no orphaned write may
    # race it (deterministic paths + overwrite mode make it idempotent)
    eng_b.run_round(2)
    assert store_b.latest() == 2

    def rows(df):
        return [tuple(r) for r in df.orderBy(*df.columns).collect()]

    assert rows(store_b.read_fetch_log(2)) == rows(store_a.read_fetch_log(2))
    assert rows(store_b.read_frontier(2)) == rows(store_a.read_frontier(2))
    assert rows(store_b.read_seen(2)) == rows(store_a.read_seen(2))


@pytest.mark.slow
def test_spark_submit_pyfiles_deployment(tiny_fixtures, tmp_path):
    """north_rule deployment path: the package zipped as the single
    --py-files artifact, submitted with spark-submit from a cwd OUTSIDE
    the repo with PYTHONPATH scrubbed — imports (driver, executors, and
    the Python UDF workers) must resolve from the zip alone, and the
    run must produce the same per-round counts as the in-repo CLI."""
    import os
    import shutil
    import zipfile

    pkg = os.path.join(REPO, "ccrawler_spark")
    zpath = tmp_path / "ccrawler_spark.zip"
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".pyc") or "__pycache__" in root:
                    continue
                full = os.path.join(root, f)
                z.write(full, os.path.relpath(full, REPO))
    entry = tmp_path / "submit_job.py"
    shutil.copy(os.path.join(REPO, "scripts", "submit_job.py"), entry)

    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH",)}
    out = tmp_path / "store"
    p = subprocess.run(
        ["/opt/spark/bin/spark-submit", "--master", "local[4]",
         "--py-files", str(zpath), str(entry),
         "--size", "tiny", "--rounds", "2", "--cores", "4",
         "--fixture-dir", str(tiny_fixtures), "--out", str(out)],
        cwd=tmp_path, env=env, capture_output=True, text=True,
        timeout=600,
    )
    assert p.returncode == 0, p.stderr[-3000:]
    import json as _json

    lines = [_json.loads(x) for x in p.stdout.splitlines()
             if x.startswith("{")]
    by_round = {x["round"]: x for x in lines if "round" in x}

    ref = tmp_path / "ref"
    run_cli(["--size", "tiny", "--rounds", "2",
             "--fixture-dir", str(tiny_fixtures), "--out", str(ref)])
    assert fetch_rows(str(out)) == fetch_rows(str(ref))
    assert seen_rows(str(out)) == seen_rows(str(ref))
    assert by_round[1]["fetched"] > 0
