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
