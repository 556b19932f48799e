"""The scaling bench's median-of-N reporting (bench/run_bench.publish)
is part of the committed evidence chain — BASELINE.md / summary.json
claims are derived from it, so its sample-pooling and median arithmetic
get the same unit coverage as an operator. No Spark session needed."""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "bench"))

import run_bench as rb  # noqa: E402


def _mk_sample(ts, thr, walls=None, frontier=100, lv=(2, 8, 32), pairs=None):
    walls = walls or {c: 1000.0 / thr[c] for c in lv}
    pairs = pairs or {
        f"{a}->{b}": round((thr[b] / thr[a]) / (b / a), 3)
        for a, b in zip(lv, lv[1:])
    }
    return {
        "ts": ts,
        "loadavg": None,
        "levels": {
            str(c): {
                "urls_per_sec": thr[c],
                "timed_wall_s": walls[c],
                "timed_fetched": 1000,
                "frontier_rows_per_sec": frontier * 4 / walls[c],
            }
            for c in lv
        },
        "pair_efficiencies": pairs,
        "frontier_rows": frontier,
    }


def _results_from(sample, lv=(2, 8, 32)):
    return {
        c: {
            "urls_per_sec": sample["levels"][str(c)]["urls_per_sec"],
            "timed_wall_s": sample["levels"][str(c)]["timed_wall_s"],
            "timed_fetched": sample["levels"][str(c)]["timed_fetched"],
            "frontier_rows_per_sec": sample["levels"][str(c)][
                "frontier_rows_per_sec"],
            "frontier_rows": sample["frontier_rows"],
        }
        for c in lv
    }


def test_publish_reports_per_level_median_not_latest(tmp_path):
    lv = [2, 8, 32]
    # three samples; the LAST is the best run — the median must win
    s1 = _mk_sample(1, {2: 300.0, 8: 950.0, 32: 1600.0})
    s2 = _mk_sample(2, {2: 290.0, 8: 1000.0, 32: 1750.0})
    s3 = _mk_sample(3, {2: 280.0, 8: 1050.0, 32: 1900.0})
    (tmp_path / "scaling_samples.json").write_text(json.dumps([s1, s2]))
    pairs = s3["pair_efficiencies"]
    rb.publish(tmp_path, _results_from(s3), lv, pairs,
               min_max=0.0, sample=s3)
    summary = json.loads((tmp_path / "summary.json").read_text())
    assert summary["n_samples"] == 3
    # per-level medians: s2 is the middle at every level here
    assert summary["levels"] == {"2": 290.0, "8": 1000.0, "32": 1750.0}
    assert summary["contract_pair_efficiency"] == round(
        (1000.0 / 290.0) / 4, 3)
    # the latest (best) run is disclosed but not the headline
    assert summary["latest_sample"]["levels"]["32"] == 1900.0
    # samples file now holds all three
    pool = json.loads((tmp_path / "scaling_samples.json").read_text())
    assert [s["ts"] for s in pool] == [1, 2, 3]


def test_publish_even_sample_count_averages_middle_pair(tmp_path):
    lv = [2, 8, 32]
    s1 = _mk_sample(1, {2: 300.0, 8: 900.0, 32: 1600.0})
    s2 = _mk_sample(2, {2: 310.0, 8: 1100.0, 32: 1800.0})
    (tmp_path / "scaling_samples.json").write_text(json.dumps([s1]))
    rb.publish(tmp_path, _results_from(s2), lv,
               s2["pair_efficiencies"], min_max=0.0, sample=s2)
    summary = json.loads((tmp_path / "summary.json").read_text())
    assert summary["levels"]["8"] == 1000.0  # mean of the middle two


def test_publish_excludes_incompatible_samples(tmp_path):
    """A protocol change (different levels or frontier size) must reset
    the pool, not pollute the median."""
    lv = [2, 8, 32]
    stale_lv = _mk_sample(1, {8: 900.0, 32: 1600.0}, lv=(8, 32),
                          pairs={"8->32": 0.4})
    stale_fr = _mk_sample(2, {2: 1.0, 8: 1.0, 32: 1.0}, frontier=999)
    live = _mk_sample(3, {2: 300.0, 8: 1000.0, 32: 1700.0})
    (tmp_path / "scaling_samples.json").write_text(
        json.dumps([stale_lv, stale_fr]))
    rb.publish(tmp_path, _results_from(live), lv,
               live["pair_efficiencies"], min_max=0.0, sample=live)
    summary = json.loads((tmp_path / "summary.json").read_text())
    assert summary["n_samples"] == 1
    assert summary["levels"] == {"2": 300.0, "8": 1000.0, "32": 1700.0}
    # incompatible samples stay in the pool file (history), just not
    # in the headline
    pool = json.loads((tmp_path / "scaling_samples.json").read_text())
    assert len(pool) == 3


def test_publish_baseline_md_discloses_every_sample(tmp_path):
    lv = [2, 8, 32]
    s1 = _mk_sample(1, {2: 300.0, 8: 950.0, 32: 1600.0})
    s2 = _mk_sample(2, {2: 290.0, 8: 1000.0, 32: 1750.0})
    (tmp_path / "scaling_samples.json").write_text(json.dumps([s1]))
    rb.publish(tmp_path, _results_from(s2), lv,
               s2["pair_efficiencies"], min_max=0.0, sample=s2)
    md = (tmp_path / "BASELINE.md").read_text()
    assert "MEDIANS over 2" in md
    for thr in ("300.0", "290.0", "950.0", "1000.0"):
        assert thr in md, f"sample throughput {thr} not disclosed"


def test_publish_code_condition_change_resets_the_pool(tmp_path):
    """A perf-relevant code change (CODE_TAG bump, e.g. the r7
    cached-plan AQE knob) must start a fresh median pool: pooling
    samples produced by different code would average two different
    engines into one claim. Old samples stay in the file as history;
    the code-agnostic disk control remains visible with its code
    disclosed."""
    lv = [2, 8, 32]
    old1 = _mk_sample(1, {2: 300.0, 8: 950.0, 32: 1600.0})   # pre-r7
    old2 = _mk_sample(2, {2: 310.0, 8: 990.0, 32: 1650.0})   # pre-r7
    oldd = _mk_sample(3, {2: 250.0, 8: 800.0, 32: 1400.0})   # pre-r7 disk
    oldd["store"] = "disk:/var/tmp"
    new = _mk_sample(4, {2: 400.0, 8: 1300.0, 32: 2200.0})
    new["code"] = rb.CODE_TAG
    (tmp_path / "scaling_samples.json").write_text(
        json.dumps([old1, old2, oldd]))
    rb.publish(tmp_path, _results_from(new), lv,
               new["pair_efficiencies"], min_max=0.0, sample=new)
    summary = json.loads((tmp_path / "summary.json").read_text())
    assert summary["n_samples"] == 1          # fresh pool
    assert summary["code"] == rb.CODE_TAG
    assert summary["levels"] == {"2": 400.0, "8": 1300.0, "32": 2200.0}
    dc = summary["disk_control"]              # still visible, code shown
    assert dc["levels"]["32"] == 1400.0 and dc["code"] == "pre-r7"
    pool = json.loads((tmp_path / "scaling_samples.json").read_text())
    assert len(pool) == 4                     # history retained


def test_publish_disk_samples_never_pollute_tmpfs_medians(tmp_path):
    """Disk-store control samples (VERDICT r6 #3) are appended to the
    pool and surfaced as summary.disk_control + a BASELINE.md section,
    but the headline medians stay tmpfs-only — mixing stores would
    silently drag the throughput claim by the disk persistence cost."""
    lv = [2, 8, 32]
    s1 = _mk_sample(1, {2: 300.0, 8: 950.0, 32: 1600.0})
    s2 = _mk_sample(2, {2: 290.0, 8: 1000.0, 32: 1750.0})
    d = _mk_sample(3, {2: 250.0, 8: 800.0, 32: 1400.0})
    d["store"] = "disk:/var/tmp"
    (tmp_path / "scaling_samples.json").write_text(json.dumps([s1, s2]))
    rb.publish(tmp_path, _results_from(d), lv, d["pair_efficiencies"],
               min_max=0.0, sample=d)
    summary = json.loads((tmp_path / "summary.json").read_text())
    # headline pool: the two tmpfs samples only (even count → averaged)
    assert summary["n_samples"] == 2
    assert summary["levels"]["32"] == 1675.0
    assert summary["latest_sample"]["store"] == "disk:/var/tmp"
    dc = summary["disk_control"]
    assert dc["store"] == "disk:/var/tmp"
    assert dc["levels"]["32"] == 1400.0
    assert dc["delta_vs_tmpfs_median"]["32"] == round(1400.0 / 1675.0 - 1, 3)
    md = (tmp_path / "BASELINE.md").read_text()
    assert "Disk-store control" in md and "local[32] | 1400.0" in md


def test_publish_health_gate_excludes_degraded_samples(tmp_path):
    """VERDICT r7 #4: the pre-registered health rule must drop a
    degraded-window sample from the HEADLINE medians (keeping it in
    the pool + disclosure) — and the rule must also fire against a
    FAVORABLE degraded sample, not just unfavorable ones."""
    lv = [2, 8, 32]
    good1 = _mk_sample(1, {2: 300.0, 8: 1000.0, 32: 1700.0})
    good2 = _mk_sample(2, {2: 310.0, 8: 1020.0, 32: 1720.0})
    # degraded sample with the HIGHEST throughput: excluding it lowers
    # the headline (no cherry-picking possible)
    hot = _mk_sample(3, {2: 400.0, 8: 1500.0, 32: 2500.0})
    hot["cpu_window"] = {"steal_frac": 0.05, "busy_frac": 0.3}
    for s in (good1, good2):
        s["cpu_window"] = {"steal_frac": 0.001, "busy_frac": 0.3}
        s["cpu_probe_ms"] = {"start": {"single": 104.0, "multi8": 110.0},
                             "end": {"single": 106.0, "multi8": 111.0}}
    (tmp_path / "scaling_samples.json").write_text(json.dumps([good1, good2]))
    rb.publish(tmp_path, _results_from(hot), lv, hot["pair_efficiencies"],
               0.5, hot)
    summary = json.loads((tmp_path / "summary.json").read_text())
    assert summary["n_samples"] == 2
    assert summary["health_gate"]["n_excluded"] == 1
    # gated median of {300, 310} = 305; ungated includes the hot 400
    assert summary["levels"]["2"] == 305.0
    assert summary["health_gate"]["ungated_levels"]["2"] == 310.0
    md = (tmp_path / "BASELINE.md").read_text()
    assert "HEALTH-GATED" in md


def test_publish_disk_only_pool_labels_store_honestly(tmp_path):
    """ADVICE r7 medium: when the pool falls back to disk samples the
    summary's store field and BASELINE.md must say so instead of the
    hardcoded tmpfs claim."""
    lv = [2, 8, 32]
    d = _mk_sample(1, {2: 300.0, 8: 1000.0, 32: 1700.0})
    d["store"] = "disk:/root/bench_store"
    (tmp_path / "scaling_samples.json").write_text(json.dumps([]))
    rb.publish(tmp_path, _results_from(d), lv, d["pair_efficiencies"],
               0.5, d)
    summary = json.loads((tmp_path / "summary.json").read_text())
    assert summary["store"].startswith("disk:"), summary["store"]
    assert "DISK-backed pool" in summary["store"]
    md = (tmp_path / "BASELINE.md").read_text()
    assert "NOT the tmpfs protocol" in md
