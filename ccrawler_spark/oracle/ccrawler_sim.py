"""Single-process pure-Python oracle for the crawl scheduler.

This is the second, independent implementation of docs/SEMANTICS.md
(SURVEY.md §5.2): agreement between this simulator and the Spark engine
on the fixtures IS the correctness claim for BASELINE.json:6's
"reproduce crawl ordering and final URL-seen set exactly".

Only stdlib + the shared hash/normalize/fixture helpers are used; no
Spark. Heap-free implementation (plain sorts) — clarity over speed;
it runs the `small` fixture (100k URLs, 5 rounds) in seconds.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ccrawler_spark.conf import CrawlConf
from ccrawler_spark.fixtures.gen import (
    crawl_delay_for,
    robots_rules_for,
)
from ccrawler_spark.functions.hashing import umod, ushift, xxhash64_str
from ccrawler_spark.urlnorm.normalize import canonicalize, host_of


@dataclass
class FrontierRow:
    url: str
    url_hash: int
    host: str
    priority: int
    discover_ts: int  # micros since epoch (virtual clock)
    depth: int
    status: str = "queued"


@dataclass
class FetchRec:
    round: int
    seq: int
    url: str
    host: str
    slot_ms: int
    priority: int
    discover_ts: int
    depth: int


@dataclass
class OracleResult:
    fetch_log: list[FetchRec]
    seen: set[str]
    frontier_after: dict[int, list[FrontierRow]]  # round -> queued rows
    denied: set[str]


def ord_key(r: FrontierRow):
    """Total order ORD(u) — SEMANTICS.md §6."""
    return (r.priority, r.discover_ts, r.url_hash, r.url)


class RobotsOracle:
    """Longest-prefix-match robots gate (SEMANTICS.md §5), built from the
    same per-host rule formulas as the fixture generator."""

    def __init__(self, hosts: list[str], version: int = 1):
        self.rules = {h: robots_rules_for(h) for h in hosts}
        self.delay = {h: crawl_delay_for(h) for h in hosts}

    def allowed(self, url: str) -> bool:
        host = host_of(url)
        path = "/" + url.split("://", 1)[1].split("/", 1)[1]
        rules = self.rules.get(host)
        if not rules:
            return True
        best_len, best_allow = -1, True
        for r in rules:
            p = r["pattern"]
            if path.startswith(p) and len(p) > best_len:
                best_len, best_allow = len(p), r["allow"]
        return best_allow

    def crawl_delay_ms(self, host: str, default: int) -> int:
        return self.delay.get(host, default)


def outlinks(url: str, H: int, pages) -> list[str]:
    """Deterministic link function — SEMANTICS.md §4 / FIXTURES.md §1."""
    k = xxhash64_str(url)
    deg = umod(k, 5) + 1
    out = []
    for t in range(deg):
        i_t = ushift(k, 8 * t) % H
        j_t = ushift(k, 4 * t) % int(pages[i_t])
        out.append(f"http://h{i_t}.example/p/{j_t}")
    return out


def run_oracle(
    seed_urls: list[str],
    hosts: list[str],
    pages,
    conf: CrawlConf,
    rounds: int,
) -> OracleResult:
    H = len(hosts)
    robots = RobotsOracle(hosts, conf.robots_version)

    # bootstrap (SEMANTICS.md §6): normalize, self-dedup keep first
    # seed-file position, priority 0, discover_ts = t0, depth 0.
    frontier: dict[str, FrontierRow] = {}
    seen: set[str] = set()
    for raw in seed_urls:
        u = canonicalize(raw)
        if u is None or u in seen:
            continue
        seen.add(u)
        frontier[u] = FrontierRow(
            url=u,
            url_hash=xxhash64_str(u),
            host=host_of(u),
            priority=0,
            discover_ts=conf.t0_micros,
            depth=0,
        )

    fetch_log: list[FetchRec] = []
    frontier_after: dict[int, list[FrontierRow]] = {
        0: sorted(frontier.values(), key=ord_key)
    }
    denied_all: set[str] = set()
    seq = 0

    for r in range(1, rounds + 1):
        round_ts = conf.t0_micros + r * conf.round_period_micros
        queued = [
            row for row in frontier.values()
            if row.status == "queued"
            # O30/O10 due predicate (only when recrawl is enabled — the
            # engine applies the same conditional filter)
            and (conf.recrawl_interval_micros == 0
                 or row.discover_ts <= round_ts)
        ]

        # 1. robots gate
        allowed, denied = [], []
        for row in queued:
            (allowed if robots.allowed(row.url) else denied).append(row)
        for row in denied:
            denied_all.add(row.url)
            del frontier[row.url]

        # 2. per-host top-k
        by_host: dict[str, list[FrontierRow]] = {}
        for row in allowed:
            by_host.setdefault(row.host, []).append(row)
        candidates = []
        for h, rows in by_host.items():
            rows.sort(key=ord_key)
            candidates.extend(rows[: conf.per_host_k])

        # 3. global budget
        candidates.sort(key=ord_key)
        scheduled = candidates[: conf.round_budget]

        # 4. politeness slots (per host, rank by ORD)
        slot_ms: dict[str, int] = {}
        sched_by_host: dict[str, list[FrontierRow]] = {}
        for row in scheduled:
            sched_by_host.setdefault(row.host, []).append(row)
        for h, rows in sched_by_host.items():
            rows.sort(key=ord_key)
            d = robots.crawl_delay_ms(h, conf.default_crawl_delay_ms)
            for rank0, row in enumerate(rows):
                slot_ms[row.url] = rank0 * d

        # 5. fetch sequence
        def seq_key(row: FrontierRow):
            hb = umod(xxhash64_str(row.host), conf.host_buckets)
            return (slot_ms[row.url], hb, row.host, row.url_hash, row.url)

        scheduled.sort(key=seq_key)

        # 6. fetch + 7. discovery
        discoveries: dict[str, tuple] = {}  # url -> (ts, src_hash, t, depth)
        for row in scheduled:
            s = slot_ms[row.url]
            fetch_log.append(
                FetchRec(r, seq, row.url, row.host, s, row.priority,
                         row.discover_ts, row.depth)
            )
            seq += 1
            del frontier[row.url]
            fetch_ts = round_ts + s * 1000
            if conf.recrawl_interval_micros > 0:
                # O30: re-enqueue at fetch virtual time + interval,
                # keeping url/priority/depth (already in `seen`)
                frontier[row.url] = FrontierRow(
                    url=row.url,
                    url_hash=row.url_hash,
                    host=row.host,
                    priority=row.priority,
                    discover_ts=fetch_ts + conf.recrawl_interval_micros,
                    depth=row.depth,
                )
            src_hash = row.url_hash
            if row.depth + 1 > conf.max_depth:
                continue
            for t, target in enumerate(outlinks(row.url, H, pages)):
                key = (fetch_ts, src_hash, t)
                prev = discoveries.get(target)
                if prev is None or key < prev[:3]:
                    discoveries[target] = (fetch_ts, src_hash, t, row.depth + 1)

        # 9/10. dedup vs seen, enqueue fresh
        for target, (ts, _src, _t, depth) in discoveries.items():
            if target in seen:
                continue
            seen.add(target)
            frontier[target] = FrontierRow(
                url=target,
                url_hash=xxhash64_str(target),
                host=host_of(target),
                priority=umod(xxhash64_str("prio|" + target), 3),
                discover_ts=ts,
                depth=depth,
            )

        frontier_after[r] = sorted(frontier.values(), key=ord_key)

    return OracleResult(fetch_log, seen, frontier_after, denied_all)
