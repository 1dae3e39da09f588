"""Pure-Python reference simulator of the canonical crawl semantics.

The reference's asyncio completion order is nondeterministic
(reference crawl.py:189-290, tasks.py:362-368); the rebuild replaces it with
the canonical total order below, and this single-threaded simulator is the
golden oracle the Spark engine must match exactly — crawl order, URL-seen
set, and span sequences (SURVEY.md §4.5, §5.2).

Canonical round semantics (round r = 0, 1, …):
  1. candidates = queued rows with due_round ≤ r
  2. per host: order by (-score, depth, url_hash), take host_budget(host)
  3. globally: order by (-score, depth, url_hash), take global_budget
  4. fetch: success → state=fetched, emit result (spans, links);
     failure → attempt += 1; retry with due_round = r + 1 + attempt
     until max_attempts, then state=failed
  5. outlinks of successes: drop disallowed (robots) + already-seen;
     survivors enter the frontier with depth = min over same-round parents,
     score = url_score(hash), due_round = r + 1, state = queued
  6. when nothing is due this round but retries are pending, skip ahead to
     the earliest due_round; stop when the queue is empty or the round
     limit is reached

All politeness is budget arithmetic per round — no wall clock — so replays
and resume are exact (SURVEY.md R3/R5 rebuild decision).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from deepcrawl4ai_spark.frontier import DEFAULT_HOST_MAX_TOKENS, webgraph as WG


@dataclass
class SimConfig:
    global_budget: int = 200
    max_rounds: int = 10
    max_depth: int = 4
    max_attempts: int = 2
    budget_scale: int = 1
    adaptive_budget: bool = False
    min_budget: int = 10
    token_bucket: bool = False
    # no-op: the simulator always records crawl order; the field exists so
    # tests can share one config dict with EngineConfig (where it's opt-in)
    record_order: bool = True


@dataclass
class SimEntry:
    url_norm: str
    url_hash: str
    host: str
    depth: int
    score: float
    due_round: int
    state: str = "queued"  # queued | fetched | failed
    round_added: int = 0
    attempt: int = 0


@dataclass
class SimResult:
    crawl_order: list[list[str]] = field(default_factory=list)  # url_hash per round
    seen: set[str] = field(default_factory=set)
    results: dict[str, WG.Page] = field(default_factory=dict)  # url_hash → page
    round_metrics: list[dict] = field(default_factory=list)
    frontier: dict[str, SimEntry] = field(default_factory=dict)


def _host_of(url_norm: str) -> str:
    return url_norm.split("://", 1)[1].split("/", 1)[0]


def simulate(seed_urls: list[str], cfg: SimConfig | None = None) -> SimResult:
    cfg = cfg or SimConfig()
    robots = {r["host"]: r for r in WG.robots_rows()}
    disallow = {r["host"]: r["disallow_rules"] for r in WG.robots_rows()}

    res = SimResult()
    frontier = res.frontier
    for row in WG.seed_frontier_rows(seed_urls):
        host = _host_of(row["url_norm"])
        frontier[row["url_hash"]] = SimEntry(
            url_norm=row["url_norm"],
            url_hash=row["url_hash"],
            host=host,
            depth=0,
            score=row["score"],
            due_round=0,
        )
    res.seen = set(frontier)

    # R3/R4 token-bucket state: capacity/refill scaled like the engine;
    # buckets start full; update every robots host every round
    caps = {h: robots[h]["max_tokens"] * cfg.budget_scale for h in robots}
    refills = {h: int(robots[h]["rps_budget"]) * cfg.budget_scale for h in robots}
    tokens = dict(caps)

    r = 0
    while r < cfg.max_rounds:
        cand = [e for e in frontier.values() if e.state == "queued" and e.due_round <= r]
        if not cand:
            # nothing due this round but retries may be scheduled later —
            # skip ahead to the earliest pending due_round (same rule as
            # CrawlEngine.run; idle rounds refill no tokens in either)
            pending = [e.due_round for e in frontier.values() if e.state == "queued"]
            if not pending or min(pending) >= cfg.max_rounds:
                break
            r = min(pending)
            continue
        # per-host budget
        by_host: dict[str, list[SimEntry]] = {}
        for e in cand:
            by_host.setdefault(e.host, []).append(e)
        if cfg.token_bucket:
            avail = {
                h: min(caps[h], tokens[h] + refills[h]) for h in robots
            }
        picked: list[SimEntry] = []
        for host, entries in by_host.items():
            entries.sort(key=lambda e: (-e.score, e.depth, e.url_hash))
            if cfg.token_bucket and host in robots:
                budget = avail[host]
            else:
                budget = (
                    robots.get(host, {"max_tokens": DEFAULT_HOST_MAX_TOKENS})[
                        "max_tokens"
                    ]
                    * cfg.budget_scale
                )
            picked.extend(entries[:budget])
        # global budget — canonical total order; R1/X1 controller shrinks the
        # budget by the previous round's error rate when adaptive
        round_budget = cfg.global_budget
        if cfg.adaptive_budget and res.round_metrics:
            prev = res.round_metrics[-1]
            err = prev["urls_failed"] / prev["urls_popped"] if prev["urls_popped"] else 0.0
            round_budget = max(cfg.min_budget, int(cfg.global_budget * (1.0 - err)))
        picked.sort(key=lambda e: (-e.score, e.depth, e.url_hash))
        picked = picked[:round_budget]
        if cfg.token_bucket:
            consumed: dict[str, int] = {}
            for e in picked:
                consumed[e.host] = consumed.get(e.host, 0) + 1
            for h in robots:
                tokens[h] = avail[h] - consumed.get(h, 0)

        fetched = failed = outlinks_seen = dedup_dropped = 0
        new_rows: dict[str, SimEntry] = {}
        order: list[str] = []
        for e in picked:
            order.append(e.url_hash)
            page = WG.fetch_page(e.url_norm)
            if page.fetch_status == "failed":
                e.attempt += 1
                if e.attempt >= cfg.max_attempts:
                    e.state = "failed"
                else:
                    e.due_round = r + 1 + e.attempt
                failed += 1
                continue
            e.state = "fetched"
            fetched += 1
            res.results[e.url_hash] = page
            if e.depth >= cfg.max_depth:
                outlinks_seen += len(page.outlinks)
                dedup_dropped += len(page.outlinks)
                continue
            for link in page.outlinks:
                outlinks_seen += 1
                lh = WG.sha1_hex(link)
                host = _host_of(link)
                if host in WG.SOCIAL_HOSTS or WG.is_disallowed(link, disallow):
                    dedup_dropped += 1
                    continue
                if lh in res.seen:
                    dedup_dropped += 1
                    continue
                if lh in new_rows:
                    dedup_dropped += 1
                    new_rows[lh].depth = min(new_rows[lh].depth, e.depth + 1)
                    continue
                new_rows[lh] = SimEntry(
                    url_norm=link,
                    url_hash=lh,
                    host=host,
                    depth=e.depth + 1,
                    score=WG.url_score(lh),
                    due_round=r + 1,
                    round_added=r + 1,
                )
        for lh, entry in new_rows.items():
            frontier[lh] = entry
            res.seen.add(lh)
        res.crawl_order.append(order)
        res.round_metrics.append(
            {
                "round": r,
                "urls_popped": len(picked),
                "urls_fetched": fetched,
                "urls_failed": failed,
                "outlinks_seen": outlinks_seen,
                "dedup_dropped": dedup_dropped,
                "new_frontier": len(new_rows),
            }
        )
        r += 1
    return res
