"""The frontier round loop — the reference's worker loop (crawl.py:189-290)
re-expressed as Spark rounds over checkpointed tables.

Per round (all DataFrame ops, one driver-side loop):
  selection   S4/O1/O2: due-filter → per-(host, salt) top-k → per-host top-k
              → global TakeOrdered budget.  Salting bounds the window state
              for hot hosts (north_rule skew handling) WITHOUT changing the
              selected set: two-level top-k is exact.
  politeness  R3/R5: per-host budget = robots.max_tokens per round — budget
              arithmetic on round numbers, no wall clock, so replays/resume
              are exact.
  fetch       F1/F2: mapInPandas batches (deterministic synthetic web here;
              async client pool on a real cluster).
  dedup       J3: bloom prefilter (partitioned, applyInPandas) → exact
              left-anti rescue ONLY for maybe-seen rows.
  commit      X3/T7: frontier + seen_filter + results + rounds in one atomic
              snapshot; kill + restart resumes without re-fetching.

Canonical total order (SURVEY.md §4.5): (-score, depth, url_hash) — shared
with the pure-Python simulator, which is the golden oracle for crawl-order /
seen-set / span equality.

Efficiency notes (the 100 TB view):
- ALL round metrics + the crawl-order record come from ONE collect of the
  fetched rows (≤ global_budget rows — tiny); no extra jobs.
- The frontier/seen-filter carry between rounds is an in-memory
  localCheckpoint (truncates lineage); the parquet snapshot is durability,
  not the hot path.
- On a real cluster the frontier table is hash-partitioned by url_hash
  bucket; the per-round rewrite becomes an Iceberg MERGE on the touched
  partitions only.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from deepcrawl4ai_spark.frontier import bloom, webgraph as WG
from deepcrawl4ai_spark.frontier.checkpoint import CheckpointStore
from deepcrawl4ai_spark.frontier.fetcher import run_fetch

FRONTIER_COLS = (
    "url_norm",
    "url_hash",
    "host",
    "depth",
    "score",
    "due_round",
    "state",
    "round_added",
    "attempt",
)


@dataclass
class EngineConfig:
    global_budget: int = 200
    max_rounds: int = 10
    max_depth: int = 4
    max_attempts: int = 2
    salt_buckets: int = 4
    budget_scale: int = 1  # multiplies per-host robots budgets (bench knob)
    record_order: bool = True


def _score_sql(url_hash_col):
    """url_score as pure SQL — must equal webgraph.url_score bit-for-bit:
    ((int(hash[:8],16) >> 2) % 10000) / 10000.0"""
    v = F.conv(F.substring(url_hash_col, 1, 8), 16, 10).cast("long")
    return (F.shiftright(v, 2) % 10000) / 10000.0


def _order_cols():
    return [F.col("score").desc(), F.col("depth").asc(), F.col("url_hash").asc()]


class CrawlEngine:
    def __init__(self, spark: SparkSession, store_root: str, cfg: EngineConfig | None = None):
        self.spark = spark
        self.cfg = cfg or EngineConfig()
        self.store = CheckpointStore(store_root)
        robots = WG.robots_rows()
        self.robots_df = spark.createDataFrame(
            [
                (r["host"], r["max_tokens"] * self.cfg.budget_scale, r["disallow_rules"])
                for r in robots
            ],
            "host string, max_tokens int, disallow_rules array<string>",
        )

    # -- seed ingest (S1) -------------------------------------------------------

    def submit_seeds(self, seed_urls: list[str]) -> None:
        """Initialize the frontier + seen filter from a seed list (idempotent:
        no-op if a checkpoint already exists — resume wins)."""
        if self.store.last_round() is not None:
            return
        rows = WG.seed_frontier_rows(seed_urls)
        frontier = self.spark.createDataFrame(
            [
                (
                    r["url_norm"],
                    r["url_hash"],
                    r["url_norm"].split("://", 1)[1].split("/", 1)[0],
                    0,
                    r["score"],
                    0,
                    "queued",
                    0,
                    0,
                )
                for r in rows
            ],
            "url_norm string, url_hash string, host string, depth int, score double,"
            " due_round int, state string, round_added int, attempt int",
        )
        filters = bloom.build_filters(frontier.select("url_hash"), -1)
        results = self.spark.createDataFrame([], self._results_schema())
        rounds = self.spark.createDataFrame([], self._rounds_schema())
        self.store.commit_round(
            -1,
            overwrite={"frontier": frontier, "seen_filter": filters},
            append={"results": results, "rounds": rounds},
            metrics={"round": -1, "seeded": len(rows)},
        )

    def submit_frontier(self, frontier: DataFrame) -> None:
        """Distributed seed ingest: accept a prepared frontier DataFrame
        (FRONTIER_COLS) — the 10^10-scale path, where seeds are built with
        DataFrame ops (spark.range → url synth → sha1), never a driver loop.
        Idempotent like submit_seeds."""
        if self.store.last_round() is not None:
            return
        frontier = frontier.select(*FRONTIER_COLS)
        filters = bloom.build_filters(frontier.select("url_hash"), -1)
        results = self.spark.createDataFrame([], self._results_schema())
        rounds = self.spark.createDataFrame([], self._rounds_schema())
        self.store.commit_round(
            -1,
            overwrite={"frontier": frontier, "seen_filter": filters},
            append={"results": results, "rounds": rounds},
            metrics={"round": -1, "seeded": -1},
        )

    @staticmethod
    def _results_schema() -> str:
        return (
            "doc_id string, url string, url_hash string, host string, depth int,"
            " round int, fetch_status string,"
            " spans array<struct<kind:string,text:string,media_ref:string,offset:int>>,"
            " links array<string>, error string"
        )

    @staticmethod
    def _rounds_schema() -> str:
        return (
            "round int, urls_popped long, urls_fetched long, urls_failed long,"
            " outlinks_seen long, dedup_dropped long, new_frontier long, state string"
        )

    # -- one round -----------------------------------------------------------------

    def run_round(
        self, r: int, frontier: DataFrame, filters: DataFrame
    ) -> tuple[dict, DataFrame | None, DataFrame | None]:
        cfg = self.cfg

        cand = frontier.filter((F.col("state") == "queued") & (F.col("due_round") <= r))

        # politeness budget join (broadcast — robots is a small dim table)
        cand = cand.join(
            F.broadcast(self.robots_df.select("host", "max_tokens")), "host", "left"
        ).withColumn("budget", F.coalesce(F.col("max_tokens"), F.lit(2)))

        # two-level exact top-k: (host, salt) window bounds per-window state on
        # hot hosts; the host window then enforces the true budget
        salt = F.pmod(
            F.conv(F.substring("url_hash", 5, 4), 16, 10).cast("int"),
            F.lit(cfg.salt_buckets),
        )
        w1 = W.partitionBy("host", "salt").orderBy(*_order_cols())
        w2 = W.partitionBy("host").orderBy(*_order_cols())
        selected = (
            cand.withColumn("salt", salt)
            .withColumn("rk1", F.row_number().over(w1))
            .filter(F.col("rk1") <= F.col("budget"))
            .withColumn("rk2", F.row_number().over(w2))
            .filter(F.col("rk2") <= F.col("budget"))
            .select(*FRONTIER_COLS)
            .orderBy(*_order_cols())
            .limit(cfg.global_budget)
        )

        fetched = run_fetch(selected).persist()

        # ONE small collect (≤ global_budget rows) drives every metric,
        # the crawl-order record, and per-partition lineage
        meta = fetched.select(
            "url_hash", "score", "depth", "fetch_status", F.size("links").alias("n_links"), "fetch_pid"
        ).collect()
        if not meta:
            fetched.unpersist()
            return {"round": r, "urls_popped": 0, "empty": True}, None, None

        popped = len(meta)
        n_success = sum(1 for m in meta if m["fetch_status"] == "success")
        outlinks_seen = sum(m["n_links"] for m in meta if m["fetch_status"] == "success")
        per_partition: dict[int, int] = {}
        for m in meta:
            per_partition[m["fetch_pid"]] = per_partition.get(m["fetch_pid"], 0) + 1

        succ = fetched.filter(F.col("fetch_status") == "success")

        # outlink pipeline: explode → robots/social filter → batch dedup →
        # bloom prefilter → exact anti-join rescue
        links = succ.filter(F.col("depth") < cfg.max_depth).select(
            (F.col("depth") + 1).alias("depth"), F.explode("links").alias("url_norm")
        )
        links = (
            links.withColumn("host", F.regexp_extract("url_norm", r"^[a-z]+://([^/]+)", 1))
            .withColumn("path", F.regexp_extract("url_norm", r"^[a-z]+://[^/]+(/.*)?$", 1))
            .filter(~F.col("host").isin(*WG.SOCIAL_HOSTS))
            .join(F.broadcast(self.robots_df.select("host", "disallow_rules")), "host", "left")
            .filter(
                ~F.coalesce(
                    F.exists("disallow_rules", lambda rule: F.col("path").startswith(rule)),
                    F.lit(False),
                )
            )
        )
        # sha1 stays JVM-side (links are already canonical — no re-normalize)
        batch = (
            links.withColumn("url_hash", F.sha1(F.encode("url_norm", "UTF-8")))
            .groupBy("url_hash")
            .agg(
                F.min("depth").alias("depth"),
                F.first("url_norm").alias("url_norm"),
                F.first("host").alias("host"),
            )
        )
        flagged = bloom.maybe_seen(batch, filters)
        new_rows = (
            flagged.filter(~F.col("maybe_seen"))
            .unionByName(
                flagged.filter(F.col("maybe_seen")).join(
                    frontier.select("url_hash"), "url_hash", "left_anti"
                )
            )
            .select(
                "url_norm",
                "url_hash",
                "host",
                "depth",
                _score_sql(F.col("url_hash")).alias("score"),
                F.lit(r + 1).alias("due_round"),
                F.lit("queued").alias("state"),
                F.lit(r + 1).alias("round_added"),
                F.lit(0).alias("attempt"),
            )
            .persist()
        )
        new_count = new_rows.count()

        # frontier state update (the "pop" rewrite — reference LTRIM analog)
        outcome = fetched.select("url_hash", F.col("fetch_status").alias("_st"))
        updated = (
            frontier.join(outcome, "url_hash", "left")
            .withColumn(
                "attempt",
                F.when(F.col("_st") == "failed", F.col("attempt") + 1).otherwise(
                    F.col("attempt")
                ),
            )
            .withColumn(
                "state",
                F.when(F.col("_st") == "success", F.lit("fetched"))
                .when(
                    (F.col("_st") == "failed") & (F.col("attempt") >= cfg.max_attempts),
                    F.lit("failed"),
                )
                .otherwise(F.col("state")),
            )
            .withColumn(
                "due_round",
                F.when(
                    (F.col("_st") == "failed") & (F.col("state") == "queued"),
                    F.lit(r + 1) + F.col("attempt"),
                ).otherwise(F.col("due_round")),
            )
            .select(*FRONTIER_COLS)
        )
        # bound write fan-out: the union would otherwise carry every upstream
        # shuffle's partitioning into the snapshot (tiny files, task overhead)
        n_write = max(self.spark.sparkContext.defaultParallelism // 2, 4)
        new_frontier = updated.unionByName(new_rows.select(*FRONTIER_COLS)).coalesce(
            n_write
        )

        # seen filter merge: single cogrouped OR pass (associative/idempotent)
        new_filters = bloom.add_to_filters(filters, new_rows.select("url_hash"), r)

        results = succ.select(
            F.col("url_hash").alias("doc_id"),
            F.col("url_norm").alias("url"),
            "url_hash",
            "host",
            "depth",
            F.lit(r).alias("round"),
            "fetch_status",
            "spans",
            "links",
            F.lit(None).cast("string").alias("error"),
        )

        metrics = {
            "round": r,
            "urls_popped": popped,
            "urls_fetched": n_success,
            "urls_failed": popped - n_success,
            "outlinks_seen": int(outlinks_seen),
            "dedup_dropped": int(outlinks_seen) - int(new_count),
            "new_frontier": int(new_count),
            "per_partition": [
                {"pid": pid, "rows": n} for pid, n in sorted(per_partition.items())
            ],
        }
        if cfg.record_order:
            metrics["crawl_order"] = [
                m["url_hash"]
                for m in sorted(meta, key=lambda m: (-m["score"], m["depth"], m["url_hash"]))
            ]

        rounds_row = self.spark.createDataFrame(
            [
                (
                    r,
                    metrics["urls_popped"],
                    metrics["urls_fetched"],
                    metrics["urls_failed"],
                    metrics["outlinks_seen"],
                    metrics["dedup_dropped"],
                    metrics["new_frontier"],
                    "committed",
                )
            ],
            self._rounds_schema(),
        )
        self.store.commit_round(
            r,
            overwrite={"frontier": new_frontier, "seen_filter": new_filters},
            append={"results": results, "rounds": rounds_row},
            metrics=metrics,
        )
        # carry the just-written snapshot (lazy read-back: truncates lineage
        # without recomputing the plan a second time)
        carried_frontier = self.store.read(self.spark, "frontier")
        carried_filters = self.store.read(self.spark, "seen_filter")
        fetched.unpersist()
        new_rows.unpersist()
        return metrics, carried_frontier, carried_filters

    # -- full run ---------------------------------------------------------------------

    def run(self, seed_urls: list[str] | None = None) -> list[dict]:
        if seed_urls is not None:
            self.submit_seeds(seed_urls)
        last = self.store.last_round()
        if last is None:
            raise ValueError("no checkpoint and no seeds — call with seed_urls")
        frontier = self.store.read(self.spark, "frontier")
        filters = self.store.read(self.spark, "seen_filter")
        out = []
        import time as _time

        for r in range(last + 1, self.cfg.max_rounds):
            t0 = _time.time()
            m, nf, nflt = self.run_round(r, frontier, filters)
            if m.get("empty"):
                break
            m["_sec"] = round(_time.time() - t0, 2)
            frontier, filters = nf, nflt
            out.append(m)
        return out
