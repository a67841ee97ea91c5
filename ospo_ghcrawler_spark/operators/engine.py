"""The crawl engine: batch-iterative superstep loop over snapshot tables.

One superstep = the reference's ``crawler.processOne`` (single-stepped by
/root/reference/test/unit/processingTests.js:48-51) generalized to a whole
batch and compiled to one Spark DAG per stage:

    select → politeness filter → fetch → extract (fused Arrow pass) →
    explode links → dedup (attenuation + bloom/anti-join seen) →
    commit (pages append, seen append, frontier overwrite, metrics append,
    deadletters append, bloom sidecar, run-manifest entry)

Determinism: every selection is a pure function of table state with
total-order tie-breakers (priority, enqueue_step, seq, url_hash), timestamps
are logical superstep indices, and new-edge sequence numbers are assigned by a
sorted window — so the crawl order and final seen-set are identical at any
parallelism level (local[8] vs local[32] vs a 1000-executor cluster), which is
what makes the run exactly resumable and the scaling bench honest.
"""

from __future__ import annotations

import os
import time
from concurrent.futures import Future, ThreadPoolExecutor
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ospo_ghcrawler_spark.config import (
    COMPUTE_BUDGET_UNBOUND,
    PRIORITY_NORMAL,
    CrawlConfig,
)
from ospo_ghcrawler_spark.functions.extract import with_extracted
from ospo_ghcrawler_spark.functions.urls import canonicalize_udf, host_col
from ospo_ghcrawler_spark.operators.dedup import (
    BloomFamily,
    CuckooFilter,
    build_bloom_distributed,
    seen_filter,
)
from ospo_ghcrawler_spark.operators.fetch import simulated_fetch_bloom
from ospo_ghcrawler_spark.operators.politeness import (
    compute_limiter_benches,
    effective_host_budget,
    robots_allowed_filter,
)
from ospo_ghcrawler_spark.operators.tokens import (
    apply_token_caps,
    assign_tokens,
    split_fetchable,
    tokens_df,
)
from ospo_ghcrawler_spark.plans.catalog import Catalog
from ospo_ghcrawler_spark.plans.selection import policy_depth_col, select_batch
from ospo_ghcrawler_spark.schemas import FRONTIER_SCHEMA

Fetcher = Callable[[DataFrame, DataFrame, CrawlConfig], DataFrame]

# sparse OPH signature column type (schemas.py PAGES minhash_oph)
_MINHASH_DT = "array<struct<bin:int,h:bigint>>"


def harvest_feature_cols(cfg: CrawlConfig) -> list:
    """Fetch-time featurization columns for the harvest write (shared by the
    superstep and ``prewarm`` so the warmed codegen is the exact plan shape
    the measured superstep compiles)."""
    if cfg.featurize_at_fetch:
        # document featurization rides the harvest write — the only pass
        # that materializes text — so quality/lang/token/fingerprint
        # signals cost zero extra scans (all JVM expressions, they join
        # the whole-stage-codegen span of the pages append)
        from ospo_ghcrawler_spark.functions import text as _TXT

        t = F.col("text")
        ok_row = F.col("status") == 200  # no text → no features (all null)
        exprs = [
            ("n_tokens", _TXT.token_count(t).cast("int")),
            ("n_types", _TXT.distinct_token_count(t).cast("int")),
            ("n_punct", _TXT.punct_count(t).cast("int")),
            ("quality", _TXT.quality_score(t)),
            ("lang_pred", _TXT.lang_id(t)),
            ("fp", _TXT.fingerprint(t)),
        ]
        if cfg.winnow_at_fetch:
            # MOSS winnowing fingerprints in the same pass (xxhash64 word
            # shingles, JVM array exprs): the pages table comes out
            # near-dup-ready — downstream dedup joins on winnow_fp instead
            # of re-scanning text. Word shingles, not char grams: ~L/6
            # hashes/page for the same document-level shared-run detection
            # (functions/text.py:winnow_fingerprints_tokens)
            exprs.append(("winnow_fp", _TXT.winnow_fingerprints_tokens(t)))
        else:
            exprs.append(("winnow_fp", F.lit(None).cast("array<bigint>")))
        if cfg.minhash_at_fetch:
            # sparse OPH MinHash signature in the same pass: one xxhash64
            # per word shingle, per-bin minima — the pages table comes out
            # Jaccard-LSH-ready (oph_lsh_pairs consumes the stored column,
            # candidates never re-read text). Opt-in: ~1 hash/word roughly
            # doubles per-page harvest compute on full pages.
            exprs.append(("minhash_oph", _TXT.minhash_oph_entries(t)))
        else:
            exprs.append(("minhash_oph", F.lit(None).cast(_MINHASH_DT)))
        return [F.when(ok_row, e).alias(nm) for nm, e in exprs]
    return [
        F.lit(None).cast(dt).alias(nm)
        for nm, dt in [
            ("n_tokens", "int"), ("n_types", "int"), ("n_punct", "int"),
            ("quality", "double"), ("lang_pred", "string"), ("fp", "string"),
            ("winnow_fp", "array<bigint>"), ("minhash_oph", _MINHASH_DT),
        ]
    ]


class Crawler:
    """Drives a crawl run over a Catalog of snapshot tables."""

    def __init__(
        self,
        spark: SparkSession,
        catalog_root: str,
        corpus: DataFrame,
        robots: DataFrame,
        cfg: CrawlConfig | None = None,
        run_id: str = "run",
        fetcher: Fetcher = simulated_fetch_bloom,
    ):
        self.spark = spark
        self.cfg = cfg or CrawlConfig()
        self.catalog = Catalog(spark, catalog_root)
        self.corpus = corpus
        self.robots = robots.cache()
        self.host_budgets = effective_host_budget(self.robots, self.cfg).cache()
        self.fetcher = fetcher
        self.run_id = run_id
        self.manifest = self.catalog.run_manifest(run_id)
        self.bloom: BloomFamily | None = (
            BloomFamily(self.cfg.bloom_shards, self.cfg.bloom_bits_per_shard, self.cfg.bloom_hashes)
            if self.cfg.use_bloom
            else None
        )
        self.step = 0
        # recrawl window (D3, north rule "bloom+cuckoo"): urls removed from
        # `seen` by requeue_for_refetch leave STALE bloom positives (bloom
        # bits can't delete). The delete-capable cuckoo tracks exactly that
        # window; seen_filter uses it to route stale-positive rows through a
        # broadcast pending-set check instead of the full-`seen` anti-join.
        # `_recrawl_pending` is the window's exact driver-side hash set
        # (bounded by control-plane requeue volume, not corpus size); the
        # cuckoo is its probe-optimized executor-side form. An entry MISSING
        # from the window is always safe (falls back to the exact rescue),
        # so crash-recovery ordering only ever drops entries, never keeps
        # stale ones (see _commit_rest / requeue ordering).
        self.recrawl_cf: CuckooFilter | None = None
        self._recrawl_pending: set[int] = set()
        # credential pools (R3): the token dim is tiny — always broadcastable;
        # None (the default) bypasses the token machinery entirely
        self.tokens_dim = (
            tokens_df(spark, self.cfg.token_specs, self.cfg.token_cap_per_step)
            if self.cfg.token_specs
            else None
        )
        self._live_cfg_mtime: float | None = None
        # link-score frontier prioritization (cfg.host_score_source): the
        # (host, host_score) dim recomputed at refresh boundaries from the
        # committed pages table — derived state, so resume needs no extra
        # lineage (see _compute_host_scores)
        self._host_scores: DataFrame | None = None
        self._host_scores_boundary = 0
        self._bloom_bc = None  # per-superstep broadcast of the bloom bitmaps
        # superstep pipelining state: one background commit in flight at most
        self._commit_pool = ThreadPoolExecutor(max_workers=1)
        self._pending: Future | None = None
        # pipelined mode: the full next-frontier STATE as an in-memory plan —
        # the next superstep selects from it without waiting for the
        # background frontier table write (both root in committed snapshots,
        # so recompute-after-unpersist stays correct). Cleared by any
        # control-plane mutation of the frontier table. The plan is used ONLY
        # while the write is still in flight — once landed, reads go back to
        # the table, which also truncates plan lineage (a cache does not:
        # chaining plans across many supersteps grows the logical tree
        # without bound and eventually OOMs plan stringification).
        self._next_frontier: DataFrame | None = None
        self._nf_depth = 0
        # last superstep's metrics plan (parquet-rooted) so the next select
        # never has to wait for the metrics table write
        self._last_metrics: DataFrame | None = None
        # smallest effective per-host budget — lets selection skip the
        # politeness window when it provably cannot bind (bench fast path)
        row = self.host_budgets.agg(F.min("host_budget").alias("m")).collect()
        self._min_budget = min(
            row[0]["m"] if row and row[0]["m"] is not None else self.cfg.host_budget,
            self.cfg.host_budget,
        )
        self._build_plan_fragments()

    def _build_plan_fragments(self) -> None:
        """Build the per-run STATIC plan fragments once.

        Column objects are immutable expression trees — reusable across
        queries — and constructing them costs a py4j round trip per node.
        Rebuilding the harvest/edges/frontier fragments inside every
        superstep was ~0.5-1 s of driver-side time per step (measured via
        SPARK_CRAWL_DEBUG_TIMING at 1 core): pure serial overhead, i.e. the
        fixed cost F that caps N→4N scaling efficiency. Rebuilt on live
        config reload (the fragments embed cfg-derived literals)."""
        cfg = self.cfg
        self._frontier_names = [f.name for f in FRONTIER_SCHEMA.fields]
        self._metrics_names = [
            f.name for f in self.catalog.table("metrics").schema.fields
        ]
        self._feat_cols = harvest_feature_cols(cfg)
        self._host_salt_col = F.pmod(
            F.xxhash64("host"), F.lit(cfg.frontier_partitions)
        ).cast("int")
        self._edges_depth_ceiling = policy_depth_col(F.col("policy"), cfg)
        self._w_first = Window.partitionBy("url_hash").orderBy("seq", "pos")
        self._metrics_aggs = [
            F.count("*").alias("selected"),
            F.sum((F.col("status") == 200).cast("long")).alias("fetched_ok"),
            F.sum((F.col("status") == 404).cast("long")).alias("fetched_404"),
            F.sum((F.col("status") >= 500).cast("long")).alias("failed"),
            F.sum("fetch_ms").alias("fetch_ms_sum"),
            F.min("fetch_ms").alias("fetch_ms_min"),
            F.sum(
                F.coalesce(F.octet_length("html"), F.lit(0)).cast("long")
            ).alias("bytes"),
        ]

    def _await_pending(self) -> None:
        """Barrier on the in-flight background commit (pipelined mode)."""
        if self._pending is not None:
            try:
                self._pending.result()
            finally:
                self._pending = None

    def prewarm(self) -> None:
        """Warm every hot execution path OUTSIDE any timed region.

        First-use costs — Python/Arrow worker spin-up for the mapInPandas
        stages, whole-stage-codegen compilation of the fetch-join/featurize/
        write plans, the parquet writer committer, the distributed bloom
        build's numpy path, and the simulated fetcher's one-time corpus
        membership broadcast — otherwise land inside the FIRST superstep of a
        throughput measurement (~10 s at 1 core, measured). Steady-state
        throughput is the quantity a scaling benchmark tests, so benches call
        this before starting the clock; both parallelism legs warm
        identically. Everything runs on a ≤64-row slice except the membership
        collect (inherently corpus-wide, one-time either way). Idempotent."""
        import shutil
        import tempfile

        cfg = self.cfg
        # one-time corpus membership structure for the bundled fetchers (the
        # real cost is corpus-wide; pay it here, not in superstep 0)
        from ospo_ghcrawler_spark.operators import fetch as _fetch

        if self.fetcher is _fetch.simulated_fetch:
            _fetch._corpus_url_set(self.corpus)
        elif self.fetcher is _fetch.simulated_fetch_bloom:
            _fetch._corpus_bloom(self.corpus)

        # tiny end-to-end pass: select-shaped rows → fetch → extract →
        # harvest featurize → parquet write (same plan shapes as a superstep)
        corpus_small = self.corpus.limit(64)
        sel = corpus_small.limit(1).select(
            "url",
            F.xxhash64("url").alias("url_hash"),
            host_col(F.col("url")).alias("host"),
            F.lit(0).cast("int").alias("priority"),
            F.lit(0).cast("int").alias("attempt"),
            F.lit(0).cast("int").alias("depth"),
            F.lit(0).cast("int").alias("enqueue_step"),
            F.lit(0).cast("long").alias("seq"),
            F.lit("default").alias("policy"),
            F.lit(0).cast("int").alias("fetch_salt"),
        )
        fetched = self.fetcher(sel, corpus_small, cfg)
        if not ("text" in fetched.columns and "links" in fetched.columns):
            fetched = with_extracted(fetched)  # same Arrow path as superstep
        harvest = fetched.select(
            "url", "warc_ts", "html", "text", "lang", "links",
            "url_hash", "host", "priority", "attempt", "depth",
            "enqueue_step", "seq", "policy",
            F.lit(0).cast("int").alias("superstep"),
            "status", "fetch_ms",
            F.md5(F.encode("text", "UTF-8")).alias("etag"),
            *harvest_feature_cols(cfg),
        )
        tmp = tempfile.mkdtemp(prefix="_prewarm_", dir=self.catalog.root)
        try:
            harvest.write.mode("overwrite").parquet(os.path.join(tmp, "pages"))
            if self.bloom is not None:
                build_bloom_distributed(
                    harvest.select("url_hash"), "url_hash",
                    self.bloom.shards, self.bloom.bits, self.bloom.k,
                )
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    # ------------------------------------------------------- live config (C6)

    def _maybe_reload_config(self) -> None:
        """Superstep-boundary live config reload — the reference's
        PATCH /config (routes/config.js:12-18) at superstep granularity: when
        the watched JSON file's mtime changes, its patches apply to the
        running config before the next selection. Derived state that depends
        on patched fields (host-budget dim, token dim) is rebuilt."""
        path = self.cfg.live_config_path
        if not path or not os.path.exists(path):
            return
        mtime = os.path.getmtime(path)
        if mtime == self._live_cfg_mtime:
            return
        self._live_cfg_mtime = mtime
        import json

        with open(path) as f:
            patches = json.load(f)
        old = self.cfg
        self.cfg = old.apply_patches(patches)
        if old.host_budget != self.cfg.host_budget:
            self.host_budgets.unpersist()
            self.host_budgets = effective_host_budget(self.robots, self.cfg).cache()
            row = self.host_budgets.agg(F.min("host_budget").alias("m")).collect()
            self._min_budget = min(
                row[0]["m"] if row and row[0]["m"] is not None else self.cfg.host_budget,
                self.cfg.host_budget,
            )
        if (
            old.token_specs != self.cfg.token_specs
            or old.token_cap_per_step != self.cfg.token_cap_per_step
        ):
            # POST /config/tokens — swap the credential pool live
            # (routes/config.js:30-34 setTokens)
            self.tokens_dim = (
                tokens_df(self.spark, self.cfg.token_specs, self.cfg.token_cap_per_step)
                if self.cfg.token_specs
                else None
            )
        self._build_plan_fragments()  # fragments embed cfg-derived literals

    # ------------------------------------------------------ token pools (R3)

    def exhaust_token(self, value: str, until_step: int) -> None:
        """Bench a credential until a restore superstep (tokenFactory.exhaust,
        tokenFactory.js:74-86) — e.g. on an upstream 403. The bench persists
        in the token dim; requests whose pools are fully benched defer to the
        soonest restore."""
        if self.tokens_dim is None:
            raise ValueError("no token pools configured (cfg.token_specs)")
        from ospo_ghcrawler_spark.operators.tokens import exhaust_tokens

        # token dim is O(credentials): collect+rebuild keeps it a local plan,
        # not an ever-growing lazy lineage chain
        updated = exhaust_tokens(self.tokens_dim, [value], until_step, current_step=self.step)
        rows = updated.collect()
        self.tokens_dim = self.spark.createDataFrame(rows, updated.schema)

    def _compute_host_scores(self, boundary: int) -> DataFrame:
        """(host, host_score) from the link graph harvested BEFORE
        *boundary* — integer scores only (backlink counts or fixed-point
        PageRank, operators/graph.py), so score-ranked selection stays
        bit-deterministic across partitionings AND across interrupt/resume
        (the boundary filter makes the dim a pure function of committed
        snapshots, never of in-flight work).

        Cost: one columnar pages scan pruned to (host, links, status,
        superstep) per refresh — html/text never read. At a 10^10-url
        history, swap the rescan for additive per-superstep backlink deltas
        folded into the dim (counts are additive; PageRank periodic); the
        join side stays O(hosts), always broadcastable.
        """
        pages = self.catalog.table("pages").read()
        ok = pages.filter(
            (F.col("status") == 200) & (F.col("superstep") < boundary)
        ).select("host", "links")
        edges = (
            ok.select(F.col("host").alias("src"), F.explode("links").alias("_u"))
            .select("src", host_col(F.col("_u")).alias("dst"))
            .filter(F.col("src") != F.col("dst"))
        )
        if self.cfg.host_score_source == "pagerank":
            from ospo_ghcrawler_spark.operators.graph import pagerank_fixed_point

            hosts = (
                edges.select(F.col("src").alias("doc_id"))
                .unionByName(edges.select(F.col("dst").alias("doc_id")))
                .distinct()
            )
            scores = pagerank_fixed_point(
                hosts, edges, iterations=self.cfg.host_score_iterations
            ).select(F.col("doc_id").alias("host"), F.col("rank_fp").alias("host_score"))
        else:  # "backlinks": additive in-link counts, the cheap signal
            scores = edges.groupBy(F.col("dst").alias("host")).agg(
                F.count(F.lit(1)).alias("host_score")
            )
        # O(hosts) rows: checkpoint eagerly so every superstep's selection
        # broadcasts a materialized dim instead of re-running the scan
        return scores.localCheckpoint(eager=True)

    def _desired_traits_col(self):
        """Per-row desired trait sets from the request's policy
        (cfg.policy_trait_sets; the reference attaches desired trait sets per
        request context, e.g. private repos want the 'private' pool)."""
        empty = F.array().cast("array<array<string>>")
        expr = empty
        for name, sets in sorted(self.cfg.policy_trait_sets.items()):
            arr = (
                F.array(*[F.array(*[F.lit(t) for t in s]) for s in sets])
                if sets
                else empty
            )
            expr = F.when(F.col("policy") == name, arr).otherwise(expr)
        return expr

    # ------------------------------------------------------------------ seed

    def _frontier_rows(
        self, urls: list[str], priority: int, step: int, policy: str = "default"
    ) -> DataFrame:
        p = self.cfg.frontier_partitions
        df = self.spark.createDataFrame(
            [(u, i) for i, u in enumerate(urls)], ["url", "seq"]
        ).withColumn("seq", F.col("seq").cast("long"))
        # canonicalize at the ingestion edge (identity layer); junk → null → dropped
        df = df.withColumn("url", canonicalize_udf("url")).filter(F.col("url").isNotNull())
        return (
            df.withColumn("url_hash", F.xxhash64("url"))
            .withColumn("host", host_col(F.col("url")))
            .withColumn("host_salt", F.pmod(F.xxhash64("host"), F.lit(p)).cast("int"))
            .withColumn("priority", F.lit(priority).cast("int"))
            .withColumn("attempt", F.lit(0))
            .withColumn("depth", F.lit(0))
            .withColumn("enqueue_step", F.lit(step).cast("int"))
            .withColumn("not_before_step", F.lit(step).cast("int"))
            .withColumn("policy", F.lit(policy))
            .select(*[f.name for f in FRONTIER_SCHEMA.fields])
        )

    def seed(
        self, urls: list[str], priority: int = PRIORITY_NORMAL, policy: str = "default"
    ) -> int:
        """Seed URLs onto the frontier (the reference's POST /requests,
        default queue 'normal' — /root/reference/routes/requests.js:22-28;
        per-request *policy* as routes/requests.js:79 — e.g. 'self' fetches
        the seed without walking, 'shallow' walks 2 deep).
        Deduped against seen + frontier before append."""
        self._await_pending()
        self._next_frontier = None  # table mutation: drop the in-memory plan
        rows = self._frontier_rows(urls, priority, self.step, policy)
        # within-list dedup must be deterministic: keep the lowest seq per
        # url_hash (dropDuplicates would keep a partition-order-dependent row)
        w_seed = Window.partitionBy("url_hash").orderBy("seq")
        rows = (
            rows.withColumn("_rk", F.row_number().over(w_seed))
            .filter(F.col("_rk") == 1)
            .drop("_rk")
        )
        rows = robots_allowed_filter(rows, self.robots)
        seen = self.catalog.table("seen").read()
        rows = seen_filter(rows, seen, fam=None)  # seeds are few — exact join
        frontier_t = self.catalog.table("frontier")
        rows = rows.join(frontier_t.read().select("url_hash"), "url_hash", "left_anti")
        frontier_t.append(rows.select(*[f.name for f in FRONTIER_SCHEMA.fields]))
        return frontier_t.current_snapshot()

    # -------------------------------------------------------------- superstep

    def superstep(self, pipelined: bool = False) -> dict:
        """Run one superstep; returns its stats. Empty selection → {}.

        With ``pipelined=True`` (used by :meth:`run`) the non-harvest table
        commits run in the background and the NEXT superstep's selection is
        computed ahead from in-memory lineage; callers driving supersteps
        manually get fully synchronous semantics by default.

        Stage citations: selection §2.1 Q2/Q10, politeness §2.3 R1-R5,
        fetch §2.4 F1, extract §2.4 F2, dedup §2.2 D1-D3, commit §2.1 Q3 +
        §2.5 S1/S6 of SURVEY.md.
        """
        self._maybe_reload_config()
        cfg, step = self.cfg, self.step
        debug_timing = os.environ.get("SPARK_CRAWL_DEBUG_TIMING")
        _t0 = time.time()
        _marks: list[tuple[str, float]] = []

        def _mark(label: str) -> None:
            if debug_timing:
                _marks.append((label, time.time() - _t0))

        frontier_t = self.catalog.table("frontier")
        seen_t = self.catalog.table("seen")

        # frontier state: in pipelined mode the previous superstep's frontier
        # TABLE write may still be in flight in the background — its full
        # next-state plan (self._next_frontier) is the current state and
        # selection reads from it; otherwise read the committed table.
        # Per-host benches come from the previous step's in-memory metrics
        # plan (parquet-rooted), so selection never waits on the backgrounded
        # metrics write. Multi-superstep benches (bench_supersteps > 1) need
        # the lookback window, so they read the committed metrics table
        # instead (ADVICE r01: a benched host emits no metrics while benched,
        # so a 1-step lookback expires benches early).
        if self._next_frontier is not None and not (
            self._pending is None or self._pending.done() or self._nf_depth >= 3
        ):
            # previous frontier write still in flight: select from the plan
            frontier = self._next_frontier.cache()
            self._nf_depth += 1
        else:
            if self._next_frontier is not None:
                self._await_pending()  # write landed (or depth bound hit)
                self._next_frontier = None
            frontier = frontier_t.read().cache()
            self._nf_depth = 0
        if cfg.compute_budget_ms >= COMPUTE_BUDGET_UNBOUND:
            # compute limiter provably cannot bind (budget set to the
            # unbound sentinel) — skip the benches aggregation + broadcast
            # join entirely: one fewer job per superstep, and the selection
            # plan stays a pure frontier scan (throughput-bench fast path,
            # mirrors selection's budget_unbound fast path)
            eligible_frontier = frontier
        else:
            if cfg.bench_supersteps <= 1 and self._last_metrics is not None:
                metrics_prev = self._last_metrics
            else:
                self._await_pending()
                metrics_prev = self.catalog.table("metrics").read()
            benches = compute_limiter_benches(metrics_prev, cfg, step)
            eligible_frontier = (
                frontier.join(F.broadcast(benches), on="host", how="left")
                .withColumn(
                    "not_before_step",
                    F.greatest("not_before_step", F.coalesce("bench_until", F.lit(0))),
                )
                .drop("bench_until")
            )
        # ---- link-score prioritization (beyond-reference frontier ranking) --
        # A host-level centrality score joins the frontier as the leading
        # within-priority order key (selection.py pick_order). Refreshed at
        # boundaries b ≡ 0 (mod k) from pages with superstep < b: a pure
        # function of the committed harvest, so an interrupted run resumes
        # with bit-identical scores and the golden resume-equality property
        # survives with scoring ON.
        if cfg.host_score_source != "none":
            k_refresh = max(1, cfg.host_score_refresh_every)
            boundary = step - (step % k_refresh)
            if boundary > 0 and self._host_scores_boundary != boundary:
                self._host_scores = self._compute_host_scores(boundary)
                self._host_scores_boundary = boundary
            if self._host_scores is not None:
                eligible_frontier = eligible_frontier.join(
                    F.broadcast(self._host_scores), "host", "left"
                ).withColumn("host_score", F.coalesce("host_score", F.lit(0)))
        selected, n_selected, max_wake, total_eligible = select_batch(
            eligible_frontier, self.host_budgets, cfg, step, min_host_budget=self._min_budget
        )
        _mark("select")
        if n_selected == 0:
            # nothing fetchable NOW — but deferred/benched rows may wake at a
            # later step (the reference's defer/bench semantics, amqp10Queue
            # _deferUntil). Idle-advance while any statically-eligible row has
            # a future wake-up; return {} only on true exhaustion/starvation.
            # (the unbound fast path returned max_wake from its stats job —
            # zero extra jobs; the windowed path computes it here, lazily)
            if max_wake is None:
                static = eligible_frontier.filter(F.col("depth") <= cfg.max_depth)
                if cfg.allowed_hosts is not None:
                    static = static.filter(F.col("host").isin(*cfg.allowed_hosts))
                row = static.agg(F.max("not_before_step").alias("m")).collect()
                max_wake = row[0]["m"]
            frontier.unpersist()
            if max_wake is not None and max_wake > step:
                self.step = step + 1
                return {"selected": 0, "new_edges": 0, "bounced": 0, "idle": True}
            return {}

        # ---- credential pools (R3): trait-matched token assignment ----------
        # sel_all = the full selection (leaves the frontier); `selected`
        # narrows to the token-granted rows when pools are configured —
        # pool-benched rows defer to their wake step, pool-less rows
        # dead-letter (the reference's null-token hard miss)
        sel_all = selected
        tok_defer = tok_dead = None
        if self.tokens_dim is not None:
            assigned = assign_tokens(
                sel_all.withColumn("desired_traits", self._desired_traits_col()),
                self.tokens_dim,
                step,
            )
            if cfg.token_cap_per_step:
                assigned = apply_token_caps(assigned, self.tokens_dim, step)
            assigned = assigned.drop("desired_traits").cache()
            fetchable, deferred = split_fetchable(assigned)
            tok_defer = (
                deferred.filter(F.col("token_wake").isNotNull())
                .withColumn(
                    "not_before_step",
                    F.greatest(F.col("token_wake").cast("int"), F.lit(step + 1)),
                )
                .select(*self._frontier_names)
            )
            tok_dead = deferred.filter(F.col("token_wake").isNull()).select(
                "url",
                "url_hash",
                "host",
                F.lit("no_matching_token").alias("error"),
                F.col("attempt").cast("int").alias("attempt"),
                F.col("enqueue_step").alias("first_seen_step"),
                F.lit(step).cast("int").alias("last_error_step"),
            )
            selected = fetchable.drop("token", "token_wake")
            n_selected = selected.count()

        # fetch + fused text/link extraction. The fetcher owns its input
        # distribution: the simulated fetcher streams the corpus scan in
        # place (broadcast joins, html never shuffles); a real network
        # fetcher repartitions `selected` by fetch_salt so one hot host
        # cannot straggle a task (the salt is already on the rows).
        if debug_timing:
            selected.count()  # profile-only: split batch-cache materialization
            _mark("sel_mat")  # out of the harvest job's wall
        # conditional-GET hints (fetchers that declare wants_etag_hints,
        # e.g. the network fetcher): attach each selected url's last-seen
        # RESPONSE ETag from the doc store as an `etag_hint` column. A
        # broadcast semi-join reduction keyed on the (politeness-bounded,
        # small) batch — the pages table streams ONCE, pruned to three
        # columns, and never shuffles; fresh urls simply get a null hint
        # (reference etag replay, lib/crawlerFactory.js:669-679). Gated on
        # the fetcher attribute so corpus-simulated crawls pay nothing.
        if getattr(self.fetcher, "wants_etag_hints", False):
            prior_etags = (
                self.catalog.table("pages")
                .read()
                .filter((F.col("status") == 200) & F.col("http_etag").isNotNull())
                .select("url_hash", "http_etag", "superstep")
                .join(
                    F.broadcast(selected.select("url_hash").distinct()),
                    "url_hash",
                    "leftsemi",
                )
                .groupBy("url_hash")
                .agg(F.max_by("http_etag", "superstep").alias("etag_hint"))
            )
            selected = selected.join(F.broadcast(prior_etags), "url_hash", "left")
        fetched = self.fetcher(selected, self.corpus, cfg)
        if "text" in fetched.columns and "links" in fetched.columns:
            extracted = fetched  # fetcher fused extraction into its Arrow pass
        else:
            # scalar struct UDF, not mapInPandas: only (html, url) cross to
            # Python and only (text, links) come back — html and the 13
            # metadata columns stay JVM-side instead of round-tripping
            # through Arrow (BENCH/SCALING_NOTES §3g/§3h: per-page byte
            # traffic is the wide-leg tax on a shared-bus host)
            extracted = with_extracted(fetched)

        # ---- commit the harvest FIRST (the only pass over html) -------------
        # Everything downstream derives from the snapshot just written: the
        # fetch+extract pipeline executes exactly once, and later reads prune
        # html/text away (columnar scan) instead of re-materializing them.
        pages_t = self.catalog.table("pages")
        feat_cols = self._feat_cols
        # fetcher-optional columns (network fetcher emits them; simulated
        # fetchers don't — null-fill so the harvest schema is uniform)
        def _opt(c: str):
            return (
                F.col(c) if c in extracted.columns else F.lit(None).cast("string")
            ).alias(c)

        harvest = extracted.select(
            "url", "warc_ts", "html", "text", "lang", "links",
            "url_hash", "host", "priority", "attempt", "depth",
            "enqueue_step", "seq", "policy",
            F.lit(step).cast("int").alias("superstep"),
            "status", "fetch_ms",
            F.md5(F.encode("text", "UTF-8")).alias("etag"),
            _opt("redirect_to"), _opt("http_etag"),
            *feat_cols,
        )
        pages_sid = pages_t.append(harvest)
        _mark("w_pages")

        log = pages_t.read_delta(pages_sid)  # slim columnar re-read
        ok = log.filter(F.col("status") == 200)
        failed = log.filter(F.col("status") >= 500)

        # ---- new edges: explode → scope/robots → dedup → sequence ----------
        # edges inherit the parent request's traversal policy straight from
        # the harvest log (policy rides the pages row — no join back to the
        # selected batch) and expansion honors the policy's depth ceiling —
        # the reference's per-request walk scope (routes/requests.js:79,
        # TraversalPolicy)
        # meta-robots nofollow (cfg.respect_meta_robots): a page that opts
        # out of link-following contributes no edges — the page-level analog
        # of robots.txt, honored as a pure JVM regexp filter inside the same
        # stage that explodes links (functions/extract.py:meta_robots_flags)
        link_src = ok
        if cfg.respect_meta_robots:
            from ospo_ghcrawler_spark.functions.extract import meta_robots_flags

            link_src = ok.filter(~meta_robots_flags(F.col("html"))["nofollow"])
        links = (
            link_src.select(
                "seq", "policy",
                (F.col("depth") + 1).alias("depth"),
                F.posexplode("links").alias("pos", "url"),
            )
            .select(
                "*",
                F.xxhash64("url").alias("url_hash"),
                host_col(F.col("url")).alias("host"),
            )
            .filter(F.col("depth") <= self._edges_depth_ceiling)
        )
        edges = links
        # redirect targets (fetchers that declare emits_redirects, e.g. the
        # network fetcher): a 3xx settles under its ORIGINAL url; its
        # Location re-enters here as one more edge — through the SAME
        # canonicalize → scope → robots → attenuation → seen-dedup path as
        # any extracted link, so a page that 301s to a robots-disallowed
        # target is never fetched (ADVICE r4; the reference treats redirect
        # targets as new requests). pos=-1 ranks the redirect ahead of the
        # page's extracted links in first-occurrence attenuation. Gated on
        # the fetcher attribute so simulated crawls add no plan branch.
        if getattr(self.fetcher, "emits_redirects", False):
            from ospo_ghcrawler_spark.functions.urls import canonicalize_col

            redirect_edges = (
                log.filter(
                    F.col("status").between(300, 399)
                    & F.col("redirect_to").isNotNull()
                )
                .select(
                    "seq", "policy",
                    (F.col("depth") + 1).alias("depth"),
                    F.lit(-1).alias("pos"),
                    canonicalize_col(F.col("redirect_to")).alias("url"),
                )
                .filter(F.col("url").isNotNull())
                .select(
                    "*",
                    F.xxhash64("url").alias("url_hash"),
                    host_col(F.col("url")).alias("host"),
                )
                .filter(F.col("depth") <= self._edges_depth_ceiling)
            )
            edges = links.unionByName(redirect_edges)
        if cfg.allowed_hosts is not None:
            edges = edges.filter(F.col("host").isin(*cfg.allowed_hosts))
        edges = robots_allowed_filter(edges, self.robots)

        # attenuation: first-occurrence wins deterministically (parent seq, pos)
        edges = (
            edges.withColumn("_rk", F.row_number().over(self._w_first))
            .filter(F.col("_rk") == 1)
            .drop("_rk")
        )
        n_edges_raw = edges.count() if cfg.collect_stats else -1
        _mark("edges_raw")

        # barrier: last step's seen/bloom commits must be visible before
        # dedup (their writes overlapped this step's select+fetch+extract)
        self._await_pending()
        _mark("barrier")
        seen = seen_t.read()
        if self.bloom is not None and self._bloom_bc is None:
            self._bloom_bc = self.spark.sparkContext.broadcast(self.bloom.bitmaps)
        # active recrawl window → hand seen_filter the cuckoo + the exact
        # pending set (tiny, broadcast) so stale bloom positives skip the
        # full-`seen` anti-join
        recrawl_df = None
        if self.recrawl_cf is not None and self._recrawl_pending:
            recrawl_df = self.spark.createDataFrame(
                [(h,) for h in sorted(self._recrawl_pending)], "url_hash long"
            )
        edges = seen_filter(
            edges, seen, fam=self.bloom, bc=self._bloom_bc,
            recrawl_cf=self.recrawl_cf if recrawl_df is not None else None,
            recrawl_pending=recrawl_df,
        )
        # also anti-join what's still on the frontier (tracker semantics, D2).
        # `frontier` is the PRE-removal state, so it still contains this
        # superstep's own fetches — one anti-join covers both (their seen
        # rows commit below)
        edges = edges.join(frontier.select("url_hash"), "url_hash", "left_anti")
        # dead-lettered urls are neither seen nor on the frontier — without
        # this anti-join a later link rediscovery silently re-enqueues and
        # re-exhausts them. The reference parks failed requests in the
        # deadletter STORE until the operator explicitly requeues
        # (routes/deadletters.js:26-31 — our requeue_deadletters, which
        # clears the table so rediscovery works again after requeue). Only
        # possible when failures are expected; the dl table is
        # failure-bounded, so AQE broadcasts this join at any corpus scale.
        if cfg.expect_failures:
            edges = edges.join(
                self.catalog.table("deadletters").read().select("url_hash"),
                "url_hash",
                "left_anti",
            )

        if n_selected <= cfg.fifo_links_threshold:
            # exact FIFO: (parent seq, link position) order — single-partition
            # sort, bounded by the small-batch threshold
            w_seq = Window.orderBy("seq", "pos")
            seq_col = F.lit(step + 1) * F.lit(1 << 32) + F.row_number().over(w_seq)
        else:
            # bulk path: deterministic hash tie-break (no global sort);
            # still a pure function of (step, url) → parallelism-invariant
            seq_col = F.lit(step + 1) * F.lit(1 << 32) + F.xxhash64("url").bitwiseAND(
                F.lit((1 << 32) - 1)
            )
        new_rows = (
            edges.withColumns({
                "seq": seq_col.cast("long"),
                "host_salt": self._host_salt_col,
                "priority": F.lit(PRIORITY_NORMAL).cast("int"),
                "attempt": F.lit(0),
                "enqueue_step": F.lit(step + 1).cast("int"),
                "not_before_step": F.lit(step + 1).cast("int"),
            })
            .select(*self._frontier_names)
        ).cache()
        # provable termination (fast stop): the unbound-path stats job already
        # showed this batch covers EVERY eligible-now row and nothing wakes
        # later — if additionally no new edges survived dedup (and no retry /
        # token-deferral re-entry is possible), the post-removal frontier
        # provably holds no selectable row, so run() can stop WITHOUT the
        # trailing empty-check selection. That final selection is pure fixed
        # overhead on both legs of the N→4N scaling bench (it scans the
        # next-frontier plan just to find it empty). Counting new_rows here
        # is critical-path-neutral: the count populates the same cache the
        # frontier write / next selection would have to materialize anyway.
        fast_stop_possible = (
            total_eligible is not None
            and self.tokens_dim is None
            and not cfg.expect_failures
            and n_selected == total_eligible
            and (max_wake is None or max_wake <= step)
        )
        n_new_exact = (
            new_rows.count() if (cfg.collect_stats or fast_stop_possible) else None
        )
        n_new = n_new_exact if cfg.collect_stats else -1  # -1 = stats not collected
        _mark("new_rows")

        # ---- retries & dead letters ----------------------------------------
        retry = None if not cfg.expect_failures else (
            failed  # policy rides the log row — no join back to the batch
            .filter(F.col("attempt") + 1 < cfg.max_attempts)
            .withColumns({
                "attempt": (F.col("attempt") + 1).cast("int"),
                "priority": F.when(
                    F.col("priority") <= 1, F.lit(cfg.retry_priority)
                ).otherwise(F.col("priority")).cast("int"),
                "not_before_step": F.lit(step + cfg.defer_supersteps).cast("int"),
                "host_salt": self._host_salt_col,
            })
            .select(*self._frontier_names)
        )
        dead = None if not cfg.expect_failures else (
            failed.filter(F.col("attempt") + 1 >= cfg.max_attempts)
            .select(
                "url",
                "url_hash",
                "host",
                F.lit("fetch_failed").alias("error"),
                (F.col("attempt") + 1).cast("int").alias("attempt"),
                F.col("enqueue_step").alias("first_seen_step"),
                F.lit(step).cast("int").alias("last_error_step"),
            )
        )
        if tok_dead is not None:
            dead = tok_dead if dead is None else dead.unionByName(tok_dead)

        # ---- settled + metrics ----------------------------------------------
        settled = log.filter(F.col("status") < 500)  # 200 & 404 leave the frontier
        new_seen = settled.select(
            "url_hash", "url", F.lit(step).cast("int").alias("first_seen_step"), "status"
        )
        metrics = (
            log.groupBy("host")
            .agg(*self._metrics_aggs)
            .withColumns({
                "superstep": F.lit(step).cast("int"),
                "new_edges": F.lit(0).cast("long"),
                "dedup_bounced": F.lit(0).cast("long"),
            })
            .select(*self._metrics_names)
        )
        # per-step edge/dedup counts ride on a synthetic "__run__" row —
        # built as a pure JVM literal plan; spark.createDataFrame here costs
        # a Python→JVM schema/pickle round trip (~0.3-0.5 s) on every
        # superstep's critical path
        run_row = self.spark.range(1).select(
            F.lit(step).cast("int").alias("superstep"),
            F.lit("__run__").alias("host"),
            F.lit(int(n_selected)).cast("long").alias("selected"),
            F.lit(0).cast("long").alias("fetched_ok"),
            F.lit(0).cast("long").alias("fetched_404"),
            F.lit(0).cast("long").alias("failed"),
            F.lit(int(n_new)).cast("long").alias("new_edges"),
            F.lit(int(n_edges_raw - n_new)).cast("long").alias("dedup_bounced"),
            F.lit(0).cast("long").alias("fetch_ms_sum"),
            F.lit(None).cast("long").alias("fetch_ms_min"),
            F.lit(0).cast("long").alias("bytes"),
        )

        # ---- next frontier ----------------------------------------------------
        # the selected-keys anti-join broadcasts (batch-bounded, scale-safe);
        # removal covers the FULL selection — token-deferred rows re-enter
        # below with their wake step
        sel_keys = F.broadcast(sel_all.select("url_hash"))
        remaining = frontier.join(sel_keys, "url_hash", "left_anti")
        next_frontier = remaining.unionByName(new_rows)
        if retry is not None:
            next_frontier = next_frontier.unionByName(retry)
        if tok_defer is not None:
            next_frontier = next_frontier.unionByName(tok_defer)
        next_frontier = next_frontier.select(*self._frontier_names)
        pipeline_frontier = pipelined and cfg.pipelined_frontier_commit
        if pipeline_frontier:
            # the plan is handed to the NEXT superstep's selection while the
            # table write is still in flight; a lazy local checkpoint makes
            # it a LEAF (LogicalRDD) — without truncation every superstep's
            # plan embeds ~10 copies of the previous one (selection branches
            # + anti-joins), an exponential tree that OOMs plan analysis.
            # Materialized once by the background write job; the step after
            # next reads the committed table again (lineage re-rooted).
            next_frontier = next_frontier.localCheckpoint(eager=False)

        # ---- commit -----------------------------------------------------------
        # frontier is written synchronously (the next selection depends on
        # it); the independent group — seen, metrics, deadletters, bloom,
        # run-manifest — commits in the background and overlaps the next
        # superstep's select+fetch+extract. The run-manifest entry remains
        # the atomic superstep commit point: it is written only after every
        # table write of this superstep has finished.
        stats = {
            "selected": n_selected,
            "new_edges": n_new,
            "bounced": int(n_edges_raw - n_new),
            # frontier provably empty after this commit → run() stops without
            # the trailing empty-check selection (see fast_stop_possible)
            "exhausted": bool(fast_stop_possible and n_new_exact == 0),
        }
        metrics_all = metrics.unionByName(run_row)
        self._last_metrics = metrics  # parquet-rooted plan for next benches
        retire = [frontier, sel_all, new_rows]
        if self.tokens_dim is not None:
            retire.append(assigned)

        # incremental commit: only host_salt partitions holding selected /
        # new / retried rows changed this superstep; untouched partitions'
        # files stay byte-identical on disk (scale path: never rewrite the
        # whole 10^10-row frontier). Touched-set discovery reads only cached
        # slim columns — and is skipped entirely for dense batches, where
        # every partition is touched with near-certainty and a full overwrite
        # is always-correct anyway. Full overwrite also fires every
        # compact_chain_len layers to bound read fan-in.
        touched_src = sel_all.select("host_salt").unionByName(new_rows.select("host_salt"))
        if retry is not None:
            touched_src = touched_src.unionByName(retry.select("host_salt"))
        dense_batch = n_selected >= cfg.frontier_partitions * 64

        # snapshot ids for the manifest are captured AT WRITE TIME (the
        # append/overwrite return values), never via current_snapshot() inside
        # the background commit — the next superstep's synchronous pages
        # append can land before this group finishes, and a manifest entry
        # pointing at a later pages snapshot would duplicate that harvest on
        # resume (ADVICE r01, high).
        dead_sid_prev = self.catalog.table("deadletters").current_snapshot()

        def _frontier_job() -> int:
            if not cfg.incremental_frontier or dense_batch:
                touched = list(range(cfg.frontier_partitions))
            else:
                touched = sorted(
                    r["host_salt"] for r in touched_src.distinct().collect()
                )
            if (
                len(touched) >= cfg.frontier_partitions
                or frontier_t.chain_length() + 1 >= cfg.compact_chain_len
            ):
                return frontier_t.overwrite(next_frontier)
            return frontier_t.replace_partitions(
                next_frontier.filter(F.col("host_salt").isin(touched)),
                touched,
                "host_salt",
            )

        # default: the frontier write is synchronous (the next selection
        # depends on the table). With cfg.pipelined_frontier_commit the write
        # joins the background group instead and the next superstep selects
        # from the in-memory next-frontier plan; the dedup-phase barrier
        # guarantees the write has landed before anything else depends on
        # the table.
        sync_frontier_sid: int | None = None
        if not pipeline_frontier:
            sync_frontier_sid = _frontier_job()
            _mark("w_frontier")

        def _commit_rest() -> None:
            def _bloom_job():
                # distributed bitmap build (only shard bitmaps reach the
                # driver) — the same path that holds at 10^10 urls/superstep
                return build_bloom_distributed(
                    new_seen, "url_hash", self.bloom.shards, self.bloom.bits, self.bloom.k
                )

            with ThreadPoolExecutor(max_workers=5) as ex:
                futs = {
                    "seen": ex.submit(seen_t.append, new_seen),
                    "metrics": ex.submit(self.catalog.table("metrics").append, metrics_all),
                }
                if sync_frontier_sid is None:
                    futs["frontier"] = ex.submit(_frontier_job)
                if dead is not None:
                    futs["dead"] = ex.submit(self.catalog.table("deadletters").append, dead)
                if self.bloom is not None:
                    futs["bloom"] = ex.submit(_bloom_job)
                results = {k: f.result() for k, f in futs.items()}

            if self.bloom is not None:
                self.bloom.bitmaps |= results["bloom"].bitmaps
                self.bloom.save(self._bloom_path(step))
                if self._bloom_bc is not None:
                    self._bloom_bc.unpersist()
                    self._bloom_bc = None  # rebroadcast lazily next superstep
            if self._recrawl_pending:
                # drain the recrawl window: settled urls leave the cuckoo.
                # Filter is bounded by |pending| (isin over a control-plane
                # set), never a corpus scan. Ordered BEFORE the manifest
                # commit point: a crash in between rolls `seen` back, so a
                # drained entry's url is un-seen again and the missing
                # window entry routes through the (safe) exact rescue.
                import numpy as np

                pend = list(self._recrawl_pending)
                done = [
                    r["url_hash"]
                    for r in new_seen.filter(F.col("url_hash").isin(pend))
                    .select("url_hash")
                    .collect()
                ]
                if done:
                    self.recrawl_cf.remove(np.array(done, dtype=np.int64))
                    self._recrawl_pending.difference_update(done)
                    self._save_recrawl()
            self.manifest.record(
                step,
                {
                    "frontier": results.get("frontier", sync_frontier_sid),
                    "pages": pages_sid,
                    "seen": results["seen"],
                    "deadletters": results.get("dead", dead_sid_prev),
                    "metrics": results["metrics"],
                },
                stats,
            )
            for df in retire:
                df.unpersist()
            # compaction cadence: fold append chains once read fan-in crosses
            # the threshold (Iceberg rewrite_data_files). Runs after the
            # manifest commit point; resume to a pre-compaction snapshot id
            # stays valid because layer dirs are never deleted.
            for tname in ("seen", "metrics"):
                t = self.catalog.table(tname)
                if t.chain_length() >= cfg.compact_chain_len:
                    t.compact()

        if pipelined:
            self._next_frontier = next_frontier if pipeline_frontier else None
            self._pending = self._commit_pool.submit(_commit_rest)
        else:
            _commit_rest()
            self._next_frontier = None
        _mark("commit_submit")

        if debug_timing:
            deltas = []
            prev = 0.0
            for label, t in _marks:
                deltas.append(f"{label}={t - prev:.2f}")
                prev = t
            print(f"[step {step}] n={n_selected} total={prev:.2f}s " + " ".join(deltas), flush=True)
        self.step = step + 1
        return stats

    def _bloom_path(self, step: int) -> str:
        d = os.path.join(self.catalog.root, "_bloom")
        os.makedirs(d, exist_ok=True)
        return os.path.join(d, f"bloom_{step:06d}.npz")

    # -------------------------------------------------- recrawl window (D3)

    def _recrawl_path(self) -> str:
        d = os.path.join(self.catalog.root, "_bloom")
        os.makedirs(d, exist_ok=True)
        return os.path.join(d, "recrawl.npz")

    def register_recrawl(self, url_hashes: list[int]) -> None:
        """Enter urls into the recrawl window — called by
        control.requeue_for_refetch AFTER the `seen` rows are deleted (a
        window entry whose seen row still exists would confirm a seen url as
        fresh; the reverse order can only lose entries, which is safe)."""
        if not self.cfg.recrawl_cuckoo or not url_hashes:
            return
        import numpy as np

        if self.recrawl_cf is None:
            self.recrawl_cf = CuckooFilter(self.cfg.recrawl_cuckoo_buckets)
        fresh = [h for h in url_hashes if h not in self._recrawl_pending]
        self.recrawl_cf.add(np.array(fresh, dtype=np.int64))
        self._recrawl_pending.update(fresh)
        self._save_recrawl()

    def _save_recrawl(self) -> None:
        import numpy as np

        path = self._recrawl_path()
        if not self._recrawl_pending:
            if os.path.exists(path):
                os.remove(path)
            return
        tmp = path + ".tmp"
        np.savez(tmp, pending=np.array(sorted(self._recrawl_pending), dtype=np.int64))
        os.replace(tmp + ".npz", path)

    def _load_recrawl(self) -> None:
        """Restore the recrawl window on resume. Resume rolls tables back to
        the last MANIFEST snapshot, which undoes any control-plane requeue
        made after it — so a persisted entry whose `seen` deletion was rolled
        back must be dropped (it would confirm a seen url as fresh). The
        window is reconciled against the restored `seen` table (one bounded
        isin probe) and the cuckoo is rebuilt exactly from the survivors."""
        import numpy as np

        path = self._recrawl_path()
        if not os.path.exists(path) or not self.cfg.recrawl_cuckoo:
            return
        pend = [int(h) for h in np.load(path)["pending"]]
        if pend:
            seen = self.catalog.table("seen").read()
            rolled_back = {
                r["url_hash"]
                for r in seen.filter(F.col("url_hash").isin(pend))
                .select("url_hash")
                .collect()
            }
            pend = [h for h in pend if h not in rolled_back]
        self._recrawl_pending = set(pend)
        if pend:
            self.recrawl_cf = CuckooFilter(self.cfg.recrawl_cuckoo_buckets)
            self.recrawl_cf.add(np.array(sorted(pend), dtype=np.int64))
        self._save_recrawl()

    def clear_recrawl(self) -> None:
        self.recrawl_cf = None
        self._recrawl_pending = set()
        path = self._recrawl_path()
        if os.path.exists(path):
            os.remove(path)

    # ------------------------------------------------------------------- run

    def run(self, max_supersteps: int = 1000, pipelined: bool = True) -> dict:
        """Crawl to frontier exhaustion (or the superstep cap)."""
        totals = {"supersteps": 0, "selected": 0, "new_edges": 0, "bounced": 0}
        try:
            for _ in range(max_supersteps):
                stats = self.superstep(pipelined=pipelined)
                if not stats:
                    break
                if stats.get("idle"):
                    continue  # politeness pause — clock advanced, work remains
                totals["supersteps"] += 1
                for k in ("selected", "new_edges", "bounced"):
                    totals[k] += stats[k]
                if stats.get("exhausted"):
                    break  # frontier provably empty — skip the empty-check step
        finally:
            self._await_pending()  # run() returns only fully committed
        return totals

    # ---------------------------------------------------------------- resume

    @classmethod
    def resume(
        cls,
        spark: SparkSession,
        catalog_root: str,
        corpus: DataFrame,
        robots: DataFrame,
        cfg: CrawlConfig | None = None,
        run_id: str = "run",
        fetcher: Fetcher = simulated_fetch_bloom,
    ) -> "Crawler":
        """Reopen a run exactly where its last committed superstep left it:
        roll every table back to the manifest's snapshot ids and reload the
        bloom sidecar (north-rule exact-resume requirement)."""
        c = cls(spark, catalog_root, corpus, robots, cfg, run_id, fetcher)
        last = c.manifest.last()
        if last is None:
            return c
        for name, sid in last["tables"].items():
            c.catalog.table(name).set_current(sid)
        c.step = last["superstep"] + 1
        if c.bloom is not None:
            path = c._bloom_path(last["superstep"])
            if os.path.exists(path):
                c.bloom = BloomFamily.load(path)
        c._load_recrawl()
        return c
