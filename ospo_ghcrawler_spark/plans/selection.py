"""Superstep selection — the distributed "pop" of the priority QueueSet.

The reference pops one request at a time from five weighted FIFO queues
(QueueSet weights {events:10, immediate:3, soon:2, normal:3, later:2},
/root/reference/lib/crawlerFactory.js:80,573-580). Here a superstep selects a
whole batch in one deterministic DataFrame plan:

1. eligibility filter — ``not_before_step <= step`` (defer/bench semantics of
   ``_deferUntil``, /root/reference/providers/queuing/amqp10Queue.js:238-251)
   and depth/scope caps;
2. per-host politeness rank — ``row_number() over (partition by host order by
   priority, enqueue_step, seq)`` kept to the host budget (token call cap);
3. weighted priority quotas — batch split proportionally to the reference's
   pop weights, with deterministic spill of unused quota to other priorities
   (QueueSet's best-effort weighted interleave);
4. per-priority top-k by FIFO order — ``orderBy(...).limit(q)`` compiles to
   TakeOrderedAndProject (per-partition top-k + merge), NOT a global sort;
5. hot-host salting for the fetch stage — hosts over the fan-out threshold
   get per-url salt so one mega-host spreads across all partitions
   (north-rule skew defeat).

Everything is a pure function of (frontier state, step) with total-order
tie-breakers, so the selected set is identical at any parallelism level —
the property the golden-traversal and resume tests pin.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ospo_ghcrawler_spark.config import CrawlConfig


def policy_depth_col(policy, cfg: CrawlConfig):
    """Effective max depth of a request given its traversal policy
    (reference Request.policy, routes/requests.js:79): the policy's ceiling
    min'd with the run-wide max_depth; unlisted policies walk to max_depth."""
    expr = F.lit(cfg.max_depth)
    for name, d in sorted(cfg.policy_depths.items()):
        expr = F.when(policy == name, F.least(F.lit(d), F.lit(cfg.max_depth))).otherwise(expr)
    return expr


def allocate_quotas(cfg: CrawlConfig, avail: dict[int, int]) -> dict[int, int]:
    """Deterministic batch split across priorities by pop weight, spilling
    unused quota to priorities that still have eligible rows."""
    quotas = {p: 0 for p in cfg.weights}
    remaining = cfg.batch_size
    # iterate until no progress: proportional grant capped by availability
    while remaining > 0:
        live = {p: w for p, w in cfg.weights.items() if avail.get(p, 0) > quotas[p] and w > 0}
        if not live:
            break
        total_w = sum(live.values())
        granted = 0
        for p in sorted(live):  # stable order
            share = max(1, (remaining * live[p]) // total_w)
            take = min(share, avail[p] - quotas[p], remaining - granted)
            quotas[p] += take
            granted += take
            if granted >= remaining:
                break
        if granted == 0:
            break
        remaining -= granted
        if not cfg.spill_quota:
            break
    return quotas


def select_batch(
    frontier: DataFrame,
    host_budgets: DataFrame,
    cfg: CrawlConfig,
    step: int,
    min_host_budget: int | None = None,
) -> tuple[DataFrame, int, int | None, int | None]:
    """(selected batch, its row count, max future wake-up step or None,
    total statically-eligible-now row count or None).

    Exactly ONE Spark job runs here (the per-priority stats aggregation);
    the selected row count is derived from quotas vs availability (a
    ``limit(q)`` picks exactly ``min(q, avail)`` rows), never re-counted,
    and the batch itself stays lazy — its first consumer (the fetch stage)
    materializes it into the per-superstep cache.

    *min_host_budget* (the smallest effective budget across hosts, computed
    once per run) lets the plan skip the per-host window entirely when the
    budget provably cannot bind (budget ≥ batch size) — the unbounded-budget
    fast path. On that path the same stats job also returns the max future
    ``not_before_step`` so an empty selection needs NO extra job to decide
    idle-advance vs termination (max_wake is None on the windowed path —
    the caller computes it lazily, only when the selection is empty), plus
    the TOTAL eligible-now count — when the batch covers it entirely and
    max_wake ≤ step, the caller can prove the post-removal frontier holds
    no selectable rows and terminate without running another selection
    (provable-termination fast stop; the trailing empty-check superstep is
    pure fixed overhead on both legs of the N→4N scaling bench).
    ``total_eligible`` is None on the windowed path.
    """
    # starvation-free priority aging (cfg.priority_age_every > 0): a request
    # waiting w supersteps is promoted floor(w / k) CONFIGURED tiers for
    # this selection only — `_orig_priority` restores the stored value on
    # the way out, so requeue/lineage never see the promotion. A pure JVM
    # expression of (priority, enqueue_step, step): selection stays a pure
    # function of (frontier, step), so determinism/resume properties hold.
    aged = cfg.priority_age_every > 0
    if aged:
        tiers = sorted(cfg.weights)
        arr = F.array(*[F.lit(t) for t in tiers])
        idx_col = None
        for i, t in enumerate(tiers):
            c = F.when(F.col("priority") == t, F.lit(i))
            idx_col = c if idx_col is None else idx_col.when(F.col("priority") == t, F.lit(i))
        idx_col = idx_col.otherwise(F.lit(len(tiers) - 1))
        promo = F.greatest(
            F.floor((F.lit(step) - F.col("enqueue_step")) / cfg.priority_age_every),
            F.lit(0),
        ).cast("int")
        eff = F.element_at(arr, F.greatest(F.lit(0), idx_col - promo) + 1)
        frontier = frontier.withColumn("_orig_priority", F.col("priority")).withColumn(
            "priority", eff
        )

    static = frontier.filter(F.col("depth") <= cfg.max_depth)
    if cfg.allowed_hosts is not None:
        static = static.filter(F.col("host").isin(*cfg.allowed_hosts))
    eligible = static.filter(F.col("not_before_step") <= step)

    # link-score prioritization (cfg.host_score_source): when the engine
    # joined a host_score column, it becomes the leading order key WITHIN a
    # priority level — FIFO breaks ties, so the plan stays a pure function
    # of (frontier, step). Constant per host, so the politeness window's
    # per-host ordering is untouched.
    has_score = "host_score" in frontier.columns
    fifo_keys = ["enqueue_step", "seq", "url_hash"]
    pick_order = ([F.desc("host_score")] if has_score else []) + [
        F.col(c) for c in fifo_keys
    ]

    budget_unbound = min_host_budget is not None and min_host_budget >= cfg.batch_size
    max_wake: int | None = None
    total_eligible: int | None = None
    if budget_unbound:
        budgeted = eligible.withColumn("_host_rank", F.lit(1))
        # one job: per-priority eligible counts + the future wake horizon
        stats = (
            static.groupBy("priority")
            .agg(
                F.count(F.when(F.col("not_before_step") <= step, 1)).alias("cnt"),
                F.max("not_before_step").alias("wake"),
            )
            .collect()
        )
        avail = {r["priority"]: r["cnt"] for r in stats if r["cnt"] > 0}
        wakes = [r["wake"] for r in stats if r["wake"] is not None]
        max_wake = max(wakes) if wakes else None
        total_eligible = sum(avail.values())
    else:
        # per-host politeness rank (many hosts → well-distributed window)
        w_host = Window.partitionBy("host").orderBy(
            "priority", "enqueue_step", "seq", "url_hash"
        )
        budgeted = (
            eligible.join(F.broadcast(host_budgets), on="host", how="left")
            .withColumn("host_budget", F.coalesce("host_budget", F.lit(cfg.host_budget)))
            .withColumn("_host_rank", F.row_number().over(w_host))
            .filter(F.col("_host_rank") <= F.col("host_budget"))
            .drop("host_budget")
        ).cache()
        avail = {
            r["priority"]: r["cnt"]
            for r in budgeted.groupBy("priority").agg(F.count("*").alias("cnt")).collect()
        }
    quotas = allocate_quotas(cfg, avail)

    # per-priority FIFO top-k — TakeOrderedAndProject, no global shuffle;
    # when the quota cannot bind (covers all available rows), skip the
    # ordered-limit entirely (avoids a single-point top-k merge at scale)
    picks = [
        (
            budgeted.filter(F.col("priority") == p)
            if q >= avail.get(p, 0)
            else budgeted.filter(F.col("priority") == p)
            .orderBy(*pick_order)
            .limit(q)
        )
        for p, q in quotas.items()
        if q > 0 and avail.get(p, 0) > 0
    ]
    n = sum(min(q, avail.get(p, 0)) for p, q in quotas.items() if avail.get(p, 0) > 0)
    def _restore(df: DataFrame) -> DataFrame:
        if not aged:
            return df
        return df.withColumn("priority", F.col("_orig_priority")).drop("_orig_priority")

    if not picks:
        empty = _restore(budgeted.filter(F.lit(False)).drop("_host_rank", "host_score"))
        if not budget_unbound:
            budgeted.unpersist()
        return empty.withColumn("fetch_salt", F.lit(0)), 0, max_wake, total_eligible
    selected = _restore(
        reduce(lambda a, b: a.unionByName(b), picks).drop("_host_rank", "host_score")
    )

    # hot-host salting: spread mega-hosts across all fetch partitions.
    # A lazy join (no collect): the hot-host dim builds as a broadcast
    # sub-stage of whichever job first consumes the batch.
    hot = (
        selected.groupBy("host")
        .agg(F.count("*").alias("_n"))
        .filter(F.col("_n") > cfg.hot_host_fanout_threshold)
        .select("host", F.lit(True).alias("_hot"))
    )
    p = cfg.frontier_partitions
    out = (
        selected.join(F.broadcast(hot), on="host", how="left")
        .withColumn(
            "fetch_salt",
            F.when(F.col("_hot"), F.pmod(F.xxhash64("url"), F.lit(p)))
            .otherwise(F.pmod(F.xxhash64("host"), F.lit(p)))
            .cast("int"),
        )
        .drop("_hot", "_n")
    ).cache()
    if not budget_unbound:
        # materialize out while the windowed plan is still cached, then
        # retire the intermediate cache (windowed path only; the unbound
        # path stays fully lazy — its first consumer materializes it)
        out.count()
        budgeted.unpersist()
    return out, n, max_wake, total_eligible
