"""Run configuration for the crawl engine.

Mirrors the reference's throughput-shaping constants
(/root/reference/lib/crawlerFactory.js:54-115) as a frozen dataclass that the
driver broadcasts by closure into every superstep job.  Unlike the reference's
live JSON-patchable config (routes/config.js:12-18), a config here is immutable
for a run; "live" changes happen between supersteps by constructing a new run.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace


# Queue pop weights, reference /root/reference/lib/crawlerFactory.js:80
# {events: 10, immediate: 3, soon: 2, normal: 3, later: 2}
DEFAULT_WEIGHTS: dict[int, int] = {0: 10, 1: 3, 2: 2, 3: 3, 4: 2}

# compute_budget_ms at or above this sentinel means "limiter unbound": the
# engine skips the per-superstep benches aggregation + broadcast join
# entirely (it provably cannot bind) — throughput benches set 1 << 40
COMPUTE_BUDGET_UNBOUND = 1 << 39

PRIORITY_EVENTS = 0
PRIORITY_IMMEDIATE = 1
PRIORITY_SOON = 2
PRIORITY_NORMAL = 3
PRIORITY_LATER = 4

PRIORITY_NAMES = {
    PRIORITY_EVENTS: "events",
    PRIORITY_IMMEDIATE: "immediate",
    PRIORITY_SOON: "soon",
    PRIORITY_NORMAL: "normal",
    PRIORITY_LATER: "later",
}


@dataclass(frozen=True)
class CrawlConfig:
    """All knobs of one crawl run.  Defaults trace to the reference's
    defaults (file:line cited per field)."""

    # --- selection / batching ---------------------------------------------
    # rows selected per superstep; analog of AMQP prefetch credit=100
    # (/root/reference/lib/crawlerFactory.js:79) scaled up for batch execution
    batch_size: int = 1000
    # per-host fetches per superstep window; analog of token callCapLimit=30
    # per 1s window (/root/reference/lib/crawlerFactory.js:68-69)
    host_budget: int = 30
    # wall-clock length the superstep window MODELS for robots Crawl-delay
    # accounting: a host with crawl_delay_ms gets at most
    # floor(superstep_window_ms / crawl_delay_ms) fetches per superstep
    # (politeness.effective_host_budget). 60 s default keeps the typical
    # 100 ms delay non-binding against the default host_budget of 30.
    superstep_window_ms: int = 60_000
    # weighted interleave of the five priority queues
    # (/root/reference/lib/crawlerFactory.js:80)
    weights: dict[int, int] = field(default_factory=lambda: dict(DEFAULT_WEIGHTS))
    # strict priority preemption: if True, quota leftover spills to the next
    # priority level (reference QueueSet pops best-effort in weight order)
    spill_quota: bool = True
    # starvation-free priority aging (beyond-reference; classic frontier
    # schedulers' budget rotation): every k supersteps a request waits, it is
    # promoted one CONFIGURED tier (one index in sorted(weights)) for
    # selection purposes only — the stored priority is untouched. 0 = off
    # (reference-faithful: a weight-0 tier is never popped,
    # crawlerFactory.js:80 pops strictly by QueueSet weight).
    priority_age_every: int = 0

    # --- politeness / budgets ---------------------------------------------
    # per-host compute budget in simulated latency ms per window; analog of
    # computeLimit=15000ms/15s (/root/reference/lib/crawlerFactory.js:70-72)
    compute_budget_ms: int = 15_000
    # penalty supersteps a host is benched when over budget; analog of
    # "exhaust until now + window/4"
    # (/root/reference/providers/limiting/computeLimiter.js:50-55)
    bench_supersteps: int = 1
    # per-call latency already accounted elsewhere, subtracted before the
    # budget compare (computeLimiter.consume's `preallocated`,
    # computeLimiter.js:27-31); the adaptive min-observed baseline is
    # subtracted automatically
    preallocated_ms: int = 0
    # defer wake-up in supersteps; analog of deferDelay=500ms
    # (/root/reference/lib/crawlerFactory.js:74)
    defer_supersteps: int = 1

    # --- retry / dead-letter ----------------------------------------------
    # attempts before a request is dead-lettered (reference redelivers up to
    # MaxDeliveryCount, /root/reference/providers/queuing/
    # serviceBusQueueManager.js:93; we cap realistically)
    max_attempts: int = 5
    # retry of failed event work re-enters at priority=immediate, mirroring
    # _retryQueue='immediate' (/root/reference/lib/crawlerFactory.js:678)
    retry_priority: int = PRIORITY_IMMEDIATE

    # --- traversal scope ----------------------------------------------------
    max_depth: int = 10
    # host allow-list (None = all); analog of the org filter
    # (/root/reference/lib/crawlerFactory.js:633-650)
    allowed_hosts: tuple[str, ...] | None = None
    # per-request policy → depth ceiling, min'd with max_depth at edge
    # expansion (reference: Request.policy, routes/requests.js:79 — 'self'
    # fetches without walking, shallow walks bounded). Policies not listed
    # (e.g. 'default') walk to max_depth.
    policy_depths: dict[str, int] = field(
        default_factory=lambda: {"self": 0, "shallow": 2}
    )

    # --- link-score frontier prioritization (beyond-reference) --------------
    # "none" | "backlinks" | "pagerank": order selection WITHIN a priority
    # level by a host-level link-centrality score mined from the harvested
    # link graph (the production crawler's frontier-ranking signal; the
    # reference ranks by queue tier only). Scores are integers (counts /
    # fixed-point PageRank), so selection stays bit-deterministic and
    # parallelism-invariant; FIFO order breaks score ties.
    host_score_source: str = "none"
    # scores refresh at superstep boundaries b ≡ 0 (mod k) from pages with
    # superstep < b — a pure function of the COMMITTED harvest, so an
    # interrupted run resumes with the identical scores (no extra lineage)
    host_score_refresh_every: int = 2
    # fixed-point PageRank iterations (host graph ≪ url graph, so a handful
    # of iterations is one small-join round-trip each)
    host_score_iterations: int = 2

    # honor <meta name="robots" content="nofollow"> at edge expansion (page-
    # level robots analog; functions/extract.py:meta_robots_flags). Off by
    # default: the reference consults only API-level visibility, not page
    # meta, and the golden-traversal fixtures assume expansion of every page.
    respect_meta_robots: bool = False

    # --- seen-set / dedup ---------------------------------------------------
    # bloom shards (by url_hash range) and bits per shard; sized so the same
    # code path scales to 10^10 urls by raising shard count, not shard size
    bloom_shards: int = 16
    bloom_bits_per_shard: int = 1 << 20
    bloom_hashes: int = 7
    use_bloom: bool = True
    # track the RECRAWL WINDOW (urls removed from `seen` by
    # requeue_for_refetch, until they settle again) in a delete-capable
    # cuckoo filter (north rule: "bloom+cuckoo URL-seen"). Bloom bits can't
    # be deleted, so a requeued url leaves a stale bloom positive; with the
    # cuckoo, seen_filter routes stale-positive rows through a broadcast
    # check against the small pending set instead of the full-`seen`
    # anti-join — refetch churn stops taxing the big join. Off ⇒ stale
    # positives fall back to the exact-rescue path (correct, slower).
    recrawl_cuckoo: bool = True
    # cuckoo buckets (4 slots each; rounded up to a power of two) — sized
    # for the expected in-flight recrawl window, not the corpus
    recrawl_cuckoo_buckets: int = 1 << 15

    # --- partitioning / skew -----------------------------------------------
    # frontier is hash-partitioned by host_salt = xxhash64(host) % partitions
    frontier_partitions: int = 32
    # hosts owning more than this share of the selected batch get salt fan-out
    hot_host_fanout_threshold: int = 1000

    # --- storage commit shape ------------------------------------------------
    # incremental frontier commit: a superstep replaces only the host_salt
    # partitions it touched (selected/new/retried rows) instead of rewriting
    # the whole frontier — at a 10^10-row frontier with a politeness-bound
    # batch this turns a full-table rewrite into a few-partition one (Iceberg
    # overwritePartitions semantics). Falls back to full overwrite when every
    # partition was touched anyway.
    incremental_frontier: bool = True
    # fold a table's layer chain into one snapshot when its read fan-in
    # exceeds this many layers (Iceberg rewrite_data_files cadence) — bounds
    # long-run read fan-in for frontier and seen
    compact_chain_len: int = 16
    # compute document features (token counts, quality score, lang-id,
    # whitespace-invariant fingerprint) inside the harvest-write pass — the
    # only pass that materializes text — so the training-data pipeline's
    # scoring signals land on the pages row with zero extra corpus scans.
    # All JVM expressions (functions/text.py); they fuse into the harvest
    # stage's whole-stage codegen and scale with cores.
    featurize_at_fetch: bool = True
    # also compute winnowing fingerprints (Schleimer et al. SIGMOD'03 — the
    # MOSS near-dup/plagiarism primitive, functions/text.py:
    # winnow_fingerprints_fast) in the same harvest-write pass: the harvest
    # is the only stage that holds the text, and a training-data pipeline
    # re-derives these for near-dup detection anyway, so computing them at
    # fetch time makes the pages table dedup-ready with zero extra scans.
    # Pure JVM array expressions (xxhash64 per gram), CPU-dense and
    # shuffle-free — they scale with cores. Requires featurize_at_fetch.
    winnow_at_fetch: bool = True
    # also compute a one-permutation-hashing MinHash signature (Li, Owen &
    # Zhang NIPS'12; functions/text.py:minhash_oph_entries — ONE xxhash64
    # per word shingle, per-bin minima, sparse entries) in the harvest
    # pass, making the pages table Jaccard-LSH-ready with zero extra
    # scans (operators/dedup_docs.py:oph_lsh_pairs consumes the stored
    # column via entries_col and never re-reads text for candidates).
    # OFF by default: at ~1 hash/word it roughly doubles the per-page
    # harvest compute on full web pages — opt in when the corpus is
    # destined for near-dup dedup. Requires featurize_at_fetch.
    minhash_at_fetch: bool = False
    # run the frontier table write inside the BACKGROUND commit group and let
    # the next superstep select from the in-memory next-frontier plan (lazily
    # local-checkpointed so plan trees stay bounded). Lowers absolute wall at
    # every parallelism (the write overlaps the next fetch+extract), but on
    # small hosts it overlaps best where spare slots exist — i.e. it helps a
    # 2-core leg relatively more than an 8-core leg, so the measured N→4N
    # scaling RATIO drops slightly. Default off: the bench evidences the
    # north rule's ratio; flip on for real deployments chasing wall-clock.
    pipelined_frontier_commit: bool = False

    # --- credential pools ---------------------------------------------------
    # token specs "value#trait1,trait2;value2#..." (tokenFactory.setTokens,
    # /root/reference/providers/fetcher/tokenFactory.js:18-29). None = fetch
    # without credentials (token machinery fully bypassed, zero overhead).
    token_specs: str | None = None
    # per-token calls per superstep window; analog of the limited token
    # factory's per-token rate limit (limitedTokenFactory.js:19-42). 0 = no cap
    token_cap_per_step: int = 0
    # per-policy desired trait sets, walked in fallback order
    # (getToken(desiredTraitSets), tokenFactory.js:37-47; e.g. a private-repo
    # request wants [['private'],['admin']]). Policies not listed desire any
    # token (the empty trait set)
    policy_trait_sets: dict[str, tuple[tuple[str, ...], ...]] = field(
        default_factory=dict
    )

    # --- live config --------------------------------------------------------
    # path of a JSON file polled at each superstep boundary; when its mtime
    # changes, its patches apply to the running config — the reference's
    # PATCH /config live-reconfiguration (routes/config.js:12-18) at
    # superstep granularity. File holds either {"field": value} (merge) or
    # [{"op": "replace", "path": "/field", "value": v}] (JSON-patch ops).
    live_config_path: str | None = None

    # --- misc ---------------------------------------------------------------
    seed: int = 42
    simulate_fetch_failure_every: int = 0  # 0 = never; N = every Nth url_hash fails once
    # collect optional per-superstep stats (edge/bounce counts). Costs two
    # extra Spark jobs per superstep; benches turn it off.
    collect_stats: bool = True
    # False ⇒ the fetcher provably never returns 5xx (e.g. simulated fetch
    # without failure injection): the retry/dead-letter branch is skipped,
    # saving one table write per superstep.
    expect_failures: bool = True
    # up to this many selected rows, new edges get exact FIFO sequence
    # numbers (global sorted window — single-partition, fine for small
    # interactive crawls and the golden traversal). Above it, ties within a
    # superstep take a deterministic hash sequence instead: the reference
    # makes no cross-worker ordering promise within a poll window, and a
    # global sort would serialize the whole engine at scale.
    fifo_links_threshold: int = 10_000

    def with_(self, **kw) -> "CrawlConfig":
        return replace(self, **kw)

    def apply_patches(self, patches) -> "CrawlConfig":
        return apply_config_patches(self, patches)

    @property
    def total_weight(self) -> int:
        return sum(self.weights.values())

    def priority_quota(self, priority: int) -> int:
        """Per-superstep row quota for a priority level: batch * w_p / sum(w)."""
        w = self.weights.get(priority, 0)
        return max(1, (self.batch_size * w) // self.total_weight) if w else 0


# fields PATCH /config may change mid-run (routes/config.js:12-18 applies
# patches per subsystem; the batch analogs are the throughput/politeness
# shaping knobs — structural fields like partitioning and bloom sizing are
# frozen for a run because committed table layouts depend on them)
LIVE_PATCHABLE: frozenset[str] = frozenset(
    {
        "batch_size", "host_budget", "weights", "spill_quota",
        "compute_budget_ms", "bench_supersteps", "preallocated_ms",
        "defer_supersteps", "max_attempts", "retry_priority", "max_depth",
        "allowed_hosts", "policy_depths", "token_specs", "token_cap_per_step",
        "policy_trait_sets", "hot_host_fanout_threshold", "fifo_links_threshold",
    }
)


def _coerce(field_name: str, value):
    if field_name == "weights" and isinstance(value, dict):
        return {int(k): int(v) for k, v in value.items()}
    if field_name == "allowed_hosts" and isinstance(value, list):
        return tuple(value)
    if field_name == "policy_trait_sets" and isinstance(value, dict):
        return {k: tuple(tuple(s) for s in v) for k, v in value.items()}
    return value


def apply_config_patches(cfg: CrawlConfig, patches) -> CrawlConfig:
    """Apply a live-config document to *cfg* → new config (the reference's
    PATCH /config handler semantics, routes/config.js:12-18: patches are
    grouped and applied to the live options; here the immutable-dataclass
    analog returns the patched copy the engine swaps in between supersteps).

    *patches* is either a merge-object ``{"field": value}`` or a list of
    JSON-patch ops ``[{"op": "replace"|"add"|"remove", "path": "/field",
    "value": v}]``. Unknown / non-live-patchable fields raise ``KeyError``
    (the reference 500s on an unknown subsystem the same way)."""
    from dataclasses import MISSING
    from dataclasses import fields as dc_fields

    defaults = {f.name: f for f in dc_fields(CrawlConfig)}
    if isinstance(patches, dict):
        items = list(patches.items())
    else:
        items = []
        for op in patches:
            name = op["path"].lstrip("/")
            if op["op"] in ("replace", "add"):
                items.append((name, op["value"]))
            elif op["op"] == "remove":  # remove = reset to the field default
                f = defaults[name]
                items.append(
                    (name, f.default if f.default is not MISSING else f.default_factory())
                )
            else:
                raise KeyError(f"unsupported config patch op {op['op']!r}")
    kw = {}
    for name, value in items:
        if name not in LIVE_PATCHABLE:
            raise KeyError(f"config field {name!r} is not live-patchable")
        kw[name] = _coerce(name, value)
    return cfg.with_(**kw)
