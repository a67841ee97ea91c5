"""Token trait pools — the reference TokenFactory's trait-matched credential
pools re-expressed as one batch DataFrame assignment plan.

Reference semantics (/root/reference/providers/fetcher/tokenFactory.js):

- a token spec is ``value#trait1,trait2``; multiple specs join with ``;``
  (``setTokens``/``createToken``, tokenFactory.js:6-29);
- ``getToken(desiredTraitSets)`` walks the trait sets IN ORDER and stops at
  the first set with any matching token (``token.traits ⊇ desired``); from
  that set it returns an unbenched token, or — if every matching token is
  benched — the soonest bench-expiry time; if no set matches at all, null
  (tokenFactory.js:37-67; note ``if (token) return token`` is truthy for the
  numeric bench time, so an all-benched set STOPS the fallback walk);
- ``exhaust(value, until)`` benches a token until a restore time; a token
  already on the bench keeps its earlier restore time (tokenFactory.js:74-86);
- the rate-limited wrapper benches a token when its underlying limit trips
  (limitedTokenFactory.js:19-42).

Batch re-expression: tokens are a SMALL broadcast dim ``(value, traits,
bench_until, cap_per_step)``; each request carries an ordered array of
desired trait sets. Assignment is pure DataFrame algebra — explode the trait
sets with their fallback rank, broadcast-join tokens on JVM-side array
containment (``forall``), keep the first matching rank per request, then
spread the requests of a pool across its unbenched tokens deterministically
by ``pmod(url_hash, n_tokens)`` (the reference picks randomly inside the
pool, tokenFactory.js:65-66; a hash pick is the parallelism-invariant batch
analog). Per-token call caps defer the overflow to the next superstep — the
exhaust/bench semantics at batch granularity.

Scale posture: the token dim is O(credentials) — always broadcastable; the
only shuffle is the per-token cap window, partitioned by token value (number
of partitions = number of tokens, each bounded by the batch), after an
url_hash-pre-bounded selection. No Python in the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

TOKEN_SCHEMA = T.StructType(
    [
        T.StructField("value", T.StringType(), False),
        T.StructField("traits", T.ArrayType(T.StringType()), False),
        T.StructField("bench_until", T.IntegerType(), True),  # superstep; null = free
        T.StructField("cap_per_step", T.IntegerType(), True),  # null/0 = uncapped
    ]
)


def parse_token_specs(spec: str) -> list[tuple[str, list[str]]]:
    """``"a#public;b#public,admin"`` → ``[("a", ["public"]), ("b", [...])]``
    (tokenFactory.js:6-29). Empty spec → no tokens."""
    if not spec:
        return []
    out = []
    for part in spec.split(";"):
        if not part:
            continue
        value, _, traits = part.partition("#")
        out.append((value, [t for t in traits.split(",") if t]))
    return out


def tokens_df(
    spark: SparkSession, spec: str, cap_per_step: int = 0
) -> DataFrame:
    """Materialize a token-spec string as the token dim."""
    rows = [
        (value, traits, None, cap_per_step or None)
        for value, traits in parse_token_specs(spec)
    ]
    return spark.createDataFrame(rows, TOKEN_SCHEMA)


def exhaust_tokens(
    tokens: DataFrame, values: list[str], until: int, current_step: int = 0
) -> DataFrame:
    """Bench the named tokens until superstep *until*. A token ACTIVELY on
    the bench keeps its existing restore time — even when the new *until* is
    later (tokenFactory.js:78-84: "if the token is already on the bench, its
    restore time is unaffected"); only an expired or absent bench takes the
    new one. Expiry is checked against the caller's *current_step* — the
    batch-granular 'now' of the reference's ``now > benchUntil`` clock check
    (ADVICE r02: using *until* as 'now' wrongly extended active benches)."""
    hit = F.col("value").isin(values)
    expired_or_free = F.coalesce("bench_until", F.lit(-1)) <= current_step
    return tokens.withColumn(
        "bench_until",
        F.when(hit & expired_or_free, F.lit(until)).otherwise(F.col("bench_until")),
    )


def assign_tokens(
    requests: DataFrame,
    tokens: DataFrame,
    step: int,
    desired_col: str = "desired_traits",
    key_col: str = "url_hash",
) -> DataFrame:
    """Assign each request a token per the reference's getToken walk.

    *requests* carries ``desired_col: array<array<string>>`` (ordered fallback
    trait sets; empty outer array = any token). Output adds:

    - ``token``       — assigned token value, or null;
    - ``token_wake``  — when null-token is a bench (all matching tokens
      benched): the soonest restore superstep (the reference's minBench
      return); null when no token matches at all (the caller dead-letters or
      drops, reference crawler treats it as a hard miss).
    """
    tok = tokens.select("value", "traits", "bench_until")
    # empty desired list ⇒ one empty set (matches any token) — tokenFactory.js:38
    desired = F.when(
        (F.col(desired_col).isNull()) | (F.size(desired_col) == 0),
        F.array(F.array().cast("array<string>")),
    ).otherwise(F.col(desired_col))
    sets = requests.select(
        F.col(key_col).alias("_k"),
        F.posexplode(desired).alias("_rank", "_want"),
    )
    # containment (traits ⊇ want) as a plain expression — array_except keeps
    # the condition resolvable across the join (no lambda capture needed)
    matched = sets.join(
        F.broadcast(tok),
        F.size(F.array_except(sets["_want"], tok["traits"])) == 0,
        "inner",
    )
    pools = matched.groupBy("_k", "_rank").agg(
        F.sort_array(
            F.collect_list(
                F.when(F.coalesce("bench_until", F.lit(-1)) <= step, F.col("value"))
            )
        ).alias("_cands"),
        F.min(F.when(F.col("bench_until") > step, F.col("bench_until"))).alias(
            "_min_bench"
        ),
    )
    w = Window.partitionBy("_k").orderBy("_rank")
    first = (
        pools.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .select(
            "_k",
            F.when(
                F.size("_cands") > 0,
                F.element_at(
                    "_cands", (F.pmod(F.col("_k"), F.size("_cands")) + 1).cast("int")
                ),
            ).alias("token"),
            F.when(F.size("_cands") == 0, F.col("_min_bench")).alias("token_wake"),
        )
    )
    return requests.join(
        F.broadcast(first), requests[key_col] == first["_k"], "left"
    ).drop("_k")


def apply_token_caps(
    assigned: DataFrame, tokens: DataFrame, step: int, key_col: str = "url_hash"
) -> DataFrame:
    """Enforce per-token call caps on an assigned batch: rows ranked past a
    token's ``cap_per_step`` lose the token and get ``token_wake = step+1``
    (the limited-token bench at batch granularity,
    limitedTokenFactory.js:19-42). Deterministic rank: by request key."""
    caps = tokens.filter(
        F.col("cap_per_step").isNotNull() & (F.col("cap_per_step") > 0)
    ).select(F.col("value").alias("token"), "cap_per_step")
    w = Window.partitionBy("token").orderBy(key_col)
    over = (
        F.col("token").isNotNull()
        & F.col("cap_per_step").isNotNull()
        & (F.row_number().over(w) > F.col("cap_per_step"))
    )
    return (
        assigned.join(F.broadcast(caps), "token", "left")
        .withColumn(
            "token_wake",
            F.when(over, F.lit(step + 1)).otherwise(F.col("token_wake")),
        )
        .withColumn("token", F.when(over, F.lit(None)).otherwise(F.col("token")))
        .drop("cap_per_step")
    )


def split_fetchable(assigned: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(fetchable, deferred): rows with a token fetch now; rows whose pool is
    benched (token null, wake set) defer to their wake step. Rows matching no
    token at all are fetchable-without-credentials ONLY if the caller opts in
    — here they are dropped into the deferred side with wake null so the
    engine can dead-letter them (the reference's null-token hard miss)."""
    fetchable = assigned.filter(F.col("token").isNotNull())
    deferred = assigned.filter(F.col("token").isNull())
    return fetchable, deferred
