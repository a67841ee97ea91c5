"""Token trait pools (R3), live config patching (C6), webhook HMAC (C3) —
ports of the reference's tokenFactory/limitedTokenFactory behavior
(/root/reference/providers/fetcher/tokenFactory.js), PATCH /config
(routes/config.js:12-34), and X-Hub-Signature verification
(routes/webhook.js:19-29)."""

import hashlib
import hmac as hmac_mod
import json
import os
import time

import pytest
from pyspark.sql import functions as F

from ospo_ghcrawler_spark.config import CrawlConfig, apply_config_patches
from ospo_ghcrawler_spark.operators.engine import Crawler
from ospo_ghcrawler_spark.operators.tokens import (
    apply_token_caps,
    assign_tokens,
    exhaust_tokens,
    parse_token_specs,
    split_fetchable,
    tokens_df,
)
from ospo_ghcrawler_spark.sources.corpus import page_url, synth_pages, synth_robots
from ospo_ghcrawler_spark.streaming.seeds import (
    hmac_sha1_col,
    sign_seed,
    verify_webhook_batch,
)


# --------------------------------------------------------------- token pools


def test_parse_token_specs():
    # tokenFactory.createToken/setTokens (tokenFactory.js:6-29)
    assert parse_token_specs("a#public;b#public,admin") == [
        ("a", ["public"]),
        ("b", ["public", "admin"]),
    ]
    assert parse_token_specs("") == []


def _requests(spark, rows):
    """rows: list of (url_hash, desired_trait_sets)"""
    return spark.createDataFrame(
        rows, "url_hash long, desired_traits array<array<string>>"
    )


def test_assign_first_matching_trait_set_wins(spark):
    """getToken walks trait sets in order; the first set with ANY matching
    token wins (tokenFactory.js:37-47)."""
    toks = tokens_df(spark, "a#public;b#private;c#private,admin")
    reqs = _requests(spark, [(1, [["private"], ["public"]])])
    got = assign_tokens(reqs, toks, step=0).collect()[0]
    # pool = {b, c} (both carry 'private'); pick is deterministic by hash
    assert got["token"] in ("b", "c") and got["token_wake"] is None


def test_assign_superset_matching(spark):
    """A token matches when its traits ⊇ the desired set (_traitsMatch,
    tokenFactory.js:89-101)."""
    toks = tokens_df(spark, "a#public;b#private,admin")
    reqs = _requests(spark, [(7, [["private", "admin"]]), (8, [["admin", "nope"]])])
    rows = {r["url_hash"]: r for r in assign_tokens(reqs, toks, step=0).collect()}
    assert rows[7]["token"] == "b"
    assert rows[8]["token"] is None and rows[8]["token_wake"] is None  # no pool


def test_assign_empty_desired_matches_any(spark):
    # getToken(null) → [[]] → any token (tokenFactory.js:38)
    toks = tokens_df(spark, "a#public")
    reqs = _requests(spark, [(3, [])])
    assert assign_tokens(reqs, toks, step=0).collect()[0]["token"] == "a"


def test_all_benched_pool_stops_fallback_and_returns_wake(spark):
    """An all-benched matching set STOPS the fallback walk and yields the
    soonest restore (the truthy-minBench return, tokenFactory.js:40-44,60-62);
    a later set with free tokens must NOT be used."""
    toks = exhaust_tokens(tokens_df(spark, "a#private;b#private;c#public"), ["a", "b"], 5)
    reqs = _requests(spark, [(1, [["private"], ["public"]])])
    got = assign_tokens(reqs, toks, step=0).collect()[0]
    assert got["token"] is None and got["token_wake"] == 5


def test_bench_expiry_frees_token(spark):
    toks = exhaust_tokens(tokens_df(spark, "a#private"), ["a"], 5)
    reqs = _requests(spark, [(1, [["private"]])])
    assert assign_tokens(reqs, toks, step=5).collect()[0]["token"] == "a"
    assert assign_tokens(reqs, toks, step=4).collect()[0]["token"] is None


def test_exhaust_keeps_active_restore_unaffected(spark):
    """exhaust on an ACTIVELY benched token leaves its restore time unchanged
    — earlier OR later new until (tokenFactory.js:78-84: expiry is checked
    against the caller's clock, not the requested restore time); an EXPIRED
    bench takes the new restore."""
    toks = exhaust_tokens(tokens_df(spark, "a#x"), ["a"], 7, current_step=0)
    toks = exhaust_tokens(toks, ["a"], 3, current_step=0)  # active → keep 7
    assert toks.collect()[0]["bench_until"] == 7
    toks2 = exhaust_tokens(toks, ["a"], 9, current_step=0)  # active → still 7
    assert toks2.collect()[0]["bench_until"] == 7
    toks3 = exhaust_tokens(toks, ["a"], 9, current_step=7)  # expired → re-bench
    assert toks3.collect()[0]["bench_until"] == 9


def test_round_robin_pick_spreads_pool(spark):
    toks = tokens_df(spark, "a#p;b#p;c#p")
    reqs = _requests(spark, [(i, [["p"]]) for i in range(30)])
    got = assign_tokens(reqs, toks, step=0).collect()
    by_tok = {}
    for r in got:
        by_tok.setdefault(r["token"], 0)
        by_tok[r["token"]] += 1
    assert set(by_tok) == {"a", "b", "c"}  # all three tokens used
    assert all(v == 10 for v in by_tok.values())  # pmod spreads evenly


def test_token_caps_defer_overflow(spark):
    toks = tokens_df(spark, "a#p", cap_per_step=2)
    reqs = _requests(spark, [(i, [["p"]]) for i in range(5)])
    assigned = apply_token_caps(assign_tokens(reqs, toks, step=3), toks, step=3)
    fetchable, deferred = split_fetchable(assigned)
    assert fetchable.count() == 2
    d = deferred.collect()
    assert len(d) == 3 and all(r["token_wake"] == 4 for r in d)


def test_engine_crawl_with_token_pools(spark, tmp_path):
    """End-to-end: a capped single-token pool throttles fetches per superstep
    but the crawl still settles the full reachable set; a policy with no
    matching pool dead-letters (the null-token hard miss)."""
    N, H = 60, 3
    corpus = synth_pages(spark, n_pages=N, n_hosts=H, links_per_page=6).cache()
    robots = synth_robots(spark, n_hosts=H)
    cfg = CrawlConfig(
        batch_size=50,
        host_budget=50,
        token_specs="t1#public;t2#public",
        token_cap_per_step=10,
        policy_trait_sets={"default": (("public",),), "vault": (("secret",),)},
        use_bloom=False,
    )
    c = Crawler(spark, str(tmp_path / "cat"), corpus, robots, cfg, run_id="tok")
    c.seed([page_url(i, N, H, False) for i in range(6)])
    c.seed([page_url(50, N, H, False)], policy="vault")  # no 'secret' pool
    c.run(40)
    m = c.catalog.table("metrics").read().filter(F.col("host") != "__run__")
    worst = (
        m.groupBy("superstep").agg(F.sum("selected").alias("n")).agg(F.max("n")).collect()[0][0]
    )
    assert worst <= 20  # 2 tokens × cap 10
    dead = c.catalog.table("deadletters").read().collect()
    assert len(dead) == 1 and dead[0]["error"] == "no_matching_token"
    assert dead[0]["url"] == page_url(50, N, H, False)
    # everything reachable under the default policy still got fetched
    assert c.catalog.table("pages").read().filter(F.col("status") == 200).count() > 0
    seen = c.catalog.table("seen").read().count()
    assert seen > 30  # the walk kept going under the cap (settled most pages)


def test_engine_exhausted_pool_defers_then_resumes(spark, tmp_path):
    N, H = 20, 2
    corpus = synth_pages(spark, n_pages=N, n_hosts=H, links_per_page=4).cache()
    robots = synth_robots(spark, n_hosts=H)
    cfg = CrawlConfig(
        batch_size=20, host_budget=20,
        token_specs="only#public",
        policy_trait_sets={"default": (("public",),)},
        use_bloom=False,
    )
    c = Crawler(spark, str(tmp_path / "cat"), corpus, robots, cfg, run_id="ex")
    c.seed([page_url(i, N, H, False) for i in range(4)])
    c.exhaust_token("only", until_step=2)  # benched for steps 0 and 1
    s0 = c.superstep()  # all rows defer (pool benched)
    assert s0["selected"] == 0
    s1 = c.superstep()
    assert s1.get("selected", 0) == 0  # step1 still < wake (rows woke at 2)
    s2 = c.superstep()
    assert s2["selected"] == 4  # bench expired at step 2
    c.run(20)
    assert c.catalog.table("seen").read().count() > 4


# --------------------------------------------------------------- live config


def test_apply_config_patches_merge_and_ops():
    cfg = CrawlConfig()
    p1 = apply_config_patches(cfg, {"batch_size": 7, "weights": {"0": 1, "3": 2}})
    assert p1.batch_size == 7 and p1.weights == {0: 1, 3: 2}
    p2 = apply_config_patches(
        p1,
        [
            {"op": "replace", "path": "/host_budget", "value": 3},
            {"op": "remove", "path": "/batch_size"},
        ],
    )
    assert p2.host_budget == 3 and p2.batch_size == CrawlConfig().batch_size
    with pytest.raises(KeyError):
        apply_config_patches(cfg, {"frontier_partitions": 64})  # frozen field
    with pytest.raises(KeyError):
        apply_config_patches(cfg, {"no_such_field": 1})


def test_live_config_reload_between_supersteps(spark, tmp_path):
    """PATCH /config at superstep granularity: a batch_size/host_budget patch
    written mid-run takes effect at the next superstep boundary."""
    N, H = 120, 3
    corpus = synth_pages(spark, n_pages=N, n_hosts=H, links_per_page=6).cache()
    robots = synth_robots(spark, n_hosts=H)
    live = str(tmp_path / "live.json")
    cfg = CrawlConfig(
        batch_size=10, host_budget=100, live_config_path=live, use_bloom=False
    )
    c = Crawler(spark, str(tmp_path / "cat"), corpus, robots, cfg, run_id="lc")
    c.seed([page_url(i, N, H, False) for i in range(40)])
    s0 = c.superstep()
    assert s0["selected"] == 10
    with open(live, "w") as f:
        json.dump({"batch_size": 25, "host_budget": 2}, f)
    os.utime(live, (time.time() + 2, time.time() + 2))  # ensure mtime change
    s1 = c.superstep()
    assert c.cfg.batch_size == 25 and c.cfg.host_budget == 2
    # host budget now binds: ≤ 2 per host → ≤ 6 selected across 3 hosts
    assert s1["selected"] <= 2 * H
    assert c._min_budget == 2  # derived state rebuilt


# -------------------------------------------------------------- webhook HMAC


def test_hmac_sha1_col_matches_hashlib(spark):
    secret = b"it's a secret to everybody"
    urls = ["http://h0.example/p1", "http://h1.example/p2?q=3"]
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    got = {
        r["url"]: r["sig"]
        for r in df.select("url", hmac_sha1_col(secret, F.col("url")).alias("sig")).collect()
    }
    for u in urls:
        want = hmac_mod.new(secret, u.encode(), hashlib.sha1).hexdigest()
        assert got[u] == want
    # long keys hash down to the block size first (RFC 2104)
    long_secret = b"x" * 100
    df2 = df.select(hmac_sha1_col(long_secret, F.col("url")).alias("sig"), "url")
    for r in df2.collect():
        assert r["sig"] == hmac_mod.new(long_secret, r["url"].encode(), hashlib.sha1).hexdigest()


def test_verify_webhook_batch_drops_bad_sig_and_oversize(spark):
    secret = b"k"
    ok_url = "http://h0.example/a"
    sig = sign_seed(secret, ok_url, 0, None, "small")
    rows = [
        (ok_url, 0, None, sig, "small"),
        ("http://h0.example/b", 0, None, "deadbeef", "x"),  # bad signature
        ("http://h0.example/c", 0, None, None, None),  # missing signature
        ("http://h0.example/d", 0, None, None, "y" * (241 * 1024)),  # oversize
    ]
    df = spark.createDataFrame(
        rows, "url string, priority int, policy string, signature string, payload string"
    )
    got = [r["url"] for r in verify_webhook_batch(df, secret).collect()]
    assert got == [ok_url]
    # without a secret the signature gate is off but the size cap stays
    got2 = {r["url"] for r in verify_webhook_batch(df, None).collect()}
    assert got2 == {ok_url, "http://h0.example/b", "http://h0.example/c"}


def test_verify_webhook_signature_covers_whole_row(spark):
    """The signature binds url AND priority/policy/payload (the reference
    signs the entire request body): replaying a captured (url, signature)
    with a different priority or policy or payload must be rejected."""
    secret = b"k"
    url = "http://h0.example/a"
    sig = sign_seed(secret, url, 0, "default", "p")
    rows = [
        (url, 0, "default", sig, "p"),        # authentic
        (url, 9, "default", sig, "p"),        # tampered priority
        (url, 0, "broad", sig, "p"),          # tampered policy
        (url, 0, "default", sig, "evil"),     # tampered payload
    ]
    df = spark.createDataFrame(
        rows, "url string, priority int, policy string, signature string, payload string"
    )
    kept = verify_webhook_batch(df, secret).collect()
    assert len(kept) == 1 and kept[0]["priority"] == 0 and kept[0]["policy"] == "default"
