"""Property-based pins (hypothesis) for the frozen URL canonicalizer —
the function every dedup/seen decision keys on, so its algebraic
properties matter more than any single example:

- idempotence: canonicalize(canonicalize(u)) == canonicalize(u) — without
  it the same url could hash differently on refetch vs first fetch;
- fragment-invariance: #fragment never changes identity;
- query-order-invariance: param permutation never changes identity;
- case-invariance of scheme+host, case-SENSITIVITY of path;
- total function: never raises on arbitrary text, returns None or a
  canonical http(s) url.

No Spark needed: canonicalize_url is the pure-Python source of truth the
vectorized UDF wraps (functions/urls.py)."""

from __future__ import annotations

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from ospo_ghcrawler_spark.functions.urls import canonicalize_url

_host_label = st.text(string.ascii_letters + string.digits + "-", min_size=1, max_size=8)
_hosts = st.lists(_host_label, min_size=1, max_size=4).map(".".join)
_path = st.text(string.ascii_letters + string.digits + "/._~%-", max_size=20)
_param = st.tuples(
    st.text(string.ascii_lowercase, min_size=1, max_size=5),
    st.text(string.ascii_letters + string.digits, max_size=5),
).map(lambda kv: f"{kv[0]}={kv[1]}")
_params = st.lists(_param, max_size=5)


@st.composite
def _urls(draw):
    scheme = draw(st.sampled_from(["http", "https", "HTTP", "Https"]))
    host = draw(_hosts)
    port = draw(st.sampled_from(["", ":80", ":443", ":8080"]))
    path = draw(_path)
    params = draw(_params)
    frag = draw(st.sampled_from(["", "#x", "#frag/ment"]))
    q = ("?" + "&".join(params)) if params else ""
    p = ("/" + path) if path and not path.startswith("/") else path
    return f"{scheme}://{host}{port}{p}{q}{frag}"


@settings(max_examples=300, deadline=None)
@given(_urls())
def test_idempotent(u):
    c = canonicalize_url(u)
    assert c is not None
    assert canonicalize_url(c) == c


@settings(max_examples=300, deadline=None)
@given(_urls(), st.sampled_from(["", "#x", "#a/b?c=d", "#"]))
def test_fragment_never_changes_identity(u, frag):
    base = u.split("#", 1)[0]
    assert canonicalize_url(base) == canonicalize_url(base + frag)


@settings(max_examples=300, deadline=None)
@given(_hosts, st.permutations(["a=1", "b=2", "c=3", "a=0"]))
def test_query_order_invariant(host, perm):
    c1 = canonicalize_url(f"http://{host}/p?" + "&".join(perm))
    c2 = canonicalize_url(f"http://{host}/p?a=0&a=1&b=2&c=3")
    assert c1 == c2


@settings(max_examples=300, deadline=None)
@given(_urls())
def test_scheme_host_case_invariant_path_case_sensitive(u):
    c_lower = canonicalize_url(u)
    s = u.find("://")
    swapped = u[:s].upper() + u[s:]
    assert canonicalize_url(swapped) == c_lower
    # path case must be preserved (urls are case-sensitive after authority)
    if c_lower is not None:
        rest = c_lower.split("://", 1)[1]
        slash = rest.find("/")
        path = rest[slash:]
        if any(ch.isalpha() for ch in path[1:]):
            assert path in c_lower


@settings(max_examples=500, deadline=None)
@given(st.text(max_size=40))
def test_total_never_raises(junk):
    c = canonicalize_url(junk)
    if c is not None:
        assert c.startswith(("http://", "https://"))
        assert canonicalize_url(c) == c
