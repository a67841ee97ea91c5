"""Frozen HTML link + text extraction as vectorized Arrow/pandas UDFs.

The reference's processor walks a fetched document and emits child requests
(GitHubProcessor contract, golden traversal at
/root/reference/test/unit/processingTests.js:20-44); the web-domain analog is
link extraction from ``<a href>`` plus text extraction. The extractor is a
**frozen, pure-regex implementation committed with golden fixtures** — no
third-party parser whose version drift could break the byte-identical-per-url
invariant (BASELINE.json input_hint).

Text extraction contract (deterministic, documented, pinned by tests):

1. drop ``<script>``/``<style>`` elements and HTML comments;
2. replace every remaining tag with a single ``\\n`` separator;
3. decode the five standard entities (&amp; &lt; &gt; &quot; &#39;);
4. collapse runs of whitespace-around-newlines to one ``\\n``, collapse runs
   of spaces/tabs to one space, strip each line, drop empty lines;
5. join lines with ``\\n`` (no trailing newline).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ospo_ghcrawler_spark.functions.urls import canonicalize_url

_RE_SCRIPT = re.compile(rb"<script\b.*?</script\s*>", re.IGNORECASE | re.DOTALL)
_RE_STYLE = re.compile(rb"<style\b.*?</style\s*>", re.IGNORECASE | re.DOTALL)
_RE_COMMENT = re.compile(rb"<!--.*?-->", re.DOTALL)
_RE_TAG = re.compile(rb"<[^>]*>")
_RE_HREF = re.compile(
    rb"""<a\s[^>]*?href\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+))""", re.IGNORECASE
)
_RE_SPACES = re.compile(r"[ \t\r\f\v]+")

_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),  # last, so &amp;lt; decodes to &lt; not <
]


def extract_text(html: bytes | None) -> str | None:
    """Frozen text extraction (see module docstring for the contract)."""
    if html is None:
        return None
    body = _RE_COMMENT.sub(b"", html)
    body = _RE_SCRIPT.sub(b"", body)
    body = _RE_STYLE.sub(b"", body)
    body = _RE_TAG.sub(b"\n", body)
    text = body.decode("utf-8", errors="replace")
    for ent, ch in _ENTITIES:
        text = text.replace(ent, ch)
    lines = []
    for raw_line in text.split("\n"):
        line = _RE_SPACES.sub(" ", raw_line).strip()
        if line:
            lines.append(line)
    return "\n".join(lines)


def _resolve(base: str, href: str) -> str | None:
    """Minimal deterministic URL resolution: absolute, host-relative,
    path-relative (no ``..`` support — the synthetic corpus never emits it)."""
    if not href or href.startswith(("javascript:", "mailto:", "data:")):
        return None
    if "://" in href:
        return canonicalize_url(href)
    if href.startswith("//"):
        scheme = base.split("://", 1)[0]
        return canonicalize_url(f"{scheme}:{href}")
    origin_end = base.find("/", base.find("://") + 3)
    origin = base if origin_end < 0 else base[:origin_end]
    if href.startswith("/"):
        return canonicalize_url(origin + href)
    base_path = "/" if origin_end < 0 else base[origin_end:]
    base_dir = base_path.rsplit("/", 1)[0] + "/"
    return canonicalize_url(origin + base_dir + href)


def extract_links(html: bytes | None, base_url: str) -> list[str]:
    """All ``<a href>`` targets, resolved against *base_url* and
    canonicalized; de-duplicated preserving first-occurrence order."""
    if html is None:
        return []
    out: list[str] = []
    seen: set[str] = set()
    for m in _RE_HREF.finditer(html):
        raw = next(g for g in m.groups() if g is not None)
        href = raw.decode("utf-8", errors="replace").strip()
        resolved = _resolve(base_url, href)
        if resolved is not None and resolved not in seen:
            seen.add(resolved)
            out.append(resolved)
    return out


@F.pandas_udf(T.StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    return html.map(extract_text)


@F.pandas_udf(T.ArrayType(T.StringType()))
def extract_links_udf(html: pd.Series, base_url: pd.Series) -> pd.Series:
    return pd.Series(
        [extract_links(h, b) for h, b in zip(html, base_url)], index=html.index
    )


_EXTRACT_STRUCT_T = T.StructType(
    [
        T.StructField("text", T.StringType()),
        T.StructField("links", T.ArrayType(T.StringType())),
    ]
)


@F.pandas_udf(_EXTRACT_STRUCT_T)
def extract_struct_udf(html: pd.Series, url: pd.Series) -> pd.DataFrame:
    """Fused text+link extraction as ONE scalar Arrow UDF returning a struct.

    Versus the ``mapInPandas`` form this keeps every other column JVM-side:
    only (html, url) cross into Python and only (text, links) cross back —
    html itself never round-trips. On the harvest path that removes
    ~html-size bytes/page of Arrow return traffic plus the serialization of
    the 13 metadata columns both ways; the scaling notes (§3g/§3h) measured
    per-page byte traffic as the wide-leg bottleneck on a shared-bus host."""
    return pd.DataFrame(
        {
            "text": [extract_text(h) for h in html],
            "links": [extract_links(h, u) for h, u in zip(html, url)],
        },
        index=html.index,
    )


def with_extracted(df):
    """Attach ``text`` + ``links`` to *df* via :func:`extract_struct_udf`
    (one ArrowEvalPython node; identical UDF expressions are collapsed by
    Catalyst's python-UDF extraction, so the struct is evaluated once)."""
    ext = extract_struct_udf(F.col("html"), F.col("url"))
    return df.withColumn("_ext", ext).select(
        *df.columns,
        F.col("_ext.text").alias("text"),
        F.col("_ext.links").alias("links"),
    )


def extract_pages_map_in_pandas(schema_out: T.StructType):
    """``mapInPandas`` variant fusing text+link extraction in one Arrow pass —
    avoids materializing html twice when both outputs are needed (the hot path
    of the superstep)."""

    cols = [f.name for f in schema_out.fields]

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # assign in place (mapInPandas owns the batch — no defensive copy)
            pdf["text"] = [extract_text(h) for h in pdf["html"]]
            pdf["links"] = [extract_links(h, u) for h, u in zip(pdf["html"], pdf["url"])]
            yield pdf[cols]

    return fn


# --- meta-robots directives (crawl + training opt-outs) ----------------------
# <meta name="robots" content="noindex, nofollow"> — the page-level analog of
# robots.txt (and, with noai/noimageai, the emerging training-data opt-out
# convention). Pure JVM expressions over the stored html bytes: no Python in
# the path, so the engine can honor nofollow at expansion time inside the
# same codegen span that explodes links.
META_ROBOTS_DIRECTIVES: tuple[str, ...] = (
    "noindex",
    "nofollow",
    "noarchive",
    "noai",
    "noimageai",
)

# name="robots" with the attribute-value END anchored: a matching closing
# quote, or (unquoted) a delimiter [\s/>] via lookahead — so
# name="robots-something" / name=robotsfoo do NOT prefix-match as the robots
# tag, and content is captured with the MATCHING quote character (an
# apostrophe inside a double-quoted value no longer truncates the capture).
_NAME_ROBOTS = r'name\s*=\s*(?:"robots"|\'robots\'|robots(?=[\s/>]))'
_META_NAME_FIRST = tuple(
    rf'<meta\s[^>]*{_NAME_ROBOTS}[^>]*?content\s*=\s*{v}'
    for v in (r'"([^"]*)"', r"'([^']*)'", r'([^\s"\'>]+)')
)
_META_CONTENT_FIRST = tuple(
    rf'<meta\s[^>]*content\s*=\s*{v}[^>]*{_NAME_ROBOTS}'
    for v in (r'"([^"]*)"', r"'([^']*)'", r'([^\s"\'>]+)')
)


def meta_robots_col(html_col: F.Column) -> F.Column:
    """Lowercased content of the page's robots meta tag (either attribute
    order; double-quoted, single-quoted, or unquoted values — each captured
    to its own matching terminator), NULL when the page has none."""
    h = F.lower(F.decode(html_col, "UTF-8"))
    out = None
    for pat in (*_META_NAME_FIRST, *_META_CONTENT_FIRST):
        x = F.regexp_extract(h, pat, 1)
        out = F.when(x != "", x) if out is None else out.when(x != "", x)
    return out


def meta_robots_flags(html_col: F.Column) -> dict[str, F.Column]:
    """One boolean Column per directive (False when the tag is absent)."""
    toks = F.transform(F.split(meta_robots_col(html_col), ","), lambda t: F.trim(t))
    return {
        d: F.coalesce(F.array_contains(toks, d), F.lit(False))
        for d in META_ROBOTS_DIRECTIVES
    }
