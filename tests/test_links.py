"""S2/T8 link extraction + frontier (functions/links.py) vs a pure-Python
oracle that re-implements the reference's findUrls/checkLink/matchUrls
(PageIndexer.java:169-222) with java-compatible regex semantics (Python `re`
and java.util.regex agree on these patterns — both backtracking engines,
same character-class / anchoring semantics, ASCII `\\w`)."""

from __future__ import annotations

import re
from urllib.parse import unquote

import pytest

from searchengine_spark.functions.links import (
    HREF_PATTERNS,
    extract_frontier,
    link_candidates,
    site_link_patterns,
)

PAGES = [
    # (site, domain, path, html)
    (
        "s0",
        "https://s0.example.com",
        "/s0/doc1",
        '<html><body>'
        '<a href="/s0/doc2">plain kept</a>'
        '<a href="/s0/page1.html">html kept</a>'
        '<a href="/s0/q1.php?k=v1&x=y2">php+params kept</a>'
        '<a href="https://s0.example.com/s0/abs1">absolute same-domain kept</a>'
        '<a href="https://other.example.org/x1">foreign rejected</a>'
        '<a href="/up1">shallower rejected</a>'
        '<a href="/s0/sp%20ace1">decodes to space, rejected</a>'
        '<a href="/s0/%D0%BF1">cyrillic escape kept</a>'
        '<a href="/s0/doc1">self rejected</a>'
        '<a href="/shared/hub">hub</a>'
        '<a href="/b.html">root-level .html rejected (reference quirk)</a>'
        "<a href='/s0/single2'>single-quoted kept</a>"
        '<a href="mailto:x@y.z">mailto rejected</a>'
        '<a href="/s0/trail1/">trailing slash kept</a>'
        "<A HREF=/s0/bare3>uppercase tag, unquoted value kept</A>"
        '<a class="x" href = "/s0/eq4">spaces around = kept</a>'
        '<a href="/s0/amp5.php?a=1&amp;b=2">entity-decoded &amp; kept</a>'
        "</body></html>",
    ),
    (
        "s0",
        "https://s0.example.com",
        "/s0/doc2",
        '<a href="/s0/doc1">existing page, anti-joined away</a>'
        '<a href="/shared/hub">hub again (dedup)</a>'
        '<a href="/s0/%E2">bad escape: decode fails, raw %E2 rejected</a>',
    ),
    (
        "s1",
        "https://s1.example.com",
        "/s1/doc1",
        '<a href="/shared/hub">same path, other site: its own frontier row</a>'
        '<a href="https://s0.example.com/s0/doc9">other site domain = foreign</a>',
    ),
]


def oracle_frontier(pages):
    """The reference algorithm, straight-line Python. re.ASCII pins Python's
    `\\w` to Java's default ASCII semantics (java.util.regex without
    UNICODE_CHARACTER_CLASS, the reference's and Spark's engine; RE2 in the
    DuckDB oracle is ASCII-`\\w` too) — without it Python alone would accept
    cyrillic inside TDT and this oracle would be looser than the reference.
    The explicit А-Яа-я ranges in RUDRU are untouched by the flag."""
    pats = [re.compile(p, re.ASCII) for p in site_link_patterns("")]
    seen = {(s, p) for s, _, p, _ in pages}
    out = set()
    for site, domain, path, html in pages:
        harvested = [h for p in HREF_PATTERNS for h in re.findall(p, html)]
        for href in (h.replace("&amp;", "&") for h in harvested):
            if "%" in href:
                try:
                    dec = unquote(href, encoding="utf-8", errors="strict")
                except Exception:
                    dec = href
            else:
                dec = href
            if dec.startswith("http"):
                i = dec.find(domain)
                rel = dec[i + len(domain):] if i >= 0 else ""
            else:
                rel = dec
            link = rel if any(p.match(rel) for p in pats) else ""
            if link != path and link.count("/") >= path.count("/"):
                if (site, link) not in seen:
                    out.add((site, link))
    return out


@pytest.fixture(scope="module")
def pages_df(spark):
    return spark.createDataFrame(PAGES, "site string, domain string, path string, html string")


def test_frontier_matches_reference_oracle(spark, pages_df):
    got = {(r.site, r.path) for r in extract_frontier(pages_df).collect()}
    assert got == oracle_frontier(PAGES)


def test_frontier_expected_rows(spark, pages_df):
    got = {(r.site, r.path) for r in extract_frontier(pages_df).collect()}
    # the kept set, by hand:
    assert got == {
        ("s0", "/s0/page1.html"),
        ("s0", "/s0/q1.php?k=v1&x=y2"),
        ("s0", "/s0/abs1"),
        ("s0", "/s0/п1"),
        ("s0", "/shared/hub"),
        ("s0", "/s0/single2"),
        ("s0", "/s0/trail1/"),
        ("s0", "/s0/bare3"),
        ("s0", "/s0/eq4"),
        ("s0", "/s0/amp5.php?a=1&b=2"),
        ("s1", "/shared/hub"),
    }
    # notably absent: /s0/doc2 and /s0/doc1 (existing pages), /up1 (depth),
    # foreign domains, 'mailto:', '/b.html' (root-level .html cannot satisfy
    # SLASH_TEXT_SLASH + TDT\.html — the reference's own regexes reject it),
    # '/s0/sp ace1' (decoded space fails every pattern), '/s0/%E2' (decode
    # failure keeps the raw href, '%' fails every pattern).


def test_candidates_keep_pre_dedup_multiplicity(spark, pages_df):
    cands = link_candidates(pages_df)
    hub = cands.filter("link = '/shared/hub'").collect()
    # emitted by all three pages, deduplicated only in the frontier
    assert len(hub) == 3
    assert extract_frontier(pages_df).filter("path = '/shared/hub'").count() == 2


def test_depth_rule_is_non_strict(spark):
    # equal depth passes (urlLevel - subUrlLevel >= 0, PageIndexer.java:185)
    df = spark.createDataFrame(
        [("s", "https://d", "/a/b", '<a href="/c/d">x</a><a href="/e">y</a>')],
        "site string, domain string, path string, html string",
    )
    got = {r.path for r in extract_frontier(df).collect()}
    assert got == {"/c/d"}


def test_fuzz_parity_with_reference_oracle(spark):
    """300 seeded-random hrefs composed from adversarial fragments — valid
    and malformed escapes, cyrillic, absolute/relative, query params, dots,
    double slashes — must produce the identical frontier in the Spark
    operator and the straight-line reference oracle. Intermediate decode
    behavior may differ on malformed UTF-8 (java URLDecoder substitutes
    U+FFFD where Python strict-raises and keeps the raw href), but neither
    form can match any site pattern, so frontier equality is exact."""
    import random

    rng = random.Random(0)
    frags = [
        "/abc", "/p1", "/doc", "/п", "/тест", "%20", "%D0%BF", "%2F", "%ZZ",
        "%E2", "%C3%28", ".html", ".php", "?a=b", "&c=d", "?п=х", "/", "//",
        "..", "+", "-x", "_y", "5", "а", "http://", "https://s0.example.com",
        "https://other.org", "mailto:", "#frag", " ",
    ]
    hrefs = [
        "".join(rng.choice(frags) for _ in range(rng.randint(1, 6)))
        for _ in range(300)
    ]
    html = "".join(f'<a href="{h}">x</a>' for h in hrefs if '"' not in h)
    pages = [("s0", "https://s0.example.com", "/s0/doc1", html)]
    df = spark.createDataFrame(
        pages, "site string, domain string, path string, html string"
    )
    got = {(r.site, r.path) for r in extract_frontier(df).collect()}
    assert got == oracle_frontier(pages)
    assert got, "fuzz corpus produced an empty frontier — fragments too hostile"


def test_patterns_agree_across_regex_engines():
    """The four site patterns must classify identically under java-semantics
    Python re (re.ASCII ≡ java.util.regex default, the Spark/rlike engine)
    and RE2 (the DuckDB CORRECTNESS oracle's engine) — anchored full-match
    membership is a language property, so any disagreement is a dialect bug
    in the oracle SQL."""
    import random

    import duckdb

    pats = site_link_patterns("")
    py = [re.compile(p, re.ASCII) for p in pats]
    rng = random.Random(1)
    frags = [
        "/abc", "/п", "/тест", ".html", ".php", "?a=b", "&c=d", "?п=х",
        "/", "//", "-x", "_y", "5", "а", " ", ".", "п1", "/a.b",
    ]
    cands = [
        "".join(rng.choice(frags) for _ in range(rng.randint(1, 6)))
        for _ in range(500)
    ]
    con = duckdb.connect()
    match_sql = " or ".join(f"regexp_matches(s, '{p}')" for p in pats)
    got = con.execute(
        f"select s, ({match_sql}) from (select unnest(?) as s)", [cands]
    ).fetchall()
    for s, duck_m in got:
        py_m = any(p.match(s) for p in py)
        assert bool(duck_m) == py_m, f"engine disagreement on {s!r}"


def test_plan_is_codegen_no_python(spark, pages_df):
    plan = extract_frontier(pages_df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
