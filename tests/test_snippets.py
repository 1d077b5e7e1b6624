"""Snippet/title presentation tests (SURVEY §2.5 P1-P3)."""

from __future__ import annotations

from searchengine_spark.functions.snippets import make_snippet, make_title


def test_title():
    assert make_title("conv00-000123", 7) == "conv00-000123#7"


def test_snippet_bolds_query_lemmas():
    text = "alpha beta gamma delta epsilon"
    snip = make_snippet(text, {"gamma"})
    assert "<b>gamma</b>" in snip
    assert "<b>alpha</b>" not in snip


def test_snippet_matches_inflected_forms():
    # token 'walking' lemmatizes to 'walk' → must be highlighted for lemma 'walk'
    snip = make_snippet("he was walking home", {"walk"})
    assert "<b>walking</b>" in snip


def test_snippet_window_limits_length():
    words = " ".join(f"w{i:03d}" for i in range(200)) + " needle " + " ".join(
        f"v{i:03d}" for i in range(200)
    )
    snip = make_snippet(words, {"needle"}, window=40)
    assert "<b>needle</b>" in snip
    # ~40 tokens, not 400
    assert len(snip.split()) <= 45
    assert snip.startswith("... ") and snip.endswith(" ...")


def test_snippet_centers_on_best_cluster():
    # rarest lemma = 'rare' (1 occurrence); window must cover it even though
    # 'common' occurs many times elsewhere (P1: rarest-first, min-max-dev)
    text = ("common " * 60) + "rare common" + (" filler" * 60)
    snip = make_snippet(text, {"rare", "common"})
    assert "<b>rare</b>" in snip


def test_snippet_empty_cases():
    assert make_snippet("", {"x"}) == ""
    assert make_snippet("12345 !!!", {"x"}) == ""
    # no query lemma present → window from document start, no bolding
    snip = make_snippet("plain words here", {"absent"})
    assert "<b>" not in snip and "plain" in snip


def test_snippet_multi_window_joined_with_ellipsis():
    """Distant matched lemmas yield several windows joined by ' ... '
    (LemmaSearcherImpl.java:121-125 multi-part snippets)."""
    text = (
        "alphaword shared one two three "
        + " ".join(f"f{i:03d}" for i in range(100))
        + " betaword shared tail"
    )
    snip = make_snippet(text, {"alphaword", "betaword"}, window=40)
    assert "<b>alphaword</b>" in snip
    assert "<b>betaword</b>" in snip
    assert " ... " in snip
    # the filler middle is NOT materialized wholesale
    assert len(snip.split()) < 60


def test_snippet_single_window_when_clustered():
    text = "start alphaword mid betaword end " + " ".join(
        f"f{i}" for i in range(100)
    )
    snip = make_snippet(text, {"alphaword", "betaword"}, window=40)
    assert "<b>alphaword</b>" in snip and "<b>betaword</b>" in snip
    assert " ... " not in snip.strip(" ...")
