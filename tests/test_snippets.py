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


def test_snippet_spanning_goldens_match_reference_arithmetic():
    """Pin the multi-window part boundaries to getSnippetParts' arithmetic
    (LemmaSearcherImpl.java:216-233): k=2 chosen positions at 5 and 60 with
    window=40 give offset = 40//2//2 = 10 → tail part [50, 69) (around
    pos 60), then length = max(40−20+1, 0) = 21 covers the remaining
    cluster → head part [0, 14) (5−10 clamped to 0 .. 5+10−1), joined in
    document order."""
    # letter-only words; positions 5 and 60 carry the query terms
    words = [f"w{chr(97 + i % 26)}{chr(97 + (i * 7) % 26)}{chr(97 + (i * 3) % 26)}" for i in range(100)]
    words[5] = "alphaword"
    words[60] = "betaword"
    text = " ".join(words)
    snip = make_snippet(text, {"alphaword", "betaword"}, window=40)
    head = " ".join(
        w if i != 5 else "<b>alphaword</b>" for i, w in enumerate(words[0:14])
    )
    tail = " ".join(
        w if i + 50 != 60 else "<b>betaword</b>"
        for i, w in enumerate(words[50:69])
    )
    assert snip == f"{head} ... {tail} ..."


def test_snippet_single_window_when_clustered():
    text = "start alphaword mid betaword end " + " ".join(
        f"f{i}" for i in range(100)
    )
    snip = make_snippet(text, {"alphaword", "betaword"}, window=40)
    assert "<b>alphaword</b>" in snip and "<b>betaword</b>" in snip
    assert " ... " not in snip.strip(" ...")
