"""Snippet + title presentation operators (SURVEY §2.5 P1–P3).

Reference algorithm (``indexing/impl/LemmaSearcherImpl.java:113-281``):
re-tokenize the hit's text recording positions of query lemmas; pick the
rarest query lemma present (:164-170); among its positions choose the one
minimizing the maximum deviation to the closest position of every other
query lemma (:172-214); emit a ~40-word window (:218) with matched lemma
occurrences wrapped in ``<b>…</b>`` (:276-277).

Divergences (documented): one window per hit (the reference may join several
windows with " ... "); title is synthesized as ``conv_id#turn_idx`` since
transcript turns have no HTML ``<title>`` (P3, ``SearchServiceImpl.java:176``).

Runs post-top-k only — over ≤ `limit` rows, never corpus-wide (the
reference's accidental late-materialization pattern kept deliberately,
SURVEY §4.1).
"""

from __future__ import annotations

import re

from searchengine_spark.functions.lemmatize import lemmatize_token

_TOKEN_RE = re.compile(r"[А-ЯЁа-яёA-Za-z]+")  # letter runs — dual of TOKEN_SPLIT

SNIPPET_WINDOW = 40  # words — LemmaSearcherImpl.java:218


def make_title(conv_id: str, turn_idx: int) -> str:
    return f"{conv_id}#{turn_idx}"


def make_snippet(text: str, query_lemmas: set[str], window: int = SNIPPET_WINDOW) -> str:
    """Build one highlighted ~`window`-word snippet around the best cluster
    of query-lemma occurrences."""
    if not text:
        return ""
    tokens = list(_TOKEN_RE.finditer(text))
    if not tokens:
        return ""
    tok_lemmas = [set(lemmatize_token(m.group())) for m in tokens]
    positions: dict[str, list[int]] = {}
    for i, ls in enumerate(tok_lemmas):
        for lem in ls & query_lemmas:
            positions.setdefault(lem, []).append(i)
    if not positions:
        center = 0
    else:
        # P1: rarest present lemma (fewest occurrences; tie → lemma asc)
        rarest = min(positions, key=lambda l: (len(positions[l]), l))
        others = [l for l in positions if l != rarest]
        best_pos, best_dev = positions[rarest][0], float("inf")
        for p in positions[rarest]:
            dev = max(
                (min(abs(q - p) for q in positions[o]) for o in others),
                default=0,
            )
            if dev < best_dev:
                best_pos, best_dev = p, dev
        center = best_pos
    start = max(0, center - window // 2)
    end = min(len(tokens), start + window)
    # P2: reconstruct from the original text span, bolding matched tokens
    span_start = tokens[start].start()
    span_end = tokens[end - 1].end()
    out: list[str] = []
    cursor = span_start
    for i in range(start, end):
        m = tokens[i]
        out.append(text[cursor : m.start()])
        if tok_lemmas[i] & query_lemmas:
            out.append(f"<b>{m.group()}</b>")
        else:
            out.append(m.group())
        cursor = m.end()
    snippet = "".join(out)
    prefix = "... " if start > 0 else ""
    suffix = " ..." if end < len(tokens) else ""
    return f"{prefix}{snippet}{suffix}"
