"""Snippet + title presentation operators (SURVEY §2.5 P1–P3).

Reference algorithm (``indexing/impl/LemmaSearcherImpl.java:113-281``):
re-tokenize the hit's text recording positions of query lemmas; pick the
rarest query lemma present (:164-170); among its positions choose the one
minimizing the maximum deviation to the closest position of every other
query lemma (:172-214); emit a ~40-word window (:218) with matched lemma
occurrences wrapped in ``<b>…</b>`` (:276-277).

Multi-window (``LemmaSearcherImpl.java:121-125,216-233``): when the chosen
lemma positions span more than ``window`` words, the reference emits one
2·offset-word part per distant tail position (offset = window // k // 2,
fixed), shrinking the remaining length by 2·offset−1 each round, then one
final part covering the leftover cluster, all joined with ``" ... "`` in
document order. This module reproduces that arithmetic exactly (goldens in
``test_snippets.py``); positions index letter-run tokens rather than the
reference's ``split()`` array with empty entries.

Divergence (documented): title is synthesized as ``conv_id#turn_idx`` since
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
    """Build the highlighted snippet: windows around the chosen query-lemma
    positions, several parts joined by ``" ... "`` when the positions span
    more than ``window`` words (multi-window, ``LemmaSearcherImpl.java:
    121-125``)."""
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
        chosen = [0]
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
        # snippet indices = rare position + each other lemma's closest
        # position to it (findClosestLemmaIndices,
        # LemmaSearcherImpl.java:172-214)
        chosen = sorted(
            {best_pos}
            | {min(positions[o], key=lambda q: abs(q - best_pos)) for o in others}
        )

    # window intervals (token index ranges, END-EXCLUSIVE), following
    # getSnippetParts' arithmetic exactly (LemmaSearcherImpl.java:216-233):
    # fixed offset = window // k // 2; while the remaining chosen indices
    # span more than the (shrinking) length, emit a 2·offset-word part
    # around the LAST remaining index [ind[c]−offset, ind[c]+offset−1) and
    # shrink length ← max(length − 2·offset + 1, 0); the final part covers
    # the remaining cluster [ind[0]−offset, ind[c]+offset−1). Parts are
    # produced back-to-front and joined in document order (getSnippet's
    # reversed concat, :121-125). Deviation: offset is floored at 1 (a
    # >window/2-lemma query would otherwise emit empty parts); positions
    # index letter-run tokens, not the reference's split() array with its
    # empty entries.
    offset = max(1, window // len(chosen) // 2)
    length = window
    counter = len(chosen) - 1
    intervals: list[tuple[int, int]] = []
    while True:
        idx = counter if chosen[counter] - chosen[0] > length else 0
        start = max(0, chosen[idx] - offset)
        end = min(chosen[counter] + offset - 1, len(tokens) - 1)
        # (guard: keep the anchoring position inside its end-exclusive part
        # — the reference drops a match sitting on the very last word)
        end = min(max(end, chosen[counter] + 1, start + 1), len(tokens))
        intervals.append((start, end))
        if chosen[counter] - chosen[0] <= length:
            break
        counter -= 1
        length = max(length - offset * 2 + 1, 0)
    intervals.reverse()

    def render(start: int, end: int) -> str:
        # P2: reconstruct from the original text span, bolding matched tokens
        out: list[str] = []
        cursor = tokens[start].start()
        for i in range(start, end):
            m = tokens[i]
            out.append(text[cursor : m.start()])
            if tok_lemmas[i] & query_lemmas:
                out.append(f"<b>{m.group()}</b>")
            else:
                out.append(m.group())
            cursor = m.end()
        return "".join(out)

    body = " ... ".join(render(s, e) for s, e in intervals)
    prefix = "... " if intervals[0][0] > 0 else ""
    suffix = " ..." if intervals[-1][1] < len(tokens) else ""
    return f"{prefix}{body}{suffix}"
