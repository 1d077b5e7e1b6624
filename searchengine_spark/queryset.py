"""The fixed reference query set (FIXTURES.md §2) — shared by tests and the
bench harness. Categories: single rare term; single high-DF term; multi-term
AND with mixed selectivity; absent term; inflected forms; duplicate terms;
Russian; mixed-alphabet; ё-normalization; cross-language AND."""

REFERENCE_QUERIES = [
    "hotalpha",                       # high-df single term (skew path)
    "hotbeta hotgamma",               # two high-df terms
    "поиск",                          # Russian single term
    "запросом страницы",              # Russian inflected forms
    "data the",                       # term + stopword (stopword dropped)
    "hotalpha hotalpha hotalpha",     # duplicate terms collapse
    "zzzqqqxxx",                      # absent term → empty
    "hotalpha zzzqqqxxx",             # AND with absent term → empty (reference)
    "logлог",                         # mixed-alphabet → two lemmas
    "ёж",                             # ё→е normalization
    "hotdelta поиск",                 # cross-language AND
    "walking walked walks",           # inflections of one stem
]
