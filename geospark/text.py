"""pg_trgm-compatible trigram kernels + string utilities.

The reference leans on three Postgres extensions (README.md:90-91):
  * pg_trgm      — the ``%`` similarity operator / ``<->`` distance used by every
                   forward-geocode variant (sql/geocoder/003:57,61 etc.)
  * fuzzystrmatch — levenshtein + dmetaphone (sql/geocoder/002:10-22)
and Python ``str.title()`` in the OA importer (bin/import_openaddress_data.py:369).

pg_trgm semantics reproduced here:
  * lowercase the string, split into words = runs of ASCII alphanumerics
    (non-alnum characters separate words and never appear in trigrams),
  * pad each word with two leading spaces and one trailing space,
  * collect the distinct 3-grams of every padded word into one set,
  * similarity(a, b) = |A ∩ B| / |A ∪ B|;  ``a % b``  ⇔  similarity >= 0.3,
  * distance ``a <-> b`` = 1 - similarity.

ASCII word characters are a documented deviation from a UTF-8 Postgres locale
(SURVEY.md §7.4.1): it keeps the kernel bit-identical to Java/RE2 regex
semantics so the Spark plan, this kernel, and the DuckDB oracle all agree.
"""

from __future__ import annotations

import re

TRGM_SIM_THRESHOLD = 0.3
_WORD_RE = re.compile(r"[a-z0-9]+")


def trigram_words(s: str) -> list[str]:
    return _WORD_RE.findall(s.lower())


def trigrams(s: str) -> frozenset:
    """Distinct padded trigrams of all words in ``s`` (pg_trgm rules)."""
    if s is None:
        return frozenset()
    grams = set()
    for w in trigram_words(s):
        p = "  " + w + " "
        for i in range(len(p) - 2):
            grams.add(p[i : i + 3])
    return frozenset(grams)


def similarity(a: str, b: str) -> float:
    """pg_trgm similarity: shared / union of distinct trigrams."""
    ta, tb = trigrams(a), trigrams(b)
    if not ta or not tb:
        return 0.0
    shared = len(ta & tb)
    union = len(ta) + len(tb) - shared
    return shared / union if union else 0.0


def is_similar(a: str, b: str, threshold: float = TRGM_SIM_THRESHOLD) -> bool:
    """The pg_trgm ``%`` operator (strictly: similarity >= threshold)."""
    return similarity(a, b) >= threshold


def distance(a: str, b: str) -> float:
    """The pg_trgm ``<->`` operator."""
    return 1.0 - similarity(a, b)


def levenshtein(a: str, b: str) -> int:
    """Classic DP edit distance (insert/delete/substitute cost 1), matching
    fuzzystrmatch ``levenshtein`` defaults. Only used driver-side/in tests;
    the distributed path uses Spark's builtin F.levenshtein."""
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def prefix_levenshtein(word: str, user_input: str) -> int:
    """fuzzystrmatch ``levenshtein(substr(word, 0, length(input)+1), input)``
    — Postgres substr with start 0 yields the first len(input) characters
    (sql/geocoder/002-text_prediction.sql:10; SURVEY.md §7.4.5)."""
    return levenshtein(word[: len(user_input)], user_input)


def py_title(s: str) -> str:
    """Python ``str.title()`` — the importer applies it to every CSV field
    (bin/import_openaddress_data.py:369). NOT the same as Spark ``initcap``
    ("o'brien 12a".title() == "O'Brien 12A"; initcap gives "O'brien 12a"),
    so the OA source uses a pandas UDF wrapping this."""
    return s.title() if s is not None else None
