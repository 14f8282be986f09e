"""Address abbreviation expansion + normalization (S8: the libpostal
sidecar, ``bin/postal_service.py:22-85``).

The reference pre-processes unstructured queries through libpostal:
``/split`` first EXPANDS the address ("st" -> "street", "Hauptstr." ->
"Hauptstraße"), then parses each variant — and the geocoder consumes the
FIRST variant only (``osmgeocoder/forward.py:43-46``:
``parsed_address = response.json()[0]``). This engine replaces the
statistical expander with a committed, deterministic rule table that
produces that canonical variant directly, expressed as ordered regex
rewrites executable IDENTICALLY in three places:

  * Spark (Java regex, ``expand_term_col``) — the batch geocode path,
  * DuckDB (RE2, ``expand_term_sql``) — the correctness oracle,
  * Python (``re``, ``expand_address``) — the HTTP service face.

Patterns are restricted to the regex subset with identical semantics in
all three engines: ``(?i)`` leading flag, explicit Latin-1 letter classes,
and CONSUMED delimiter groups instead of ``\\b`` — Java/Python word
boundaries are unicode-aware while RE2's are ASCII, so ``\\bst`` diverges
next to umlauts ("Wüst" would expand in RE2 only); lookaround is out
because RE2 has none. Because the trailing delimiter is consumed, a rule
can miss the second of two same-abbreviation adjacent tokens ("st st") —
every rule is therefore applied twice (misses are provably isolated, so
the second pass catches them all). Equivalence is pinned by
``tests/test_geocode.py::test_expansion_cross_engine_equivalence``.

Rule-table semantics (documented divergence from libpostal): libpostal
emits ALL expansions ("St" -> both "street" and "saint"); the canonical
table picks one per abbreviation (street wins over saint, English "pl" ->
"place" wins over German "platz"). A locale tag on each rule lets callers
subset (``rules(locales={"de"})``); the default applies every rule, like
``expand_address`` with no ``languages`` argument.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, functions as F

# ORDER MATTERS: the German glued-suffix rule must run before the
# standalone "str" rule, and no expansion output re-matches any earlier or
# later pattern (expansions are full words that are not themselves
# abbreviations).
_LETTER = "a-zA-ZÀ-ÿ"  # Latin-1 letters incl. umlauts/ß, all engines
_LEAD = f"(^|[^{_LETTER}0-9])"       # consumed leading delimiter
_TAIL = rf"\.?($|[^{_LETTER}0-9.])"  # optional dropped '.', consumed tail


def _std(abbrev: str, expansion: str, locale: str) -> tuple[str, str, str]:
    """Standalone-token rule: ABBREV bounded by explicit delimiters, an
    optional trailing period dropped, both delimiters re-inserted."""
    return (f"(?i){_LEAD}{abbrev}{_TAIL}", f"$1{expansion}$2", locale)


# (java_pattern, java_replacement, locale)
RULES: list[tuple[str, str, str]] = [
    # German: trailing -str glued to a letter stem (Hauptstr/Hauptstr. ->
    # Hauptstraße); must precede the standalone "str" rule
    (rf"(?i)([{_LETTER}]+)str{_TAIL}", "$1straße$2", "de"),
    _std("str", "straße", "de"),
    _std("nr", "nummer", "de"),
    # English thoroughfare types
    _std("st", "street", "en"),
    _std("ave?", "avenue", "en"),  # av / ave
    _std("blvd", "boulevard", "en"),
    _std("rd", "road", "en"),
    _std("dr", "drive", "en"),
    _std("ln", "lane", "en"),
    _std("ct", "court", "en"),
    _std("hwy", "highway", "en"),
    _std("pkwy", "parkway", "en"),
    _std("pl", "place", "en"),
    _std("sq", "square", "en"),
    _std("ter", "terrace", "en"),
    _std("cir", "circle", "en"),
    _std("mt", "mount", "en"),
    _std("ft", "fort", "en"),
    # unit designators (libpostal's unit-aware rows)
    _std("apt", "apartment", "en"),
    _std("ste", "suite", "en"),
    _std("fl", "floor", "en"),
    _std("bldg", "building", "en"),
]


def rules(locales: set[str] | None = None) -> list[tuple[str, str]]:
    """(pattern, java_replacement) pairs, optionally restricted by locale.
    Each rule appears TWICE consecutively: the consumed trailing delimiter
    makes a match swallow the character the NEXT adjacent same-abbreviation
    token would need as its leading delimiter ("st st"), and misses are
    provably isolated (a miss requires its predecessor to have consumed the
    shared delimiter), so a second application is exhaustive."""
    out = []
    for p, r, loc in RULES:
        if locales is None or loc in locales:
            out.append((p, r))
            out.append((p, r))
    return out


# ---------------------------------------------------------------------------
# Spark face (the batch path: applied to query terms before the splitter)
# ---------------------------------------------------------------------------

def expand_term_col(col: Column, locales: set[str] | None = None) -> Column:
    """Canonical expansion as a chained JVM regexp_replace — stays inside
    whole-stage codegen; per-query-row cost on a dimension-sized batch."""
    out = col
    for pat, repl in rules(locales):
        out = F.regexp_replace(out, pat, repl)
    return out


# ---------------------------------------------------------------------------
# DuckDB face (the oracle recomputes the SAME expansion independently)
# ---------------------------------------------------------------------------

def expand_term_sql(expr: str, locales: set[str] | None = None) -> str:
    """The identical rule chain as nested DuckDB regexp_replace calls
    ('g' flag: RE2 replaces first-match-only by default, Java replaces all)."""
    out = expr
    for pat, repl in rules(locales):
        p = pat.replace("'", "''")
        r = _backslash_groups(repl).replace("'", "''")
        out = f"regexp_replace({out}, '{p}', '{r}', 'g')"
    return out


def _backslash_groups(repl: str) -> str:
    """Java's ``$n`` group references as the ``\\n`` form RE2 and Python
    use."""
    return re.sub(r"\$(\d)", r"\\\1", repl)


# ---------------------------------------------------------------------------
# Python face (the service endpoints /split /expand /normalize)
# ---------------------------------------------------------------------------

def _compiled(locales: set[str] | None = None):
    return [(re.compile(p), _backslash_groups(r)) for p, r in rules(locales)]


def expand_address(term: str, locales: set[str] | None = None) -> str:
    """The canonical expanded variant of ``term`` (the reference's
    ``expand_address(...)[0]`` role)."""
    for cre, repl in _compiled(locales):
        term = cre.sub(repl, term)
    return term


_TOKEN_RE = re.compile(rf"[{_LETTER}0-9]+")


def tokenize(term: str) -> list[str]:
    """Word/number tokens in order (the ``postal.tokenize`` role for the
    /expand endpoint's token lists)."""
    return _TOKEN_RE.findall(term)


def normalized_tokens(term: str, locales: set[str] | None = None) -> list[tuple[str, str]]:
    """(token, kind) pairs over the expanded, lowercased term — the
    ``postal.normalize.normalized_tokens`` role for /normalize. Kinds:
    'numeric' (digits only), 'alphanumeric' (mixed, e.g. house number
    '12b'), 'word' otherwise."""
    out = []
    for tok in tokenize(expand_address(term, locales).lower()):
        if tok.isdigit():
            kind = "numeric"
        elif any(c.isdigit() for c in tok):
            kind = "alphanumeric"
        else:
            kind = "word"
        out.append((tok, kind))
    return out
