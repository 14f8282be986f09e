"""Deterministic HTML -> text extractor.

The engine's primary input is a Common-Crawl-style table
(url, warc_ts, html binary, text, lang) per BASELINE.json input_hint. The
per-row invariant is: extracted text must be *byte-identical per url* across
runs and parallelism levels. That is guaranteed by making extraction a pure
function of the html bytes — no locale, hash-seed, wall-clock or partition
dependence.

Extraction spec (fixed, versioned — the fixture generator emits pages whose
stored ``text`` column equals ``extract_text(html)`` exactly):
  1. decode UTF-8 (errors -> U+FFFD),
  2. drop <script>/<style>/<head> elements and HTML comments entirely,
  3. replace block-level tags (p, div, br, li, tr, h1-h6, table, ul, ol,
     section, article, header, footer) with a newline, all other tags with a
     single space,
  4. decode the five core entities (&amp; &lt; &gt; &quot; &#39;) plus
     numeric charrefs,
  5. collapse runs of spaces/tabs to one space, strip spaces around newlines,
     collapse 2+ newlines to one, strip the ends.
"""

from __future__ import annotations

import re

_SCRIPT_RE = re.compile(rb"<(script|style|head)\b.*?</\1\s*>", re.IGNORECASE | re.DOTALL)
_COMMENT_RE = re.compile(rb"<!--.*?-->", re.DOTALL)
_BLOCK_TAG_RE = re.compile(
    rb"</?(?:p|div|br|li|tr|h[1-6]|table|ul|ol|section|article|header|footer)\b[^>]*>",
    re.IGNORECASE,
)
_TAG_RE = re.compile(rb"<[^>]*>")
_NUM_REF_RE = re.compile(r"&#(\d{1,7});")

_ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&")]

_SPACE_RUN_RE = re.compile(r"[ \t\r\f\v]+")
_SPACE_NL_RE = re.compile(r" ?\n ?")
_NL_RUN_RE = re.compile(r"\n{2,}")


def extract_text(html: bytes) -> str:
    """Pure function of the html bytes; see module docstring for the spec."""
    if html is None:
        return ""
    raw = _COMMENT_RE.sub(b"", html)
    raw = _SCRIPT_RE.sub(b"", raw)
    raw = _BLOCK_TAG_RE.sub(b"\n", raw)
    raw = _TAG_RE.sub(b" ", raw)
    s = raw.decode("utf-8", errors="replace")
    s = _NUM_REF_RE.sub(lambda m: chr(int(m.group(1))) if int(m.group(1)) < 0x110000 else "", s)
    for ent, ch in _ENTITIES:
        s = s.replace(ent, ch)
    s = _SPACE_RUN_RE.sub(" ", s)
    s = _SPACE_NL_RE.sub("\n", s)
    while True:
        s2 = _NL_RUN_RE.sub("\n", s)
        if s2 == s:
            break
        s = s2
    return s.strip()
