"""Address formatter: a minimal mustache-subset renderer + country templates.

The reference renders result rows through pystache with OpenCage
address-formatting templates and a custom ``first`` section helper
(osmgeocoder/format.py:8-58). pystache/yaml data files are not vendored here;
instead we implement the mustache subset those templates actually use:

  * ``{{{var}}}`` and ``{{var}}`` interpolation (addresses contain no HTML, so
    both render the raw value — matching how the templates use them),
  * ``{{#first}} a || b || c {{/first}}``: render each ``||`` alternative and
    keep the first whose rendering is non-blank — exactly the reference's
    ``first`` lambda (format.py:8-16),
  * missing/None keys render as '' and the final result is ``.strip()``-ed
    (format.py:52-58: None values are dropped before rendering).

Templates come from ``formatter_data`` — the full OpenCageData worldwide
template set (224 territories + 26 generic/fallback styles + 40
``use_country`` aliases), re-expressed as a generated Python data module
(scripts/gen_formatter_data.py); custom templates can be passed as a dict.
"""

from __future__ import annotations

import re

from . import formatter_data


def _build_templates() -> dict:
    """country code -> template string, generic-name references resolved;
    use_country aliases resolved one hop (worldwide.yml aliases never chain).
    'default' mirrors worldwide.yml's default entry (generic1)."""
    out = {"default": formatter_data.GENERICS[formatter_data.DEFAULT]}
    for code, tpl in formatter_data.COUNTRY.items():
        out[code] = formatter_data.GENERICS.get(tpl, tpl)
    for code, target in formatter_data.ALIASES.items():
        if target in out:
            out[code] = out[target]
    return out


TEMPLATES = _build_templates()

_VAR_RE = re.compile(r"\{\{\{\s*([\w.]+)\s*\}\}\}|\{\{\s*([\w.]+)\s*\}\}")
_SECTION_RE = re.compile(r"\{\{#first\}\}(.*?)\{\{/first\}\}", re.DOTALL)


def _interpolate(template: str, ctx: dict) -> str:
    def sub(m: re.Match) -> str:
        key = m.group(1) or m.group(2)
        v = ctx.get(key)
        return "" if v is None else str(v)

    return _VAR_RE.sub(sub, template)


def render(template: str, ctx: dict) -> str:
    """Render the mustache subset; ``first`` sections resolved like
    format.py:8-16 (split on ||, strip tokens, first non-blank render wins —
    the winning render is returned *unstripped*, matching pystache-lambda
    behavior in the reference)."""

    def first_section(m: re.Match) -> str:
        for token in (t.strip() for t in m.group(1).split("||")):
            result = _interpolate(token, ctx)
            if result.strip() != "":
                return result
        return ""

    return _interpolate(_SECTION_RE.sub(first_section, template), ctx)


def format_address(address: dict, country: str | None = None, templates: dict | None = None) -> str:
    """format.py:44-58 semantics: template by upper-cased country (fallback
    'default'), None values dropped, final whole-string strip."""
    model = templates or TEMPLATES
    fmt = model.get(country.upper()) if country is not None else None
    if fmt is None:
        fmt = model["default"]
    cleaned = {k: v for k, v in address.items() if v is not None}
    return render(fmt, cleaned).strip()
