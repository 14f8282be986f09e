"""Regenerate geospark/formatter_data.py from the OpenCageData
address-formatting template set (CC-BY public data; the reference vendors it
as osmgeocoder/data/worldwide.yml and reads ONLY ``address_template`` per key
— format.py:44-58). We re-express it as a plain-Python data module so the
runtime needs no yaml dependency and no data file.

Usage: python scripts/gen_formatter_data.py [path-to-worldwide.yml]
(dev-time only; the generated module is committed).
"""

from __future__ import annotations

import sys

import yaml

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/osmgeocoder/data/worldwide.yml"
OUT = "geospark/formatter_data.py"


def main():
    model = yaml.load(open(SRC), Loader=yaml.FullLoader)

    generics = {k: v for k, v in model.items()
                if k.startswith("generic") or k.startswith("fallback")}
    by_text = {v: k for k, v in generics.items()}

    country_tpl: dict[str, str] = {}   # code -> generic name OR inline template
    aliases: dict[str, str] = {}       # use_country-only entries
    for key, val in model.items():
        if key in generics or not isinstance(val, dict):
            continue
        if "address_template" in val:
            t = val["address_template"]
            country_tpl[key] = by_text.get(t, t)
        elif "use_country" in val:
            aliases[key] = val["use_country"]

    default_name = by_text.get(model["default"]["address_template"], "generic1")

    with open(OUT, "w") as fp:
        fp.write('"""Address-formatting templates (generated — do not edit).\n\n'
                 "Derived from the public OpenCageData address-formatting template set\n"
                 "(CC-BY; github.com/OpenCageData/address-formatting), the same data the\n"
                 "reference vendors as osmgeocoder/data/worldwide.yml and renders via\n"
                 "format.py:44-58. Regenerate with scripts/gen_formatter_data.py.\n"
                 'Only ``address_template`` is represented — the reference formatter\n'
                 "reads nothing else from the model.\n"
                 '"""\n\n'
                 "# flake8: noqa\n\n")
        fp.write("GENERICS = {\n")
        for k in sorted(generics):
            fp.write(f"    {k!r}: {generics[k]!r},\n")
        fp.write("}\n\n")
        fp.write(f"DEFAULT = {default_name!r}\n\n")
        fp.write("# country/territory -> generic name (str key into GENERICS) or an\n"
                 "# inline template string (contains '{{' so the two are distinguishable)\n")
        fp.write("COUNTRY = {\n")
        for k in sorted(country_tpl):
            fp.write(f"    {k!r}: {country_tpl[k]!r},\n")
        fp.write("}\n\n")
        fp.write("# use_country-only entries. NOTE reference quirk: format.py:58 does\n"
                 "# fmt['address_template'] and would raise KeyError for these keys; we\n"
                 "# resolve the alias instead (documented deviation, arguably intended).\n")
        fp.write("ALIASES = {\n")
        for k in sorted(aliases):
            fp.write(f"    {k!r}: {aliases[k]!r},\n")
        fp.write("}\n")
    n_inline = sum(1 for v in country_tpl.values() if "{{" in v)
    print(f"wrote {OUT}: {len(generics)} generics, {len(country_tpl)} countries "
          f"({n_inline} inline), {len(aliases)} aliases, default={default_name}")


if __name__ == "__main__":
    main()
