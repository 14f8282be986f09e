"""Worldwide address-template coverage (F20).

Parity is checked against an INDEPENDENT transcription of the reference's
render semantics (osmgeocoder/format.py:8-16 first-helper + :44-58 render):
a split-based interpolator written differently from geospark.formatter's
regex renderer, run over every template in the generated data module.
Golden strings anchor a hand-checked subset of countries.
"""

from geospark import formatter, formatter_data


# --- independent reference renderer (format.py semantics, different code) ---

def _interp(t: str, ctx: dict) -> str:
    res = ""
    while True:
        j = t.find("{{")
        if j < 0:
            return res + t
        res += t[:j]
        t = t[j + 2:]
        k = t.find("}}")
        key, t = t[:k], t[k + 2:]
        if key.startswith("{"):
            key = key[1:]
            if t.startswith("}"):
                t = t[1:]
        v = ctx.get(key.strip())
        res += "" if v is None else str(v)


def ref_render(tpl: str, address: dict) -> str:
    ctx = {k: v for k, v in address.items() if v is not None}
    res, rest = "", tpl
    while "{{#first}}" in rest:
        pre, rest = rest.split("{{#first}}", 1)
        content, rest = rest.split("{{/first}}", 1)
        res += _interp(pre, ctx)
        for tok in (x.strip() for x in content.split("||")):
            r = _interp(tok, ctx)
            if r.strip() != "":
                res += r
                break
    return (res + _interp(rest, ctx)).strip()


ADDR_FULL = {"attention": None, "house": "Acme HQ", "road": "Hauptstraße",
             "house_number": "5", "postcode": "01067", "city": "Dresden",
             "state": "Sachsen", "state_code": "SN", "suburb": "Altstadt",
             "country": "Deutschland"}
ADDR_MIN = {"road": "Main St", "house_number": "1"}
ADDR_VILLAGE = {"road": "Dorfstr.", "house_number": "2", "village": "Kleinort",
                "county": "Landkreis X", "postcode": "99999", "country": "DE-Land"}


def test_every_template_matches_reference_semantics():
    assert len(formatter.TEMPLATES) >= 200
    for code, tpl in formatter.TEMPLATES.items():
        for addr in (ADDR_FULL, ADDR_MIN, ADDR_VILLAGE):
            cleaned = {k: v for k, v in addr.items() if v is not None}
            got = formatter.render(tpl, cleaned).strip()
            assert got == ref_render(tpl, addr), f"template {code} diverges"


def test_country_lookup_upper_cases_like_reference():
    # format.py:45 looks up country.upper(); lower-case input resolves, and
    # keys that don't survive .upper() (e.g. 'CN_en') fall to default — both
    # exactly as the reference behaves
    assert formatter.format_address(ADDR_FULL, country="de") == \
        formatter.format_address(ADDR_FULL, country="DE")
    assert formatter.format_address(ADDR_FULL, country="CN_en") == \
        formatter.format_address(ADDR_FULL)


def test_use_country_aliases_resolved():
    # e.g. American Samoa formats like the US (worldwide.yml use_country)
    assert formatter.TEMPLATES["AS"] == formatter.TEMPLATES["US"]
    assert len(formatter_data.ALIASES) >= 30


GOLDEN = {
    # generic1 family: road hn / postcode city
    "DE": "Acme HQ\nHauptstraße 5\n01067 Dresden\nDeutschland",
    "AT": "Acme HQ\nHauptstraße 5\n01067 Dresden\nDeutschland",
    "CH": "Acme HQ\nHauptstraße 5\n01067 Dresden\nDeutschland",
    "NL": "Acme HQ\nHauptstraße 5\n01067 Dresden\nDeutschland",
    "SE": "Acme HQ\nHauptstraße 5\n01067 Dresden\nDeutschland",
    "PL": "Acme HQ\nHauptstraße 5\n01067 Dresden\nDeutschland",
    "TR": "Acme HQ\nHauptstraße 5\n01067 Dresden\nDeutschland",
    # hn road variants
    "FR": "Acme HQ\n5 Hauptstraße\n01067 Dresden\nDeutschland",
    "US": "Acme HQ\n5 Hauptstraße\nDresden, SN 01067\nDeutschland",
    "CA": "Acme HQ\n5 Hauptstraße\nDresden, SN 01067\nDeutschland",
    "GB": "Acme HQ\n5 Hauptstraße\nDresden 01067\nDeutschland",
    "AU": "Acme HQ\n5 Hauptstraße\nAltstadt SN 01067\nDeutschland",
    # comma styles
    "ES": "Acme HQ\nHauptstraße, 5\n01067 Dresden\nDeutschland",
    "IN": "Acme HQ\n5, Hauptstraße\nAltstadt\nDresden - 01067\nSachsen\nDeutschland",
    # suburb/big-endian styles
    "JP": "Acme HQ\n5 Hauptstraße\nAltstadt\nDresden, Sachsen 01067\nDeutschland",
    "KR": "Acme HQ\n5 Hauptstraße\nAltstadt, Dresden, Sachsen 01067\nDeutschland",
    "RU": "Acme HQ\nHauptstraße 5\nAltstadt\nDresden\nSachsen\nDeutschland\n01067",
    "HU": "Acme HQ\nDresden\nHauptstraße 5\n01067\nDeutschland",
    "MX": "Acme HQ\nHauptstraße 5\nAltstadt\n01067 Dresden, SN\nDeutschland",
    "ZA": "Acme HQ\n5 Hauptstraße\nAltstadt\nDresden\n01067\nDeutschland",
    "CL": "Acme HQ\nHauptstraße 5\n01067 Dresden\nDeutschland",
    "BR": "Acme HQ\nHauptstraße, 5\nDresden - SN\n01067\nDeutschland",
}


def test_golden_country_renders():
    assert len(GOLDEN) >= 20
    for code, want in GOLDEN.items():
        assert formatter.format_address(ADDR_FULL, country=code.lower()) == want, code


def test_default_still_generic1():
    assert formatter.format_address(
        {"road": "Georgenstraße", "house_number": "34",
         "postcode": "92224", "city": "Amberg"}) == "Georgenstraße 34\n92224 Amberg"
