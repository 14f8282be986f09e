"""Deterministic synthetic fixture world (FIXTURES.md §§1-4, 6).

Generates, with no randomness beyond a fixed seed and no wall-clock:
  * the 5 imposm-shaped OSM tables (FIXTURES.md §2 / SURVEY.md §1.1),
  * OpenAddresses-shaped raw CSV rows + license blocks (§3),
  * a Common-Crawl-style web-page table whose ``text`` column is byte-equal
    to ``extract.extract_text(html)`` (§1, BASELINE.json input_hint),
  * forward / reverse / predict query tables (§4),
  * polygon *edge* tables (one row per polygon edge) so the DuckDB oracle can
    do ray-casting point-in-polygon in pure SQL, independently of the
    engine's NumPy kernels.

Everything is written as parquet via pyarrow (no Spark dependency) so the
fixtures can be committed and referenced by absolute path from oracle SQL.

Scale knob ``n_houses_per_street`` lets bench.py regenerate a larger world in
a temp dir for throughput runs; the committed default world has ~3.4k houses
including one mega-cell city holding >30% of them (skew fixture §6).
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from . import extract
from .geometry import polygon_centroid
from .proj import lonlat_to_merc, merc_to_lonlat

FIXTURE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures")

X0, Y0 = 1.00e6, 6.00e6  # world origin (southern-Germany-ish Mercator meters)


def _rect(x0, y0, x1, y1):
    """Closed rectangle ring as a plain list of [x, y]."""
    return [[x0, y0], [x1, y0], [x1, y1], [x0, y1], [x0, y0]]


def _notched_rect(x0, y0, x1, y1, frac=0.25):
    """Concave hexagon: rectangle with a triangular notch in the top edge,
    so admin containment tests exercise non-convex polygons."""
    mx = (x0 + x1) / 2.0
    d = (y1 - y0) * frac
    return [[x0, y0], [x1, y0], [x1, y1], [mx, y1 - d], [x0, y1], [x0, y0]]


STREET_POOL = [
    "Georgenstraße", "Hauptstraße", "Bahnhofstraße", "Marktplatz", "Gartenweg",
    "Main Street", "High Street", "Church Road", "Mill Lane", "Station Road",
    "Dickenreuther Weg", "Schulstraße",
]

CITIES = [
    # name, postcode, county index, is mega-city
    ("Amberg", "92224", 0, False),
    ("Dickenreuth", "95505", 1, False),
    ("Bigstadt", "90001", 2, True),
    ("Neuhausen", "73765", 3, False),
    ("Springfield", "62704", 4, False),
    ("Rivertown", "10501", 5, False),
    ("Lakeside", "81669", 6, False),
    ("Altdorf", "90518", 7, False),
]


def build_world(n_streets_per_city: int = 6, n_houses_per_street: int = 40, seed: int = 42):
    """Returns a dict of table-name -> list-of-dict rows."""
    rng = np.random.RandomState(seed)
    W = 150_000.0  # country width
    H = 300_000.0

    admin = []
    osm_id = 1000
    # countries (admin_level 2)
    admin.append(dict(osm_id=osm_id, name="Osmland", admin_level=2, type="administrative",
                      rings=[_rect(X0, Y0, X0 + W, Y0 + H)])); osm_id += 1
    admin.append(dict(osm_id=osm_id, name="Adressia", admin_level=2, type="administrative",
                      rings=[_rect(X0 + W, Y0, X0 + 2 * W, Y0 + H)])); osm_id += 1
    # states (admin_level 4): split each country in y
    states = [("Nordland", X0, Y0 + H / 2, X0 + W, Y0 + H),
              ("Südland", X0, Y0, X0 + W, Y0 + H / 2),
              ("Eastmark", X0 + W, Y0 + H / 2, X0 + 2 * W, Y0 + H),
              ("Westmark", X0 + W, Y0, X0 + 2 * W, Y0 + H / 2)]
    for nm, x0, y0, x1, y1 in states:
        admin.append(dict(osm_id=osm_id, name=nm, admin_level=4, type="administrative",
                          rings=[_rect(x0, y0, x1, y1)])); osm_id += 1
    # counties (admin_level 6): split each state in x; one concave
    counties = []
    for si, (nm, x0, y0, x1, y1) in enumerate(states):
        for half in range(2):
            cx0 = x0 + half * (x1 - x0) / 2
            cx1 = x0 + (half + 1) * (x1 - x0) / 2
            cname = f"{nm} County {half + 1}"
            ring = _notched_rect(cx0, y0, cx1, y1) if si == 0 and half == 0 else _rect(cx0, y0, cx1, y1)
            counties.append((cname, cx0, y0, cx1, y1))
            admin.append(dict(osm_id=osm_id, name=cname, admin_level=6, type="administrative",
                              rings=[ring])); osm_id += 1
    # one OVERLAPPING county that covers part of the first city (Amberg sits
    # at the center of county 0) → J3 left-join row multiplicity fixture
    ccx0 = (counties[0][1] + counties[0][3]) / 2
    ccy0 = (counties[0][2] + counties[0][4]) / 2
    admin.append(dict(osm_id=osm_id, name="Overlap Special District", admin_level=6,
                      type="special",
                      rings=[_rect(ccx0 - 6_000, ccy0 - 6_000, ccx0 + 500, ccy0 + 6_000)]))
    osm_id += 1

    # city polygons (admin_level 8) centered in their county
    city_polys = []
    for ci, (cname, pc, county_idx, mega) in enumerate(CITIES):
        x0, y0, x1, y1 = counties[county_idx][1:]
        ccx, ccy = (x0 + x1) / 2, (y0 + y1) / 2
        r = 6_000.0
        rings = [_rect(ccx - r, ccy - r, ccx + r, ccy + r)]
        city_polys.append((cname, pc, ccx, ccy, r))
        admin.append(dict(osm_id=osm_id, name=cname, admin_level=8, type="city", rings=rings))
        osm_id += 1

    # postal-code polygons: one per city, slightly larger than the city box,
    # plus one covering an unnamed rural area (tests optimize/004)
    postal = []
    for cname, pc, ccx, ccy, r in city_polys:
        postal.append(dict(osm_id=osm_id, postcode=pc,
                           rings=[_rect(ccx - r * 1.2, ccy - r * 1.2, ccx + r * 1.2, ccy + r * 1.2)]))
        osm_id += 1
    rural_x, rural_y = X0 + 10_000, Y0 + 10_000
    postal.append(dict(osm_id=osm_id, postcode="99999",
                       rings=[_rect(rural_x, rural_y, rural_x + 8_000, rural_y + 8_000)]))
    osm_id += 1

    # roads, houses, buildings
    roads, houses, buildings = [], [], []
    hn_id, b_id, r_id = 500_000, 700_000, 300_000
    for ci, (cname, pc, ccx, ccy, r) in enumerate(city_polys):
        mega = CITIES[ci][3]
        n_streets = n_streets_per_city
        for si in range(n_streets):
            street = STREET_POOL[(ci + si) % len(STREET_POOL)]
            # horizontal street line inside the city box
            sy = ccy - r * 0.8 + (si + 0.5) * (1.6 * r / n_streets)
            sx0, sx1 = ccx - r * 0.8, ccx + r * 0.8
            if mega:
                # cram the mega-city into a compact box so one res-15 cell
                # holds it (the skew fixture) — but let the box grow with the
                # house count so the density stays at very-dense-city levels
                # (~0.04 houses/m^2) instead of going unphysical at bench
                # scale; at test scale (n<=1600/street) this is the original
                # 800 m box
                n_h_mega = n_houses_per_street * 6
                half_w = min(0.8 * r, max(400.0, 0.2 * n_h_mega))
                sy = ccy + (si - n_streets / 2) * 60.0
                sx0, sx1 = ccx - half_w, ccx + half_w
            roads.append(dict(osm_id=r_id, type="residential", street=street, cls="highway",
                              line=[[sx0, sy], [sx1, sy]]))
            r_id += 1
            n_h = n_houses_per_street * (6 if mega else 1)
            for hi in range(n_h):
                t = (hi + 0.5) / n_h
                hx = sx0 + t * (sx1 - sx0)
                hy = sy + (12.0 if hi % 2 == 0 else -12.0) * (0.08 if mega else 1.0)
                number = f"{hi + 1}a" if hi % 7 == 3 else str(hi + 1)
                # field-presence patterns exercising optimize/004/005 paths:
                mode = hi % 10
                city_f, pc_f = cname, pc
                if mode == 8:
                    city_f = ""          # postcode only → 005 fills city via admin8
                elif mode == 9:
                    city_f, pc_f = "", ""  # both empty → 004 fills pc via postal poly
                houses.append(dict(osm_id=hn_id, x=hx, y=hy, city=city_f, postcode=pc_f,
                                   street=street, house_number=number))
                hn_id += 1
        # buildings with house numbers in half the cities (optimize/002 path)
        if ci % 2 == 0:
            for bi in range(12):
                bx = ccx - r * 0.5 + bi * (r / 12.0)
                by = ccy + r * 0.55
                buildings.append(dict(
                    osm_id=b_id, name=f"{cname} Block {bi}" if bi % 3 == 0 else "",
                    type="yes", street=STREET_POOL[(ci + bi) % n_streets],
                    house_number=str(100 + bi) if bi % 4 != 1 else "",
                    rings=[_rect(bx, by, bx + 40, by + 30)]))
                b_id += 1
    # rural houses: inside the 99999 postal polygon, no city/postcode, with street
    for k in range(20):
        houses.append(dict(osm_id=hn_id, x=rural_x + 500 + k * 300, y=rural_y + 4_000,
                           city="", postcode="", street="Feldweg", house_number=str(k + 1)))
        hn_id += 1
    # orphan houses: outside every postal/admin polygon → stay ('','') and drop out
    for k in range(5):
        houses.append(dict(osm_id=hn_id, x=X0 - 50_000 - k * 1000, y=Y0 - 50_000,
                           city="", postcode="", street="Nowhere Lane", house_number=str(k + 1)))
        hn_id += 1

    return dict(osm_admin=admin, osm_postal_code=postal, osm_roads=roads,
                osm_house_number=houses, osm_buildings=buildings)


# ---------------------------------------------------------------------------
# OpenAddresses fixture (FIXTURES.md §3): csv column order per
# bin/import_openaddress_data.py:366-410 (lon,lat,number,street,unit,city,
# district,region,postcode)
# ---------------------------------------------------------------------------

OA_BASE = {"springfield": (-89.650, 39.800), "rivertown": (-73.755, 41.270)}


def build_oa_rows(seed: int = 42):
    rows = []
    idx = 0
    # OA covers two US-ish spots far from the OSM world (fallback fixture);
    # includes a duplicate house number (last-wins dedup) and messy casing
    for cname, pc, region, src in [
        ("springfield", "62704", "il", "us/il/test.csv"),
        ("rivertown", "10501", "ny", "us/ny/rivertown.csv"),
    ]:
        lon0, lat0 = OA_BASE[cname]
        for si, st in enumerate(["oak avenue", "elm street", "MAPLE DRIVE"]):
            for i in range(15):
                lon = lon0 + si * 0.004 + i * 0.0002
                lat = lat0 + si * 0.001
                rows.append(dict(
                    row_idx=idx, lon=str(round(lon, 7)), lat=str(round(lat, 7)),
                    number=str(i + 1), street=st, unit="",
                    city=cname, district="", region=region, postcode=pc,
                    source_file=src))
                idx += 1
        # duplicate house number with different coordinate: LAST wins
        rows.append(dict(row_idx=idx, lon=str(round(lon0 + 0.0001, 7)), lat=str(round(lat0, 7)),
                         number="1", street="oak avenue", unit="", city=cname,
                         district="", region=region, postcode=pc, source_file=src))
        idx += 1
    # a source with EMPTY city names whose houses sit inside the fixture's
    # Lakeside admin_level-8 polygon → exercises optimize/017 backfill
    lk_lon, lk_lat = merc_to_lonlat(np.array([1187000.0]), np.array([6075000.0]))
    for i in range(8):
        rows.append(dict(row_idx=idx, lon=str(round(float(lk_lon[0]) + i * 0.0002, 7)),
                         lat=str(round(float(lk_lat[0]), 7)),
                         number=str(i + 1), street="seefeldweg", unit="", city="",
                         district="", region="by", postcode="81669",
                         source_file="de/by/lakeside.csv"))
        idx += 1
    return rows


# LICENSE.txt in the reference's block format (import_openaddress_data.py:280-314):
# two header lines are skipped, then blocks of [file, Website:, License:,
# Required attribution:] terminated by a blank line.
OA_LICENSE_TEXT = b"""Attribution and license data
============================
us/il/test
Website: https://example.org/data
License: CC-BY-4.0
Required attribution: Example County GIS

us/ny/rivertown
Website: https://example.org/ny
License: Public Domain
Required attribution: Yes

de/by/lakeside
Website: https://example.org/by
License: DL-DE-BY-2.0
Required attribution: Bayern GIS

"""


# ---------------------------------------------------------------------------
# Web pages (FIXTURES.md §1) — html generated so extract_text(html) == text
# ---------------------------------------------------------------------------

def build_webpages(world, n_pages: int = 1500, seed: int = 42):
    rng = np.random.RandomState(seed + 2)
    houses = world["osm_house_number"]
    langs = ["en", "de", "fr", "es", "it"]
    # several crawl hosts (deterministic per page) so per-domain analytics
    # have real groups to aggregate; host choice never affects page content
    hosts = ["example.org", "news.example.com", "shop.example.net",
             "blog.example.org", "data.example.io"]
    pages = []
    base_ts = 1700000000  # fixed epoch base; no wall-clock
    for i in range(n_pages):
        url = f"https://{hosts[i % len(hosts)]}/p/{i}"
        h = houses[int(rng.randint(0, len(houses)))]
        body = [f"<h1>Page {i}</h1>"]
        kind = i % 4
        if kind == 0:  # embeds a full address
            body.append(f"<p>Visit us at {h['street']} {h['house_number']}, "
                        f"{h['postcode']} {h['city']}.</p>")
        elif kind == 1:  # embeds a coordinate pair (lat, lon)
            lon, lat = merc_to_lonlat(np.array([h["x"]]), np.array([h["y"]]))
            body.append(f"<p>Our office is at {float(lat[0]):.6f}, {float(lon[0]):.6f} "
                        f"in the city center.</p>")
        elif kind == 2:  # street mention only
            body.append(f"<p>News from {h['street']} and the neighborhood.</p>")
        else:  # no geo content
            body.append("<p>Nothing spatial to see here, just prose.</p>")
        body.append(f"<div>Contact &amp; imprint {i % 97}</div>")
        html = ("<html><head><title>t</title><script>var x=1;</script></head><body>"
                + "".join(body) + "</body></html>").encode("utf-8")
        pages.append(dict(url=url, warc_ts=base_ts + i * 37, html=html,
                          text=extract.extract_text(html),
                          lang=langs[int(rng.randint(0, len(langs)))]))
    return pages


def build_raw_elements(world, admin_polys, postal_polys, bld_polys):
    """Raw OSM-elements table (osm_id, kind, tags_json, geometry cols) that
    the imposm-mapping filters (geospark/sources.py) must reduce back to the
    5 OSM tables — including reject rows exercising every filter rule."""
    import json

    rows = []
    G = dict(rings=None, xmin=None, ymin=None, xmax=None, ymax=None,
             centroid_x=None, centroid_y=None, line=None,
             x0=None, y0=None, x1=None, y1=None, x=None, y=None)

    def add(osm_id, kind, tags, **geom):
        r = dict(G)
        r.update(geom)
        rows.append(dict(osm_id=osm_id, kind=kind, tags_json=json.dumps(tags, sort_keys=True), **r))

    for p in admin_polys:
        add(p["osm_id"], "polygon",
            {"boundary": "administrative", "admin_level": str(p["admin_level"]),
             "name": p["name"]},
            rings=p["rings"], xmin=p["xmin"], ymin=p["ymin"], xmax=p["xmax"], ymax=p["ymax"],
            centroid_x=p["centroid_x"], centroid_y=p["centroid_y"])
    for p in postal_polys:
        add(p["osm_id"], "polygon", {"postal_code": p["postcode"]},
            rings=p["rings"], xmin=p["xmin"], ymin=p["ymin"], xmax=p["xmax"], ymax=p["ymax"],
            centroid_x=p["centroid_x"], centroid_y=p["centroid_y"])
    for p in bld_polys:
        tags = {"building": p["type"]}
        if p["name"]:
            tags["name"] = p["name"]
        if p["street"]:
            tags["addr:street"] = p["street"]
        if p["house_number"]:
            tags["addr:housenumber"] = p["house_number"]
        add(p["osm_id"], "polygon", tags,
            rings=p["rings"], xmin=p["xmin"], ymin=p["ymin"], xmax=p["xmax"], ymax=p["ymax"],
            centroid_x=p["centroid_x"], centroid_y=p["centroid_y"])
    for r in world["osm_roads"]:
        add(r["osm_id"], "linestring",
            {"highway": r["type"], "name": r["street"]},
            line=[[float(p[0]), float(p[1])] for p in r["line"]],
            x0=r["line"][0][0], y0=r["line"][0][1], x1=r["line"][1][0], y1=r["line"][1][1])
    for h in world["osm_house_number"]:
        tags = {"addr:housenumber": h["house_number"]}
        if h["city"]:
            tags["addr:city"] = h["city"]
        if h["postcode"]:
            tags["addr:postcode"] = h["postcode"]
        if h["street"]:
            tags["addr:street"] = h["street"]
        add(h["osm_id"], "point", tags, x=h["x"], y=h["y"])

    # reject rows — each violates exactly one mapping rule
    add(900001, "linestring", {"highway": "residential"},  # road without name
        line=[[0.0, 0.0], [1.0, 1.0]], x0=0.0, y0=0.0, x1=1.0, y1=1.0)
    add(900002, "linestring", {"highway": "pedestrian", "name": "Plaza", "area": "yes"},
        line=[[0.0, 0.0], [1.0, 1.0]], x0=0.0, y0=0.0, x1=1.0, y1=1.0)  # area=yes
    add(900003, "polygon", {"landuse": "park", "name": "No Building Tag"},
        rings=[[[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 0.0]]],
        xmin=0.0, ymin=0.0, xmax=1.0, ymax=1.0, centroid_x=0.5, centroid_y=0.5)
    add(900004, "point", {"amenity": "bench"}, x=5.0, y=5.0)  # no housenumber
    return rows


def build_dmetaphone_codes(world, oa_rows, predict_inputs):
    """(word, dmet, dmet_alt) for every string that can appear as a wordlist
    word (OSM + OA branches of geocoder/001) or as a predict-query input.

    This is the predict oracle's code table (the engine's equivalent of the
    Postgres ``str.dmetaphone`` GIN indexes, fixed at fixture-gen time like
    the polygon edge tables are for PIP): DuckDB recomputes the whole
    trigram-``%`` + prefix-levenshtein + 4-key-ranking path of
    002-text_prediction.sql in SQL over these codes, independently of the
    engine's runtime metaphone UDF. The codes themselves come from
    geospark.metaphone (golden-tested against the published double-metaphone
    vectors in tests/test_kernels.py), so a runtime regression in either the
    metaphone kernel or the predict dataflow breaks the hash match."""
    import re

    from . import metaphone

    names: set[str] = set()
    for a in world["osm_admin"]:
        names.add(a["name"])  # city names via 005/017 fills come from here
    for h in world["osm_house_number"]:
        names.add(h["city"])
        names.add(h["street"])
    for b in world["osm_buildings"]:
        names.add(b["street"])
    for r in oa_rows:  # importer title-cases before storing (S3)
        city, street = r["city"].title(), r["street"].title()
        names.add(city if city else " ")
        names.add(street if street else " ")
    words: set[str] = set(predict_inputs)
    for nm in names:
        # ASCII \W: Spark (Java), DuckDB (RE2) and Postgres all treat
        # \W as [^0-9A-Za-z_] here, so 'Georgenstraße' splits at the ß;
        # Python's default Unicode \W would not, leaving the actual
        # wordlist words ('Georgenstra', 'e') uncovered by the code table
        words.update(re.split(r"\W", nm, flags=re.ASCII))
    rows = []
    for w in sorted(words):
        d, da = metaphone.double_metaphone(w)
        rows.append(dict(word=w, dmet=d, dmet_alt=da))
    return rows


def build_media(n: int = 60, seed: int = 42):
    """Multimodal fixture: opaque binary payloads + typed metadata. Payload
    bytes are seeded-deterministic (hash-expanded), no real codecs."""
    rng = np.random.RandomState(seed + 3)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        size = {"image": 256, "audio": 512, "video": 2048}[kind] + int(rng.randint(0, 64))
        payload = rng.randint(0, 256, size, dtype=np.uint8).tobytes()
        rows.append(dict(media_id=i, kind=kind, payload=payload,
                         width=64 + i if kind == "image" else None,
                         sample_rate=16000 if kind == "audio" else None,
                         n_frames=size // 64 if kind == "video" else None))
    return rows


# ---------------------------------------------------------------------------
# query tables (FIXTURES.md §4)
# ---------------------------------------------------------------------------

def build_queries():
    fwd = [
        # road-only, typo'd, no center (NULLS-LAST ranking branch)
        dict(query_id=1, road="Georgenstr", house_number=None, postcode=None,
             city=None, country=None, center_lat=None, center_lon=None, radius=20000, limit=20),
        # road + housenumber + city (the reference demo query, 003:496)
        dict(query_id=2, road="Georgenstr", house_number="34", postcode=None,
             city="Amberg", country=None, center_lat=None, center_lon=None, radius=20000, limit=10),
        # postcode branch takes precedence over city
        dict(query_id=3, road="Hauptstr", house_number=None, postcode="95505",
             city="IgnoredCity", country=None, center_lat=None, center_lon=None, radius=20000, limit=20),
        # with country restriction
        dict(query_id=4, road="Main Street", house_number=None, postcode=None,
             city=None, country="Adressia", center_lat=None, center_lon=None, radius=20000, limit=20),
        # with center + radius
        dict(query_id=5, road="Bahnhofstr", house_number=None, postcode=None,
             city=None, country=None, center_lat=47.4, center_lon=9.2, radius=2_000_000, limit=20),
        # no match at all
        dict(query_id=6, road="Zzzyqx Blvd", house_number=None, postcode=None,
             city=None, country=None, center_lat=None, center_lon=None, radius=20000, limit=20),
    ]
    rev = []
    # reverse queries at known house positions (filled in by write_fixtures
    # with actual world coordinates)
    unstructured = [
        dict(query_id=1, search_term="Georgenstraße 34, 92224 Amberg",
             country=None, center_lat=None, center_lon=None, radius=20000, limit=10),
        dict(query_id=2, search_term="Hauptstraße 5, 95505 Dickenreuth",
             country=None, center_lat=None, center_lon=None, radius=20000, limit=10),
        dict(query_id=3, search_term="Main Street",  # no parse → whole term as road
             country=None, center_lat=None, center_lon=None, radius=20000, limit=20),
        dict(query_id=4, search_term="complete gibberish nowhere",
             country=None, center_lat=None, center_lon=None, radius=20000, limit=10),
        # abbreviated variants — the libpostal /expand stage (postal.py rule
        # table) must recover the exact unabbreviated parses above
        dict(query_id=5, search_term="Georgenstr. 34, 92224 Amberg",  # de glued suffix + '.'
             country=None, center_lat=None, center_lon=None, radius=20000, limit=10),
        dict(query_id=6, search_term="Hauptstr 5, 95505 Dickenreuth",  # de suffix, no '.'
             country=None, center_lat=None, center_lon=None, radius=20000, limit=10),
        dict(query_id=7, search_term="123 Main St",  # en standalone; unparsed → whole as road
             country=None, center_lat=None, center_lon=None, radius=20000, limit=20),
        dict(query_id=8, search_term="Bahnhofstr. 3",  # expansion inside the road fallback
             country=None, center_lat=None, center_lon=None, radius=20000, limit=20),
    ]
    predict = [
        dict(query_id=1, input="Dickenr"),
        dict(query_id=2, input="Georgenstr"),
        dict(query_id=3, input="Hauptstrase"),  # typo
        dict(query_id=4, input="Mian"),          # transposition of Main
        dict(query_id=5, input="Xxqqzz"),        # no match
    ]
    return fwd, rev, predict, unstructured


# ---------------------------------------------------------------------------
# parquet writers
# ---------------------------------------------------------------------------

def _rings_to_wkb_rows(rows, geom_key="rings"):
    """Flatten ring geometry to exploded edge rows + bbox columns."""
    out_polys, out_edges = [], []
    for r in rows:
        rings = r[geom_key]
        pts = np.vstack([np.asarray(ring) for ring in rings])
        rec = {k: v for k, v in r.items() if k != geom_key}
        rec.update(xmin=float(pts[:, 0].min()), ymin=float(pts[:, 1].min()),
                   xmax=float(pts[:, 0].max()), ymax=float(pts[:, 1].max()))
        cx, cy = polygon_centroid([np.asarray(ring) for ring in rings])
        rec.update(centroid_x=cx, centroid_y=cy)
        rec["rings"] = [[[float(p[0]), float(p[1])] for p in ring] for ring in rings]
        out_polys.append(rec)
        for ri, ring in enumerate(rings):
            for ei in range(len(ring) - 1):
                out_edges.append(dict(
                    osm_id=r["osm_id"], ring_idx=ri, edge_idx=ei,
                    x0=float(ring[ei][0]), y0=float(ring[ei][1]),
                    x1=float(ring[ei + 1][0]), y1=float(ring[ei + 1][1]),
                    **{k: r[k] for k in r if k not in (geom_key, "osm_id")}))
    return out_polys, out_edges


def _write(rows, path, schema=None):
    if not rows:
        raise ValueError(f"no rows for {path}")
    cols = {}
    for k in rows[0]:
        cols[k] = [r.get(k) for r in rows]
    table = pa.table(cols) if schema is None else pa.table(cols, schema=schema)
    pq.write_table(table, path)
    return table


def write_fixtures(out_dir: str = FIXTURE_DIR, n_streets_per_city: int = 6,
                   n_houses_per_street: int = 40, n_pages: int = 1500, seed: int = 42):
    os.makedirs(out_dir, exist_ok=True)
    world = build_world(n_streets_per_city, n_houses_per_street, seed)

    admin_polys, admin_edges = _rings_to_wkb_rows(world["osm_admin"])
    postal_polys, postal_edges = _rings_to_wkb_rows(world["osm_postal_code"])
    bld_polys, _ = _rings_to_wkb_rows(world["osm_buildings"])

    _write(admin_polys, f"{out_dir}/osm_admin.parquet")
    _write(admin_edges, f"{out_dir}/osm_admin_edges.parquet")
    _write(postal_polys, f"{out_dir}/osm_postal_code.parquet")
    _write(postal_edges, f"{out_dir}/osm_postal_edges.parquet")
    _write(bld_polys, f"{out_dir}/osm_buildings.parquet")
    _write([dict(osm_id=r["osm_id"], type=r["type"], street=r["street"], cls=r["cls"],
                 x0=r["line"][0][0], y0=r["line"][0][1],
                 x1=r["line"][1][0], y1=r["line"][1][1],
                 line=[[float(p[0]), float(p[1])] for p in r["line"]])
            for r in world["osm_roads"]], f"{out_dir}/osm_roads.parquet")
    _write(world["osm_house_number"], f"{out_dir}/osm_house_number.parquet")

    _write(build_raw_elements(world, admin_polys, postal_polys, bld_polys),
           f"{out_dir}/osm_raw_elements.parquet")

    oa_rows = build_oa_rows(seed)
    _write(oa_rows, f"{out_dir}/oa_raw.parquet")
    with open(f"{out_dir}/oa_license.txt", "wb") as fp:
        fp.write(OA_LICENSE_TEXT)

    pages = build_webpages(world, n_pages=n_pages, seed=seed)
    _write(pages, f"{out_dir}/webpages.parquet",
           schema=pa.schema([("url", pa.string()), ("warc_ts", pa.timestamp("us")),
                             ("html", pa.binary()), ("text", pa.string()),
                             ("lang", pa.string())]))

    _write(build_media(seed=seed), f"{out_dir}/media.parquet",
           schema=pa.schema([("media_id", pa.int64()), ("kind", pa.string()),
                             ("payload", pa.binary()), ("width", pa.int64()),
                             ("sample_rate", pa.int64()), ("n_frames", pa.int64())]))

    fwd, rev, predict, unstructured = build_queries()
    _write(unstructured, f"{out_dir}/unstructured_queries.parquet",
           schema=pa.schema([("query_id", pa.int64()), ("search_term", pa.string()),
                             ("country", pa.string()), ("center_lat", pa.float64()),
                             ("center_lon", pa.float64()), ("radius", pa.int64()),
                             ("limit", pa.int64())]))
    # reverse queries derived from actual house positions (stable offsets);
    # rev3857 carries the SAME points already projected to EPSG:3857 (the
    # reference's Geocoder.reverse_epsg3857 entry, geocoder.py:199-247)
    rev3857 = []
    houses = world["osm_house_number"]
    for qi, idx in enumerate([3, 77, 400, 911, 1500]):
        h = houses[idx % len(houses)]
        qx, qy = h["x"] + 15.0, h["y"] - 10.0
        lon, lat = merc_to_lonlat(np.array([qx]), np.array([qy]))
        rev.append(dict(query_id=qi + 1, lat=float(lat[0]), lon=float(lon[0]),
                        radius=100.0, limit=10))
        rev3857.append(dict(query_id=qi + 1, x=qx, y=qy, radius=100.0, limit=10))
    # one query in the middle of nowhere (0 results anywhere)
    nx, ny = X0 - 80_000.0, Y0 - 80_000.0
    lon, lat = merc_to_lonlat(np.array([nx]), np.array([ny]))
    rev.append(dict(query_id=len(rev) + 1, lat=float(lat[0]), lon=float(lon[0]),
                    radius=100.0, limit=10))
    rev3857.append(dict(query_id=len(rev3857) + 1, x=nx, y=ny, radius=100.0, limit=10))
    # one query next to an OA house → exercises the OSM→OA fallback (J11)
    lon0, lat0 = OA_BASE["springfield"]
    rev.append(dict(query_id=len(rev) + 1, lat=lat0 + 0.00005, lon=lon0 + 0.0001,
                    radius=150.0, limit=5))
    ox, oy = lonlat_to_merc(np.array([lon0 + 0.0001]), np.array([lat0 + 0.00005]))
    rev3857.append(dict(query_id=len(rev3857) + 1, x=float(ox[0]), y=float(oy[0]),
                        radius=150.0, limit=5))
    _write(fwd, f"{out_dir}/fwd_queries.parquet")
    _write(rev, f"{out_dir}/rev_queries.parquet")
    _write(rev3857, f"{out_dir}/rev3857_queries.parquet")
    _write(predict, f"{out_dir}/predict_queries.parquet")

    _write(build_dmetaphone_codes(world, oa_rows, [q["input"] for q in predict]),
           f"{out_dir}/dmetaphone_codes.parquet",
           schema=pa.schema([("word", pa.string()), ("dmet", pa.string()),
                             ("dmet_alt", pa.string())]))

    manifest = hashlib.sha256()
    for name in sorted(os.listdir(out_dir)):
        if name.endswith(".parquet"):
            with open(os.path.join(out_dir, name), "rb") as fp:
                manifest.update(name.encode())
                manifest.update(fp.read())
    with open(f"{out_dir}/MANIFEST.sha256", "w") as fp:
        fp.write(manifest.hexdigest() + "\n")
    return out_dir


if __name__ == "__main__":
    d = write_fixtures()
    print(f"fixtures written to {d}")
