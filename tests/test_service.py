"""HTTP service face (S7): the three reference endpoints served end-to-end
over the engine, exercised through real HTTP round-trips."""

import json
import threading
import urllib.error
import urllib.request

import pytest


@pytest.fixture(scope="module")
def server(spark, geo):
    from geospark.service import GeocoderService, make_server

    svc = GeocoderService(spark, geo["tables"], geo["wordlist"])
    httpd = make_server(svc, port=0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(), method="POST",
        headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req, timeout=300) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_forward_endpoint(server):
    status, body = _post(f"{server}/forward",
                         {"address": "Georgenstraße 34, 92224 Amberg"})
    assert status == 200 and isinstance(body, list) and body
    top = body[0]
    assert set(top) == {"address", "lat", "lon"}
    assert "Georgenstraße" in top["address"] and "Amberg" in top["address"]
    # fixture world sits around lon 8.5-11 / lat 47-48.5
    assert 46.0 < top["lat"] < 49.5 and 8.0 < top["lon"] < 12.0


def test_reverse_endpoint_hit_and_miss(server, geo):
    import numpy as np

    from geospark import proj

    # a street-linked house (orphans legitimately return nothing)
    h = (geo["tables"].houses
         .join(geo["tables"].street_city.select("street_id"), "street_id", "left_semi")
         .select("x", "y").first())
    lon, lat = proj.merc_to_lonlat(np.array([h.x + 5.0]), np.array([h.y]))
    status, body = _post(f"{server}/reverse",
                         {"lat": float(lat[0]), "lon": float(lon[0])})
    assert status == 200 and body["address"]

    status, body = _post(f"{server}/reverse", {"lat": 0.0, "lon": 0.0})
    assert status == 404 and body["error"]["code"] == 404


def test_predict_endpoint(server):
    status, body = _post(f"{server}/predict", {"query": "Dickenr"})
    assert status == 200
    assert "Dickenreuth" in body["predictions"]


def test_bad_requests(server):
    for path, payload in [("/forward", {}), ("/reverse", {"lat": 1.0}),
                          ("/predict", {})]:
        status, body = _post(f"{server}{path}", payload)
        assert status == 400, path
    status, _ = _post(f"{server}/nope", {"x": 1})
    assert status == 404


def test_malformed_center_and_coords_return_400(server):
    """A malformed 'center' (or non-numeric lat/lon) must produce a clean
    reference-style 400, not an unhandled exception mid-dispatch (ADVICE
    r3)."""
    bad_centers = ["47,9", [47.0], [47.0, 9.0, 1.0], [True, False],
                   ["47", "9"], {"lat": 47.0, "lon": 9.0}]
    for c in bad_centers:
        status, body = _post(f"{server}/forward", {"address": "Main Street", "center": c})
        assert status == 400, c
        assert body["error"]["code"] == 400
    status, _ = _post(f"{server}/reverse", {"lat": "47.4", "lon": 9.2})
    assert status == 400
    # a well-formed center still geocodes
    status, body = _post(f"{server}/forward",
                         {"address": "Main Street", "center": [47.4, 9.2]})
    assert status == 200 and isinstance(body, list)


def test_postal_sidecar_endpoints(server):
    """/split /expand /normalize (bin/postal_service.py:22-85) round-trip
    with the reference JSON shapes over the committed rule table."""
    # /split: expansion + parse of the canonical variant
    status, body = _post(f"{server}/split", {"query": "Georgenstr. 34, 92224 Amberg"})
    assert status == 200
    assert body == [{"road": "Georgenstraße", "house_number": "34",
                     "postcode": "92224", "city": "Amberg"}]
    # unparsed → whole expanded term as road (reference fallback shape)
    status, body = _post(f"{server}/split", {"query": "123 Main St"})
    assert status == 200 and body == [{"road": "123 Main street"}]

    # /expand: list of token lists (lowercased, like libpostal)
    status, body = _post(f"{server}/expand", {"query": "Main St Apt 3"})
    assert status == 200 and body == [["main", "street", "apartment", "3"]]
    # language restriction: German-only rules leave English abbrevs alone
    status, body = _post(f"{server}/expand",
                         {"query": "Main St", "languages": ["de"]})
    assert status == 200 and body == [["main", "st"]]

    # /normalize: token-class-keyed dict
    status, body = _post(f"{server}/normalize", {"query": "Hauptstr. 34b, 92224"})
    assert status == 200
    assert body == {"word": ["hauptstraße"], "alphanumeric": ["34b"],
                    "numeric": ["92224"]}

    # missing/non-string query → 400 on all three
    for path in ("/split", "/expand", "/normalize"):
        status, _ = _post(f"{server}{path}", {"query": 5})
        assert status == 400, path
