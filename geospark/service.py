"""HTTP service face (S7): the reference's Flask endpoints
/forward /reverse /predict (bin/geocoder_service.py:46-99) re-exposed over
the Spark engine with a stdlib ThreadingHTTPServer (no Flask in this
environment, and the service is a driver-side convenience anyway — the
cluster-scale surface is the batch DataFrame API; each request here runs a
1-row query batch through the same plans the batch path uses), plus the
postal sidecar's /split /expand /normalize (bin/postal_service.py:22-85)
over the committed rule table (geospark.postal) instead of libpostal.

Request/response shapes mirror the reference exactly:
  POST /forward   {"address": str, "center": [lat, lon]?, "country": str?}
      -> [{"address": str, "lat": float, "lon": float}, ...]
  POST /reverse   {"lat": float, "lon": float}
      -> {"address": str} | 404 {"error": {...}}
  POST /predict   {"query": str}
      -> {"predictions": [str, ...]}
  POST /split     {"query": str, "language": str?, "country": str?}
      -> [{"road": ..., "house_number": ..., ...}, ...]   (postal_service:39-65)
  POST /expand    {"query": str, "languages": [str]?}
      -> [[token, ...], ...]                              (postal_service:67-85)
  POST /normalize {"query": str, "languages": [str]?}
      -> {kind: [token, ...], ...}                        (postal_service:22-37)
The postal endpoints return ONE canonical variant where libpostal returns
many — the deterministic rule-table choice documented in geospark.postal
(the reference geocoder consumes only response.json()[0] anyway,
osmgeocoder/forward.py:43-46).
Malformed/non-JSON bodies -> 400, like the reference's ``abort(400)``.
"""

from __future__ import annotations

import json
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from . import formatter, proj

# reference defaults: reverse radius 100 m / limit 10 (geocoder.py:160-162),
# forward radius 20 km / limit 20 (forward.py:15-16)
REVERSE_RADIUS_M = 100.0
REVERSE_LIMIT = 10
FORWARD_RADIUS_M = 20_000
FORWARD_LIMIT = 20


def _is_latlon_pair(v, optional: bool = False) -> bool:
    """True when ``v`` is a 2-element numeric (non-bool) sequence; with
    ``optional`` a None also passes (absent center)."""
    if v is None:
        return optional
    if not isinstance(v, (list, tuple)) or len(v) != 2:
        return False
    return all(isinstance(c, (int, float)) and not isinstance(c, bool) for c in v)


class GeocoderService:
    """Driver-side request handlers over a built geo_state session."""

    def __init__(self, spark, tables, wordlist):
        self.spark = spark
        self.tables = tables
        self.wordlist = wordlist

    # -- endpoint logic (plain dicts in/out; HTTP layer below) --------------

    def forward(self, address: str, center=None, country: str | None = None) -> list[dict]:
        from .forward import forward_geocode_unstructured

        lat, lon = (center if center else (None, None))
        q = self.spark.createDataFrame(
            [(1, address, country, lat, lon, FORWARD_RADIUS_M, FORWARD_LIMIT)],
            "query_id long, search_term string, country string, center_lat double, "
            "center_lon double, radius int, limit int")
        rows = forward_geocode_unstructured(self.spark, self.tables, q).collect()
        out = []
        for r in rows:
            lon_r, lat_r = proj.merc_to_lonlat(np.array([r.x]), np.array([r.y]))
            out.append({
                # reference joins the mustache lines with ', ' (service:60)
                "address": ", ".join(self._format(r).split("\n")).strip(),
                "lat": float(lat_r[0]),
                "lon": float(lon_r[0]),
            })
        return out

    def reverse(self, lat: float, lon: float) -> dict | None:
        from .reverse import reverse_geocode

        q = self.spark.createDataFrame(
            [(1, float(lat), float(lon), REVERSE_RADIUS_M, REVERSE_LIMIT)],
            "query_id long, lat double, lon double, radius double, limit int")
        rows = reverse_geocode(self.spark, self.tables, q).collect()
        if not rows:
            return None
        # reference takes next(geocoder.reverse(...)) — the top-ranked row
        r = min(rows, key=lambda x: (x.distance, x.house_number or ""))
        return {"address": ", ".join(self._format(r).split("\n")).strip()}

    def predict(self, query: str) -> dict:
        from .predict import predict_text

        q = self.spark.createDataFrame([(1, query)], "query_id long, input string")
        rows = predict_text(self.spark, self.wordlist, q).collect()
        # recover the 002:23-28 total order client-side (the engine ranks
        # per query but a .collect() carries no ordering guarantee)
        ordered = sorted(rows, key=lambda r: (r.dist, -r.ct, len(r.word), r.word))
        return {"predictions": [r.word for r in ordered]}

    # -- postal sidecar endpoints (no Spark involved: pure rule table) ------

    @staticmethod
    def _locales(data) -> set | None:
        langs = data.get("languages") or (
            [data["language"]] if data.get("language") else None)
        return set(langs) if langs else None

    @staticmethod
    def split(query: str, locales: set | None = None,
              country: str | None = None) -> list[dict]:
        """/split: expand, then parse the canonical variant with the same
        'road hn, pc city' grammar the batch splitter uses
        (forward.split_address_cols); unparsed -> whole term as road, the
        reference's documented fallback. ``country`` is accepted for shape
        parity (libpostal uses it as a parser hint; the rule parse doesn't)."""
        import re as _re

        from .mine import ADDR_RE
        from .postal import expand_address

        term = expand_address(query, locales)
        m = _re.match("^" + ADDR_RE + "$", term)
        if not m:
            return [{"road": term}]
        parts = dict(zip(("road", "house_number", "postcode", "city"), m.groups()))
        return [{k: v for k, v in parts.items() if v}]

    @staticmethod
    def expand(query: str, locales: set | None = None) -> list[list[str]]:
        from .postal import expand_address, tokenize

        return [tokenize(expand_address(query, locales).lower())]

    @staticmethod
    def normalize(query: str, locales: set | None = None) -> dict:
        """/normalize: {kind: [token, ...]} like the reference's
        token-class-keyed dict (postal_service.py:30-36)."""
        from .postal import normalized_tokens

        out: dict[str, list[str]] = {}
        for value, kind in normalized_tokens(query, locales):
            out.setdefault(kind, []).append(value)
        return out

    @staticmethod
    def _format(row) -> str:
        return formatter.format_address({
            "road": row.road, "house_number": row.house_number,
            "postcode": row.postcode, "city": row.city,
            "county": row.county, "state": row.state,
        })


def make_server(service: GeocoderService, host: str = "127.0.0.1",
                port: int = 0) -> ThreadingHTTPServer:
    """Bind (port=0 -> ephemeral) and return the server; caller runs
    ``serve_forever`` (possibly on a thread) and ``shutdown``s it."""

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *args):  # quiet: logging is the caller's job
            pass

        def _reply(self, code: int, payload) -> None:
            body = json.dumps(payload).encode("utf-8")
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):  # noqa: N802 (http.server API)
            try:
                n = int(self.headers.get("Content-Length", "0"))
                data = json.loads(self.rfile.read(n) or b"{}")
                if not isinstance(data, dict):
                    raise ValueError("body must be a JSON object")
            except (ValueError, json.JSONDecodeError):
                return self._reply(400, {"error": {"code": 400, "message": "Bad request"}})

            if self.path == "/forward":
                # malformed 'center' must 400 like any other bad body — not
                # surface as an unhandled exception mid-dispatch (ADVICE r3)
                center = data.get("center")
                if data.get("address") is None or not _is_latlon_pair(center, optional=True):
                    return self._reply(400, {"error": {"code": 400, "message": "Bad request"}})
                return self._reply(200, service.forward(
                    data["address"], center=center,
                    country=data.get("country")))
            if self.path == "/reverse":
                if not _is_latlon_pair([data.get("lat"), data.get("lon")]):
                    return self._reply(400, {"error": {"code": 400, "message": "Bad request"}})
                res = service.reverse(data["lat"], data["lon"])
                if res is None:  # reference: 404 {"error": {...}} (service:80)
                    return self._reply(404, {"error": {"code": 404, "message": "Not found"}})
                return self._reply(200, res)
            if self.path == "/predict":
                if data.get("query") is None:
                    return self._reply(400, {"error": {"code": 400, "message": "Bad request"}})
                return self._reply(200, service.predict(data["query"]))
            if self.path in ("/split", "/expand", "/normalize"):
                if not isinstance(data.get("query"), str):
                    return self._reply(400, {"error": {"code": 400, "message": "Bad request"}})
                locales = service._locales(data)
                if self.path == "/split":
                    return self._reply(200, service.split(
                        data["query"], locales, country=data.get("country")))
                if self.path == "/expand":
                    return self._reply(200, service.expand(data["query"], locales))
                return self._reply(200, service.normalize(data["query"], locales))
            return self._reply(404, {"error": {"code": 404, "message": "Not found"}})

    return ThreadingHTTPServer((host, port), Handler)
