"""Scaled deterministic bench-world generation (wraps fixtures.write_fixtures
with sf-proportional sizes; same seed discipline — no wall-clock, no
unseeded randomness)."""

from __future__ import annotations

import hashlib
import os

import numpy as np

from . import fixtures
from .proj import merc_to_lonlat


def world_params(sf: float) -> dict:
    """Fixture sizes proportional to the TPC-H-ish scale factor."""
    houses = max(40, int(4000 * sf))
    pages = max(1500, int(200_000 * sf))
    return dict(n_streets_per_city=6, n_houses_per_street=houses, n_pages=pages)


WORLD_VERSION = 2  # bump when fixtures.build_world geometry changes


def ensure_bench_world(root: str, sf: float, seed: int = 42) -> str:
    """Generate (once) a scaled world keyed by its parameters; returns dir."""
    p = world_params(sf)
    key = hashlib.sha256(
        f"v{WORLD_VERSION}|{sorted(p.items())}|{seed}".encode()).hexdigest()[:12]
    out = os.path.join(root, f"world-{key}")
    if os.path.exists(os.path.join(out, "MANIFEST.sha256")):
        return out
    fixtures.write_fixtures(out, seed=seed, **p)
    return out


def reverse_query_rows(world_dir: str, n: int, seed: int = 42):
    """n reverse queries jittered around house positions."""
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(world_dir, "osm_house_number.parquet"),
                      columns=["x", "y"])
    xs = t["x"].to_numpy()
    ys = t["y"].to_numpy()
    rng = np.random.RandomState(seed + 9)
    idx = rng.randint(0, len(xs), n)
    lon, lat = merc_to_lonlat(xs[idx] + rng.uniform(-40, 40, n),
                              ys[idx] + rng.uniform(-40, 40, n))
    return [dict(query_id=i, lat=float(lat[i]), lon=float(lon[i]),
                 radius=100.0, limit=10) for i in range(n)]


def forward_query_rows(n: int, seed: int = 42):
    """n forward queries cycling the street pool with deterministic typos."""
    rng = np.random.RandomState(seed + 10)
    pool = fixtures.STREET_POOL
    cities = [c[0] for c in fixtures.CITIES]
    rows = []
    for i in range(n):
        road = pool[i % len(pool)]
        # deterministic typo: drop one character for 1 in 3 queries
        if i % 3 == 0 and len(road) > 4:
            k = int(rng.randint(1, len(road) - 1))
            road = road[:k] + road[k + 1:]
        rows.append(dict(query_id=i, road=road, house_number=None,
                         postcode=None, city=cities[i % len(cities)] if i % 2 else None,
                         country=None, center_lat=None, center_lon=None,
                         radius=20000, limit=20))
    return rows
