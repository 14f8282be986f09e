"""geospark — a from-scratch PySpark-native geocoding + spatial-join engine.

Re-expresses the query/data-processing capabilities of the reference
(dunkelstern/osmgeocoder, a PostGIS/pg_trgm geocoder; see /root/reference)
as batch dataflow over Spark DataFrames:

* forward geocoding  -> tokenized trigram-similarity join (SURVEY.md J8)
* reverse geocoding  -> cell-grid k-ring expansion + sort-merge join + window top-k (J10)
* admin containment  -> broadcast-tiled vectorized point-in-polygon (J3)
* ETL optimize/001..018 -> deterministic DataFrame stages with content-derived keys
* text prediction    -> double-metaphone trigram join + levenshtein prefix (O3)
* raster <-> vector  -> grid rasterize / pyramid pool / vectorize / zonal stats (raster.py)
* HTTP service face  -> /forward /reverse /predict over the engine (service.py)

All geo/text kernels are pure NumPy/Python (no shapely/h3/pg extensions) inside
vectorized pandas UDFs; no RDDs; no per-row Python in hot paths.
"""

__version__ = "0.1.0"
