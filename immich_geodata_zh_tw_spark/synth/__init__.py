"""Deterministic synthetic fixtures (FIXTURES.md §1/§6/§3) — no external data.

All generators are seeded / arithmetic-hash driven so the same inputs are
reproducible on the driver (pandas, for tests) and distributed (spark.range +
mapInPandas, for bench-scale pages) without coordination.
"""

TW_BBOX = (21.5, 25.5, 119.5, 122.5)  # lat_min, lat_max, lon_min, lon_max
