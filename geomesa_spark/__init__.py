"""geomesa_spark — a from-scratch PySpark-native spatial-join + tiling engine.

Re-creates the query and data-processing capabilities of GeoMesa
(reference: mmatz-ccri/geomesa, a fork of locationtech/geomesa) as an
idiomatic Spark engine:

- ``curves``    vectorized NumPy Z2/Z3/XZ2 space-filling-curve kernels
                (replaces geomesa-z3 Z2SFC/Z3SFC/XZ2SFC Scala machinery)
- ``geom``      vectorized geometry kernels: WKT, point-in-polygon, haversine
- ``tables``    deterministic synthesis of the interleaved document table
- ``functions`` the ``st_*`` scalar catalog + text-analysis functions
- ``operators`` spatial join / kNN / tiling / stats / dedup / similarity
- ``plans``     bbox→cell-range planner (predicate injection, no custom
                Catalyst rule needed — see SURVEY.md §4.3)
- ``sources``   ingest converters + Iceberg-style manifest commit layer
- ``streaming`` live layer (latest-wins cache, continuous queries)

Everything is DataFrame/Catalyst-first; Python appears only in
vectorized pandas/Arrow UDF kernels (no per-row Python).
"""

__version__ = "0.3.0"

from geomesa_spark.engine import GeoMesaSpark  # noqa: E402

__all__ = ["GeoMesaSpark", "__version__"]
