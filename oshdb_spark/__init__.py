"""oshdb_spark — a from-scratch PySpark-native OSM-history spatial engine.

Re-expresses the query and data-processing capabilities of the reference
OSHDB (Comundela/oshdb, read-only at /root/reference) in idiomatic Spark:

- input is one table of interleaved text+media documents
  ``docs(doc_id, spans: array<struct<kind,text,media_ref,offset>>)``;
  one doc = one OSH entity (all versions + embedded member histories),
  mirroring the reference OSH model (osh/OSHEntity.java:11-34) but stored
  columnar (Parquet/Iceberg) instead of delta-coded byte blobs.
- temporal reconstruction (snapshot / contribution views,
  oshdb-util CellIterator.java) runs as vectorized pandas/Arrow UDFs via
  ``mapInPandas`` — one doc row is self-contained, so extraction is a
  narrow (shuffle-free) transformation; shuffles appear only at the final
  aggregation, which Catalyst executes partial+final.
- spatial indexing replaces the reference's bespoke z-order grid
  (oshdb-tool ZGrid.java) with a Hilbert-ordered hierarchical cell grid
  (geo/cells.py): tokens are base-4 Hilbert digit strings, so ancestor
  tokens are string prefixes of descendants → Iceberg/Parquet partition
  pruning by cell-prefix predicates.
- geometry is pure-numpy (geo/): no native geo libs are assumed; the
  geodesic formulas reproduce the reference bit-for-bit
  (util/geometry/Geo.java).
"""

__version__ = "0.1.0"

# public API surface (lazy imports keep `import oshdb_spark` cheap for
# spark-submit --py-files workers that only need one submodule)

def __getattr__(name):
    if name == "OSHDB":
        from .api.engine import OSHDB

        return OSHDB
    if name == "build_session":
        from .session import build_session

        return build_session
    if name == "run_with_timeout":
        from .session import run_with_timeout

        return run_with_timeout
    raise AttributeError(name)


__all__ = ["OSHDB", "build_session", "run_with_timeout", "__version__"]
