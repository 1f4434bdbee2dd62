"""Wave-69 driver queries: MAD-based robust outliers and the zlib
compression-ratio quality signal (rows-only check — no zlib in DuckDB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import testdata as td
from .driver_queries import _register
from .operators import profiling, textstats

_CUT = 3.0


def _q_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = td.load_table(spark, sf_dir, "events")
    return profiling.mad_outliers(ev, cutoff=_CUT)


_register(
    "mad_outliers",
    _q_mad,
    f"""
WITH med AS (
  SELECT event_type AS g, quantile_cont(value, 0.5) AS med
  FROM events GROUP BY 1),
d AS (
  SELECT e.event_id, e.event_type, e.value, abs(e.value - m.med) AS dev
  FROM events e JOIN med m ON e.event_type = m.g),
md AS (
  SELECT event_type AS g2, quantile_cont(dev, 0.5) AS mad
  FROM d GROUP BY 1)
SELECT d.event_id, d.event_type, d.value,
       round(dev / (1.4826 * mad), 6) AS robust_z
FROM d JOIN md ON d.event_type = md.g2
WHERE mad > 0 AND dev / (1.4826 * mad) > {_CUT}
""",
)


def _q_compression(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = td.load_table(spark, sf_dir, "documents")
    return textstats.compression_ratio(docs)


# no oracle by design: DuckDB has no zlib.  Driver records the rows-only
# check; golden parity lives in tests/test_wave69.py (recomputes with the
# same zlib).
_register("compression_ratio_stats", _q_compression, None)
