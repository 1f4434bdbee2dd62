"""Driver-contract queries, wave 149: the salted groupBy-skew proof —
``layout.salted_distinct_profile`` registered over the events table
(VERDICT r9 #8's second named gap).

collect-type per-key state is the one groupBy shape partial aggregation
cannot de-skew (no map-side reduction exists), so the operator salts the
stage-1 exchange with ``spark_partition_id()`` and merges
set-cardinality-bounded payloads in stage 2.  ``bench.py``'s degenerate
section times the one-hot-key shape; the plan pin asserts the salt
survives refactors.

Reference anchor: the reference profiles feed payloads by scanning the
whole frame in pandas (run_job_filter.py's per-column summaries); this
is that profile at a grain and skew-resistance a 100 TB corpus needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import testdata as td
from .driver_queries import _register
from .operators import layout

_SP_PREVIEW = 8


def _q_salted_props_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = td.load_table(spark, sf_dir, "events")
    return layout.salted_distinct_profile(
        ev, "event_type", "props", preview_k=_SP_PREVIEW
    )


_register(
    "salted_props_profile",
    _q_salted_props_profile,
    f"""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT props) AS BIGINT) AS n_distinct,
       array_to_string(list_sort(list_distinct(list(props)))[1:{_SP_PREVIEW}],
                       ',') AS preview
FROM events GROUP BY 1
""",
)
