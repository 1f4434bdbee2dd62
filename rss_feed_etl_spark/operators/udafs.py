"""Custom aggregate functions (UDAF surface, SURVEY §2.10 — absent in the
reference, first-class in this engine) as Arrow grouped-agg pandas UDFs.

NOTE: this module intentionally does NOT use ``from __future__ import
annotations`` — ``pandas_udf`` infers the GROUPED_AGG eval type from real
type hints at decoration time, and postponed (stringified) annotations
break that inference with UNSUPPORTED_SIGNATURE.
"""

import pandas as pd
from pyspark.sql import functions as F


@F.pandas_udf("double")
def gmean_udaf(v: pd.Series) -> float:
    """Geometric mean of the positive values of a group.

    Grouped-agg pandas UDF: Spark hash-partitions on the group key and
    hands each group's values to Python as one Arrow batch; the log-space
    mean runs vectorized in numpy.  (Unlike built-in aggregates there is
    no partial/merge decomposition — an algebraic rewrite
    ``exp(avg(ln(x)))`` stays fully JVM-side and is what the oracle uses;
    this UDAF exists to exercise the custom-aggregate path.)

    Spark restriction: a grouped-agg pandas UDF cannot share one ``agg()``
    with non-pandas aggregates (INVALID_PANDAS_UDF_PLACEMENT) — compute
    built-ins in a separate aggregation and join on the group key.
    """
    import numpy as np

    x = v[v > 0]
    if x.empty:
        return None
    return float(np.exp(np.log(x.to_numpy()).mean()))
