"""CSV source/sink (reference S5/S6).

S5: ``read_job_descriptions_from_csv`` (src/utils/file_utils.py:62-86) reads
a CSV with header and drops rows whose description column is blank.
S6: enrichment results to CSV (run_ats_enrichment.py:1054-1077).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..functions.text import non_blankish


def read_descriptions_csv(
    spark: SparkSession,
    path: str,
    description_col: str = "description",
    schema: T.StructType | None = None,
) -> DataFrame:
    reader = spark.read.option("header", True)
    reader = reader.schema(schema) if schema is not None else reader.option("inferSchema", False)
    df = reader.csv(path)
    return df.filter(non_blankish(description_col))


def write_csv(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").option("header", True).csv(path)
