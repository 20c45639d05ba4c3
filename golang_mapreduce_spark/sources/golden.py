"""Golden text sink — the reference's output format.

The reference's reduce phase writes one text object per partition with
lines ``"%v %v\\n"`` (key, space, value) (6.5840/src/mr/worker.go:223-249;
oracle path mrsequential.go:61-86), and its test harness imposes the final
global order with ``sort mr-out* | cmp`` (test-mr.sh:103-111).

:func:`write_golden_text` reproduces that contract with a distributed
text write (one part file per partition = one ``mr-out-Y``);
:func:`read_golden_text` parses it back.  ``sorted_output=True`` mirrors
the harness's external sort for byte-stable golden files.

Scale: a global sort is a range-partitioned shuffle (Spark samples key
ranges); only request it when producing human-diffable goldens — the
unsorted variant is a straight narrow write like the reference's.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_golden_text(
    df: DataFrame,
    path: str,
    num_partitions: int | None = None,
    sorted_output: bool = False,
) -> None:
    """Write a (key, value) DataFrame as reference-style ``key value``
    text lines.  ``num_partitions`` plays NReduce (mrcoordinator.go:23);
    by default the upstream partitioning is kept."""
    cols = df.columns
    out = df.select(
        F.concat_ws(" ", F.col(cols[0]).cast("string"), F.col(cols[1]).cast("string")).alias(
            "value"
        )
    )
    if sorted_output:
        out = out.orderBy("value")
        if num_partitions:
            out = out.coalesce(num_partitions)
    elif num_partitions:
        out = out.repartition(num_partitions, F.col("value"))
    out.write.mode("overwrite").text(path)


def read_golden_text(spark: SparkSession, path: str) -> DataFrame:
    """Parse reference-style ``key value`` lines back to (key, value)."""
    lines = spark.read.text(path)
    return lines.select(
        F.regexp_extract("value", r"^(\S+) (.*)$", 1).alias("key"),
        F.regexp_extract("value", r"^(\S+) (.*)$", 2).alias("value"),
    )
