"""Single-partition literal DataFrames (bench/driver hot path).

``SparkSession.createDataFrame(list, schema)`` parallelizes the driver-side
rows into ``defaultParallelism`` partitions — on a 32-core session a 1-row
report frame becomes 32 near-empty *Python* partitions. Every downstream
action then pays 32 tasks (a noop sink write measured ~0.7-1.4 s), a
``first()`` escalates through the 1/4/20/... take() ladder because the row
hides in the last partition, and a ``coalesce(1)`` is the worst of all: the
single merged task evaluates the 32 pickled partitions through the Python
worker SEQUENTIALLY (measured ~6 s for a 16-row frame — the round-12
profile of ivf_index_probe's quantizer sidecar write).

Literal relations built from driver-side results (reports, gate rows,
collected model tables) are by construction tiny; one partition is their
right physical shape at any scale. ``local_df`` pins ``numSlices=1`` so a
literal frame costs one task everywhere it is consumed.
"""

from __future__ import annotations


def local_df(spark, rows, schema):
    """``spark.createDataFrame(rows, schema)`` with ONE partition.

    ``rows`` is a driver-side list (or other sized iterable) of
    tuples/Rows; ``schema`` a DDL string or StructType. Values and
    schema handling are identical to ``createDataFrame`` — only the
    partition count differs (1 instead of ``defaultParallelism``).
    """
    rows = rows if isinstance(rows, list) else list(rows)
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, numSlices=1), schema
    )
