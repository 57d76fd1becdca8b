from deeptime_spark.operators.lag import (  # noqa: F401
    with_lagged,
    timeshifted,
    sliding_window,
    blocksplit,
    cvsplit,
    strided,
)
