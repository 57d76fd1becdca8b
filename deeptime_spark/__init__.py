"""deeptime_spark — a PySpark-native time-series analytics engine.

Re-expresses the capabilities of deeptime-ml/deeptime (dimensionality
reduction, clustering, Markov state model estimation and analysis) as
idiomatic Spark DataFrame programs:

- trajectories are DataFrames ``(traj_id: long, t: long, x: array<double>)``
- time-lagging compiles to ``lead`` window functions (no shuffle beyond the
  per-trajectory partitioning)
- covariance/moment estimation is a single-pass, map-side-combined aggregate
- transition counting is a ``groupBy(s_from, s_to).count()``
- small-matrix analytics (eigendecompositions, MLE, MFPT, committors, PCCA+)
  run driver-side on collected sufficient statistics, exactly where the
  reference uses LAPACK.

Reference parity documented per-module via ``/root/reference`` file:line
citations in docstrings.
"""

__version__ = "0.1.0"

from deeptime_spark.base import Estimator, Model, Transformer  # noqa: F401
