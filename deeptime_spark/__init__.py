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

__version__ = "0.2.0"

from deeptime_spark.base import Estimator, Model, Transformer  # noqa: F401
from deeptime_spark.covariance import Covariance, CovarianceModel, covar, covars  # noqa: F401
from deeptime_spark.decomposition.dmd import DMD, EDMD  # noqa: F401
from deeptime_spark.decomposition.tica import TICA  # noqa: F401
from deeptime_spark.decomposition.vamp import (  # noqa: F401
    VAMP,
    vamp_score,
    vamp_score_cv,
    vamp_score_data,
)
from deeptime_spark.kernels import (  # noqa: F401
    GaussianKernel,
    GeneralizedGaussianKernel,
    LaplacianKernel,
    PolynomialKernel,
)
from deeptime_spark.markov import analysis  # noqa: F401
from deeptime_spark.markov.amm import AugmentedMSM, AugmentedMSMEstimator  # noqa: F401
from deeptime_spark.markov.effective_counts import (  # noqa: F401
    effective_count_matrix,
    statistical_inefficiency,
)
from deeptime_spark.markov.msm import (  # noqa: F401
    BayesianMSM,
    MarkovStateModel,
    MaximumLikelihoodMSM,
)
from deeptime_spark.markov.oom import OOMReweightedMSM  # noqa: F401
from deeptime_spark.markov.pcca import PCCAModel, pcca  # noqa: F401
from deeptime_spark.callbacks import ProgressCallback, supports_progress_interface  # noqa: F401
from deeptime_spark.markov.rate_matrix import (  # noqa: F401
    estimate_rate_matrix,
    estimate_rate_matrix_cve,
    estimate_rate_matrix_kl,
    rate_matrix,
)
from deeptime_spark.markov.tpt import ReactiveFlux, pathways, reactive_flux  # noqa: F401
from deeptime_spark.markov.tram import (  # noqa: F401
    TRAM,
    TRAMModel,
    restrict_connected,
    tram_dataset_df,
)
from deeptime_spark.markov.transition_counting import (  # noqa: F401
    TransitionCountEstimator,
    TransitionCountModel,
    count_states,
)
from deeptime_spark.validation import (  # noqa: F401
    ChapmanKolmogorovTest,
    ImpliedTimescales,
    ck_test,
    implied_timescales,
    implied_timescales_from_dtrajs,
)
