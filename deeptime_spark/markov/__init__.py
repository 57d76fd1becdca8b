from deeptime_spark.markov.transition_counting import (  # noqa: F401
    TransitionCountEstimator,
    TransitionCountModel,
    count_states,
)
from deeptime_spark.markov.msm import (  # noqa: F401
    MarkovStateModel,
    MaximumLikelihoodMSM,
    BayesianMSM,
)
from deeptime_spark.markov import analysis  # noqa: F401
from deeptime_spark.markov.pcca import pcca, PCCAModel  # noqa: F401
from deeptime_spark.markov.tpt import reactive_flux, ReactiveFlux  # noqa: F401
from deeptime_spark.markov.graph_export import (  # noqa: F401
    matrix_edges,
    msm_edges,
    msm_nodes,
    flux_edges,
    flux_nodes,
    to_networkx,
)
