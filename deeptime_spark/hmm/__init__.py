from deeptime_spark.hmm.hmm_model import HiddenMarkovModel, forward_backward, viterbi
from deeptime_spark.hmm.init import (
    init_discrete_metastable_from_data,
    init_discrete_metastable_from_msm,
    init_gaussian_from_data,
    random_guess,
)
from deeptime_spark.hmm.mlhmm import MaximumLikelihoodHMM, lag_observations_df
from deeptime_spark.hmm.output_models import DiscreteOutputModel, GaussianOutputModel

__all__ = [
    "HiddenMarkovModel",
    "forward_backward",
    "viterbi",
    "MaximumLikelihoodHMM",
    "lag_observations_df",
    "DiscreteOutputModel",
    "GaussianOutputModel",
    "init_discrete_metastable_from_data",
    "init_discrete_metastable_from_msm",
    "init_gaussian_from_data",
    "random_guess",
]

from deeptime_spark.hmm.bayesian_hmm import BayesianHMM, BayesianHMMPosterior, ffbs_sample_path

__all__ += ["BayesianHMM", "BayesianHMMPosterior", "ffbs_sample_path"]
