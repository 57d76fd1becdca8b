from deeptime_spark.decomposition.koopman import (  # noqa: F401
    CovarianceKoopmanModel,
    TransferOperatorModel,
)
from deeptime_spark.decomposition.tica import TICA  # noqa: F401
from deeptime_spark.decomposition.vamp import VAMP, vamp_score  # noqa: F401
from deeptime_spark.decomposition.dmd import DMD, EDMD  # noqa: F401
