from deeptime_spark.numeric.kahan import kdot, ksum  # noqa: F401
from deeptime_spark.numeric.eigen import (  # noqa: F401
    sort_eigs,
    spd_eig,
    spd_inv,
    spd_inv_split,
    spd_inv_sqrt,
    eig_corr,
)
