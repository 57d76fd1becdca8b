from deeptime_spark.data.schema import (  # noqa: F401
    trajectory_from_arrays,
    dtraj_from_arrays,
    trajectory_from_events,
    to_dataset,
    TRAJECTORY_SCHEMA,
    DTRAJ_SCHEMA,
)
from deeptime_spark.data.generators import (  # noqa: F401
    BirthDeathChain,
    simulate_msm,
    linear_koopman_system,
    double_well_discrete_tmatrix,
    tmatrix_metropolis1d,
)
