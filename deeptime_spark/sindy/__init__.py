from deeptime_spark.sindy.sindy import (
    STLSQ,
    SINDy,
    SINDyModel,
    finite_difference_coefficients,
    with_derivative,
)

__all__ = ["SINDy", "SINDyModel", "STLSQ", "finite_difference_coefficients", "with_derivative"]

from deeptime_spark.sindy.tv_derivative import tv_derivative, tv_derivative_df

__all__ += ["tv_derivative", "tv_derivative_df"]
