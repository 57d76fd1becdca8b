"""pyspark.ml Pipeline adapters for the engine's estimators.

MLlib's ``Pipeline`` composes Estimator/Transformer stages with Params,
persistence, and CrossValidator integration — the idiom Spark users
already build feature pipelines in. These thin adapters let the
engine's estimators participate directly::

    from pyspark.ml import Pipeline
    from deeptime_spark.ml import TICAStage, KMeansDiscretizerStage

    pipe = Pipeline(stages=[
        TICAStage(lagtime=2, dim=2, inputCol="x", outputCol="proj"),
        KMeansDiscretizerStage(k=5, inputCol="proj", outputCol="state"),
    ])
    dtraj = pipe.fit(traj).transform(traj)   # (traj_id, t, ..., state)

The adapters delegate all computation to the engine classes (TICA's
one-job moments aggregate, DeterministicKMeans' bit-reproducible Lloyd)
— no logic is duplicated; params are plain keyword state (uid-based
Param plumbing is deliberately avoided: these stages are deterministic
wrappers, and engine-native persistence lives in sources/persistence).
"""

from __future__ import annotations

from typing import Optional

from pyspark.ml import Estimator, Transformer
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class _Renaming:
    """Shared col-mapping helper: the engine's trajectory schema is
    (traj_id, t, x); adapters map arbitrary user columns onto it and
    back without copying data (pure projections)."""

    def __init__(self, inputCol: str, trajCol: str, timeCol: str):
        self.inputCol, self.trajCol, self.timeCol = inputCol, trajCol, timeCol

    def to_engine(self, df: DataFrame) -> DataFrame:
        return df.select(
            F.col(self.trajCol).alias("traj_id"),
            F.col(self.timeCol).alias("t"),
            F.col(self.inputCol).alias("x"),
        )


class TICAModelStage(Transformer):
    def __init__(self, model, inputCol: str, outputCol: str):
        super().__init__()
        self.model = model
        self.inputCol, self.outputCol = inputCol, outputCol

    def _transform(self, df: DataFrame) -> DataFrame:
        out = self.model.transform(
            df.withColumnRenamed(self.inputCol, "x"), out_col=self.outputCol
        )
        return out.withColumnRenamed("x", self.inputCol)


class TICAStage(Estimator):
    """Pipeline stage for TICA: fit = the engine's single-pass lagged
    moments aggregate; transform adds the projection column."""

    def __init__(
        self,
        lagtime: int = 1,
        dim: Optional[int] = None,
        inputCol: str = "x",
        outputCol: str = "proj",
        trajCol: str = "traj_id",
        timeCol: str = "t",
    ):
        super().__init__()
        self.lagtime, self.dim = lagtime, dim
        self.inputCol, self.outputCol = inputCol, outputCol
        self.trajCol, self.timeCol = trajCol, timeCol

    def _fit(self, df: DataFrame) -> TICAModelStage:
        from deeptime_spark.decomposition.tica import TICA

        ren = _Renaming(self.inputCol, self.trajCol, self.timeCol)
        model = TICA(lagtime=self.lagtime, dim=self.dim).fit(ren.to_engine(df)).fetch_model()
        return TICAModelStage(model, self.inputCol, self.outputCol)


class VAMPStage(Estimator):
    """Pipeline stage for VAMP — same adapter shape as TICAStage (the
    engine model API is shared via CovarianceKoopmanModel)."""

    def __init__(
        self,
        lagtime: int = 1,
        dim: Optional[int] = None,
        inputCol: str = "x",
        outputCol: str = "proj",
        trajCol: str = "traj_id",
        timeCol: str = "t",
    ):
        super().__init__()
        self.lagtime, self.dim = lagtime, dim
        self.inputCol, self.outputCol = inputCol, outputCol
        self.trajCol, self.timeCol = trajCol, timeCol

    def _fit(self, df: DataFrame) -> TICAModelStage:
        from deeptime_spark.decomposition.vamp import VAMP

        ren = _Renaming(self.inputCol, self.trajCol, self.timeCol)
        model = VAMP(lagtime=self.lagtime, dim=self.dim).fit(ren.to_engine(df)).fetch_model()
        return TICAModelStage(model, self.inputCol, self.outputCol)


class KMeansDiscretizerModelStage(Transformer):
    def __init__(self, model, inputCol: str, outputCol: str):
        super().__init__()
        self.model = model
        self.inputCol, self.outputCol = inputCol, outputCol

    def _transform(self, df: DataFrame) -> DataFrame:
        return self.model.transform(df, x_col=self.inputCol, out_col=self.outputCol)


class KMeansDiscretizerStage(Estimator):
    """Pipeline stage for the bit-reproducible DeterministicKMeans —
    discretizes a feature column into a state column (the MSM front-end)."""

    def __init__(
        self,
        k: int = 8,
        seed: int = 42,
        max_iter: int = 16,
        inputCol: str = "x",
        outputCol: str = "state",
        orderCol: str = "t",
    ):
        super().__init__()
        self.k, self.seed, self.max_iter = k, seed, max_iter
        self.inputCol, self.outputCol, self.orderCol = inputCol, outputCol, orderCol

    def _fit(self, df: DataFrame) -> KMeansDiscretizerModelStage:
        from deeptime_spark.clustering.kmeans import DeterministicKMeans

        model = (
            DeterministicKMeans(
                n_clusters=self.k,
                seed=self.seed,
                max_iter=self.max_iter,
                order_col=self.orderCol,
                x_col=self.inputCol,
            )
            .fit(df)
            .fetch_model()
        )
        return KMeansDiscretizerModelStage(model, self.inputCol, self.outputCol)
