"""KMeans / MiniBatchKMeans over trajectory DataFrames.

Reference: ``KMeans`` (/root/reference/src/deeptime/clustering/
_kmeans.py:148-472; C++ Lloyd loop kmeans_bits.h with OpenMP) and
``MiniBatchKMeans`` (:474-559).

Spark realization: MLlib's KMeans is the idiomatic replacement — its
k-means|| init (Bahmani et al.) is the distributed analogue of kmeans++
(reference :24-56), and its Lloyd iterations are map-side partial
aggregations. We adapt our array<double> schema via array_to_vector and
return a driver-side ClusterModel so downstream assignment composes with
the rest of the engine without MLlib types leaking out.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from deeptime_spark.base import Estimator
from deeptime_spark.clustering.cluster_model import ClusterModel


class KMeansModel(ClusterModel):
    """Centers + inertia (reference _kmeans.py:58-146)."""

    def __init__(self, cluster_centers: np.ndarray, inertia: float = float("nan"), converged: bool = True):
        super().__init__(cluster_centers, converged=converged)
        self.inertia = inertia


class KMeans(Estimator):
    """ctor mirrors reference (:148-236): n_clusters, max_iter, tolerance,
    init_strategy ('kmeans++' -> k-means||), fixed_seed, initial_centers."""

    def __init__(
        self,
        n_clusters: int,
        max_iter: int = 32,
        tolerance: float = 1e-5,
        init_strategy: str = "kmeans++",
        fixed_seed: int | bool = 42,
        initial_centers: Optional[np.ndarray] = None,
        x_col: str = "x",
    ):
        super().__init__()
        self.n_clusters = n_clusters
        self.max_iter = max_iter
        self.tolerance = tolerance
        self.init_strategy = init_strategy
        self.seed = int(fixed_seed) if not isinstance(fixed_seed, bool) else 42
        self.initial_centers = initial_centers
        self.x_col = x_col

    def fit(self, df: DataFrame) -> "KMeans":
        from pyspark.ml.clustering import KMeans as MLKMeans
        from pyspark.ml.functions import array_to_vector

        # persist the assembled vectors: k-means|| init + every Lloyd
        # iteration re-reads the input (MLlib no longer auto-caches), so an
        # uncached source pays the scan + conversion ~2(init)+maxIter times
        vec = df.select(array_to_vector(F.col(self.x_col)).alias("features")).persist()
        try:
            init_mode = "k-means||" if self.init_strategy == "kmeans++" else "random"
            km = MLKMeans(
                k=self.n_clusters,
                maxIter=self.max_iter,
                tol=self.tolerance,
                initMode=init_mode,
                seed=self.seed,
            )
            fitted = km.fit(vec)
            centers = np.array([np.asarray(c) for c in fitted.clusterCenters()])
            inertia = float(fitted.summary.trainingCost)
        finally:
            vec.unpersist()
        self._model = KMeansModel(centers, inertia=inertia, converged=True)
        return self


class MiniBatchKMeans(KMeans):
    """Minibatch variant (reference :474-559): each ``partial_fit``/epoch
    refines centers on a random sample — on Spark a sampled MLlib fit warm-
    started from the previous centers via per-center weighted averaging.

    v1 approximation: Lloyd steps on a Bernoulli sample per epoch; the
    sample fraction replaces the reference's batch_size (cluster-friendly:
    sampling is a narrow op, no shuffle).
    """

    def __init__(self, n_clusters: int, batch_fraction: float = 0.1, max_iter: int = 8, **kwargs):
        super().__init__(n_clusters, max_iter=max_iter, **kwargs)
        self.batch_fraction = batch_fraction
        self._centers: Optional[np.ndarray] = None
        self._counts: Optional[np.ndarray] = None
        self._epoch = 0

    def partial_fit(self, df: DataFrame) -> "MiniBatchKMeans":
        import pandas as pd
        from pyspark.sql.types import ArrayType, DoubleType, StructField, StructType

        # fresh Bernoulli sample per call (seed varies by epoch) — a fixed
        # seed would refit the identical subsample every epoch instead of
        # streaming new data like the reference minibatch loop
        self._epoch += 1
        batch = df.sample(fraction=min(1.0, self.batch_fraction), seed=self.seed + self._epoch)
        if self._centers is None:
            # init from an MLlib fit on the first batch
            KMeans.fit(self, batch)
            self._centers = self._model.cluster_centers
            self._counts = np.ones(self.n_clusters)
            return self
        centers = self._centers
        d = centers.shape[1]
        schema = StructType(
            [
                StructField("sums", ArrayType(DoubleType())),
                StructField("counts", ArrayType(DoubleType())),
            ]
        )

        def acc(batches):
            sums = np.zeros((len(centers), d))
            counts = np.zeros(len(centers))
            for pdf in batches:
                if not len(pdf):
                    continue
                X = np.stack(pdf[self.x_col].to_numpy())
                d2 = (
                    np.einsum("ij,ij->i", X, X)[:, None]
                    - 2.0 * (X @ centers.T)
                    + np.einsum("ij,ij->i", centers, centers)[None, :]
                )
                a = np.argmin(d2, axis=1)
                np.add.at(sums, a, X)
                np.add.at(counts, a, 1.0)
            yield pd.DataFrame({"sums": [sums.ravel().tolist()], "counts": [counts.tolist()]})

        partials = batch.select(self.x_col).mapInPandas(acc, schema=schema).collect()
        sums = np.zeros((self.n_clusters, d))
        counts = np.zeros(self.n_clusters)
        for p in partials:
            sums += np.array(p["sums"]).reshape(self.n_clusters, d)
            counts += np.array(p["counts"])
        # minibatch update: running per-center mean (learning rate 1/n_c)
        self._counts += counts
        mask = counts > 0
        eta = (counts[mask] / self._counts[mask])[:, None]
        batch_means = sums[mask] / counts[mask][:, None]
        self._centers[mask] = (1 - eta) * self._centers[mask] + eta * batch_means
        self._model = KMeansModel(self._centers.copy(), converged=False)
        return self

    def fit(self, df: DataFrame) -> "MiniBatchKMeans":
        self._centers = None
        self._epoch = 0
        for _ in range(self.max_iter):
            self.partial_fit(df)
        return self
