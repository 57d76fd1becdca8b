from deeptime_spark.clustering.cluster_model import ClusterModel  # noqa: F401
from deeptime_spark.clustering.kmeans import KMeans, MiniBatchKMeans  # noqa: F401
from deeptime_spark.clustering.box import BoxDiscretization, BoxDiscretizationModel  # noqa: F401
from deeptime_spark.clustering.regspace import RegularSpace  # noqa: F401
