"""pyspark.ml Pipeline integration: the engine's estimators compose as
standard MLlib stages, and the composed result equals running the
engine classes directly."""

from pyspark.ml import Pipeline
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from deeptime_spark.ml import KMeansDiscretizerStage, TICAStage

SF = "/root/testdata/sf0.001"


def test_pipeline_tica_then_kmeans_matches_direct(spark):
    traj = entrymod._event_traj(spark, SF)
    v = F.col("value") / 100.0
    feat = traj.select("traj_id", "t", F.array(v, v * v, v * v * v).alias("x"))

    pipe = Pipeline(
        stages=[
            TICAStage(lagtime=2, dim=2, inputCol="x", outputCol="proj"),
            KMeansDiscretizerStage(k=4, seed=42, inputCol="proj", outputCol="state"),
        ]
    )
    fitted = pipe.fit(feat)
    out = fitted.transform(feat)
    assert set(["traj_id", "t", "x", "proj", "state"]).issubset(out.columns)

    # equals the direct engine composition
    from deeptime_spark.clustering.kmeans import DeterministicKMeans
    from deeptime_spark.decomposition.tica import TICA

    tica = TICA(lagtime=2, dim=2).fit(feat).fetch_model()
    proj = tica.transform(feat, out_col="proj")
    km = (
        DeterministicKMeans(n_clusters=4, seed=42, max_iter=16, order_col="t", x_col="proj")
        .fit(proj)
        .fetch_model()
    )
    want = km.transform(proj, x_col="proj", out_col="state")

    got_rows = out.select("traj_id", "t", "state").orderBy("traj_id", "t").collect()
    want_rows = want.select("traj_id", "t", "state").orderBy("traj_id", "t").collect()
    assert [tuple(r) for r in got_rows] == [tuple(r) for r in want_rows]


def test_pipeline_stage_copy_and_refit(spark):
    # MLlib drives stages through copy()/fit(); a second fit on a
    # different frame must not leak state from the first
    traj = entrymod._event_traj(spark, SF)
    v = F.col("value") / 100.0
    feat = traj.select("traj_id", "t", F.array(v, v * v).alias("x"))
    stage = TICAStage(lagtime=1, dim=1, inputCol="x", outputCol="p")
    m1 = stage.fit(feat)
    m2 = stage.fit(feat.where(F.col("traj_id") % 2 == 0))
    p1 = m1.transform(feat).select("p").first()["p"]
    p2 = m2.transform(feat).select("p").first()["p"]
    assert len(p1) == 1 and len(p2) == 1


def test_vamp_stage(spark):
    from deeptime_spark.ml import VAMPStage

    traj = entrymod._event_traj(spark, SF)
    v = F.col("value") / 100.0
    feat = traj.select("traj_id", "t", F.array(v, v * v).alias("x"))
    out = VAMPStage(lagtime=2, dim=1, outputCol="svproj").fit(feat).transform(feat)
    row = out.select("svproj").first()
    assert len(row["svproj"]) == 1
