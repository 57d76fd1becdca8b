"""Sources/sinks + model persistence round-trips."""

import shutil
import tempfile

import numpy as np
import pytest

from deeptime_spark.data.schema import trajectory_from_arrays
from deeptime_spark.sources import (
    load_model,
    read_trajectories_csv,
    read_trajectories_parquet,
    save_model,
    write_trajectories_parquet,
)


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="dts-src-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_parquet_roundtrip(spark, rng, tmpdir):
    data = [rng.normal(size=(50, 3)) for _ in range(2)]
    df = trajectory_from_arrays(spark, data)
    write_trajectories_parquet(df, tmpdir + "/trajs")
    back = read_trajectories_parquet(spark, tmpdir + "/trajs")
    a = sorted((r["traj_id"], r["t"], tuple(r["x"])) for r in df.collect())
    b = sorted((r["traj_id"], r["t"], tuple(r["x"])) for r in back.collect())
    assert a == b


def test_csv_wide_format(spark, tmpdir):
    import pandas as pd

    pdf = pd.DataFrame(
        {"traj_id": [0, 0, 1], "t": [0, 1, 0], "f0": [1.0, 2.0, 3.0], "f1": [4.0, 5.0, 6.0]}
    )
    pdf.to_csv(tmpdir + "/t.csv", index=False)
    df = read_trajectories_csv(spark, tmpdir + "/t.csv")
    rows = sorted((r["traj_id"], r["t"], tuple(r["x"])) for r in df.collect())
    assert rows == [(0, 0, (1.0, 4.0)), (0, 1, (2.0, 5.0)), (1, 0, (3.0, 6.0))]


def test_model_persistence_roundtrip(tmpdir, rng):
    from deeptime_spark.markov.msm import MarkovStateModel

    T = np.array([[0.9, 0.1], [0.2, 0.8]])
    model = MarkovStateModel(T, lagtime=3)
    save_model(model, tmpdir + "/msm.pkl")
    back = load_model(tmpdir + "/msm.pkl")
    np.testing.assert_allclose(back.transition_matrix, T)
    assert back.lagtime == 3
    np.testing.assert_allclose(back.stationary_distribution, model.stationary_distribution)
    with pytest.raises(ValueError, match="not a deeptime_spark model"):
        import pickle

        with open(tmpdir + "/bad.pkl", "wb") as fh:
            pickle.dump([1, 2, 3], fh)
        load_model(tmpdir + "/bad.pkl")
