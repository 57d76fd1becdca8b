from deeptime_spark.sources.readers import (
    read_trajectories_csv,
    read_trajectories_json,
    read_trajectories_parquet,
    read_trajectories_table,
    write_trajectories_bucketed,
    write_trajectories_parquet,
)
from deeptime_spark.sources.persistence import load_model, save_model

__all__ = [
    "read_trajectories_csv",
    "read_trajectories_json",
    "read_trajectories_parquet",
    "read_trajectories_table",
    "write_trajectories_bucketed",
    "write_trajectories_parquet",
    "save_model",
    "load_model",
]
