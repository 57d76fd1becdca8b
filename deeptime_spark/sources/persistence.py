"""Model persistence: versioned pickle round-trip.

Reference: ``__getstate__``/``__setstate__`` with a version stamp
(/root/reference/src/deeptime/base.py:98-125). Models here are plain
driver-side objects holding numpy arrays, so a stamped pickle container
is the faithful equivalent; the stamp records the package version and the
model class for forward-compatibility checks at load time.
"""

from __future__ import annotations

import pickle
from typing import Any

FORMAT_VERSION = 1


def save_model(model: Any, path: str) -> None:
    payload = {
        "format_version": FORMAT_VERSION,
        "class": f"{type(model).__module__}.{type(model).__qualname__}",
        "model": model,
    }
    with open(path, "wb") as fh:
        pickle.dump(payload, fh)


def load_model(path: str) -> Any:
    with open(path, "rb") as fh:
        payload = pickle.load(fh)
    if not isinstance(payload, dict) or "format_version" not in payload:
        raise ValueError(f"{path} is not a deeptime_spark model file")
    if payload["format_version"] > FORMAT_VERSION:
        raise ValueError(
            f"model file {path} has format version {payload['format_version']} "
            f"but this build reads at most {FORMAT_VERSION}"
        )
    return payload["model"]
