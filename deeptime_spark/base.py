"""Estimator/Model/Transformer shell.

Mirrors the reference API contract (``/root/reference/src/deeptime/base.py``:
``Estimator.fit/partial_fit/fetch_model/fit_fetch`` at base.py:247-329,
``Model`` at base.py:160, ``Transformer.transform/__call__`` at
base.py:420-439, ``EstimatorTransformer.fit_transform`` at base.py:442-484)
re-expressed for Spark:

- ``fit`` runs one or more DataFrame jobs and stores a *driver-side* model
  (small numpy arrays + metadata).
- ``transform`` is DataFrame -> DataFrame, executed with broadcast model
  parameters (column expressions where possible, pandas UDFs otherwise).
- models are plain picklable Python objects; ``partial_fit`` accumulates
  mergeable sufficient statistics (every accumulator in this engine is a
  commutative monoid, which is what makes treeAggregate/foreachBatch work).
"""

from __future__ import annotations

import copy
from typing import Any, Optional


class Model:
    """Immutable-ish result container (reference: base.py:160-173)."""

    def copy(self) -> "Model":
        return copy.deepcopy(self)

    def get_params(self) -> dict[str, Any]:
        return {k: v for k, v in self.__dict__.items() if not k.startswith("_")}

    def __repr__(self) -> str:
        keys = ", ".join(sorted(k for k in self.__dict__ if not k.startswith("_")))
        return f"{type(self).__name__}({keys})"


class Estimator:
    """Reference: base.py:247-329. ``fit`` resets state; ``partial_fit`` accumulates."""

    def __init__(self, model: Optional[Model] = None):
        self._model = model

    def fit(self, data, **kwargs) -> "Estimator":
        raise NotImplementedError

    def partial_fit(self, data, **kwargs) -> "Estimator":
        raise NotImplementedError(f"{type(self).__name__} does not support incremental fitting")

    def fetch_model(self) -> Optional[Model]:
        return self._model

    def fit_fetch(self, data, **kwargs) -> Model:
        self.fit(data, **kwargs)
        model = self.fetch_model()
        assert model is not None
        return model

    @property
    def model(self) -> Model:
        m = self.fetch_model()
        if m is None:
            raise RuntimeError("call fit() first")
        return m

    @property
    def has_model(self) -> bool:
        return self._model is not None

    def get_params(self) -> dict[str, Any]:
        return {k: v for k, v in self.__dict__.items() if not k.startswith("_")}


class Transformer:
    """Reference: base.py:420-439; transform is DataFrame -> DataFrame here."""

    def transform(self, df, **kwargs):
        raise NotImplementedError

    def __call__(self, df, **kwargs):
        return self.transform(df, **kwargs)


class EstimatorTransformer(Estimator, Transformer):
    """Reference: base.py:442-484."""

    def fit_transform(self, data, **kwargs):
        return self.fit(data, **kwargs).transform(data)

    def transform(self, df, **kwargs):
        model = self.fetch_model()
        if model is None:
            raise RuntimeError("call fit() before transform()")
        if not isinstance(model, Transformer):
            raise TypeError(f"model {type(model).__name__} is not a Transformer")
        return model.transform(df, **kwargs)
