"""Progress reporting for driver-side iteration loops (EM sweeps, Gibbs
sampling, per-lag model fits).

Reference: ``ProgressCallback`` / ``supports_progress_interface``
(/root/reference/src/deeptime/util/callbacks.py:4-71) and the tqdm shim in
util/platform.py. Spark note: per-iteration *distributed* progress lives in
the Spark UI; these callbacks track the driver loop itself (one tick per EM
iteration / Gibbs sweep / lagtime), which is what the reference's progress
argument reports too.
"""

from __future__ import annotations


def supports_progress_interface(bar) -> bool:
    """True if ``bar`` has update/close/set_description and an ``n``
    attribute (the reference's duck-typed tqdm contract)."""
    has_methods = all(
        callable(getattr(bar, m, None)) for m in supports_progress_interface.required_methods
    )
    has_attributes = all(hasattr(bar, a) for a in supports_progress_interface.required_attributes)
    return has_methods and has_attributes


supports_progress_interface.required_methods = ["update", "close", "set_description"]
supports_progress_interface.required_attributes = ["n"]


class _NoopBar:
    """Fallback bar when tqdm is absent or progress is disabled."""

    def __init__(self, total=None, **_):
        self.total = total
        self.n = 0

    def update(self, inc: int = 1):
        self.n += inc

    def set_description(self, *_args, **_kw):
        pass

    def close(self):
        pass


def handle_progress_bar(progress):
    """Return a bar *factory*: the given tqdm-like class, or a no-op one.
    ``progress=None`` tries tqdm and falls back silently (reference
    util/platform.py:handle_progress_bar semantics)."""
    if progress is None:
        try:
            from tqdm import tqdm as progress  # type: ignore
        except ImportError:
            return _NoopBar
    return progress


class ProgressCallback:
    """Tick-per-iteration callback for driver loops (reference :31-71).

    Usable as a context manager; ``__call__(inc)`` advances the bar.
    """

    def __init__(self, progress=None, desc=None, total=None):
        self.progress_bar = handle_progress_bar(progress)(total=total)
        self.total = total
        assert supports_progress_interface(self.progress_bar), (
            "progress bar must implement "
            f"{supports_progress_interface.required_methods} and have "
            f"{supports_progress_interface.required_attributes}"
        )
        if desc is not None:
            self.set_description(desc)

    def __call__(self, inc: int = 1, *args, **kw):
        self.progress_bar.update(inc)

    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc_val, exc_tb):
        if exc_type is None:
            self.progress_bar.total = self.progress_bar.n
        self.progress_bar.close()

    def set_description(self, value):
        self.progress_bar.set_description(value)
