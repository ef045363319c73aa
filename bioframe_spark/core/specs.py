"""Column-name spec handling for interval DataFrames.

Mirrors the reference's mutable default-colnames registry
(``/root/reference/src/bioframe/core/specs.py:11-58``): a module-level
default triple ``(chrom, start, end)``, overridable globally or as a
context manager, plus per-call ``cols=`` overrides on every operator.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager

_DEFAULT = ("chrom", "start", "end")

_local = threading.local()


def _get_default_colnames() -> tuple[str, str, str]:
    """Current default (chrom, start, end) column names (thread-local)."""
    return getattr(_local, "colnames", _DEFAULT)


def set_default_colnames(chrom: str = "chrom", start: str = "start", end: str = "end"):
    """Globally (thread-locally) override the default interval column names."""
    _local.colnames = (chrom, start, end)


@contextmanager
def update_default_colnames(chrom: str = "chrom", start: str = "start", end: str = "end"):
    """Context manager: temporarily override default interval column names.

    Mirrors ``update_default_colnames`` (reference ``core/specs.py:28-58``).
    """
    prev = _get_default_colnames()
    _local.colnames = (chrom, start, end)
    try:
        yield
    finally:
        _local.colnames = prev


def _resolve_cols(cols) -> tuple[str, str, str]:
    """Resolve a ``cols=`` argument to a concrete (chrom, start, end) triple."""
    if cols is None:
        return _get_default_colnames()
    ck, sk, ek = cols
    return (ck, sk, ek)


def _verify_columns(df, colnames, caller: str = ""):
    """Raise ValueError if any of *colnames* is missing from *df*."""
    missing = [c for c in colnames if c not in df.columns]
    if missing:
        raise ValueError(f"{caller}: missing columns {missing}; have {list(df.columns)}")


def is_chrom_dtype(dtype) -> bool:
    """True for types usable as a chromosome column (reference
    ``specs.py:142-152``: string/object/categorical pandas dtypes — here
    the Spark analog: StringType, or a string-valued pandas/numpy dtype
    for driver-side frames)."""
    from pyspark.sql import types as T

    if isinstance(dtype, T.DataType):
        return isinstance(dtype, T.StringType)
    try:
        import pandas as pd

        return bool(
            pd.api.types.is_string_dtype(dtype)
            or pd.api.types.is_object_dtype(dtype)
            or isinstance(dtype, pd.CategoricalDtype)
        )
    except Exception:
        return False
