"""Small shared runtime utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def track_persisted(df: DataFrame, deps: list[DataFrame]) -> DataFrame:
    """Record persisted upstream DataFrames on ``df`` so whoever
    materializes it (CheckpointStore.write) can unpersist them — a
    long-lived driver (incremental/serving mode) must not leak executor
    storage across runs."""
    df._persisted_deps = getattr(df, "_persisted_deps", []) + list(deps)
    return df


def release_persisted(df: DataFrame) -> None:
    """Unpersist every dependency recorded by ``track_persisted``."""
    for dep in getattr(df, "_persisted_deps", []):
        try:
            dep.unpersist()
        except Exception:
            pass
    df._persisted_deps = []
