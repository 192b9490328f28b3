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


class releasing:
    """Context manager for DIRECT consumers of a track_persisted result
    (ones that collect/count it themselves instead of routing it through
    CheckpointStore.write, which releases automatically): guarantees the
    recorded persists are dropped when the block exits, so a long-lived
    driver doesn't leak executor storage (ADVICE r2)::

        with releasing(audio_dup_pairs(clips)) as pairs:
            rows = pairs.collect()
    """

    def __init__(self, df: DataFrame):
        self.df = df

    def __enter__(self) -> DataFrame:
        return self.df

    def __exit__(self, *exc) -> None:
        release_persisted(self.df)
