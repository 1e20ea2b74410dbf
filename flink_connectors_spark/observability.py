"""Observability hooks: per-query data-quality metrics without extra
passes.

`observe()` attaches aggregate metrics to a plan node — Spark
computes them DURING the action (no second scan of 100 TB), and they
surface via `Observation.get` (batch) or
`QueryProgressEvent.observedMetrics` (streaming). The idiomatic
replacement for "run the pipeline, then run three COUNT(*) checks",
which would triple the scan cost at scale.

Typical use: row counts in/out of a cleaning stage, null-rate on a
join key before shuffling on it, payload-size histogram bounds for
sink batch sizing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observed_null_rate(
    df: DataFrame, key_col: str, name: str = "key_quality"
) -> tuple[DataFrame, Observation]:
    """Attach (n_rows, n_null_keys) metrics on the join/group key:
    NULL-heavy keys are the classic silent skew bomb (every NULL
    hashes to one reducer). Read after an action:
    ``obs.get["n_null_keys"]``."""
    obs = Observation(name)
    out = df.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            F.when(F.col(key_col).isNull(), 1).otherwise(0)
        ).alias("n_null_keys"),
    )
    return out, obs


def observed_stage_counts(
    df_in: DataFrame, df_out: DataFrame, stage: str
) -> tuple[DataFrame, DataFrame, Observation, Observation]:
    """Wrap a pipeline stage with input/output row metrics — the
    yield accounting a curation pipeline reports per stage."""
    obs_in = Observation(f"{stage}_in")
    obs_out = Observation(f"{stage}_out")
    return (
        df_in.observe(obs_in, F.count(F.lit(1)).alias("rows")),
        df_out.observe(obs_out, F.count(F.lit(1)).alias("rows")),
        obs_in,
        obs_out,
    )
