"""Streaming rollups: watermarked windowed aggregation and a custom
stateful operator over event streams.

- ``windowed_rollup``: declarative ``withWatermark`` + ``window()``
  groupBy — Catalyst owns state store, late-data drop, and window
  finalization. In append mode a window only emits once the watermark
  passes its end, which is the exactly-once contract downstream
  encode jobs want (each finalized window is immutable and can be
  committed as an epoch).
- ``stateful_running_stats``: ``applyInPandasWithState`` — the escape
  hatch for operators Spark's built-ins can't express (here: per-key
  running count/sum/min/max carried across micro-batches). State is
  per group, Arrow-batched, and survives restarts via the checkpoint.

Both transformations are plan fragments: they apply to a streaming OR
batch DataFrame (the batch path is how tests pin parity between the
streaming result and a plain groupBy over the same data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ROLLUP_STATE_DDL = "cnt long, vsum double, vmin double, vmax double"


def windowed_rollup(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    key_col: str | None = "event_type",
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Watermarked tumbling-window aggregate: (window, key) ->
    count/sum/min/max. On a stream, rows later than ``watermark`` past
    the max seen event time are dropped and windows finalize exactly
    once (append mode)."""
    src = df
    if df.isStreaming:
        src = df.withWatermark(ts_col, watermark)
    keys = [F.window(F.col(ts_col), window).alias("win")]
    if key_col:
        keys.append(F.col(key_col))
    return (
        src.groupBy(*keys)
        .agg(
            F.count("*").alias("cnt"),
            F.sum(value_col).alias("vsum"),
            F.min(value_col).alias("vmin"),
            F.max(value_col).alias("vmax"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            *([F.col(key_col)] if key_col else []),
            "cnt", "vsum", "vmin", "vmax",
        )
    )


def stateful_running_stats(
    df: DataFrame, key_col: str = "event_type", value_col: str = "value",
    timeout: str = "NoTimeout",
) -> DataFrame:
    """Per-key running stats carried across micro-batches via
    ``applyInPandasWithState`` (GroupState). Emits the UPDATED totals
    for every key seen in each batch — the custom-stateful-operator
    shape (sessionization, dedup-with-memory, online stats) that
    windowed aggregation can't express."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_ddl = f"{key_col} string, cnt long, vsum double, vmin double, vmax double"

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        cnt, vsum, vmin, vmax = (
            state.get if state.exists else (0, 0.0, float("inf"), float("-inf"))
        )
        for pdf in pdfs:
            v = pdf[value_col].astype("float64")
            if len(v):
                cnt += int(len(v))
                vsum += float(v.sum())
                vmin = min(vmin, float(v.min()))
                vmax = max(vmax, float(v.max()))
        state.update((cnt, vsum, vmin, vmax))
        yield pd.DataFrame(
            {key_col: [key[0]], "cnt": [cnt], "vsum": [vsum],
             "vmin": [vmin], "vmax": [vmax]}
        )

    return df.groupBy(key_col).applyInPandasWithState(
        update, out_ddl, ROLLUP_STATE_DDL, "update",
        getattr(GroupStateTimeout, timeout),
    )
