"""Custom stateful streaming operators via applyInPandasWithState
(SURVEY.md §2.9 T3 — the pure-streaming alternative to foreachBatch).

``running_latest_by_key`` is the streaming CDC dedup: per key, state holds
the (ts, payload) of the best event seen so far; each micro-batch emits the
keys whose latest row CHANGED, i.e. an upsert changelog for a downstream
sink. This trades the foreachBatch table merge for executor-local state —
preferable when the mirror is consumed as a stream (e.g. feeding a cache)
rather than as a table; the table path (streaming/pipeline.py) remains the
default for 100 TB state because state store size is bounded by executor
storage (SURVEY.md §7 watch list).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_latest_by_key(
    events: DataFrame,
    key_col: str = "id",
    ts_col: str = "ts",
    payload_col: str = "name",
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Streaming latest-per-key with I/U/D semantics.

    Output rows: (key, ts, payload, live) — one per key whose resolved
    state changed in the micro-batch; ``live=false`` means the key's latest
    event is a delete (downstream sinks drop it).

    Closure is self-contained (no module imports on workers).
    """
    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("ts", T.StringType()),
            T.StructField("payload", T.StringType()),
            T.StructField("live", T.BooleanType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("ts", T.StringType()),
            T.StructField("payload", T.StringType()),
            T.StructField("live", T.BooleanType()),
        ]
    )

    def update(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        best_ts, best_payload, best_live = (
            state.get if state.exists else (None, None, None)
        )
        changed = False
        # vectorized per-batch reduce: idxmax picks the FIRST max row (same
        # tie-break as a strict `>` scan in batch order), then one scalar
        # compare against state — no per-row Python loop
        for pdf in pdfs:
            if pdf.empty:
                continue
            row = pdf.loc[pdf[ts_col].idxmax()]
            ts, payload, op = row[ts_col], row[payload_col], row[op_col]
            if best_ts is None or ts > best_ts:
                best_ts, best_payload = ts, payload
                best_live = op != delete_op
                changed = True
        if changed:
            state.update((best_ts, best_payload, best_live))
            yield _pd.DataFrame(
                {
                    "id": [key[0]],
                    "ts": [best_ts],
                    "payload": [best_payload],
                    "live": [best_live],
                }
            )

    return events.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
