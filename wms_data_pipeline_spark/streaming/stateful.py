"""Custom stateful streaming operator via ``applyInPandasWithState``.

``latest_state_changes`` turns an at-least-once entity update stream into a
**deduplicated change stream**: per key it keeps the newest (ts, tiebreak)
seen so far in the state store and emits a row ONLY when an incoming update
is strictly newer — the streaming twin of the newer-wins upsert
(operators/merge.latest_merge), with redeliveries and stale/out-of-order
updates suppressed at the operator instead of in the sink.

Scale notes: state is one small row per key in Spark's state store
(RocksDB-backed on a real cluster — configure
``spark.sql.streaming.stateStore.providerClass``); the stream shuffles once
on the key, and batches arrive Arrow-encoded per group. The hot path is
pandas over a single group's micro-batch slice — bounded by per-key update
rate, not corpus size.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StructType


def latest_state_changes(
    stream_df: DataFrame,
    key: str = "id",
    ts_col: str = "updated_at",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Emit only strictly-newer updates per key (update output mode).

    State layout: ``(last_ts long micros, last_tie string)``. Strictness
    matches the reference's ON CONFLICT … WHERE excluded.updated_at >
    target.updated_at (staging_repo.py:89): equal timestamps do NOT emit.
    """
    out_schema: StructType = stream_df.schema
    state_schema = "last_ts long, last_tie string"

    def fn(
        key_tuple: Any, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            last_ts, last_tie = state.get
        else:
            last_ts, last_tie = None, None
        emitted = []
        for pdf in pdfs:
            # newest-first within the micro-batch so one pass suffices
            sort_cols = [ts_col] + ([tiebreak_col] if tiebreak_col else [])
            pdf = pdf.sort_values(sort_cols, ascending=False)
            top = pdf.iloc[0]
            ts_us = int(top[ts_col].value // 1_000)  # pandas ns -> micros
            tie = str(top[tiebreak_col]) if tiebreak_col else ""
            if last_ts is None or ts_us > last_ts:
                last_ts, last_tie = ts_us, tie
                emitted.append(pdf.iloc[[0]])
        state.update((last_ts, last_tie))
        for e in emitted:
            yield e

    return stream_df.groupBy(key).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def latest_state_changes_tws(
    stream_df: DataFrame,
    key: str = "id",
    ts_col: str = "updated_at",
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """The same newer-wins change stream on Spark 4's
    ``transformWithStateInPandas`` (the successor API to
    ``applyInPandasWithState``): state is a typed ValueState handle with
    optional per-key TTL — at 100 TB the TTL bounds the state store for
    keys that go quiet (the old API needs manual timeout plumbing for the
    same behavior). The engine keeps the applyInPandasWithState path as the
    portable fallback: transformWithState's state-server protocol needs the
    ``protobuf`` package, which is optional here — probed up front so a
    missing dependency fails at build time with a clear error instead of
    crashing the streaming runner mid-query."""
    try:
        from google.protobuf import descriptor as _descriptor  # noqa: F401
    except ImportError as e:  # pragma: no cover - env-dependent
        raise ImportError(
            "transformWithStateInPandas requires the protobuf package "
            "(state-server protocol); use latest_state_changes "
            "(applyInPandasWithState) instead"
        ) from e
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    out_schema: StructType = stream_df.schema

    class _NewerWins(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._latest = handle.getValueState(
                "latest_ts", "last_ts long", ttlDurationMs=state_ttl_ms
            )

        def handleInputRows(self, key_tuple, rows, timer_values):
            last_ts = self._latest.get()[0] if self._latest.exists() else None
            for pdf in rows:
                pdf = pdf.sort_values(ts_col, ascending=False)
                top = pdf.iloc[0]
                ts_us = int(top[ts_col].value // 1_000)
                if last_ts is None or ts_us > last_ts:
                    last_ts = ts_us
                    self._latest.update((last_ts,))
                    yield pdf.iloc[[0]]

        def close(self) -> None:
            pass

    return stream_df.groupBy(key).transformWithStateInPandas(
        statefulProcessor=_NewerWins(),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )
