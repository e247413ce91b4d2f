"""Streaming run-log metrics (SURVEY op 24, streaming mode).

The batch pipeline writes explicit run-log rows (control/runlog.py). In
streaming, per-batch metrics ride the query itself: ``df.observe`` attaches
named aggregates evaluated inline (no extra pass), and a
``StreamingQueryListener`` receives them with each progress event — the
Spark-native replacement for the reference's start/finish row updates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener

OBSERVATION_NAME = "runlog"


def with_runlog_metrics(df: DataFrame, ts_col: str | None = None) -> DataFrame:
    """Attach rows_in (+ max event time when ``ts_col`` given — the
    watermark-advance number, reference run.py:72-75) to every micro-batch."""
    aggs = [F.count(F.lit(1)).alias("rows_in")]
    if ts_col:
        aggs.append(F.max(ts_col).alias("max_event_time"))
    return df.observe(OBSERVATION_NAME, *aggs)


class RunLogListener(StreamingQueryListener):
    """Collects observed metrics per progress event. ``records`` is a list
    of dicts (batchId, rows_in, max_event_time?) — a production deployment
    writes each to the run-log table instead."""

    def __init__(self):
        self.records: list[dict] = []

    def onQueryStarted(self, event):
        pass

    def onQueryProgress(self, event):
        progress = event.progress
        observed = dict(progress.observedMetrics or {})
        row = observed.get(OBSERVATION_NAME)
        if row is not None:
            rec = row.asDict()
            rec["batchId"] = progress.batchId
            self.records.append(rec)

    def onQueryIdle(self, event):
        pass

    def onQueryTerminated(self, event):
        pass
