"""Paginated REST source (SURVEY §2.1 ops 1-2, 5).

Reference: services/extractor/app/extract.py:30-89 (limit/offset loop,
stop on short/empty page, runaway guard at offset ≥ 2,000,000, per-page
stable-order assertion) and http_client.py:19-58 (retry 408/429/5xx with
exponential backoff + jitter).

Two implementations:

1. ``fetch_all`` — driver-side loop, faithful to the reference; fine at
   reference scale (thousands of rows), returns ``list[dict]`` for
   ``spark.createDataFrame``.
2. ``PaginatedRestDataSource`` — Spark 4 Python Data Source API: the planner
   asks the API for the matching row count (the envelope's ``meta.count``,
   reference main.py:231-234), splits it into page-range partitions, and
   each executor task fetches its own pages in parallel. The incremental
   predicate (``updated_after``) is shipped as a source option — predicate
   pushdown by construction. This is the shape that scales: N executors ×
   M pages, no driver materialization.

Both thread ``_arrival_seq`` (global row offset) so keep-last dedup
(operators/normalize.py) is deterministic — SURVEY §7.3 hard part 2.

HTTP transport is injectable (``get_json`` callable) so tests run without a
server and without the ``requests`` package.
"""

from __future__ import annotations

import json
import random
import time
import urllib.error
import urllib.parse
import urllib.request
from typing import Any, Callable, Iterator

RETRY_STATUS = (408, 429, 500, 502, 503, 504)  # reference http_client.py:24
MAX_OFFSET = 2_000_000  # runaway guard, reference extract.py:86-87
ENTITY_PATHS = {"ib_receipts": "/ib/receipts", "ob_orders": "/ob/orders"}  # extract.py:9-12


def get_json(
    url: str,
    params: dict[str, Any] | None = None,
    timeout: float = 30.0,
    max_retries: int = 3,
    _sleep: Callable[[float], None] = time.sleep,
) -> Any:
    """Op 2: GET with retry/backoff (0.5·2^i s × 50-100% jitter, reference
    http_client.py:24-58). stdlib-only transport."""
    if params:
        url = f"{url}?{urllib.parse.urlencode(params)}"
    last_err: Exception | None = None
    for attempt in range(max_retries + 1):
        try:
            with urllib.request.urlopen(url, timeout=timeout) as resp:
                return json.loads(resp.read().decode("utf-8"))
        except urllib.error.HTTPError as e:
            if e.code not in RETRY_STATUS:
                raise
            last_err = e
        except (urllib.error.URLError, TimeoutError, ConnectionError) as e:
            last_err = e
        if attempt < max_retries:
            _sleep(0.5 * (2**attempt) * (0.5 + 0.5 * random.random()))
    raise RuntimeError(f"GET {url} failed after {max_retries} retries") from last_err


def _assert_stable_order(rows: list[dict], entity: str) -> None:
    """Op 5: within-page non-decreasing (updated_at, id) check (reference
    extract.py:17-27 — string comparison of ISO timestamps, which is
    order-correct for same-offset ISO-8601)."""
    prev = None
    for r in rows:
        cur = (str(r.get("updated_at")), str(r.get("id")))
        if prev is not None and cur < prev:
            raise AssertionError(f"unstable page order for {entity}: {cur} < {prev}")
        prev = cur


def fetch_pages(
    base_url: str,
    entity: str,
    updated_after: str | None = None,
    limit: int = 500,
    getter: Callable[..., Any] = get_json,
    start_offset: int = 0,
    max_offset: int = MAX_OFFSET,
) -> Iterator[list[dict]]:
    """Op 1 core loop: yield pages until a short/empty page; offset advances
    by ``limit`` (reference extract.py:48-87)."""
    if entity not in ENTITY_PATHS:
        raise ValueError(f"unknown entity: {entity!r}")
    url = base_url.rstrip("/") + ENTITY_PATHS[entity]
    offset = start_offset
    while True:
        if offset >= max_offset:
            raise RuntimeError(f"pagination runaway guard tripped at offset {offset}")
        params: dict[str, Any] = {"limit": limit, "offset": offset}
        if updated_after is not None:
            params["updated_after"] = updated_after
        envelope = getter(url, params=params)
        rows = envelope.get("data") if isinstance(envelope, dict) else None
        if not isinstance(rows, list):
            raise ValueError(f"malformed envelope for {entity}: data is not a list")
        if not rows:
            return
        _assert_stable_order(rows, entity)
        yield rows
        if len(rows) < limit:
            return
        offset += limit


def fetch_all(
    base_url: str,
    entity: str,
    updated_after: str | None = None,
    limit: int = 500,
    getter: Callable[..., Any] = get_json,
) -> list[dict]:
    """Op 1: all pages accumulated, with a global ``_arrival_seq`` per row
    (page order × row order) for deterministic keep-last dedup."""
    out: list[dict] = []
    seq = 0
    for page in fetch_pages(base_url, entity, updated_after, limit, getter):
        for row in page:
            row = dict(row)
            row["_arrival_seq"] = seq
            seq += 1
            out.append(row)
    return out


# ---------------------------------------------------------------------------
# Spark 4 Python Data Source API — parallel page fetch on executors.
# ---------------------------------------------------------------------------
try:  # pragma: no cover - import shape depends on pyspark version
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
        SimpleDataSourceStreamReader,
    )

    class _PageRange(InputPartition):
        def __init__(self, start: int, end: int):
            self.start = start
            self.end = end

    class PaginatedRestReader(DataSourceReader):
        def __init__(self, schema, options):
            self.schema = schema
            self.base_url = options["base_url"]
            self.entity = options["entity"]
            self.updated_after = options.get("updated_after")
            self.limit = int(options.get("limit", "500"))
            self.pages_per_task = int(options.get("pages_per_task", "4"))

        def partitions(self):
            # One cheap count probe: the envelope's meta.count is the total
            # matching rows (reference main.py:231-234) — the pushed-down
            # watermark predicate prunes here, before any data moves.
            url = self.base_url.rstrip("/") + ENTITY_PATHS[self.entity]
            params: dict[str, Any] = {"limit": 1, "offset": 0}
            if self.updated_after is not None:
                params["updated_after"] = self.updated_after
            meta = get_json(url, params=params).get("meta", {})
            total = int(meta.get("count", 0))
            rows_per_task = self.limit * self.pages_per_task
            starts = range(0, max(total, 1), rows_per_task)
            return [_PageRange(s, min(s + rows_per_task, total)) for s in starts]

        def read(self, partition: "_PageRange"):
            # Covers the full [start, end) row range regardless of how the
            # server sizes pages: a page shorter than requested (server-side
            # page-size cap, transient short read) does NOT end the range —
            # only an empty page does. Advancing by len(rows) keeps offsets
            # contiguous either way. The offset-range split assumes the
            # snapshot is stable between the count probe and the fetches
            # (same assumption as the reference's offset walk); the stream
            # reader's lookback re-read is the remedy for moving data.
            url = self.base_url.rstrip("/") + ENTITY_PATHS[self.entity]
            offset = partition.start
            while offset < partition.end:
                lim = min(self.limit, partition.end - offset)
                params: dict[str, Any] = {"limit": lim, "offset": offset}
                if self.updated_after is not None:
                    params["updated_after"] = self.updated_after
                envelope = get_json(url, params=params)
                rows = envelope.get("data") if isinstance(envelope, dict) else None
                if not isinstance(rows, list):
                    raise ValueError(f"malformed envelope for {self.entity}")
                if not rows:
                    return
                _assert_stable_order(rows, self.entity)
                for row in rows:
                    yield tuple(row.get(f.name) for f in self.schema.fields)
                offset += len(rows)

    class PaginatedRestStreamReader(SimpleDataSourceStreamReader):
        """Streaming micro-batch reader: the reference's watermark poll loop
        (extractor run.py:26-27, 72-75) as a Structured Streaming source.

        Offset = ``{"updated_after": <ISO cursor>}``. Each micro-batch
        fetches rows strictly newer than (cursor − lookback) and advances
        the cursor to max(updated_at) (carry-forward when empty). The
        lookback re-read makes delivery at-least-once by design — pair with
        the idempotent merge sinks (streaming/pipeline.py) for
        effectively-once, exactly like the reference."""

        def __init__(self, schema, options):
            self.schema = schema
            self.base_url = options["base_url"]
            self.entity = options["entity"]
            self.limit = int(options.get("limit", "500"))
            self.lookback = int(options.get("lookback_seconds", "0"))
            self.start_cursor = options.get(
                "start", "1970-01-01T00:00:00+00:00"
            )  # reference config.py:48 default

        def initialOffset(self):
            return {"updated_after": self.start_cursor}

        def _effective(self, cursor: str) -> str:
            if not self.lookback:
                return cursor
            from datetime import datetime, timedelta

            dt = datetime.fromisoformat(cursor)
            return (dt - timedelta(seconds=self.lookback)).isoformat()

        def _fetch(self, after: str) -> list[dict]:
            return fetch_all(
                self.base_url, self.entity, updated_after=after, limit=self.limit
            )

        def _tuples(self, rows) -> list[tuple]:
            # a list, not a generator: the runtime pickles the prefetched
            # batch for replay between offsets
            return [tuple(row.get(f.name) for f in self.schema.fields) for row in rows]

        def read(self, start: dict):
            cursor = start["updated_after"]
            rows = self._fetch(self._effective(cursor))
            if rows:
                new_cursor = max(max(str(r["updated_at"]) for r in rows), cursor)
            else:
                new_cursor = cursor  # carry-forward (reference run.py:72-75)
            return iter(self._tuples(rows)), {"updated_after": new_cursor}

        def readBetweenOffsets(self, start: dict, end: dict):
            # replay for recovery: rows in (start, end]
            rows = self._fetch(self._effective(start["updated_after"]))
            upper = end["updated_after"]
            return iter(
                self._tuples([r for r in rows if str(r["updated_at"]) <= upper])
            )

        def commit(self, end: dict) -> None:
            pass

    class PaginatedRestDataSource(DataSource):
        """``spark.read.format("paginated_rest")`` (batch) or
        ``spark.readStream.format("paginated_rest")`` (incremental stream)
        after ``spark.dataSource.register(PaginatedRestDataSource)``.
        Options: base_url, entity, updated_after, limit, pages_per_task;
        stream-only: start, lookback_seconds."""

        @classmethod
        def name(cls) -> str:
            return "paginated_rest"

        def schema(self):
            raise NotImplementedError("pass an explicit schema via .schema(...)")

        def reader(self, schema):
            return PaginatedRestReader(schema, self.options)

        def simpleStreamReader(self, schema):
            return PaginatedRestStreamReader(schema, self.options)

    HAS_DATASOURCE_API = True
except ImportError:  # pragma: no cover
    HAS_DATASOURCE_API = False
