"""Concurrent benchmark submission.

Spark pays a fixed per-query floor (~0.3-0.5 s at sf0.1 on local[32]):
DAG scheduling, AQE re-planning between stages, broadcast setup, codegen
cache lookups.  A serial 17-query benchmark pays that floor 17 times and
measures the floor, not the engine.  A real cluster amortizes it — many
queries are in flight and the scheduler overlaps one query's planning gap
with another's execution.  This helper reproduces that regime locally:
every query is submitted from its own Python thread into its own FAIR
scheduler pool, and the recorded number is the whole-batch wall time.

Requires ``spark.scheduler.mode=FAIR`` on the SparkContext (set at session
build — it is a context-level conf).  Each thread gets a distinct pool via
``setLocalProperty``; with Spark's pinned-thread mode (default since 3.2)
local properties are per-Python-thread, so pools land correctly.
"""

from __future__ import annotations

import threading
import time
from collections.abc import Callable

from pyspark.sql import SparkSession


def concurrent_walls(
    spark: SparkSession,
    jobs: list[tuple[str, Callable[[], None]]],
    runs: int = 2,
) -> list[float]:
    """Run every job concurrently (one thread + one FAIR pool each) and
    return the whole-batch wall time of EACH repetition, in run order —
    callers pick min/median and report the spread (round-5 lesson: single
    bench numbers whipsawed ±8% on ambient host noise between identical
    runs, so every recorded number needs its spread next to it).

    The barrier releases all threads and the timer together, so the wall
    clock covers exactly the span from simultaneous submission to the last
    job's completion.  Exceptions in any thread re-raise in the caller.
    """
    walls: list[float] = []
    for _ in range(runs):
        barrier = threading.Barrier(len(jobs) + 1)
        errors: list[tuple[str, BaseException]] = []

        def _run(name: str, thunk: Callable[[], None]) -> None:
            spark.sparkContext.setLocalProperty("spark.scheduler.pool", name)
            barrier.wait()
            try:
                thunk()
            except BaseException as e:  # noqa: BLE001 — surfaced to caller
                errors.append((name, e))

        threads = [
            threading.Thread(target=_run, args=(name, thunk), daemon=True)
            for name, thunk in jobs
        ]
        for t in threads:
            t.start()
        barrier.wait()
        t0 = time.perf_counter()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        if errors:
            name, err = errors[0]
            raise RuntimeError(f"concurrent bench job {name!r} failed: {err!r}") from err
        walls.append(wall)
    return walls
