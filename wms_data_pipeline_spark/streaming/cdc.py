"""CDC update-stream generator (test double for the reference's
``/simulate/tick``, main.py:255-314).

Reproduces the mutation semantics: each tick advances a random subset of
entities one step along the status machine (IB: NEW→PROCESSING→FINISHED,
OB: NEW→READYTOPICK→…→PACKED), cancels with 5% probability, bumps
``updated_at``/``updated_by``, and sets terminal fields on completion.
Deterministic via an explicit seed. Emits plain dicts — feed them to
``spark.createDataFrame`` for batch tests, or write micro-batch files for
Structured Streaming tests (streaming/pipeline.py).
"""

from __future__ import annotations

import random
import uuid
from datetime import datetime, timedelta, timezone

from wms_data_pipeline_spark.schemas import (
    IB_STATUS_FLOW,
    OB_STATUS_FLOW,
    TERMINAL_CANCELLED,
)

CANCEL_PROB = 0.05  # reference main.py:266


class CdcSimulator:
    """In-memory entity store + mutation tick."""

    def __init__(self, entity: str = "ib_receipts", n_seed: int = 50, seed: int = 7):
        self.entity = entity
        self.flow = IB_STATUS_FLOW if entity == "ib_receipts" else OB_STATUS_FLOW
        self.rng = random.Random(seed)
        self.clock = datetime(2026, 1, 1, tzinfo=timezone.utc)
        self.rows: list[dict] = [self._new_row(i) for i in range(n_seed)]

    def _tick_clock(self) -> datetime:
        self.clock += timedelta(seconds=self.rng.randint(1, 30))
        return self.clock

    def _new_row(self, i: int) -> dict:
        ts = self._tick_clock().isoformat()
        return {
            "id": str(uuid.UUID(int=self.rng.getrandbits(128))),
            "status": self.flow[0],
            "note": f"seed-{i}",
            "created_by": "seeder",
            "created_at": ts,
            "updated_by": "seeder",
            "updated_at": ts,
            "finished_at": None,
        }

    def tick(self, n_changes: int = 10) -> list[dict]:
        """Mutate up to ``n_changes`` non-terminal rows; returns the changed
        rows (post-mutation snapshots)."""
        live = [r for r in self.rows if r["status"] not in (self.flow[-1], TERMINAL_CANCELLED)]
        self.rng.shuffle(live)
        changed = []
        for row in live[:n_changes]:
            ts = self._tick_clock().isoformat()
            if self.rng.random() < CANCEL_PROB:
                row["status"] = TERMINAL_CANCELLED
            else:
                nxt = self.flow[self.flow.index(row["status"]) + 1]
                row["status"] = nxt
                if nxt == self.flow[-1]:
                    row["finished_at"] = ts
            row["updated_at"] = ts
            row["updated_by"] = "cdc"
            changed.append(dict(row))
        return changed
