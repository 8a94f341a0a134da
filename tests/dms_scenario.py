"""Deterministic DMS changelog scenario for golden CDC tests.

Fresh implementation of the wire format described in FIXTURES.md A1 (the
reference's sample generator defines the contract: columns id/name/
modification_date/table/op/ts; batch 0 = full insert load, later batches
mix updates and deletes). Seeded RNG + expected-state computation in plain
Python, so the pipeline result can be asserted exactly — the automated
version of the reference's print-and-eyeball check (SURVEY.md §5).
"""

from __future__ import annotations

import os
import random
from datetime import datetime, timedelta

import pyarrow as pa
import pyarrow.parquet as pq

N_ROWS = 100
N_BATCHES = 5
UPDATES_PER_BATCH = 5
DELETES_PER_BATCH = 3
T0 = datetime(2024, 1, 1)


def _iso(i: int) -> str:
    return (T0 + timedelta(seconds=i)).isoformat()


def generate(out_dir: str, seed: int = 42) -> dict[int, dict]:
    """Write LOAD00000001.parquet (full load, op=I) plus incremental
    ``2024-01-01T00-00-0N.parquet`` files (file-name contract per
    FIXTURES.md A3); return the expected final state {id: row}."""
    rng = random.Random(seed)
    os.makedirs(out_dir, exist_ok=True)
    seq = 0
    state: dict[int, dict] = {}

    def event(_id: int, name: str, op: str) -> dict:
        nonlocal seq
        seq += 1
        return {
            "id": _id,
            "name": name,
            "modification_date": _iso(seq),
            "table": "test_table",
            "op": op,
            "ts": _iso(seq),
        }

    def write(rows: list[dict], fname: str) -> None:
        cols = {k: [r[k] for r in rows] for k in rows[0]}
        pq.write_table(pa.table(cols), os.path.join(out_dir, fname))

    load = [event(i, f"name{i}", "I") for i in range(1, N_ROWS + 1)]
    for r in load:
        state[r["id"]] = r
    write(load, "LOAD00000001.parquet")

    for b in range(1, N_BATCHES):
        rows: list[dict] = []
        for _ in range(UPDATES_PER_BATCH):
            live = sorted(state)
            _id = live[rng.randrange(len(live))] if live else rng.randrange(1, N_ROWS + 1)
            r = event(_id, f"updated_name{_id}_b{b}", "U")
            rows.append(r)
            state[_id] = r
        for _ in range(DELETES_PER_BATCH):
            live = sorted(state)
            if not live:
                break
            _id = live[rng.randrange(len(live))]
            r = event(_id, state[_id]["name"], "D")
            rows.append(r)
            state.pop(_id, None)
        write(rows, f"2024-01-01T00-00-{b:02d}.parquet")

    return {k: {c: v[c] for c in ("id", "name", "modification_date")} for k, v in state.items()}


def generate_two_phase(out_dir: str, seed: int = 42):
    """Schema-evolution scenario (golden v2): phase 1 writes the LOAD
    file + incremental batches 1-2 in the ORIGINAL wire format; calling
    the returned ``write_phase2`` lands batches 3-4 that carry a NEW
    ``status`` column — the one-level-down case of the reference's
    "new folder paths become new tables" contract (README.md:8: the
    schema is inferred/dynamic, so a new column in later change files is
    the same evolution event). Returns ``(write_phase2, expected)``
    where expected is the final state {id: {id,name,modification_date,
    status}} — status is non-null only for rows whose LATEST event came
    from an evolved batch."""
    rng = random.Random(seed)
    os.makedirs(out_dir, exist_ok=True)
    seq = 0
    state: dict[int, dict] = {}
    evolve_from = 3  # batches >= this carry the status column

    def event(_id: int, name: str, op: str, batch: int) -> dict:
        nonlocal seq
        seq += 1
        row = {
            "id": _id,
            "name": name,
            "modification_date": _iso(seq),
            "table": "test_table",
            "op": op,
            "ts": _iso(seq),
        }
        if batch >= evolve_from:
            row["status"] = f"status_{_id % 3}"
        return row

    def write(rows: list[dict], fname: str) -> None:
        cols = {k: [r[k] for r in rows] for k in rows[0]}
        pq.write_table(pa.table(cols), os.path.join(out_dir, fname))

    def make_batch(b: int) -> list[dict]:
        rows: list[dict] = []
        for _ in range(UPDATES_PER_BATCH):
            live = sorted(state)
            _id = live[rng.randrange(len(live))] if live else rng.randrange(1, N_ROWS + 1)
            r = event(_id, f"updated_name{_id}_b{b}", "U", b)
            rows.append(r)
            state[_id] = r
        for _ in range(DELETES_PER_BATCH):
            live = sorted(state)
            if not live:
                break
            _id = live[rng.randrange(len(live))]
            r = event(_id, state[_id]["name"], "D", b)
            rows.append(r)
            state.pop(_id, None)
        return rows

    load = [event(i, f"name{i}", "I", 0) for i in range(1, N_ROWS + 1)]
    for r in load:
        state[r["id"]] = r
    write(load, "LOAD00000001.parquet")
    for b in (1, 2):
        write(make_batch(b), f"2024-01-01T00-00-{b:02d}.parquet")

    # build ALL batches up front so the expected state is final; phase-2
    # batches only land on disk when the caller asks
    phase2_batches = [(b, make_batch(b)) for b in (3, 4)]

    def write_phase2() -> None:
        for b, rows in phase2_batches:
            write(rows, f"2024-01-01T00-00-{b:02d}.parquet")

    expected = {
        k: {
            "id": v["id"],
            "name": v["name"],
            "modification_date": v["modification_date"],
            "status": v.get("status"),
        }
        for k, v in state.items()
    }
    return write_phase2, expected
