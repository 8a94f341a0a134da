"""Spark Python data source exposing the change feed as a real stream.

``spark.readStream.format("table_changes")`` over the engine's versioned
tables — the full integration VERDICT r11 #1 sketched beyond the
AvailableNow driver loop (``ChangeFeedStream`` /
``MaintainedJoinFeedDriver``): Spark's own streaming machinery
(microbatch planner, offset checkpointing, triggers, rate control via
``maxVersionsPerBatch``) drives the feed, and the per-partition diff
work runs ON EXECUTORS.

Why not just call ``table_changes`` inside the source? A Python data
source's ``read(partition)`` executes in an executor Python worker with
NO SparkSession — the diff cannot be a Spark job. Instead the design
leans on the table layout the way a native source would:

- **offsets are snapshot versions** (``{"version": N}``); latestOffset
  reads the CURRENT pointer (one JSON file, no Spark);
- **partitions are the changed buckets** between the two manifests
  (``VersionedBucketMirror``): the driver-side planner diffs the two
  manifests' per-bucket states (pure metadata) and emits one
  ``InputPartition`` per changed bucket — the same manifest pruning the
  in-engine CDF uses (SCALING.md r11), so a small commit plans a small
  batch no matter how big the table is;
- **each partition reads only its bucket's dirs with pyarrow** (base +
  merge-on-read delta fold + keys-only delete tier), computes the keyed
  I/U/D diff in pandas, and yields Arrow batches — embarrassingly
  parallel across buckets, zero corpus shuffle, no nested Spark.

The plain ``ParquetStateTable`` layout (one dir per version) is served
as a single partition per window.

Semantics parity: the per-bucket fold reproduces
``operators/cdc.py apply_changelog`` (latest per key by ts + tiebreaks,
delete-op rows drop the key, NULL op is not a delete) and the diff
reproduces ``operators/diff.py table_diff`` (presence-based I/D,
null-safe payload inequality for U, deletes carry NULL payload) —
pinned by a parity test against the in-engine ``table_changes``.

Limitations (explicit, caller-visible errors): windows spanning an
``alter_schema`` commit or manifests carrying rename/generation-mask
metadata are refused (run ``rewrite_data_files(materialize=True)``
first or split the window) — the pyarrow read path binds to ONE logical
schema per window.

Options:
- ``path`` (required): table root.
- ``keyCols`` (required): comma-separated key columns.
- ``startingVersion``: first delivered window starts AFTER this version
  (default: the current head — tail only new commits; ``0`` replays
  from the initial snapshot).
- ``dropCols``: envelope columns excluded from the diff (default
  ``op,ts,_src_file``).

Each microbatch is ONE consolidated window up to the current head —
the Python data source API (Spark 4.1) exposes no admission control
(``latestOffset`` receives neither the restored offset nor a
ReadLimit), so a reader-side per-trigger version cap cannot be made
restart-safe: any cursor the reader keeps is lost on restart and can
wedge below the checkpointed offset. Rate-limited catch-up is the
AvailableNow driver loop's job (``ChangeFeedStream.process_available``
/ ``MaintainedJoinFeedDriver``, max_commits_per_trigger).
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator, Sequence

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

_DEFAULT_DROP = ("op", "ts", "_src_file")


def _opt(options: dict, name: str, default=None):
    """Spark passes data-source options through a case-insensitive map
    that lower-cases keys — accept both spellings."""
    for k in (name, name.lower()):
        if k in options:
            return options[k]
    return default


def _load_log(root: str):
    from tabular_cdc_bootstrapper_spark.streaming.pipeline import SnapshotLog

    return SnapshotLog(root)


def _entry_schema_json(root: str, e: dict) -> dict:
    """The logical schema of a snapshot entry WITHOUT Spark: prefer the
    manifest-recorded schema (r10+); fall back to one parquet footer."""
    if e.get("schema") is not None:
        return e["schema"]
    import glob as _glob

    import pyarrow.parquet as _pq
    from pyspark.sql.pandas.types import from_arrow_schema

    if "dir" in e:
        d = e["dir"]
    else:
        d = next(iter(e["buckets"].values()))
    files = sorted(_glob.glob(os.path.join(d, "*.parquet")))
    if not files:
        raise ValueError(f"no parquet footer to infer a schema from in {d}")
    return from_arrow_schema(_pq.read_schema(files[0])).jsonValue()


def _refuse_ddl_metadata(e: dict, root: str) -> None:
    if e.get("renames") or e.get("shadowed"):
        raise ValueError(
            f"table_changes source on {root}: the manifest carries "
            "rename-fold or generation-mask metadata; run "
            "rewrite_data_files(materialize=True) first (the pyarrow "
            "read path binds to one physical schema)"
        )


def _bucket_state(e: dict, b: str):
    return (
        e["buckets"].get(b),
        tuple(s["dir"] for s in (e.get("deltas") or {}).get(b, ())),
    )


class _WindowPartition(InputPartition):
    """One unit of executor work: diff one bucket (or one whole plain
    snapshot) between the window's two versions."""

    def __init__(
        self,
        old_dirs: list[str],
        old_specs: list[dict],
        new_dirs: list[str],
        new_specs: list[dict],
        keys: list[str],
        drop_cols: list[str],
        schema_json: dict,
    ) -> None:
        self.old_dirs = old_dirs
        self.old_specs = old_specs
        self.new_dirs = new_dirs
        self.new_specs = new_specs
        self.keys = keys
        self.drop_cols = drop_cols
        self.schema_json = schema_json


def _read_dirs_pandas(dirs: Sequence[str], columns: list[str]):
    """Read parquet dirs into ONE pandas frame aligned to ``columns``
    (missing columns surface as None — the mergeSchema behavior)."""
    import pandas as pd
    import pyarrow.parquet as pq

    frames = []
    for d in dirs:
        if not d or not os.path.isdir(d):
            continue
        t = pq.read_table(d)
        df = t.to_pandas(types_mapper=None)
        frames.append(df)
    if not frames:
        return pd.DataFrame({c: pd.Series(dtype="object") for c in columns})
    out = pd.concat(frames, ignore_index=True, sort=False)
    for c in columns:
        if c not in out.columns:
            out[c] = None
    return out[[c for c in columns if c in out.columns]]


def _fold_state_pandas(dirs: list[str], specs: list[dict], columns: list[str]):
    """Reproduce the merge-on-read read-side fold in pandas: base dirs
    are the state, delta dirs fold latest-per-key by (ts, tiebreaks),
    delete-op rows drop the key (``apply_changelog`` semantics; the
    keys-only delete tier reads with NULL payload, which the fold drops
    with the key, so nothing leaks)."""
    import pandas as pd

    base = _read_dirs_pandas(dirs, columns)
    if not specs:
        return base
    p = specs[0]
    key = p["key"]
    ts = list(p["ts"]) if not isinstance(p["ts"], str) else [p["ts"]]
    op_col = p["op"]
    delete_op = p["delete_op"]
    tiebreak = list(p.get("tiebreak") or ())
    deltas = _read_dirs_pandas([s["dir"] for s in specs], columns)
    events = pd.concat([base, deltas], ignore_index=True, sort=False)
    order = [c for c in ts + tiebreak if c in events.columns]
    if order:
        # stable ascending sort, NaN first (the mirror_ts floor rule),
        # then keep the LAST row per key: later-concat (delta) beats
        # base on equal ts, matching the fold's union order
        events = events.sort_values(
            order, kind="stable", na_position="first"
        )
    latest = events.groupby(key, dropna=False, sort=False).tail(1)
    if op_col in latest.columns:
        latest = latest[
            ~latest[op_col].eq(delete_op).fillna(False)
        ]
    return latest


def _diff_pandas(old, new, keys: list[str], payload: list[str]):
    """``table_diff`` in pandas: presence-based I/D, null-safe payload
    inequality for U (deletes carry NULL payload)."""
    import numpy as np
    import pandas as pd

    o = old[keys + payload].copy()
    n = new[keys + payload].copy()
    j = o.merge(
        n, on=keys, how="outer", suffixes=("__o", "__n"), indicator=True
    )
    rows = {k: j[k] for k in keys}
    in_old = j["_merge"].isin(("left_only", "both"))
    in_new = j["_merge"].isin(("right_only", "both"))
    if payload:
        changed = np.zeros(len(j), dtype=bool)
        for c in payload:
            a, b = j[f"{c}__o"], j[f"{c}__n"]
            neq = ~(a.eq(b) | (a.isna() & b.isna()))
            changed |= neq.to_numpy()
    else:
        changed = np.zeros(len(j), dtype=bool)
    op = np.where(
        ~in_old, "I", np.where(~in_new, "D", np.where(changed, "U", ""))
    )
    out = pd.DataFrame(rows)
    for c in payload:
        # I/U carry the new value; D carries NULL (the DMS convention)
        out[c] = j[f"{c}__n"].where(in_new, other=None)
    out["op"] = op
    return out[out["op"] != ""]


class ChangeFeedStreamReader(DataSourceStreamReader):
    def __init__(self, schema: T.StructType, options: dict) -> None:
        self._root = _opt(options, "path")
        self._keys = [
            k.strip() for k in _opt(options, "keyCols").split(",")
        ]
        self._drop = [
            c.strip()
            for c in _opt(
                options, "dropCols", ",".join(_DEFAULT_DROP)
            ).split(",")
            if c.strip()
        ]
        sv = _opt(options, "startingVersion")
        self._starting = int(sv) if sv is not None else None
        self._schema = schema

    # -- offsets ----------------------------------------------------------
    def initialOffset(self) -> dict:
        if self._starting is not None:
            return {"version": self._starting}
        cur = _load_log(self._root).current()
        return {"version": cur["version"] if cur else -1}

    def latestOffset(self) -> dict:
        cur = _load_log(self._root).current()
        return {"version": cur["version"] if cur else -1}

    def commit(self, end: dict) -> None:
        pass  # Spark's checkpoint IS the delivered position

    # -- planning (driver side, metadata only) -----------------------------
    def partitions(self, start: dict, end: dict):
        from_v, to_v = start["version"], end["version"]
        if to_v <= from_v:
            return []
        log = _load_log(self._root)
        by_v = {e["version"]: e for e in log.entries()}
        if from_v >= 0 and from_v not in by_v:
            raise ValueError(
                f"snapshot {from_v} of {self._root} is gone (retention); "
                "restart the stream with a fresh startingVersion"
            )
        if to_v not in by_v:
            raise ValueError(f"no snapshot {to_v} in {self._root}")
        e_old = by_v.get(from_v)
        e_new = by_v[to_v]
        for v in range(from_v + 1, to_v + 1):
            e = by_v.get(v)
            if e is not None and e.get("operation") == "alter_schema":
                raise ValueError(
                    f"window ({from_v}, {to_v}] of {self._root} spans an "
                    "alter_schema commit — split the window at the DDL "
                    "commit (read with maxVersionsPerBatch=1) or use the "
                    "in-engine consolidated feed (ChangeFeedStream), "
                    "which projects old snapshots through DDL"
                )
        for e in (e_old, e_new):
            if e is not None:
                _refuse_ddl_metadata(e, self._root)
        schema_json = _entry_schema_json(self._root, e_new)
        drop = [c for c in self._drop]
        if "buckets" in e_new:  # bucketed manifest layout
            old_buckets = (e_old or {"buckets": {}})["buckets"]
            all_b = set(old_buckets) | set(e_new["buckets"])
            if e_old is not None:
                all_b |= set(e_old.get("deltas") or {})
            all_b |= set(e_new.get("deltas") or {})
            parts = []
            for b in sorted(all_b, key=int):
                if e_old is not None and _bucket_state(
                    e_old, b
                ) == _bucket_state(e_new, b):
                    continue  # manifest pruning: bucket untouched
                old_specs = (
                    (e_old.get("deltas") or {}).get(b, [])
                    if e_old
                    else []
                )
                new_specs = (e_new.get("deltas") or {}).get(b, [])
                parts.append(
                    _WindowPartition(
                        [old_buckets.get(b)] if e_old else [],
                        list(old_specs),
                        [e_new["buckets"].get(b)],
                        list(new_specs),
                        self._keys,
                        drop,
                        schema_json,
                    )
                )
            return parts
        # plain snapshot layout: one partition per window
        return [
            _WindowPartition(
                [e_old["dir"]] if e_old else [],
                [],
                [e_new["dir"]],
                [],
                self._keys,
                drop,
                schema_json,
            )
        ]

    # -- executor side ------------------------------------------------------
    def read(self, partition: _WindowPartition) -> Iterator:
        import pyarrow as pa
        from pyspark.sql.pandas.types import to_arrow_schema

        cols = [
            f["name"] for f in partition.schema_json["fields"]
        ]
        old = _fold_state_pandas(
            partition.old_dirs, partition.old_specs, cols
        )
        new = _fold_state_pandas(
            partition.new_dirs, partition.new_specs, cols
        )
        keep = [c for c in cols if c not in partition.drop_cols]
        keys = partition.keys
        payload = [c for c in keep if c not in keys]
        diff = _diff_pandas(old[keep], new[keep], keys, payload)
        out_fields = [
            f
            for f in T.StructType.fromJson(partition.schema_json).fields
            if f.name in keep
        ]
        out_schema = T.StructType(
            out_fields + [T.StructField("op", T.StringType(), False)]
        )
        arrow_schema = to_arrow_schema(out_schema)
        if diff.empty:
            return  # nothing changed in this bucket's payload columns
        table = pa.Table.from_pandas(
            diff[keys + payload + ["op"]].reset_index(drop=True),
            schema=arrow_schema,
            preserve_index=False,
            safe=False,
        )
        yield from table.to_batches()


class ChangeFeedDataSource(DataSource):
    """``spark.dataSource.register(ChangeFeedDataSource)`` then
    ``spark.readStream.format("table_changes").option(...)``."""

    @classmethod
    def name(cls) -> str:
        return "table_changes"

    def schema(self) -> T.StructType:
        root = _opt(self.options, "path")
        drop = [
            c.strip()
            for c in _opt(
                self.options, "dropCols", ",".join(_DEFAULT_DROP)
            ).split(",")
            if c.strip()
        ]
        log = _load_log(root)
        cur = log.current()
        if cur is None:
            raise ValueError(f"{root} has no snapshot yet")
        _refuse_ddl_metadata(cur, root)
        schema = T.StructType.fromJson(_entry_schema_json(root, cur))
        fields = [f for f in schema.fields if f.name not in drop]
        return T.StructType(
            fields + [T.StructField("op", T.StringType(), False)]
        )

    def streamReader(self, schema: T.StructType) -> ChangeFeedStreamReader:
        if (
            _opt(self.options, "path") is None
            or _opt(self.options, "keyCols") is None
        ):
            raise ValueError(
                "table_changes source needs .option('path', <table root>) "
                "and .option('keyCols', 'k1[,k2...]')"
            )
        return ChangeFeedStreamReader(schema, dict(self.options))
