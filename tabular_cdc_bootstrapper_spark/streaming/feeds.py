"""Change feeds and maintained (incrementally folded) views over the
versioned tables. Split from ``streaming/pipeline.py`` (VERDICT r12 #3);
``streaming/pipeline.py`` re-exports every name.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import time
import uuid
from collections.abc import Sequence
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

from tabular_cdc_bootstrapper_spark.config import CdcTarget
from tabular_cdc_bootstrapper_spark.operators.cdc import (
    apply_changelog,
    latest_by_key,
)
from tabular_cdc_bootstrapper_spark.operators.diff import table_diff
from tabular_cdc_bootstrapper_spark.sources.files import exclude_glob_filter

from tabular_cdc_bootstrapper_spark.streaming._protocol import (  # noqa: F401
    CommitConflict,
    ConstraintViolation,
    SnapshotLog,
    TagSet,
    BranchSet,
    BranchOps,
    _DIR_VERSION_RE,
    _PURGE_CATCHUP_ROUNDS,
    _PURGE_LOCK_STALE_S,
    _RESERVED_META_KEYS,
    _RETRY_BACKOFF,
    _UNSET,
    _alter_schema_meta,
    _check_meta,
    _check_table_constraints,
    _dir_version,
    _purge_lock,
    _read_logical,
    _vanished_path,
    _widen_struct,
)
from tabular_cdc_bootstrapper_spark.streaming.state_table import (  # noqa: F401
    ParquetStateTable,
)


def table_changes(
    spark: SparkSession,
    table,
    from_version: int,
    to_version: int,
    key_cols: str | Sequence[str],
    drop_cols: Sequence[str] = (),
    op_col: str = "op",
) -> DataFrame:
    """Change data feed between two snapshots — the Delta CDF / Iceberg
    ``CHANGES BETWEEN`` surface on the engine's versioned tables: the
    minimal I/U/D changelog transforming snapshot ``from_version`` into
    ``to_version``, derived by ``operators/diff.py table_diff`` (ONE full
    outer join on the key — cost ∝ the two snapshots, not the history).

    Works on anything with ``read_version`` (``ParquetStateTable`` and
    ``VersionedBucketMirror``), so the feed composes with time travel:
    consumers that missed N batches ask for one consolidated diff instead
    of replaying N changelogs, and ``apply_changelog`` folds the result
    back (diff.py's round-trip law). Version resolution errors (unknown /
    expired snapshots) surface from ``read_version`` unchanged.

    ``drop_cols``: per-event metadata to exclude from the comparison —
    the CDC mirrors retain their changelog envelope (op/ts/_src_file),
    which is provenance of the LAST event, not table state; diffing it
    would re-emit rows whose payload never changed (and the op column
    would collide with the feed's own classification column).

    On a MANIFEST-backed table (``VersionedBucketMirror``) the diff is
    bucket-pruned (r11): the two manifests name exactly which buckets'
    state (base dir or delta chain) changed, so only THOSE buckets are
    read and joined — cost ∝ changed buckets, not the mirror, which is
    what a per-commit change feed must cost at 100 TB. Corner cases
    fall out correctly: a rebucket/full-rewrite marks every bucket
    changed (full diff), a purge rewrites both sides' shared dirs to
    the same new path (untouched buckets stay pruned), and a
    metadata-only ``alter_schema`` changes NO bucket — the feed is
    empty, the correct CDF for a commit that moved no data (consumers
    pick up the new schema from the table, not the feed).
    """
    if hasattr(table, "_read_entry"):  # manifest-backed: prune the diff
        e_old = table._resolve(from_version)
        e_new = table._resolve(to_version)
        buckets = set(e_old["buckets"]) | set(e_old.get("deltas") or {})
        buckets |= set(e_new["buckets"]) | set(e_new.get("deltas") or {})
        changed = [
            int(b)
            for b in buckets
            if table._bucket_state(e_old, b) != table._bucket_state(e_new, b)
        ]
        if changed:
            old = table._read_entry(spark, e_old, buckets=changed)
            new = table._read_entry(spark, e_new, buckets=changed)
        elif "schema" in e_new:  # nothing changed: an empty, typed feed
            old = new = spark.createDataFrame(
                [], T.StructType.fromJson(e_new["schema"])
            )
        else:
            full = table.read_version(spark, to_version)
            old = new = full.limit(0) if full is not None else None
    else:
        old = table.read_version(spark, from_version)
        new = table.read_version(spark, to_version)
    for c in drop_cols:
        old = old.drop(c) if old is not None else None
        new = new.drop(c) if new is not None else None
    if old is None and new is None:  # both snapshots fully deleted
        raise ValueError(
            f"snapshots {from_version} and {to_version} are both empty"
        )
    if old is None:
        old = new.limit(0)
    if new is None:
        new = old.limit(0)
    # DDL inside the window (ADVICE r12): a consolidated feed spanning an
    # ``alter_schema`` commit diffs snapshots with different LOGICAL
    # schemas. Project the old snapshot through each alter commit in
    # version order — rename folds (old name IS the new column), drops
    # project away (a schema change emits no row events, the Delta CDF
    # rule), widens cast — so the diff compares like with like instead of
    # mis-classifying every row as an update (or failing outright).
    log = getattr(table, "_log", None)
    if log is not None:
        for e in log.committed():
            if not (from_version < e["version"] <= to_version):
                continue
            alt = e.get("altered")
            if e.get("operation") != "alter_schema" or not alt:
                continue
            for c in alt.get("drop") or ():
                if c in old.columns:
                    old = old.drop(c)
            for o_name, n_name in (alt.get("rename") or {}).items():
                if o_name in old.columns:
                    old = old.withColumnRenamed(o_name, n_name)
            for name, type_str in (alt.get("widen") or {}).items():
                if name in old.columns:
                    old = old.withColumn(name, F.col(name).cast(type_str))
            # adds fall through to the typed-NULL alignment below
    # schema evolution across the window (r9): a snapshot written before a
    # column-adding MERGE lacks the new column — align by adding each
    # one-sided column as typed NULL (Delta CDF's behavior for evolved
    # tables: pre-evolution rows read NULL, an added value classifies U/I)
    for f in new.schema.fields:
        if f.name not in old.columns:
            old = old.withColumn(f.name, F.lit(None).cast(f.dataType))
    for f in old.schema.fields:
        if f.name not in new.columns:
            new = new.withColumn(f.name, F.lit(None).cast(f.dataType))
    return table_diff(old, new, key_cols, op_col=op_col)


class ChangeFeedStream:
    """Streaming consumer of a versioned table's change feed (r11,
    VERDICT task 3 — the Delta-CDF ``readStream`` analog on the engine's
    snapshot-logged tables): ``table_changes`` made incremental and
    exactly-once. State is ONE checkpoint file (atomic rename) holding
    the last ACKED version; each poll after that yields the next
    committed version's I/U/D diff, in commit order, each commit's CDF
    delivered exactly once across restarts:

    - crash BEFORE ack → the same (from, to] window redelivers, and the
      delivered ``to_version`` doubles as the idempotence fence for
      transactional consumers (``MaintainedAggView``/``MaintainedJoinView``
      take it as ``batch_id`` and skip replays);
    - crash AFTER ack → the window is never redelivered.

    A fresh consumer starts at the table's EARLIEST committed version
    (so the fold law holds: applying every delivered diff onto the
    first snapshot reproduces the head — diff.py's round-trip law,
    composed); pass ``from_version`` to start elsewhere (e.g. the
    current head for a "new changes only" tail). Retention must cover
    consumer lag: a diff whose from-snapshot has expired raises from
    ``read_version``, the same contract as Delta CDF.

    Scale: each delivery is ONE keyed full-outer join between two
    adjacent snapshots (cost ∝ the snapshots, not history), and the
    consolidated catch-up (``consolidate=True``) collapses N missed
    commits into one diff — the consumer never replays N changelogs.
    """

    def __init__(
        self,
        table,
        key_cols: str | Sequence[str],
        checkpoint_path: str,
        drop_cols: Sequence[str] = (),
        from_version: int | None = None,
    ) -> None:
        self.table = table
        self.key_cols = key_cols
        self.checkpoint_path = checkpoint_path
        self.drop_cols = tuple(drop_cols)
        self._start = from_version

    def position(self) -> int | None:
        """Last acked (delivered-and-confirmed) version, or the start
        position; None means "before the first committed version"."""
        try:
            with open(self.checkpoint_path) as fh:
                return json.load(fh)["position"]
        except (OSError, json.JSONDecodeError, KeyError):
            pass
        if self._start is not None:
            return self._start
        committed = [e["version"] for e in self.table._log.committed()]
        return committed[0] if committed else None

    def ack(self, version: int) -> None:
        """Confirm delivery through ``version`` — one atomic rename, the
        only state this consumer keeps."""
        os.makedirs(
            os.path.dirname(self.checkpoint_path) or ".", exist_ok=True
        )
        tmp = self.checkpoint_path + f".tmp.{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as fh:
            json.dump({"position": version, "ts": time.time()}, fh)
        os.replace(tmp, self.checkpoint_path)

    def pending(
        self,
        spark: SparkSession,
        consolidate: bool = False,
        max_commits: int | None = None,
    ) -> tuple[DataFrame, int, int] | None:
        """The next undelivered window as ``(diff, from_version,
        to_version)`` — the NEXT commit's CDF, with ``consolidate`` one
        diff spanning everything up to the head, or with ``max_commits``
        a consolidated window of at most that many commits (the
        ``maxFilesPerTrigger``-style rate limit, r12: a lagging consumer
        catches up in bounded bites instead of one head-sized diff).
        None when caught up. The caller applies the diff then
        ``ack(to_version)``."""
        pos = self.position()
        if pos is None:
            return None
        newer = [
            e["version"]
            for e in self.table._log.committed()
            if e["version"] > pos
        ]
        if not newer:
            return None
        if max_commits is not None:
            to_v = newer[: max(1, int(max_commits))][-1]
        else:
            to_v = newer[-1] if consolidate else newer[0]
        diff = table_changes(
            spark,
            self.table,
            pos,
            to_v,
            key_cols=self.key_cols,
            drop_cols=self.drop_cols,
        )
        return diff, pos, to_v

    def process_available(
        self,
        spark: SparkSession,
        fn,
        consolidate: bool = False,
        max_commits_per_trigger: int | None = None,
    ) -> list[tuple[int, int]]:
        """Drain the feed: ``fn(diff, from_version, to_version)`` per
        window, acked after ``fn`` returns (at-least-once delivery into
        ``fn``; pair with a ``to_version``-keyed fence for exactly-once
        effects). ``max_commits_per_trigger`` bounds each window like
        Spark's per-trigger rate limits. Returns the processed windows —
        the availableNow trigger of this source."""
        done: list[tuple[int, int]] = []
        while True:
            nxt = self.pending(
                spark,
                consolidate=consolidate,
                max_commits=max_commits_per_trigger,
            )
            if nxt is None:
                return done
            diff, from_v, to_v = nxt
            fn(diff, from_v, to_v)
            self.ack(to_v)
            done.append((from_v, to_v))


class MaintainedJoinFeedDriver:
    """AvailableNow-style trigger loop wiring change feeds into a
    ``MaintainedJoinView`` (r12, VERDICT task 1 — the composition the
    reference's delegated pipeline gets from its SaaS triggers,
    README.md:6-10): every consumer no longer hand-rolls the poll loop.

    Each trigger pulls at most ``max_commits_per_trigger`` commits per
    side from the two tables' checkpointed feeds (the Spark
    ``maxFilesPerTrigger`` rate-limit shape), converts the CDF windows to
    changelog batches, applies them through the view's batch-id fence,
    and acks both feeds only AFTER the view committed. Crash ordering:

    - crash before the view commit → both windows redeliver and re-apply
      (the view never saw them);
    - crash between the view commit and the acks → both windows
      redeliver, the fence skips the replay — exactly-once effects.

    The batch id encodes both feeds' delivered positions
    (``(to_fact+1)·10^6 + (to_dim+1)``), strictly increasing whenever
    either side advances, so the single-scalar fence covers the pair.

    Scale: each trigger is one keyed diff per advanced side (cost ∝ the
    snapshots, bucket-pruned on manifest tables) plus maintain_join's
    broadcast touched-key update — no corpus shuffle, no replay of N
    changelogs (rate-limited consolidation collapses missed commits)."""

    def __init__(
        self,
        view: "MaintainedJoinView",
        fact_table,
        dim_table,
        fact_feed: ChangeFeedStream,
        dim_feed: ChangeFeedStream,
        fact_cols: Sequence[str] | None = None,
        dim_cols: Sequence[str] | None = None,
    ) -> None:
        self.view = view
        self.fact_table = fact_table
        self.dim_table = dim_table
        self.fact_feed = fact_feed
        self.dim_feed = dim_feed
        self.fact_cols = list(fact_cols) if fact_cols else None
        self.dim_cols = list(dim_cols) if dim_cols else None

    def _prep(self, df: DataFrame, cols: list | None) -> DataFrame:
        return df.select(*cols) if cols else df

    def _changelog(self, diff: DataFrame, cols: list | None) -> DataFrame:
        # a CDF window holds ≤1 row per key, so a constant ts orders it
        out = diff
        if cols:
            out = out.select(*cols, "op")
        if self.view.op_col != "op":
            out = out.withColumnRenamed("op", self.view.op_col)
        return out.withColumn(self.view.ts_col, F.lit(1).cast("long"))

    def run_available(
        self,
        spark: SparkSession,
        max_commits_per_trigger: int | None = None,
    ) -> list[dict]:
        """Drain both feeds into the view; returns one receipt per
        trigger. The availableNow trigger of this pipeline."""
        done: list[dict] = []
        while True:
            nf = self.fact_feed.pending(
                spark, max_commits=max_commits_per_trigger
            )
            nd = self.dim_feed.pending(
                spark, max_commits=max_commits_per_trigger
            )
            if nf is None and nd is None:
                return done
            f_from = nf[1] if nf else self.fact_feed.position()
            d_from = nd[1] if nd else self.dim_feed.position()
            to_f = nf[2] if nf else f_from
            to_d = nd[2] if nd else d_from
            fact_before = self._prep(
                self.fact_table.read_version(spark, f_from), self.fact_cols
            )
            dim_before = self._prep(
                self.dim_table.read_version(spark, d_from), self.dim_cols
            )
            batch_id = (to_f + 1) * 1_000_000 + (to_d + 1)
            self.view.apply_batch(
                spark,
                batch_id,
                fact_before=fact_before,
                dim_before=dim_before,
                fact_batch=(
                    self._changelog(nf[0], self.fact_cols) if nf else None
                ),
                dim_batch=(
                    self._changelog(nd[0], self.dim_cols) if nd else None
                ),
            )
            if nf:
                self.fact_feed.ack(to_f)
            if nd:
                self.dim_feed.ack(to_d)
            done.append(
                {
                    "batch_id": batch_id,
                    "fact_window": (f_from, to_f),
                    "dim_window": (d_from, to_d),
                }
            )


class MaintainedAggView:
    """A count/sum aggregate over the mirror, maintained incrementally per
    micro-batch (`operators/incremental.py maintain_agg`) instead of
    recomputed — the streaming materialized view beside the mirror.

    Exactly-once: unlike the mirror merge (latest-per-key is idempotent
    under checkpoint replay), the delta update is NOT — re-applying a batch
    double-counts. So the view records the micro-batch id in its state
    pointer (one atomic rename covers data + metadata) and ``apply_batch``
    no-ops on an already-applied id. Call it BEFORE the mirror commit in
    ``foreachBatch``: a crash between the two replays the batch, the view
    skips by id, the mirror re-merges idempotently — both end correct.

    Scale: the view state is GROUP-cardinality (tiny); the only
    corpus-sized input is the pre-batch mirror, touched by one key
    semi-join. At 100 TB the snapshot swap becomes a table-format commit
    like the mirror's.
    """

    def __init__(
        self,
        root: str,
        group_cols: str | Sequence[str],
        key_col: str,
        ts_col: str,
        sum_cols: dict[str, str],
        count_col: str = "n_rows",
        op_col: str = "op",
        delete_op: str = "D",
    ) -> None:
        self.state = ParquetStateTable(root)
        self.group_cols = (
            [group_cols] if isinstance(group_cols, str) else list(group_cols)
        )
        self.key_col = key_col
        self.ts_col = ts_col
        self.sum_cols = dict(sum_cols)
        self.count_col = count_col
        self.op_col = op_col
        self.delete_op = delete_op

    def read(self, spark: SparkSession) -> DataFrame | None:
        return self.state.read(spark)

    def _aggregate(self, df: DataFrame) -> DataFrame:
        return df.groupBy(*self.group_cols).agg(
            F.count("*").alias(self.count_col),
            *[
                F.sum(F.col(src)).alias(out)
                for out, src in self.sum_cols.items()
            ],
        )

    def apply_batch(
        self,
        spark: SparkSession,
        batch_df: DataFrame,
        batch_id: int,
        mirror_before: DataFrame | None,
    ) -> dict:
        """Advance the view through one changelog micro-batch.

        ``mirror_before`` must be the mirror state BEFORE this batch's
        merge (pass the same frame the merge reads). Replayed ``batch_id``s
        are skipped."""
        from tabular_cdc_bootstrapper_spark.operators.incremental import maintain_agg

        cur = self.state.current()
        if cur is not None and cur.get("last_batch_id", -1) >= batch_id:
            return {"skipped_replay": True, "batch_id": batch_id}
        agg_before = self.state.read(spark)
        if agg_before is None:
            base = (
                mirror_before
                if mirror_before is not None
                else batch_df.limit(0).drop(self.op_col, self.ts_col)
            )
            agg_before = self._aggregate(base)
        out = maintain_agg(
            agg_before,
            mirror_before
            if mirror_before is not None
            else batch_df.limit(0).drop(self.op_col, self.ts_col),
            batch_df,
            group_cols=self.group_cols,
            key_cols=self.key_col,
            ts_cols=self.ts_col,
            sum_cols=self.sum_cols,
            count_col=self.count_col,
            op_col=self.op_col,
            delete_op=self.delete_op,
        )
        return self.state.commit(out, meta={"last_batch_id": batch_id})


class MaintainedJoinView:
    """A materialized ``fact ⋈ dim`` inner-join view beside the mirrors,
    maintained incrementally per micro-batch (`operators/incremental.py
    maintain_join`) instead of re-joined — the streaming companion of
    MaintainedAggView for JOIN views. Either side's changelog may be None
    per batch (one-sided update, e.g. a fact stream against a
    slowly-changing dim that only sometimes ships deltas).

    Exactly-once: like the aggregate view, the delta update assumes
    ``fact_before``/``dim_before`` are the PRE-batch mirror states, so a
    replayed batch against post-merge mirrors would double-apply. The view
    records the micro-batch id in its atomic state pointer and
    ``apply_batch`` no-ops on an already-applied id; call it BEFORE the
    mirror commits in ``foreachBatch``.

    Scale: state is the view itself (join-cardinality); per batch it is
    touched only by broadcast touched-key probes (maintain_join's plan pin
    — no corpus shuffle). At 100 TB the snapshot swap becomes a
    table-format MERGE on the touched keys, exactly like the mirror's.
    """

    def __init__(
        self,
        root: str,
        fact_keys: str | Sequence[str],
        dim_keys: str | Sequence[str],
        fk_cols: str | Sequence[str],
        ts_col: str,
        op_col: str = "op",
        delete_op: str = "D",
    ) -> None:
        self.state = ParquetStateTable(root)
        self.fact_keys = fact_keys
        self.dim_keys = dim_keys
        self.fk_cols = fk_cols
        self.ts_col = ts_col
        self.op_col = op_col
        self.delete_op = delete_op

    def read(self, spark: SparkSession) -> DataFrame | None:
        return self.state.read(spark)

    def _join(self, fact: DataFrame, dim: DataFrame) -> DataFrame:
        from functools import reduce as _reduce

        fks = [self.fk_cols] if isinstance(self.fk_cols, str) else list(self.fk_cols)
        dks = [self.dim_keys] if isinstance(self.dim_keys, str) else list(self.dim_keys)
        cond = _reduce(
            lambda a, b: a & b,
            [fact[l] == dim[r] for l, r in zip(fks, dks)],
        )
        return fact.join(dim, cond)

    def apply_batch(
        self,
        spark: SparkSession,
        batch_id: int,
        fact_before: DataFrame | None,
        dim_before: DataFrame | None,
        fact_batch: DataFrame | None = None,
        dim_batch: DataFrame | None = None,
    ) -> dict:
        """Advance the view through one micro-batch of either/both
        changelogs. ``fact_before``/``dim_before`` must be the mirror
        states BEFORE this batch's merges (pass the frames the merges
        read). Replayed ``batch_id``s are skipped."""
        from tabular_cdc_bootstrapper_spark.operators.incremental import (
            maintain_join,
        )

        cur = self.state.current()
        if cur is not None and cur.get("last_batch_id", -1) >= batch_id:
            return {"skipped_replay": True, "batch_id": batch_id}

        def _empty(batch: DataFrame | None, side: str) -> DataFrame:
            if batch is None:
                raise ValueError(
                    f"{side}_before is None and no {side}_batch to derive "
                    "an empty mirror schema from"
                )
            return batch.drop(self.op_col, self.ts_col).limit(0)

        if fact_before is None:
            fact_before = _empty(fact_batch, "fact")
        if dim_before is None:
            dim_before = _empty(dim_batch, "dim")
        view_before = self.state.read(spark)
        if view_before is None:
            view_before = self._join(fact_before, dim_before)
        out = maintain_join(
            view_before,
            fact_before,
            dim_before,
            fact_batch,
            dim_batch,
            fact_keys=self.fact_keys,
            dim_keys=self.dim_keys,
            fk_cols=self.fk_cols,
            ts_cols=self.ts_col,
            op_col=self.op_col,
            delete_op=self.delete_op,
        )
        return self.state.commit(out, meta={"last_batch_id": batch_id})


class MaintainedClusterView:
    """The near-dup cluster mapping (id → component_id), maintained per
    micro-batch of candidate PAIRS — the streaming companion VERDICT r6 #6
    asked for: ``streaming_minhash_candidates`` (streaming/stateful.py)
    emits each batch's new pairs, ``foreachBatch`` hands them here, and
    ``functions/graph.update_clusters`` folds them into the standing
    mapping with delta-sized contraction rounds — never a corpus-sized
    recluster.

    Replay safety: unlike the aggregate view's delta sums, the cluster
    fold is IDEMPOTENT (re-applying an already-merged pair batch contracts
    every edge to a self-loop → empty update), so the recorded batch id is
    a work-skipping fence, not a correctness fence. It is kept anyway:
    replaying a batch through the fold costs contraction work for a
    guaranteed no-op.

    The twin law (final mapping == batch connected_components over every
    pair ever emitted) is pinned by
    tests/test_streaming_windows.py::test_maintained_cluster_view_tracks_batch.

    Scale: state is the (id, component_id) mapping — corpus-keyed but
    2-column skinny; per batch it streams map-side through the fold's two
    broadcast joins (plan-pinned) and is rewritten by the snapshot commit.
    At 100 TB the snapshot swap becomes a table-format MERGE on the
    changed component ids (update_clusters already emits exactly those
    rows); the fold math is unchanged."""

    def __init__(self, root: str) -> None:
        self.state = ParquetStateTable(root)

    def read(self, spark: SparkSession) -> DataFrame | None:
        return self.state.read(spark)

    def apply_batch(
        self, spark: SparkSession, pairs_df: DataFrame, batch_id: int
    ) -> dict:
        """Fold one micro-batch of (id_a, id_b) candidate pairs into the
        mapping. Replayed ``batch_id``s are skipped."""
        from tabular_cdc_bootstrapper_spark.functions.graph import (
            apply_cluster_update,
            connected_components,
            update_clusters,
        )

        cur = self.state.current()
        if cur is not None and cur.get("last_batch_id", -1) >= batch_id:
            return {"skipped_replay": True, "batch_id": batch_id}
        mapping = self.state.read(spark)
        held: list = []  # the fold's own persists — unpersist exactly these
        if mapping is None:
            new = connected_components(pairs_df)
        else:
            new = apply_cluster_update(
                mapping, update_clusters(mapping, pairs_df, persisted=held)
            )
        # materialize before the commit reads it twice (count + write)
        new = new.localCheckpoint(eager=True)
        out = self.state.commit(new, meta={"last_batch_id": batch_id})
        # a global clearCache here would evict every cached frame in a
        # shared session (other foreachBatch state, user caches) each
        # micro-batch (ADVICE r7) — drop only the fold's delta-sized ones
        for frame in held:
            frame.unpersist()
        return out
