"""CDC core: latest-record-per-key reduction and changelog application.

This is the engine's flagship operator — the data plane the reference
*delegates* to a managed service via table properties (reference
tabular.py:58-62: ``etl.job-type=cdc``, ``cdc.type=DMS``, ``cdc.ts-column``,
``cdc.key-column``; semantics documented in the reference docstring
tabular.py:44-49: the ts column "tells tabular which records are the latest"
and the key column "whether to update or insert a row"). Here it is native
Spark.

Scale design (100 TB):

- ``strategy='max_by'`` (default): single aggregation — one shuffle on the
  key with a map-side partial, so shuffle volume is ~|distinct keys|, not
  |rows|. Note the physical op is SortAggregate (struct-typed buffers
  can't use HashAggregate's primitive mutable buffer), so each side sorts
  locally by the grouping key; the shuffle-volume reduction still
  dominates at scale, which is why this is the default.
- ``strategy='window'`` (``row_number() OVER (PARTITION BY key ORDER BY ts
  DESC)``): also one shuffle, and Spark's WindowGroupLimit prunes to the
  per-key top-1 map-side. Keeps every column without a struct round-trip;
  shuffles slightly more than max_by when many events share a key.
  Measured at sf0.1 the two are within ~10% (plan tests pin both shapes).
- Ordering is by *data time* (ts column), never arrival time, so
  late/out-of-order files resolve correctly (reference README.md:57 uses
  ``loaded_at``; batch_bootstrapper.py:21 uses ``transact_seq`` — both are
  just config here).
- Deterministic tie-breaks: callers pass ``tiebreak_cols`` (e.g. a file
  sequence number) appended to the ordering; without one, ties on (key, ts)
  would be nondeterministic under retries — SURVEY.md §7 watch list.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _as_list(x: str | Sequence[str]) -> list[str]:
    return [x] if isinstance(x, str) else list(x)


def latest_by_key(
    df: DataFrame,
    key_cols: str | Sequence[str],
    ts_cols: str | Sequence[str],
    tiebreak_cols: Sequence[str] = (),
    strategy: str = "max_by",
) -> DataFrame:
    """Reduce a change stream to the single latest row per key.

    Implements the reduction the reference configures at tabular.py:61-62
    (``cdc.ts-column`` / ``cdc.key-column``). Output columns == input
    columns, one row per distinct key.
    """
    keys = _as_list(key_cols)
    order = _as_list(ts_cols) + list(tiebreak_cols)
    if strategy == "max_by":
        payload = [c for c in df.columns if c not in keys]
        ord_col = F.struct(*[F.col(c) for c in order])
        agg = df.groupBy(*keys).agg(
            F.max_by(F.struct(*[F.col(c) for c in payload]), ord_col).alias("__latest")
        )
        # re-project in the INPUT column order — the docstring contract
        # ("output columns == input columns") and the window strategy both
        # preserve it; keys-first would misalign positional consumers
        return agg.select(
            *[
                F.col(c) if c in keys else F.col(f"__latest.{c}").alias(c)
                for c in df.columns
            ]
        )
    if strategy == "window":
        w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in order])
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    raise ValueError(f"unknown strategy {strategy!r}")


def apply_changelog(
    changelog: DataFrame,
    key_cols: str | Sequence[str],
    ts_cols: str | Sequence[str],
    op_col: str = "op",
    delete_op: str = "D",
    mirror: DataFrame | None = None,
    mirror_ts: Column | None = None,
    tiebreak_cols: Sequence[str] = (),
    strategy: str = "max_by",
    drop_envelope: Sequence[str] = (),
) -> DataFrame:
    """Apply a DMS-style I/U/D changelog, yielding the mirror's new state.

    Semantics (the reference's delegated CDC contract, tabular.py:58-62 +
    the DMS op codes written by the sample generator,
    generate_sample_dms_parquet.py:22,37,52):

    1. optionally union the existing mirror state (as implied inserts) with
       the new changelog — the recompute path of SURVEY.md §3;
    2. keep the latest event per key ordered by ts (+ tie-breaks);
    3. drop keys whose latest op is the delete op — delete-then-reinsert
       inside one batch resolves by ts, not by op (SURVEY.md §7 watch list);
    4. drop envelope columns (``table``/``op``/``ts``) for the mirror schema
       (FIXTURES.md A2).

    ``mirror_ts``: ordering value given to existing mirror rows when
    unioning (default: floor — any changelog event beats current state only
    if its ts is higher; pass a column to resume from a stored ts).
    """
    keys = _as_list(key_cols)
    ts = _as_list(ts_cols)
    # fail fast on wiring mistakes: a key/ts column the changelog doesn't
    # carry would otherwise be null-filled by the union below and the
    # merge would order by an all-NULL column — picking winners
    # arbitrarily instead of erroring (a misconfigured
    # TABULAR_CDC_TIMESTAMP_FIELD must not silently corrupt the mirror)
    missing = [c for c in (*keys, *ts) if c not in changelog.columns]
    if missing:
        raise ValueError(
            f"changelog is missing CDC column(s) {missing}; its columns "
            f"are {changelog.columns} — check the configured key/ts fields"
        )
    events = changelog
    if mirror is not None:
        base = mirror
        if op_col not in base.columns:
            base = base.withColumn(op_col, F.lit("I"))
        for c in ts:
            if c not in base.columns:
                base = base.withColumn(
                    c, mirror_ts if mirror_ts is not None else F.lit(None)
                )
        # schema evolution, both directions (the DMS reality: new files grow
        # columns, old files lack them): the merged schema is the COLUMN
        # UNION — changelog-only columns are null on mirror rows, and
        # mirror-only columns survive (dropping them would erase state for
        # keys untouched by this batch)
        events = base.unionByName(changelog, allowMissingColumns=True)
    latest = latest_by_key(events, keys, ts, tiebreak_cols, strategy)
    # null-safe: a NULL op means "not a delete" (AWS DMS full-load files
    # carry no op column, so rows read with the changelog schema surface
    # op=NULL — dropping them would delete every untouched initial-load
    # key on the first incremental merge)
    live = latest.filter(~F.col(op_col).eqNullSafe(F.lit(delete_op)))
    return live.drop(*[c for c in drop_envelope if c in live.columns])


def scd2_history(
    changelog: DataFrame,
    key_cols: str | Sequence[str],
    ts_col: str,
    op_col: str = "op",
    delete_op: str = "D",
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Materialize a type-2 slowly-changing-dimension history from the
    changelog: one row per (key, version) with ``valid_from``/``valid_to``
    validity bounds and an ``is_current`` flag.

    The mirror (``apply_changelog``) answers "what is the state NOW"; this
    answers "what was the state at time T" — the other standard consumer of
    the same DMS stream the reference wires up (tabular.py:58-62), and what
    an auditable warehouse keeps alongside the mirror.

    Semantics per key, ordered by ``ts_col`` (+ tie-breaks):
    - every non-delete event opens a version at its ts;
    - a version closes at the NEXT event's ts (any op — an update
      supersedes, a delete terminates), so intervals tile the timeline
      with no gaps or overlaps;
    - delete events emit no row of their own; a key whose last event is
      the delete op has no current version (``is_current`` all false).

    Scale shape: ONE shuffle (the per-key window); ``lead`` needs no join
    and WindowExec streams each key group. At 100 TB this is the same
    partitioning as the mirror merge, so the two outputs co-locate.
    ``valid_to`` is null while a version is open (half-open interval
    ``[valid_from, valid_to)`` when closed).
    """
    keys = _as_list(key_cols)
    order = [ts_col, *tiebreak_cols]
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).asc() for c in order])
    versions = changelog.withColumn("valid_to", F.lead(ts_col).over(w))
    return (
        versions.filter(~F.col(op_col).eqNullSafe(F.lit(delete_op)))
        .withColumn("valid_from", F.col(ts_col))
        .withColumn("is_current", F.col("valid_to").isNull())
    )
