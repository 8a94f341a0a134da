"""General multi-action MERGE — the warehouse `MERGE INTO` statement as a
composable DataFrame operator.

The reference's delegated CDC service applies exactly one hardwired merge
shape (upsert-latest + delete, `/root/reference/batch-bootstrapper/
tabular.py:58-62`); `operators/cdc.py:apply_changelog` implements that
shape. Real warehouse users also run the GENERAL form — conditional
update/delete/insert in one statement (Iceberg/Delta `MERGE INTO`). This
module provides it Spark-first:

- ONE full-outer join on the merge keys (single shuffle, the same
  partitioning the CDC merge uses — at scale both sides arrive
  pre-bucketed on the key and the exchange disappears);
- action resolution is a codegen `CASE` cascade with MERGE's standard
  precedence: matched+delete_cond → drop, matched+update_cond → update,
  matched otherwise → keep, unmatched-source+insert_cond → insert,
  unmatched-target → keep;
- `update_set` / `insert_set` values are expressions over the joined
  row, so updates can reference both sides (``F.col("qty") +
  src("delta")``).

No Python runs per row, no driver state; the output is a plain DataFrame
for the caller's sink (or `ParquetStateTable.replace` for the committed
path).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def src(name: str) -> Column:
    """Reference a SOURCE column inside merge_into conditions/update/
    insert expressions (target columns are referenced by plain name)."""
    return F.col(f"__s_{name}")


def merge_into(
    target: DataFrame,
    source: DataFrame,
    on: list[str],
    update_set: dict[str, Column] | None = None,
    update_cond: Column | None = None,
    delete_cond: Column | None = None,
    insert_cond: Column | None = None,
    insert_set: dict[str, Column] | None = None,
    validate_unique_source: bool = True,
) -> DataFrame:
    """MERGE ``source`` into ``target`` on equality of the ``on`` columns;
    returns the merged frame with exactly the target's schema.

    The source frame is internally prefixed so expressions reference
    target columns by plain name and source columns via ``src("name")``.
    Conditions default: update always, delete never, insert always —
    MERGE precedence on a matched row is delete → update → keep. An
    inserted row's value for column ``c`` is ``insert_set[c]`` when
    given, else the source column of the same name (which must then
    exist in the source schema)."""
    update_set = update_set or {}
    insert_set = insert_set or {}
    if validate_unique_source:
        # Iceberg/Delta MERGE raises on multiple source rows per target
        # key; without this gate the full-outer join silently fans the
        # target row out into duplicates. One keyed aggregate over the
        # (skinny) source — pass False to skip when the source is known
        # unique upstream.
        dup = (
            source.groupBy(*[F.col(k) for k in on])
            .agg(F.count("*").alias("__c"))
            .filter(F.col("__c") > 1)
            .head(1)
        )
        if dup:
            raise ValueError(
                f"merge_into: multiple source rows match key {dict((k, dup[0][k]) for k in on)}"
            )
    # explicit presence markers, NOT key-nullness: merge keys join
    # null-safely, so a matched row may legitimately carry NULL keys on
    # both sides — only a literal flag survives the outer join as an
    # unambiguous "this side had a row" witness
    t_marked = target.withColumn("__t_present", F.lit(True))
    s_pref = source.select(
        *[F.col(c).alias(f"__s_{c}") for c in source.columns]
    ).withColumn("__s_present", F.lit(True))
    cond = None
    for k in on:
        eq = F.col(k).eqNullSafe(src(k))
        cond = eq if cond is None else cond & eq
    j = t_marked.join(s_pref, cond, "full_outer")

    matched = F.col("__t_present").isNotNull() & F.col("__s_present").isNotNull()
    src_only = F.col("__t_present").isNull()

    # NULL-evaluating conditions must act as FALSE (standard MERGE WHEN
    # semantics and the update path's when() behavior) — without the
    # coalesce a NULL delete_cond poisons the keep filter through
    # three-valued logic and silently drops the row
    upd = F.coalesce(update_cond, F.lit(False)) if update_cond is not None else F.lit(True)
    dele = F.coalesce(delete_cond, F.lit(False)) if delete_cond is not None else F.lit(False)
    ins = F.coalesce(insert_cond, F.lit(False)) if insert_cond is not None else F.lit(True)

    keep = ~(matched & dele) & ~(src_only & ~ins)
    out_cols = []
    for c in target.columns:
        updated = update_set.get(c, F.col(c))
        inserted = insert_set.get(c, src(c))
        out_cols.append(
            F.when(matched & ~dele & upd, updated)
            .when(src_only & ins, inserted)
            .otherwise(F.col(c))
            .alias(c)
        )
    return j.filter(keep).select(*out_cols)
