"""Distributed Misra–Gries heavy hitters (mergeable frequency summaries).

The scalable one-pass answer to "which terms exceed x% of the corpus" when
an exact GROUP BY over the full key space is too wide to shuffle: each
partition keeps at most ``k`` decremented counters (Misra–Gries '82), the
per-partition summaries merge additively, and the Agarwal/Cormode/…
mergeable-summaries theorem gives the global guarantee

    every key with true frequency > n/(k+1) survives into the merged
    candidate set, undercounted by at most n/(k+1).

A second, candidate-restricted exact pass then replaces the lower-bound
estimates with exact counts, so the emitted rows are EXACT and
deterministic (partitioning only affects which *extra* sub-threshold
candidates appear, and those are filtered out by the threshold) — which is
what makes the operator oracle-checkable: DuckDB's plain
``HAVING cnt*(k+1) > n`` list must match row-for-row, and a single missing
row is a violated sketch law, not a tolerance miss.

100 TB shape: pass 1 shuffles only ``partitions × k`` summary rows (never
the key space); pass 2 is a broadcast semi-join of the candidate set
against the token stream and aggregates only candidate keys. Skew is the
operator's purpose: a hot key is one counter per partition, never a hot
shuffle group until the (tiny) candidate aggregation.

Design provenance: the reference delegates all aggregation to its SaaS
(tabular.py:58-62); this extends the engine's sketch tier (HLL distinct,
approx percentiles) with a frequency sketch.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mg_partition_summaries(tokens: DataFrame, term_col: str, k: int) -> DataFrame:
    """Pass 1: per-partition Misra–Gries summaries, ≤ k rows per partition.

    Arrow-batched: each incoming batch is counted exactly with a C-speed
    ``Counter`` over the column, merged into the partition state, then
    MG-trimmed: subtract the (k+1)-th largest count from every counter and
    drop the non-positive ones — the batch-merge generalization of the
    one-at-a-time MG decrement (each trim charges the same deduction to
    >= k+1 distinct keys, which preserves the n/(k+1) total-undercount
    bound). No per-token Python loop.

    The closure is self-contained (stdlib only, no module globals): Python
    workers must not need this package on their PYTHONPATH — the driver
    contract imports the repo by path, which executors don't inherit
    (same rule as streaming/stateful.py closures)."""

    def summarize(pdfs) -> pd.DataFrame:
        from collections import Counter as _Counter

        import pandas as _pd

        state = _Counter()
        n_seen = 0
        for pdf in pdfs:
            n_seen += len(pdf)
            state.update(_Counter(pdf[term_col].tolist()))
            if len(state) > k:
                d = sorted(state.values(), reverse=True)[k]
                state = _Counter(
                    {t: c - d for t, c in state.items() if c > d}
                )
        # one NULL-term row per partition carries its exact token count, so
        # the global n rides along with pass 1 — without it the threshold
        # would cost a THIRD full scan of the token stream
        yield _pd.DataFrame(
            {
                term_col: list(state.keys()) + [None],
                "mg_lower": list(state.values()) + [n_seen],
            }
        )

    return tokens.mapInPandas(
        summarize, schema=f"{term_col} string, mg_lower long"
    )


def heavy_hitters_exact(
    tokens: DataFrame, term_col: str = "term", k: int = 64
) -> DataFrame:
    """Two-pass exact heavy hitters: (term, cnt) for every term whose
    exact count satisfies cnt·(k+1) > n — integer-exact threshold, no
    float division. Output is deterministic and partitioning-independent
    (see module docstring)."""
    summaries = mg_partition_summaries(tokens, term_col, k)
    # EXACTLY two passes over the token stream (the theoretical minimum
    # for exact heavy hitters): pass 1 produced both the candidates and,
    # via the NULL-term partition rows, the exact global n — pass 2 is the
    # candidate-restricted exact count. summaries is persisted so its two
    # branches (candidates, n) don't re-run pass 1; it is at most
    # partitions·(k+1) rows.
    summaries = summaries.persist()
    candidates = summaries.filter(F.col(term_col).isNotNull()).groupBy(
        term_col
    ).agg(F.sum("mg_lower").alias("mg_lower"))
    n_total = summaries.filter(F.col(term_col).isNull()).agg(
        F.sum("mg_lower").alias("n")
    )
    exact = (
        tokens.join(F.broadcast(candidates.select(term_col)), term_col, "left_semi")
        .groupBy(term_col)
        .agg(F.count("*").alias("cnt"))
    )
    return (
        exact.crossJoin(F.broadcast(n_total))
        .filter(F.col("cnt") * (k + 1) > F.col("n"))
        .select(term_col, "cnt")
    )
