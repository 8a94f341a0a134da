"""Custom stateful streaming operators via applyInPandasWithState
(SURVEY.md §2.9 T3 — the pure-streaming alternative to foreachBatch).

``running_latest_by_key`` is the streaming CDC dedup: per key, state holds
the (ts, payload) of the best event seen so far; each micro-batch emits the
keys whose latest row CHANGED, i.e. an upsert changelog for a downstream
sink. This trades the foreachBatch table merge for executor-local state —
preferable when the mirror is consumed as a stream (e.g. feeding a cache)
rather than as a table; the table path (streaming/pipeline.py) remains the
default for 100 TB state because state store size is bounded by executor
storage (SURVEY.md §7 watch list).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_latest_by_key(
    events: DataFrame,
    key_col: str = "id",
    ts_col: str = "ts",
    payload_col: str = "name",
    op_col: str = "op",
    delete_op: str = "D",
) -> DataFrame:
    """Streaming latest-per-key with I/U/D semantics.

    Output rows: (key, ts, payload, live) — one per key whose resolved
    state changed in the micro-batch; ``live=false`` means the key's latest
    event is a delete (downstream sinks drop it).

    Closure is self-contained (no module imports on workers).
    """
    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("ts", T.StringType()),
            T.StructField("payload", T.StringType()),
            T.StructField("live", T.BooleanType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("ts", T.StringType()),
            T.StructField("payload", T.StringType()),
            T.StructField("live", T.BooleanType()),
        ]
    )

    def update(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        best_ts, best_payload, best_live = (
            state.get if state.exists else (None, None, None)
        )
        changed = False
        # vectorized per-batch reduce: idxmax picks the FIRST max row (same
        # tie-break as a strict `>` scan in batch order), then one scalar
        # compare against state — no per-row Python loop
        for pdf in pdfs:
            if pdf.empty:
                continue
            row = pdf.loc[pdf[ts_col].idxmax()]
            ts, payload, op = row[ts_col], row[payload_col], row[op_col]
            if best_ts is None or ts > best_ts:
                best_ts, best_payload = ts, payload
                best_live = op != delete_op
                changed = True
        if changed:
            state.update((best_ts, best_payload, best_live))
            yield _pd.DataFrame(
                {
                    "id": [key[0]],
                    "ts": [best_ts],
                    "payload": [best_payload],
                    "live": [best_live],
                }
            )

    return events.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_funnel(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    stages: tuple[str, str, str] = ("view", "click", "purchase"),
) -> DataFrame:
    """Streaming twin of the batch ``event_funnel`` state machine
    (queries.py): per user, stage i is reached only by hitting its event
    AFTER stage i-1 — an ORDER-SENSITIVE reduction, so unlike the window
    aggregations it cannot just fold events in arrival order.

    Out-of-order safety comes from watermark-buffered replay: each user's
    state holds a pending buffer of (ts, event_id, type) plus the stage
    flags; every invocation drains the pending events whose event time is
    at or below the CURRENT watermark in (ts, event_id) order through the
    state machine, and keeps the rest buffered. An event can only be
    reordered against neighbors still above the watermark, and those are
    all still in the buffer — so the replayed order equals the batch sort
    order, and the flags match the batch funnel exactly for every event
    the watermark has passed. EventTimeTimeout re-invokes users with
    buffered events when the watermark advances past them, even if the
    micro-batch carries no new rows for that user.

    State size is bounded by (watermark delay × per-user event rate) — the
    same bound every watermarked streaming agg carries, NOT the full
    per-user history; at 100 TB/day with a 30-min delay a user's buffer is
    minutes of their own events.

    Output (update mode): one row per user per invocation where the flags
    advanced or newly-passed events were consumed — (user_id, reached_1,
    reached_2, reached_3, n_processed). ``n_processed`` increases
    monotonically, so "latest row per user" = max n_processed.

    Requires ``events.withWatermark(ts_col, ...)`` upstream (EventTimeTimeout).

    Restart semantics (pinned by
    test_streaming_funnel_recovers_from_restart): state (flags + buffer)
    and the watermark are restored from the checkpoint, and with
    EventTimeTimeout the ENGINE drops post-restart input older than the
    restored watermark before this function sees it — standard late-data
    semantics, so events delayed past the watermark during downtime are
    lost like any other too-late event. Within a single availableNow run
    the pre-planned file batches share the run-start watermark, which is
    why fully time-interleaved files replay losslessly in one run.
    """
    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("reached_1", T.IntegerType()),
            T.StructField("reached_2", T.IntegerType()),
            T.StructField("reached_3", T.IntegerType()),
            T.StructField("n_processed", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("pend_ts", T.ArrayType(T.LongType())),  # µs epoch
            T.StructField("pend_eid", T.ArrayType(T.LongType())),
            T.StructField("pend_type", T.ArrayType(T.StringType())),
            T.StructField("r1", T.IntegerType()),
            T.StructField("r2", T.IntegerType()),
            T.StructField("r3", T.IntegerType()),
            T.StructField("n_processed", T.LongType()),
        ]
    )
    s1, s2, s3 = stages

    def update(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        if state.exists:
            pend_ts, pend_eid, pend_type, r1, r2, r3, done = state.get
            pend = list(zip(pend_ts, pend_eid, pend_type))
        else:
            pend, r1, r2, r3, done = [], 0, 0, 0, 0

        for pdf in pdfs:
            for ts, eid, et in zip(pdf[ts_col], pdf[id_col], pdf[type_col]):
                # pandas Timestamp → integer µs; buffered as longs so the
                # state row stays flat/arrow-friendly
                pend.append((int(ts.value) // 1000, int(eid), str(et)))

        wm_us = state.getCurrentWatermarkMs() * 1000
        ready = sorted(e for e in pend if e[0] <= wm_us)
        pend = [e for e in pend if e[0] > wm_us]

        advanced = False
        for _ts, _eid, et in ready:
            if et == s1 and not r1:
                r1, advanced = 1, True
            elif et == s2 and r1 and not r2:
                r2, advanced = 1, True
            elif et == s3 and r2 and not r3:
                r3, advanced = 1, True
        done += len(ready)

        state.update(
            (
                [e[0] for e in pend],
                [e[1] for e in pend],
                [e[2] for e in pend],
                r1,
                r2,
                r3,
                done,
            )
        )
        if pend:
            # wake this user when the watermark moves, even with no new
            # rows — must be strictly above the current watermark
            state.setTimeoutTimestamp(wm_us // 1000 + 1)
        if ready or advanced:
            yield _pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "reached_1": [r1],
                    "reached_2": [r2],
                    "reached_3": [r3],
                    "n_processed": [done],
                }
            )

    return events.groupBy(user_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def running_cohort_activity(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    signup_type: str = "signup",
) -> DataFrame:
    """Streaming twin of the batch ``cohort_retention`` query: emits each
    user's DISTINCT (cohort_week, week_offset) activity cells exactly once;
    a downstream aggregation (foreachBatch, or the test harness) counts
    rows per cell to get n_active — counting rows of an exactly-once
    distinct stream needs no streaming COUNT(DISTINCT), which update-mode
    chaining disallows.

    Batch semantics replicated: cohort_week = ISO-Monday week of the
    user's EARLIEST signup; a non-signup event at ts counts iff
    ts >= that signup. Correctness under out-of-order arrival uses the
    same watermark-buffered replay as ``running_funnel``: an event is
    only attributed once the watermark passes it, at which point every
    signup at-or-before it has arrived, so the earliest-signup decision
    is final (the global signup MIN can only be lowered by events the
    watermark has not passed yet — and those can never matter for an
    already-drained activity row, since a qualifying signup must be ≤ the
    activity's own event time).

    State per user: earliest signup (µs), the set of week offsets already
    emitted (bounded: one int per active week), and the watermark buffer.
    """
    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("cohort_week", T.StringType()),
            T.StructField("week_offset", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("pend_ts", T.ArrayType(T.LongType())),  # µs epoch
            T.StructField("pend_type", T.ArrayType(T.StringType())),
            T.StructField("signup_us", T.LongType()),
            T.StructField("emitted", T.ArrayType(T.LongType())),
            T.StructField("n_processed", T.LongType()),
        ]
    )

    def update(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import datetime as _dt

        import pandas as _pd

        _EPOCH = _dt.datetime(1970, 1, 1)

        def _monday(us: int) -> _dt.date:
            d = (_EPOCH + _dt.timedelta(microseconds=us)).date()
            return d - _dt.timedelta(days=d.weekday())

        if state.exists:
            pend_ts, pend_type, signup_us, emitted_l, done = state.get
            pend = list(zip(pend_ts, pend_type))
            emitted = set(emitted_l)
        else:
            pend, signup_us, emitted, done = [], None, set(), 0

        for pdf in pdfs:
            for ts, et in zip(pdf[ts_col], pdf[type_col]):
                pend.append((int(ts.value) // 1000, str(et)))

        wm_us = state.getCurrentWatermarkMs() * 1000
        ready = [e for e in pend if e[0] <= wm_us]
        pend = [e for e in pend if e[0] > wm_us]

        # Two passes, not one time-sorted scan: batch semantics attribute
        # an activity at the SAME µs as the earliest signup (ts >= signup
        # is inclusive), so every drained signup must lower signup_us
        # BEFORE any drained activity is judged. Ordering within the
        # drain is otherwise irrelevant here (unlike the funnel) — the
        # attribution predicate only compares against the global min, and
        # any signup still above the watermark has ts > wm >= every
        # drained activity's ts, so it can never affect these decisions.
        for ts_us, et in ready:
            if et == signup_type and (signup_us is None or ts_us < signup_us):
                signup_us = ts_us
        new_cells = []
        for ts_us, et in ready:
            if (
                et != signup_type
                and signup_us is not None
                and ts_us >= signup_us
            ):
                off = (_monday(ts_us) - _monday(signup_us)).days // 7
                if off not in emitted:
                    emitted.add(off)
                    new_cells.append(off)
        done += len(ready)

        state.update(
            (
                [e[0] for e in pend],
                [e[1] for e in pend],
                signup_us,
                sorted(emitted),
                done,
            )
        )
        if pend:
            state.setTimeoutTimestamp(wm_us // 1000 + 1)
        if new_cells:
            week = _monday(signup_us).strftime("%Y-%m-%d")
            yield _pd.DataFrame(
                {
                    "user_id": [key[0]] * len(new_cells),
                    "cohort_week": [week] * len(new_cells),
                    "week_offset": new_cells,
                }
            )

    return events.groupBy(user_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def streaming_minhash_candidates(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    max_bucket_size: int = 200,
) -> DataFrame:
    """Streaming MinHash-LSH candidate pairs — the cross-micro-batch twin
    of ``functions.dedup.minhash_candidates`` (same signatures, same
    ``band_explode`` hashes, same skew cap). State per (band_id, band_hash)
    bucket holds the sorted doc-id membership; a document arriving in a
    LATER batch than its near-duplicate still pairs with it, which batch
    re-runs can only do by re-reading the whole corpus.

    Emits (id_a, id_b) with id_a < id_b. Divergences from the batch
    operator, both inherent to append streams and pinned by the twin test:

    - a pair that collides in SEVERAL bands (or whose doc ids are re-sent)
      is emitted once per colliding bucket — batch ends with .distinct();
      streaming downstream consumers dedupe (candidate verification is
      idempotent, so duplicates cost work, never correctness);
    - ``max_bucket_size`` is prefix-monotone: a bucket STOPS emitting once
      its cumulative membership exceeds the cap (state drops to a
      saturated marker, freeing the id list), but pairs already emitted
      while it was small are not retractable. Batch, seeing the final
      membership, drops such a bucket wholly.

    100 TB shape: state is bounded by max_bucket_size ids per bucket and
    saturation truncates hot buckets (boilerplate) to a 1-bit marker, so
    state-store growth tracks DISTINCT healthy buckets, not corpus size or
    skew."""
    from tabular_cdc_bootstrapper_spark.functions.dedup import (
        band_explode,
        minhash_signatures_df,
    )

    sigs = minhash_signatures_df(docs, text_col, id_col, k, num_hashes)
    exploded = band_explode(sigs, num_hashes, bands)

    out_schema = T.StructType(
        [
            T.StructField("id_a", T.LongType()),
            T.StructField("id_b", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("ids", T.ArrayType(T.LongType())),
            T.StructField("saturated", T.BooleanType()),
        ]
    )

    def update(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import itertools as _it

        import pandas as _pd

        prior, saturated = state.get if state.exists else ([], False)
        prior = list(prior or [])
        seen = set(prior)
        new = sorted(
            {int(v) for pdf in pdfs for v in pdf["id"]} - seen
        )
        if not new:
            return
        if saturated or len(prior) + len(new) > max_bucket_size:
            # hot bucket: stop pairing, keep only the 1-bit marker
            state.update(([], True))
            return
        pairs = [
            (a, b) if a < b else (b, a) for a in prior for b in new
        ] + list(_it.combinations(new, 2))
        state.update((sorted(prior + new), False))
        if pairs:
            yield _pd.DataFrame(pairs, columns=["id_a", "id_b"])

    # append, not update: emitted pairs are immutable facts (never revised
    # in a later batch), which also lets the query run under the memory
    # sink's Append mode
    return exploded.groupBy("band_id", "band_hash").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_span_duplicates(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    w: int = 40,
    s: int = 10,
) -> DataFrame:
    """Streaming sub-document duplicate detector — the cross-micro-batch
    twin of the batch winnowed-span dedup (same span_fingerprints_df
    hashes). Emits (span_hash, doc_id) for every document that carries a
    span some OTHER document already contributed: when a fingerprint
    bucket sees its second distinct document, the first holder is emitted
    retroactively alongside it; later holders emit as they arrive. Grouped
    by span_hash, the emitted doc sets equal the batch operator's
    duplicated-span membership (twin test).

    State per fingerprint is CONSTANT — (first_id, emitted_first), never a
    membership list — so a boilerplate span seen in millions of documents
    costs 17 bytes of state while emitting each document once under the
    exactly-once upstream this repo's checkpointed file source provides
    (each (doc, span) row exists once thanks to the per-doc
    array_distinct, and arrival is the dedup). Under an AT-LEAST-ONCE
    upstream (e.g. Kafka redelivery) a replayed non-first holder re-emits
    — constant state cannot remember every emitted id — so such deploys
    dedupe downstream on (span_hash, doc_id); only the first holder's
    replay is absorbed by the state."""
    from tabular_cdc_bootstrapper_spark.functions.dedup import (
        span_fingerprints_df,
    )

    fps = span_fingerprints_df(docs, text_col, id_col, w, s)

    out_schema = T.StructType(
        [
            T.StructField("span_hash", T.StringType()),
            T.StructField("doc_id", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("first_id", T.LongType()),
            T.StructField("emitted_first", T.BooleanType()),
        ]
    )

    def update(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        first_id, emitted_first = state.get if state.exists else (None, False)
        new = sorted({int(v) for pdf in pdfs for v in pdf["id"]})
        if first_id is not None:
            new = [i for i in new if i != first_id]
        if not new:
            return
        out: list[int] = []
        if first_id is None:
            first_id = new[0]
            new = new[1:]
        if new and not emitted_first:
            out.append(first_id)
            emitted_first = True
        out.extend(new)
        state.update((first_id, emitted_first))
        if out:
            yield _pd.DataFrame(
                {"span_hash": [key[0]] * len(out), "doc_id": out}
            )

    return fps.groupBy("span_hash").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_mg_heavy_hitters(
    tokens: DataFrame,
    term_col: str = "term",
    k: int = 64,
    n_shards: int = 16,
) -> DataFrame:
    """Streaming Misra–Gries heavy-hitter candidates — the cross-micro-
    batch twin of ``functions.heavyhitters.mg_partition_summaries``. MG is
    the streaming-native frequency sketch (it was designed for one-pass
    streams), so the streaming form is the HOME form: state per term-hash
    SHARD holds one MG summary (≤ k counters plus the shard's exact token
    count), each micro-batch's counts merge in with the same batch-merge
    trim the batch operator uses, and the mergeable-summaries law
    carries over unchanged:

        after any prefix of the stream, every term whose count so far
        exceeds n/(k+1) is present in its shard's summary

    — because a term's entire count lands in ONE shard (shard = hash of
    the term), and n_shard ≤ n makes the per-shard bound only tighter.
    The twin test pins exactly this: final streamed candidates ⊇ the
    batch two-pass exact heavy hitters on the same corpus fed across a
    micro-batch split.

    Emission: each batch a shard receives data, it re-emits its FULL
    current summary tagged with the monotonically increasing ``n_shard``,
    PLUS one NULL-term row carrying the shard's exact token count (the
    batch operator's partition-row invariant) — so even a batch whose
    trim empties the summary still versions the shard. Downstream (and
    the test) keep the rows with each shard's max n_shard — a changelog
    of sketch versions, which is what a serving layer polls. Exact counts
    still need the candidate-restricted second pass (batch
    heavy_hitters_exact) — the stream maintains the candidate set and
    lower bounds, which is the part that must see every token.

    100 TB shape: state is ≤ n_shards·k counters TOTAL (constant in
    corpus size and skew — a hot term is one counter); the only shuffle
    is the shard partitioning; n_shards spreads merge work and keeps any
    single summary's Arrow batch tiny."""
    from pyspark.sql import functions as F

    sharded = tokens.select(
        F.col(term_col).alias("term"),
        # pmod, not abs(...)%n — the house bucketing idiom
        # (streaming/pipeline.py): abs(Long.MIN_VALUE) overflows under
        # ANSI mode and stays negative otherwise
        F.pmod(F.xxhash64(term_col), F.lit(n_shards)).alias("shard"),
    )

    out_schema = T.StructType(
        [
            T.StructField("shard", T.LongType()),
            T.StructField("term", T.StringType()),
            T.StructField("mg_lower", T.LongType()),
            T.StructField("n_shard", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("terms", T.ArrayType(T.StringType())),
            T.StructField("counts", T.ArrayType(T.LongType())),
            T.StructField("n_shard", T.LongType()),
        ]
    )

    def update(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        from collections import Counter as _Counter

        import pandas as _pd

        terms, counts, n_shard = (
            state.get if state.exists else ([], [], 0)
        )
        summary = _Counter(dict(zip(list(terms or []), list(counts or []))))
        seen = 0
        for pdf in pdfs:
            seen += len(pdf)
            summary.update(_Counter(pdf["term"].tolist()))
            if len(summary) > k:
                # batch-merge MG trim: subtracting the (k+1)-th largest
                # count charges the same deduction to >= k+1 distinct
                # keys, preserving the n/(k+1) total-undercount bound
                d = sorted(summary.values(), reverse=True)[k]
                summary = _Counter(
                    {t: c - d for t, c in summary.items() if c > d}
                )
        if not seen:
            return
        n_shard = int(n_shard) + seen
        state.update(
            (list(summary.keys()), [int(c) for c in summary.values()], n_shard)
        )
        # same invariant as the batch operator's NULL-term partition row:
        # ALWAYS emit one NULL-term marker row. Without it, a batch whose
        # trim empties the summary (>k equal counts — e.g. all-unique
        # tokens) would emit ZERO rows, the new n_shard would never reach
        # consumers, and the max-n_shard protocol would keep serving the
        # previous batch's counters as current. Unlike the batch
        # operator's 2-column schema (where the NULL-term row must carry
        # n in mg_lower), this schema has a dedicated n_shard column on
        # EVERY row — so the marker's mg_lower is NULL, never a count: a
        # consumer that sums mg_lower without filtering term IS NULL gets
        # the correct total instead of one inflated by n_shard per shard.
        yield _pd.DataFrame(
            {
                "shard": [int(key[0])] * (len(summary) + 1),
                "term": list(summary.keys()) + [None],
                "mg_lower": [int(c) for c in summary.values()] + [None],
                "n_shard": [n_shard] * (len(summary) + 1),
            }
        )

    return sharded.groupBy("shard").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_event_mix_drift(events: DataFrame) -> DataFrame:
    """Streaming twin of queries.event_mix_drift: the weekly event-type
    mix vs ALL history seen so far, recomputed exactly as each micro-batch
    lands — the always-on form of the instrumentation-breakage monitor
    (the batch query answers "was last week broken?", this one pages you
    DURING the broken week).

    State is the full (week, event_type) count table — weeks × types
    rows, KB at any corpus size, so unlike the token-drift twin there is
    no sketch compromise: the stream maintains the exact counts and the
    drift table it emits each batch is bit-identical to running the batch
    query over everything ingested so far (Python-int arithmetic inside
    the update = the same exact-integer TV formula; the twin test pins
    final emission == batch query output). All weeks land in ONE state
    group (key = lit(0)): TV needs the global totals, and the whole state
    is small enough that sharding would only add a merge step.

    Emission: the complete current drift table tagged with ``version`` =
    total events seen (strictly increasing per batch); consumers keep the
    max-version rows, same protocol as streaming_mg_heavy_hitters."""
    from pyspark.sql import functions as F

    weekly = events.select(
        F.to_date(F.date_trunc("week", "ts")).cast("string").alias("week"),
        "event_type",
    )

    out_schema = T.StructType(
        [
            T.StructField("week", T.StringType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("tv_ppm", T.LongType()),
            T.StructField("version", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("weeks", T.ArrayType(T.StringType())),
            T.StructField("types", T.ArrayType(T.StringType())),
            T.StructField("counts", T.ArrayType(T.LongType())),
        ]
    )

    def update(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        from collections import Counter as _Counter

        import pandas as _pd

        weeks, types, counts = state.get if state.exists else ([], [], [])
        table = _Counter(
            dict(zip(zip(list(weeks or []), list(types or [])), list(counts or [])))
        )
        seen = 0
        for pdf in pdfs:
            seen += len(pdf)
            table.update(_Counter(zip(pdf["week"].tolist(), pdf["event_type"].tolist())))
        if not seen:
            return
        state.update(
            (
                [w for (w, _t2) in table],
                [t2 for (_w, t2) in table],
                [int(c) for c in table.values()],
            )
        )
        # exact-integer TV per week vs the full history — Python ints, so
        # no widening concern at any scale
        n_w: dict[str, int] = {}
        c_e: dict[str, int] = {}
        for (w, t2), c in table.items():
            n_w[w] = n_w.get(w, 0) + c
            c_e[t2] = c_e.get(t2, 0) + c
        n = sum(c_e.values())
        rows = []
        for w, nw in n_w.items():
            num = sum(
                abs(table.get((w, t2), 0) * n - ce * nw) for t2, ce in c_e.items()
            )
            rows.append((w, nw, (num * 1_000_000) // (2 * nw * n)))
        rows.sort()
        yield _pd.DataFrame(
            {
                "week": [r[0] for r in rows],
                "n_events": [r[1] for r in rows],
                "tv_ppm": [r[2] for r in rows],
                "version": [n] * len(rows),
            }
        )

    return weekly.withColumn("g", F.lit(0)).groupBy("g").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
