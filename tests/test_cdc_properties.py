"""Property-based CDC invariants (SURVEY.md §5, hypothesis):

For ANY random I/U/D event sequence:
  (i)  mirror keys == keys whose latest event is non-delete
  (ii) every mirror row equals its latest non-D event's payload
  (iii) applying the changelog is idempotent (replay-safe), and
        splitting the changelog into any prefix/suffix batches and
        merging incrementally equals the one-shot batch result.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from tabular_cdc_bootstrapper_spark.operators.cdc import apply_changelog

events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=8),  # key (small → collisions)
        st.sampled_from(["I", "U", "D"]),
        st.text(alphabet="abc", min_size=0, max_size=3),  # payload
    ),
    min_size=1,
    max_size=30,
)


def _expected(seq):
    """Reference semantics in plain Python: last event per key wins."""
    latest = {}
    for ts, (key, op, payload) in enumerate(seq):
        latest[key] = (ts, op, payload)
    return {k: (ts, payload) for k, (ts, op, payload) in latest.items() if op != "D"}


def _df(spark, seq, ts_offset=0):
    # ts is global data-time: a suffix batch must carry its original
    # positions (offset), not restart at 0 — CDC ordering is by data time.
    rows = [
        (key, op, payload, ts + ts_offset)
        for ts, (key, op, payload) in enumerate(seq)
    ]
    return spark.createDataFrame(rows, "id long, op string, payload string, ts long")


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(seq=events_strategy)
def test_mirror_matches_reference_semantics(spark, seq):
    out = apply_changelog(_df(spark, seq), "id", "ts").collect()
    got = {r["id"]: (r["ts"], r["payload"]) for r in out}
    assert got == _expected(seq)


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(seq=events_strategy, split=st.integers(min_value=0, max_value=30))
def test_incremental_merge_equals_batch(spark, seq, split):
    split = min(split, len(seq))
    full = apply_changelog(_df(spark, seq), "id", "ts")

    first = apply_changelog(_df(spark, seq[:split]), "id", "ts") if split else None
    if split and seq[split:]:
        merged = apply_changelog(
            _df(spark, seq[split:], ts_offset=split), "id", "ts", mirror=first,
        )
    elif split:
        merged = first
    else:
        merged = apply_changelog(_df(spark, seq), "id", "ts")

    as_dict = lambda df: {r["id"]: r["payload"] for r in df.collect()}
    assert as_dict(merged) == as_dict(full)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(seq=events_strategy)
def test_replay_idempotent(spark, seq):
    """Re-applying the same changelog on top of the mirror changes nothing
    (exactly-once violations must not corrupt state)."""
    df = _df(spark, seq)
    once = apply_changelog(df, "id", "ts")
    twice = apply_changelog(df, "id", "ts", mirror=once)
    a = {r["id"]: r["payload"] for r in once.collect()}
    b = {r["id"]: r["payload"] for r in twice.collect()}
    assert a == b


# --- as-of join property (operators/asof.py) -------------------------------

asof_strategy = st.tuples(
    st.lists(  # left probes: (key, ts)
        st.tuples(st.integers(1, 5), st.integers(0, 50)), min_size=1, max_size=20
    ),
    st.lists(  # right quotes: (key, ts) — value derived, (key, ts) deduped
        st.tuples(st.integers(1, 5), st.integers(0, 50)), min_size=0, max_size=20
    ),
)


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(data=asof_strategy)
def test_asof_join_matches_reference(spark, data):
    """Backward inclusive as-of join == per-row python reference: each left
    row gets the right payload with the greatest right_ts <= left_ts."""
    from tabular_cdc_bootstrapper_spark.operators.asof import as_of_join

    lefts, rights = data
    rights = list({(k, t) for (k, t) in rights})  # unique (key, ts)
    left_df = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(lefts)], "k long, ts long, rowid long"
    )
    right_df = spark.createDataFrame(
        [(k, t, k * 1000 + t) for (k, t) in rights] or [(None, None, None)],
        "k long, ts long, val long",
    )
    if not rights:
        right_df = right_df.filter(F.col("k").isNotNull())

    out = as_of_join(left_df, right_df, on="k", left_ts="ts", right_ts="ts")
    got = {r["rowid"]: r["val_asof"] for r in out.collect()}

    expected = {}
    for i, (k, t) in enumerate(lefts):
        cands = [(rt, k * 1000 + rt) for (rk, rt) in rights if rk == k and rt <= t]
        expected[i] = max(cands)[1] if cands else None
    assert got == expected


def test_asof_null_payload_is_not_skipped(spark):
    """A genuinely NULL payload on the latest preceding right row must be
    returned as NULL — not skipped in favor of an older row's value (pandas
    merge_asof / DuckDB ASOF JOIN semantics)."""
    from tabular_cdc_bootstrapper_spark.operators.asof import as_of_join

    left = spark.createDataFrame([(1, 10), (1, 25), (2, 10)], "k long, lts long")
    right = spark.createDataFrame(
        [(1, 5, "old"), (1, 20, None)], "k long, rts long, v string"
    )
    out = as_of_join(left, right, on="k", left_ts="lts", right_ts="rts")
    got = {(r["k"], r["lts"]): r["v_asof"] for r in out.collect()}
    assert got[(1, 10)] == "old"   # older row matched before the null row
    assert got[(1, 25)] is None    # latest preceding row has NULL payload
    assert got[(2, 10)] is None    # no preceding right row at all
