"""Property-based tests (hypothesis): the Spark operators must agree
with straightforward single-machine reference implementations on
arbitrary small inputs — the same oracle idea as the DuckDB gate, but
adversarial instead of fixed."""

import datetime as dt

from hypothesis import given, settings, strategies as st

from etl_jlp_spark.operators.sessionize import (
    SESSION_GAP_S,
    with_session_id,
    with_time_on_page,
)

BASE = dt.datetime(2024, 1, 1)

events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),  # user_id
        st.integers(min_value=0, max_value=10_000),  # offset seconds
    ),
    min_size=1,
    max_size=25,
)


def _ref_sessions(rows):
    """Reference: per user, sorted by (ts, event_id); gap > 1800s → new."""
    out = {}
    by_user = {}
    for eid, (u, s) in enumerate(rows):
        by_user.setdefault(u, []).append((s, eid))
    for u, evs in by_user.items():
        evs.sort()
        sid, prev = 0, None
        for s, eid in evs:
            if prev is None or (s - prev) > SESSION_GAP_S:
                sid += 1
            out[eid] = sid
            prev = s
    return out


@settings(max_examples=15, deadline=None)
@given(events_strategy)
def test_sessionize_matches_reference(spark, rows):
    df = spark.createDataFrame(
        [(eid, u, BASE + dt.timedelta(seconds=s)) for eid, (u, s) in enumerate(rows)],
        "event_id long, user_id long, ts timestamp",
    )
    got = {r["event_id"]: r["session_id"] for r in with_session_id(df).collect()}
    assert got == _ref_sessions(rows)


@settings(max_examples=15, deadline=None)
@given(events_strategy)
def test_time_on_page_invariants(spark, rows):
    df = spark.createDataFrame(
        [(eid, u, BASE + dt.timedelta(seconds=s)) for eid, (u, s) in enumerate(rows)],
        "event_id long, user_id long, ts timestamp",
    )
    res = with_time_on_page(df).collect()
    assert len(res) == len(rows)
    by_user = {}
    for r in res:
        by_user.setdefault(r["user_id"], []).append(r)
    for user_rows in by_user.values():
        user_rows.sort(key=lambda r: (r["ts"], r["event_id"]))
        # capped never exceeds cap; raw never negative; exactly the last
        # event per user carries the 1800s default-or-real rule
        for i, r in enumerate(user_rows):
            assert r["capped_time_on_page"] <= 3600.0
            assert r["raw_time_on_page"] >= 0.0
            if i < len(user_rows) - 1:
                nxt = user_rows[i + 1]
                want = (nxt["ts"] - r["ts"]).total_seconds()
                assert abs(r["raw_time_on_page"] - want) < 1e-6
            else:
                assert r["raw_time_on_page"] == 1800.0
