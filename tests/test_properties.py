"""Property-based invariants (hypothesis) for the CDC core operators,
checked against pure-Python reference folds on arbitrary tiny change
logs — the regime where off-by-one tiebreaks and empty-group edge cases
live. Example counts are kept small (each example runs Spark jobs)."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from realtime_banking_cdc_pipeline_spark.operators.dedup import dedup_latest
from realtime_banking_cdc_pipeline_spark.operators.incremental import incremental_merge
from realtime_banking_cdc_pipeline_spark.operators.scd2 import scd2_from_change_log

T0 = dt.datetime(2024, 1, 1)

# (key, value, ts_offset_seconds) — seq is assigned by position (lsn analog)
events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),
        st.sampled_from(["a", "b", "c"]),
        st.integers(min_value=0, max_value=5),
    ),
    min_size=1,
    max_size=12,
)

_SETTINGS = settings(
    max_examples=12, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)


def _df(spark, log):
    rows = [
        (k, v, T0 + dt.timedelta(seconds=ts), seq)
        for seq, (k, v, ts) in enumerate(log)
    ]
    return spark.createDataFrame(rows, "id long, v string, ts timestamp, seq long")


def _ordered(log):
    """Reference ordering: (ts, seq) ascending per key."""
    rows = [
        {"id": k, "v": v, "ts": T0 + dt.timedelta(seconds=ts), "seq": seq}
        for seq, (k, v, ts) in enumerate(log)
    ]
    by_key: dict[int, list[dict]] = {}
    for r in sorted(rows, key=lambda r: (r["ts"], r["seq"])):
        by_key.setdefault(r["id"], []).append(r)
    return by_key


@given(events_strategy)
@_SETTINGS
def test_dedup_latest_matches_reference(spark, log):
    got = {
        r["id"]: (r["v"], r["seq"])
        for r in dedup_latest(_df(spark, log), ["id"], ["ts", "seq"]).collect()
    }
    want = {k: (rs[-1]["v"], rs[-1]["seq"]) for k, rs in _ordered(log).items()}
    assert got == want


@given(events_strategy)
@_SETTINGS
def test_scd2_replay_invariants(spark, log):
    hist = scd2_from_change_log(
        _df(spark, log), "id", "ts", ["seq"], check_cols=["v"]
    ).collect()

    # reference fold: collapse consecutive equal values per key
    want_chains = {}
    for k, rs in _ordered(log).items():
        chain = []
        for r in rs:
            if not chain or chain[-1] != r["v"]:
                chain.append(r["v"])
        want_chains[k] = chain

    by_key: dict[int, list] = {}
    for r in hist:
        by_key.setdefault(r["id"], []).append(r)
    assert set(by_key) == set(want_chains)
    for k, rows in by_key.items():
        rows.sort(key=lambda r: (r["valid_from"], r["seq"]))
        # version values match the reference collapse
        assert [r["v"] for r in rows] == want_chains[k]
        # exactly one open version, and it is the last
        assert [r["is_current"] for r in rows] == [False] * (len(rows) - 1) + [True]
        # gap-free half-open chains
        for a, b in zip(rows, rows[1:]):
            assert a["valid_to"] == b["valid_from"]
        assert rows[-1]["valid_to"] is None


@given(events_strategy, events_strategy)
@_SETTINGS
def test_incremental_merge_idempotent_and_complete(spark, log_a, log_b):
    target = dedup_latest(_df(spark, log_a), ["id"], ["ts", "seq"])
    batch = _df(spark, log_b)
    m1 = incremental_merge(target, batch, "id", order_by=["ts", "seq"])
    m2 = incremental_merge(m1, batch, "id", order_by=["ts", "seq"])
    got1 = sorted((r["id"], r["v"], r["seq"]) for r in m1.collect())
    got2 = sorted((r["id"], r["v"], r["seq"]) for r in m2.collect())
    assert got1 == got2  # idempotent under redelivery
    # recency-aware merge: per key the (ts, seq)-max image wins whether it
    # sits in the target or the batch (a stale image redelivered in a later
    # batch must NOT clobber a newer target row); batch wins exact ties
    batch_latest = {k: rs[-1] for k, rs in _ordered(log_b).items()}
    target_latest = {k: rs[-1] for k, rs in _ordered(log_a).items()}
    want = {}
    for k in set(target_latest) | set(batch_latest):
        t, b = target_latest.get(k), batch_latest.get(k)
        if t is None or (b is not None and (b["ts"], b["seq"]) >= (t["ts"], t["seq"])):
            want[k] = b
        else:
            want[k] = t
    assert {k: (v["v"], v["seq"]) for k, v in want.items()} == {
        r[0]: (r[1], r[2]) for r in got1
    }


edges_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9), st.integers(min_value=0, max_value=9)
    ),
    min_size=0,
    max_size=12,
)


@given(edges_strategy)
@_SETTINGS
def test_connected_components_matches_union_find(spark, edge_list):
    """Spark min-label propagation == classic union-find on arbitrary
    small graphs (self-loops, parallel edges, multiple components)."""
    from realtime_banking_cdc_pipeline_spark.operators.components import (
        connected_components,
    )

    nodes = list(range(10))
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edge_list:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = min node id in the component
    want = {}
    for n in nodes:
        root = find(n)
        want.setdefault(root, []).append(n)
    want = {n: min(members) for root, members in want.items() for n in members}

    edges = spark.createDataFrame(
        edge_list or [(0, 0)], "src long, dst long"
    )
    nodes_df = spark.createDataFrame([(n,) for n in nodes], "id long")
    got = {
        r["id"]: r["component"]
        for r in connected_components(edges, nodes=nodes_df).collect()
    }
    assert got == want


@given(edges_strategy)
@_SETTINGS
def test_connected_components_star_matches_union_find(spark, edge_list):
    """Star contraction == union-find on the same arbitrary graphs —
    the O(log n) variant must agree with the reference everywhere, not
    just on hand-picked chains."""
    from realtime_banking_cdc_pipeline_spark.operators.components import (
        connected_components_star,
    )

    nodes = list(range(10))
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edge_list:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {}
    comp_members: dict[int, list[int]] = {}
    for n in nodes:
        comp_members.setdefault(find(n), []).append(n)
    for members in comp_members.values():
        m = min(members)
        for n in members:
            want[n] = m

    edges = spark.createDataFrame(edge_list or [(0, 0)], "src long, dst long")
    nodes_df = spark.createDataFrame([(n,) for n in nodes], "id long")
    got = {
        r["id"]: r["component"]
        for r in connected_components_star(edges, nodes=nodes_df).collect()
    }
    assert got == want


@given(
    st.dictionaries(
        st.integers(min_value=0, max_value=7),
        st.tuples(st.integers(-3, 3), st.sampled_from(["x", "y", None])),
        max_size=8,
    ),
    st.dictionaries(
        st.integers(min_value=0, max_value=7),
        st.tuples(st.integers(-3, 3), st.sampled_from(["x", "y", None])),
        max_size=8,
    ),
)
@_SETTINGS
def test_snapshot_diff_reconciles_old_to_new(spark, old_rows, new_rows):
    """Applying the emitted change set to `old` reproduces `new`
    exactly: inserts ∪ updates (taken from new) ∪ untouched old rows
    == new; deletes remove the rest. Null-safe comparisons included."""
    from realtime_banking_cdc_pipeline_spark.operators.incremental import (
        snapshot_diff,
    )

    schema = "k long, n long, v string"
    old = spark.createDataFrame(
        [(k, a, b) for k, (a, b) in old_rows.items()] or [(999, 0, "z")], schema
    )
    new = spark.createDataFrame(
        [(k, a, b) for k, (a, b) in new_rows.items()] or [(999, 0, "z")], schema
    )
    ops = {
        r["k"]: r["op"] for r in snapshot_diff(old, new, ["k"]).collect()
    }
    old_d = dict(old_rows) if old_rows else {999: (0, "z")}
    new_d = dict(new_rows) if new_rows else {999: (0, "z")}
    rebuilt = dict(old_d)
    for k, op in ops.items():
        if op == "delete":
            rebuilt.pop(k)
        else:  # insert / update both take the row from new
            rebuilt[k] = new_d[k]
    assert rebuilt == new_d
    # and silence on identical rows: no op for unchanged keys
    for k in set(old_d) & set(new_d):
        if old_d[k] == new_d[k]:
            assert k not in ops


def test_driver_window_is_exactly_fifty():
    """The external driver strict-checks the FIRST 50 registry entries;
    the _DRIVER_VERIFIED rotation must leave EXACTLY 50 names outside —
    51 would silently exclude the newest registration from the hash
    gate (a real near-miss: a swap name that was already in the set
    made the window 51 and x_ddsketch_quantiles fell out)."""
    import realtime_banking_cdc_pipeline_spark.queries as q

    outside = [n for n in q.QUERIES if n not in q._DRIVER_VERIFIED]
    assert len(outside) == 50, outside
