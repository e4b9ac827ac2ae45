"""Time-respecting earliest-arrival reachability (algorithms/temporal.py)."""

import heapq


def _brute(tedges, verts, source, start):
    """Temporal Dijkstra: label-setting on earliest arrival."""
    out = {}
    for s, d, t in tedges:
        out.setdefault(s, []).append((d, t))
    arr = {v: None for v in verts}
    arr[source] = start
    pq = [(start, source)]
    while pq:
        a, u = heapq.heappop(pq)
        if arr[u] is not None and a > arr[u]:
            continue
        for v, t in out.get(u, []):
            if t >= a and (arr[v] is None or t < arr[v]):
                arr[v] = t
                heapq.heappush(pq, (t, v))
    return arr


# a path 0->1->2 whose edges occur IN order, and 0->3->4 whose edges
# occur OUT of order (static reach says yes, temporal must say no);
# plus a later second occurrence of (3,4) that becomes usable
TEDGES = [
    (0, 1, 5), (1, 2, 7),          # respects time: 5 <= 7
    (0, 3, 10), (3, 4, 2),         # violates: 2 < 10
    (3, 4, 12),                    # second occurrence, usable
    (2, 0, 1),                     # back edge too early to matter
    (5, 6, 3),                     # disconnected from source
]
VERTS = list(range(7))


class TestTemporal:
    def test_matches_bruteforce(self, spark):
        from linkgraph.algorithms.temporal import temporal_earliest_arrival

        e = spark.createDataFrame(TEDGES, "src long, dst long, t long")
        v = spark.createDataFrame([(x,) for x in VERTS], "id long")
        got, res = temporal_earliest_arrival(e, source=0, vertices=v)
        arr = {r["id"]: r["arrival"] for r in got.collect()}
        assert arr == _brute(TEDGES, VERTS, 0, 0)
        assert res.converged
        # the out-of-order path is rescued only by the t=12 recurrence
        assert arr[4] == 12
        assert arr[5] is None and arr[6] is None

    def test_static_reachable_temporally_not(self, spark):
        from linkgraph.algorithms.temporal import temporal_earliest_arrival

        e = spark.createDataFrame(
            [(0, 1, 10), (1, 2, 4)], "src long, dst long, t long"
        )
        got, _ = temporal_earliest_arrival(e, source=0)
        arr = {r["id"]: r["arrival"] for r in got.collect()}
        assert arr[1] == 10 and arr[2] is None

    def test_start_time_gates_first_edge(self, spark):
        from linkgraph.algorithms.temporal import temporal_earliest_arrival

        e = spark.createDataFrame([(0, 1, 3)], "src long, dst long, t long")
        got, _ = temporal_earliest_arrival(e, source=0, start_time=5)
        arr = {r["id"]: r["arrival"] for r in got.collect()}
        assert arr[0] == 5 and arr[1] is None

    def test_equal_time_chain_allowed(self, spark):
        """Non-strict monotonicity: equal timestamps chain."""
        from linkgraph.algorithms.temporal import temporal_earliest_arrival

        e = spark.createDataFrame(
            [(0, 1, 4), (1, 2, 4), (2, 3, 4)], "src long, dst long, t long"
        )
        got, _ = temporal_earliest_arrival(e, source=0)
        arr = {r["id"]: r["arrival"] for r in got.collect()}
        assert arr == {0: 0, 1: 4, 2: 4, 3: 4}

    def test_later_decrease_reopens_guarded_edge(self, spark):
        """A vertex whose arrival improves must re-scatter edges whose
        guard previously failed: 0->1 at 9 first, then the cheaper
        0->2->1 path (arr 1 drops to 6) unlocks (1, 3, 7)."""
        from linkgraph.algorithms.temporal import temporal_earliest_arrival

        tedges = [(0, 1, 9), (0, 2, 1), (2, 1, 6), (1, 3, 7)]
        e = spark.createDataFrame(tedges, "src long, dst long, t long")
        got, _ = temporal_earliest_arrival(e, source=0)
        arr = {r["id"]: r["arrival"] for r in got.collect()}
        assert arr == _brute(tedges, [0, 1, 2, 3], 0, 0)
        assert arr[1] == 6 and arr[3] == 7


def _brute_dep(tedges, verts, target, deadline):
    """Reverse label-setting on latest departure."""
    import heapq as hq

    inc = {}
    for s, d, t in tedges:
        inc.setdefault(d, []).append((s, t))
    dep = {v: None for v in verts}
    dep[target] = deadline
    pq = [(-deadline, target)]
    while pq:
        nd, v = hq.heappop(pq)
        d = -nd
        if dep[v] is not None and d < dep[v]:
            continue
        for u, t in inc.get(v, []):
            if t <= d and (dep[u] is None or t > dep[u]):
                dep[u] = t
                hq.heappush(pq, (-t, u))
    return dep


class TestLatestDeparture:
    def test_matches_bruteforce(self, spark):
        from linkgraph.algorithms.temporal import temporal_latest_departure

        e = spark.createDataFrame(TEDGES, "src long, dst long, t long")
        v = spark.createDataFrame([(x,) for x in VERTS], "id long")
        got, res = temporal_latest_departure(
            e, target=4, deadline=100, vertices=v
        )
        dep = {r["id"]: r["departure"] for r in got.collect()}
        assert dep == _brute_dep(TEDGES, VERTS, 4, 100)
        assert res.converged
        # 3 can leave as late as t=12 (the second (3,4) occurrence);
        # 0 must leave by t=10 (0->3 at 10, then 3->4 at 12)
        assert dep[3] == 12 and dep[0] == 10

    def test_unbounded_deadline_target_null(self, spark):
        from linkgraph.algorithms.temporal import temporal_latest_departure

        e = spark.createDataFrame([(0, 1, 5)], "src long, dst long, t long")
        got, _ = temporal_latest_departure(e, target=1)
        dep = {r["id"]: r["departure"] for r in got.collect()}
        assert dep[0] == 5 and dep[1] is None

    def test_deadline_excludes_late_edges(self, spark):
        from linkgraph.algorithms.temporal import temporal_latest_departure

        e = spark.createDataFrame(
            [(0, 1, 5), (0, 1, 50)], "src long, dst long, t long"
        )
        got, _ = temporal_latest_departure(e, target=1, deadline=10)
        dep = {r["id"]: r["departure"] for r in got.collect()}
        assert dep[0] == 5 and dep[1] == 10

    def test_duality_with_earliest_arrival(self, spark):
        """u reaches v temporally iff v's latest-departure set (with
        unbounded deadline) contains u — check against earliest
        arrival's reachable set on the shared fixture."""
        from linkgraph.algorithms.temporal import (
            temporal_earliest_arrival,
            temporal_latest_departure,
        )

        e = spark.createDataFrame(TEDGES, "src long, dst long, t long")
        v = spark.createDataFrame([(x,) for x in VERTS], "id long")
        arr, _ = temporal_earliest_arrival(e, source=0, vertices=v, start_time=0)
        reach_fwd = {r["id"] for r in arr.collect() if r["arrival"] is not None}
        dep, _ = temporal_latest_departure(e, target=4, deadline=10**9, vertices=v)
        reach_bwd = {r["id"] for r in dep.collect() if r["departure"] is not None}
        # 0 reaches 4 (via 3 at t=12), so 0 must be in 4's backward set
        assert 4 in reach_fwd and 0 in reach_bwd

    def test_negative_timestamps(self, spark):
        """Negative epochs are legal BIGINT timestamps; the old -1
        'unreachable' sentinel silently shadowed departures <= -1
        (ADVICE r3). A chain living entirely at negative times must
        report real negative departure/arrival values, not NULL."""
        from linkgraph.algorithms.temporal import (
            temporal_earliest_arrival,
            temporal_latest_departure,
        )

        tedges = [(0, 1, -50), (1, 2, -10), (3, 2, -100)]
        e = spark.createDataFrame(tedges, "src long, dst long, t long")
        v = spark.createDataFrame([(x,) for x in range(4)], "id long")
        dep, _ = temporal_latest_departure(e, target=2, deadline=-5, vertices=v)
        d = {r["id"]: r["departure"] for r in dep.collect()}
        assert d[1] == -10 and d[0] == -50 and d[3] == -100 and d[2] == -5
        arr, _ = temporal_earliest_arrival(
            e, source=0, start_time=-100, vertices=v
        )
        a = {r["id"]: r["arrival"] for r in arr.collect()}
        assert a[1] == -50 and a[2] == -10 and a[3] is None

    def test_sentinel_boundary_rejected(self, spark):
        import pytest

        from linkgraph.algorithms.temporal import temporal_latest_departure

        e = spark.createDataFrame(
            [(0, 1, -(1 << 62))], "src long, dst long, t long"
        )
        with pytest.raises(ValueError, match="timestamps"):
            temporal_latest_departure(e, target=1, deadline=10)
