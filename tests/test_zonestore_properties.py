"""Property-based tests (hypothesis) for the zone store's transfer
algebra — the invariants every DNS server honors and our streaming
exactly-once guarantee relies on:

1. snapshot_at(s) == naive forward replay of the first s messages;
2. snapshot_at(s) + IXFR(s → t] deltas == snapshot_at(t)  (delta
   composition — the IXFR contract);
3. axfr() == snapshot_at(current serial).

Pure Python (no Spark) so hypothesis can run hundreds of cases fast.
"""

from __future__ import annotations

import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st  # noqa: E402

from spark_dns_spark.sources.zonestore import (  # noqa: E402
    AXFR,
    IXFR_ADD,
    IXFR_DELETE,
    ZoneStore,
)

ZONE = "prop.example."

#: small domains force add/delete collisions (the interesting cases)
_records = st.tuples(
    st.sampled_from([f"h{i}.prop.example." for i in range(4)]),
    st.sampled_from([f"10.0.0.{i}" for i in range(3)]),
)
_change = st.tuples(st.sampled_from([IXFR_ADD, IXFR_DELETE]), _records)
_messages = st.lists(
    st.lists(_change, min_size=1, max_size=4), min_size=0, max_size=8
)


def _provision(tmp_path, messages):
    store = ZoneStore(str(tmp_path))
    store.create_zone(ZONE, records=[], serial=1)
    for msg in messages:
        store.apply_update(ZONE, [(a, f, i) for a, (f, i) in msg])
    return store


def _replay(messages, upto):
    state: set = set()
    for msg in messages[:upto]:
        for action, (fqdn, ip) in msg:
            if action == IXFR_DELETE:
                state.discard((fqdn, ip))
            else:
                state.add((fqdn, ip))
    return state


@settings(max_examples=120, deadline=None)
@given(messages=_messages)
def test_snapshot_equals_replay(tmp_path_factory, messages):
    tmp = tmp_path_factory.mktemp("zs")
    store = _provision(tmp, messages)
    # creation serial is 1; message k lands at serial k+1
    for k in range(len(messages) + 1):
        snap = store.snapshot_at(ZONE, k + 1)
        got = {(f, i) for _, f, i in snap.rows}
        assert got == _replay(messages, k), f"at serial {k + 1}"


@settings(max_examples=120, deadline=None)
@given(messages=_messages, data=st.data())
def test_ixfr_composes_with_snapshot(tmp_path_factory, messages, data):
    tmp = tmp_path_factory.mktemp("zs")
    store = _provision(tmp, messages)
    cur = len(messages) + 1
    s = data.draw(st.integers(min_value=1, max_value=cur), label="from")
    t = data.draw(st.integers(min_value=s, max_value=cur), label="to")
    base = {(f, i) for _, f, i in store.snapshot_at(ZONE, s).rows}
    res = store.ixfr(ZONE, s, t)
    if res.kind == AXFR:  # snapshot fallback — already the final state
        final = {(f, i) for _, f, i in res.rows}
    else:
        final = set(base)
        for action, fqdn, ip in res.rows:
            if action == IXFR_DELETE:
                final.discard((fqdn, ip))
            else:
                final.add((fqdn, ip))
    expect = {(f, i) for _, f, i in store.snapshot_at(ZONE, t).rows}
    assert final == expect, f"IXFR({s}->{t}] must compose onto snapshot"


@settings(max_examples=60, deadline=None)
@given(messages=_messages)
def test_axfr_equals_current_snapshot(tmp_path_factory, messages):
    tmp = tmp_path_factory.mktemp("zs")
    store = _provision(tmp, messages)
    cur = len(messages) + 1
    ax = {(f, i) for _, f, i in store.axfr(ZONE).rows}
    snap = {(f, i) for _, f, i in store.snapshot_at(ZONE, cur).rows}
    assert ax == snap
