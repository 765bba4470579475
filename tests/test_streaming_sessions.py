"""Stateful streaming sessionization — multi-batch behavior.

The catalog entry (`sessionize_stream_stateful`) covers the single-file
availableNow case under the DuckDB oracle; here we force TWO
micro-batches (maxFilesPerTrigger=1) with the file boundary placed
INSIDE a known multi-event session, and assert that per-user state
carries across the batch boundary: the spanning session must come out
as ONE session, not two.
"""

from __future__ import annotations

import collections
import os

import pytest

from spark_dns_spark.plans.feeds import load_events
from spark_dns_spark.streaming.stateful import sessionize_stream

GAP_MIN = 30
SF = "/root/testdata/sf0.01"  # sf0.001 has almost no multi-event sessions


def _truth_sessions(rows):
    """Batch gap-and-island truth: {(user_id, start): [start, end, n, sum]}."""
    by_user = collections.defaultdict(list)
    for r in rows:
        by_user[r.user_id].append((r.ts, r.value))
    truth = {}
    for uid, evs in by_user.items():
        evs.sort()
        cur = None
        sessions = []
        for ts, v in evs:
            if cur is None:
                cur = [ts, ts, 1, v]
            elif (ts - cur[1]).total_seconds() > GAP_MIN * 60:
                sessions.append(cur)
                cur = [ts, ts, 1, v]
            else:
                cur[1], cur[2], cur[3] = ts, cur[2] + 1, cur[3] + v
        sessions.append(cur)
        for s in sessions:
            truth[(uid, s[0])] = s
    return truth


def test_state_carries_across_batches(spark, tmp_path):
    ev = load_events(spark, SF).select("ts", "user_id", "value")
    rows = sorted(ev.collect(), key=lambda r: r.ts)
    truth = _truth_sessions(rows)

    # place the file boundary between the first and second event of a
    # multi-event session (so the session MUST span both batches)
    spanning = next(
        s for s in truth.values() if s[2] >= 2
    )
    uid_of = {id(s): u for (u, _), s in truth.items()}
    split_ts = next(
        r.ts
        for r in rows
        if r.ts > spanning[0] and r.ts <= spanning[1]
    )
    first = [r for r in rows if r.ts < split_ts]
    second = [r for r in rows if r.ts >= split_ts]
    assert first and second

    import time

    src = tmp_path / "src"
    src.mkdir()
    for i, chunk in enumerate((first, second)):
        d = tmp_path / f"part{i}"
        spark.createDataFrame(chunk, ev.schema).coalesce(1).write.parquet(str(d))
        for f in sorted(os.listdir(d)):
            if f.endswith(".parquet"):
                dst = src / f"{i:02d}_{f}"
                os.rename(d / f, dst)
                # distinct mtimes: the file source orders batches by
                # modification time; a tie collapses both files into one
                # micro-batch and the cross-batch claim tests nothing
                os.utime(dst, (time.time() + i * 60,) * 2)

    stream = (
        spark.readStream.schema("ts timestamp, user_id long, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    out = str(tmp_path / "out")
    q = (
        sessionize_stream(stream, gap_min=GAP_MIN)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r.user_id, r.session_start): r
        for r in spark.read.parquet(out).collect()
    }
    assert got, "stream emitted nothing"

    # every emitted session must exactly match a truth session — if the
    # boundary-spanning session had been split, its start/end/count
    # would disagree with the batch truth
    for (uid, start), r in got.items():
        assert (uid, start) in truth, f"phantom session {uid} @ {start}"
        s = truth[(uid, start)]
        assert r.session_end == s[1]
        assert r.n_events == s[2]
        assert abs(r.sum_value - s[3]) < 1e-6

    # all non-final sessions per user are emitted (gap-closed), and the
    # spanning session itself must have been emitted intact unless it is
    # its user's final session
    last_start = {}
    for (u, start), s in truth.items():
        last_start[u] = max(last_start.get(u, start), start)
    for (u, start), s in truth.items():
        if start != last_start[u]:
            assert (u, start) in got, f"missing closed session {u} @ {start}"

    span_uid = uid_of[id(spanning)]
    if spanning[0] != last_start[span_uid]:
        r = got[(span_uid, spanning[0])]
        assert r.n_events == spanning[2] >= 2
