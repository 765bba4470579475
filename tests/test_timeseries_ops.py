"""Edge-case pins for the time-series / funnel / index operators on
synthetic frames — cases the uniform driver testdata never produces:
single-hour users, same-microsecond OHLC ties, boundary-exact funnel
conversions, posting lists longer than the cap."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

BASE = datetime(2024, 1, 1, 0, 0, 0)


def _events(spark, rows):
    # (event_id, ts, user_id, event_type, value)
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double"
    )


def test_gap_fill_single_hour_user_has_no_gaps(spark, tmp_path):
    from spark_dns_spark.plans.q_timeseries import events_gap_fill_ffill

    ev = _events(
        spark,
        [
            (1, BASE, 1, "view", 10.0),
            (2, BASE.replace(minute=30), 1, "view", 20.0),
            # user 2: events 3 hours apart -> 2 gap hours, filled with
            # the hour-1 last value (event 4, later ts wins)
            (3, BASE, 2, "view", 5.0),
            (4, BASE.replace(minute=45), 2, "view", 7.0),
            (5, BASE.replace(hour=3), 2, "view", 9.0),
        ],
    )
    ev.write.parquet(str(tmp_path / "events.parquet"))
    out = {
        r["user_id"]: (r["n_hours"], r["n_gaps"], r["gap_fill_milli"])
        for r in events_gap_fill_ffill(spark, str(tmp_path)).collect()
    }
    assert out[1] == (1, 0, 0)
    # 4 grid hours, 2 gaps, each filled with 7000 milli
    assert out[2] == (4, 2, 14000)


def test_ohlc_same_microsecond_tie_breaks_on_event_id(spark, tmp_path):
    from spark_dns_spark.plans.q_timeseries import events_ohlc_bars

    ts = BASE
    ev = _events(
        spark,
        [
            (7, ts, 1, "view", 100.0),  # same ts: higher id = close
            (3, ts, 1, "view", 200.0),  # lower id = open
            (5, ts.replace(minute=5), 1, "view", 50.0),
        ],
    )
    ev.write.parquet(str(tmp_path / "events.parquet"))
    row = events_ohlc_bars(spark, str(tmp_path)).collect()[0]
    assert row["open_milli"] == 200000  # event 3
    assert row["close_milli"] == 50000  # latest ts (event 5)
    assert row["high_milli"] == 200000 and row["low_milli"] == 50000


def test_funnel_boundary_and_order_rules(spark, tmp_path):
    from spark_dns_spark.plans.q_cooccur import events_funnel_conversion

    h1 = BASE.replace(hour=1)
    ev = _events(
        spark,
        [
            # user 1: click exactly AT the 1h boundary -> counts (<=)
            (1, BASE, 1, "signup", 1.0),
            (2, h1, 1, "click", 1.0),
            (3, h1, 1, "purchase", 1.0),
            # user 2: click BEFORE signup -> not converted
            (4, BASE, 2, "click", 1.0),
            (5, BASE.replace(minute=10), 2, "signup", 1.0),
            # user 3: signup only
            (6, BASE, 3, "signup", 1.0),
            # user 4: no signup at all
            (7, BASE, 4, "purchase", 1.0),
        ],
    )
    ev.write.parquet(str(tmp_path / "events.parquet"))
    row = events_funnel_conversion(spark, str(tmp_path)).collect()[0]
    assert (
        row["n_signup"],
        row["n_clicked_1h"],
        row["n_converted_1h"],
        row["n_users"],
    ) == (3, 1, 1, 4)


def test_inverted_postings_cap_and_df(spark, tmp_path):
    from spark_dns_spark.plans.q_index import (
        POSTINGS_CAP,
        index_inverted_postings,
    )

    docs = spark.createDataFrame(
        [(i, "common common filler" + str(i)) for i in range(40)],
        "doc_id long, text string",
    ).withColumn("lang", F.lit("en")).withColumn(
        "source", F.lit("s")
    ).withColumn("n_chars", F.length("text"))
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    rows = {
        r["term"]: r
        for r in index_inverted_postings(spark, str(tmp_path)).collect()
    }
    # 'common' appears in all 40 docs but dup-per-doc counts once;
    # posting sample capped at 16 SMALLEST doc_ids, sorted
    r = rows["common"]
    assert r["df_count"] == 40
    got = [int(x) for x in r[f"postings{POSTINGS_CAP}"].split(",")]
    assert got == list(range(POSTINGS_CAP))
    assert r["first_doc"] == 0


def test_snapshot_diff_classes_partition_key_space(spark):
    from spark_dns_spark.plans.q_validate import (
        DIFF_ADD_M,
        DIFF_DEL_M,
        snapshot_diff_orders,
    )

    sf = "/root/testdata/sf0.001"
    rows = {
        r["diff_class"]: r["n"]
        for r in snapshot_diff_orders(spark, sf).collect()
    }
    import duckdb

    con = duckdb.connect()
    n_keys = con.execute(
        f"SELECT count(*), "
        f"sum(CASE WHEN o_orderkey % {DIFF_ADD_M} = 0 AND "
        f"o_orderkey % {DIFF_DEL_M} = 0 THEN 1 ELSE 0 END) "
        f"FROM '{sf}/orders.parquet'"
    ).fetchone()
    # every key lands in exactly one class, except keys absent from
    # BOTH snapshots (residue 0 mod both moduli)
    assert sum(rows.values()) == n_keys[0] - (n_keys[1] or 0)
    assert rows["changed"] > 0 and rows["added"] > 0 and rows["deleted"] > 0


def test_cusum_closed_form_equals_recurrence(spark, tmp_path):
    """The query's P_k - min(0, runmin P) closed form must equal the
    textbook recurrence S_k = max(0, S_{k-1} + d_k) on random data."""
    import numpy as np

    from spark_dns_spark.plans.q_timeseries import (
        CUSUM_H,
        CUSUM_TARGET,
        events_cusum_drift,
    )

    rng = np.random.default_rng(42)
    rows = []
    want = {}
    for uid in range(5):
        vals = rng.uniform(0, 120, size=50)
        s = 0
        max_s = 0
        alarms = 0
        for i, v in enumerate(vals):
            ts = BASE.replace(hour=i // 60, minute=i % 60)
            eid = uid * 1000 + i
            rows.append((eid, ts, uid, "view", float(v)))
            d = int(np.floor(v * 1000 + 0.5)) - CUSUM_TARGET
            s = max(0, s + d)
            max_s = max(max_s, s)
            alarms += s > CUSUM_H
        want[uid] = (50, max_s, alarms)
    _events(spark, rows).write.parquet(str(tmp_path / "events.parquet"))
    got = {
        r["user_id"]: (r["n"], r["max_cusum"], r["n_alarms"])
        for r in events_cusum_drift(spark, str(tmp_path)).collect()
    }
    assert got == want


def test_mad_constant_user_flags_only_deviants(spark, tmp_path):
    from spark_dns_spark.plans.q_mlprep import events_mad_outliers

    rows = [(i, BASE.replace(minute=i), 1, "view", 5.0) for i in range(9)]
    rows += [(9, BASE.replace(minute=9), 1, "view", 50.0)]  # lone deviant
    rows += [(i + 10, BASE.replace(minute=i), 2, "view", 3.0) for i in range(5)]
    _events(spark, rows).write.parquet(str(tmp_path / "events.parquet"))
    got = {
        r["user_id"]: (r["mad4"], r["n_outliers"], r["n"])
        for r in events_mad_outliers(spark, str(tmp_path)).collect()
    }
    # user 1: median 5000, MAD 0 -> any nonzero deviation flags (the
    # deviant 50.0), the constant points do not
    assert got[1] == (0, 1, 10)
    # user 2: all constant -> MAD 0, zero outliers
    assert got[2] == (0, 0, 5)


def test_apportionment_sums_exactly_to_budget(spark, sf_dir):
    """Hamilton apportionment invariants: quotas sum to EXACTLY the
    budget, every quota is floor_quota or floor_quota+1, and the +1
    seats go to the largest remainders."""
    from spark_dns_spark.plans.q_curation import (
        MIX_BUDGET,
        mix_token_budget_apportion,
    )

    rows = mix_token_budget_apportion(spark, sf_dir).collect()
    assert sum(r["quota"] for r in rows) == MIX_BUDGET
    assert all(r["quota"] - r["floor_quota"] in (0, 1) for r in rows)
    bumped = sorted(
        (r for r in rows if r["quota"] > r["floor_quota"]),
        key=lambda r: (-r["remainder"], r["source"]),
    )
    unbumped_max_rem = max(
        (r["remainder"] for r in rows if r["quota"] == r["floor_quota"]),
        default=-1,
    )
    if bumped:
        assert min(r["remainder"] for r in bumped) >= unbumped_max_rem
