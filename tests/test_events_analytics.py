"""Semantic pins for the events product-analytics operators
(operators/events_analytics.py): exact Python recomputes of the
first-touch funnel and the retention triangle — the oracle gate proves
engine parity, these prove the DEFINITIONS are the intended ones."""

from __future__ import annotations

from collections import defaultdict

from data_pipeline__s3_to_postgres_s3_spark.operators.events_analytics import (
    FUNNEL_STEPS,
    funnel_conversion,
    retention_cohorts,
)


def _events(spark, sf_dir):
    from data_pipeline__s3_to_postgres_s3_spark.catalog import load_events

    return load_events(spark, sf_dir).select(
        "user_id", "event_type", "ts"
    ).collect()


def test_funnel_matches_python_recompute(spark, sf_dir):
    ev = _events(spark, sf_dir)
    firsts: dict[int, dict[str, object]] = defaultdict(dict)
    for r in ev:
        d = firsts[r["user_id"]]
        t = d.get(r["event_type"])
        if t is None or r["ts"] < t:
            d[r["event_type"]] = r["ts"]

    expected = {"n_users": len(firsts)}
    counts = []
    for i, step in enumerate(FUNNEL_STEPS):
        n = 0
        for d in firsts.values():
            ok = d.get(FUNNEL_STEPS[0]) is not None
            for prev, cur in zip(FUNNEL_STEPS[:i], FUNNEL_STEPS[1 : i + 1]):
                ok = ok and (
                    d.get(cur) is not None
                    and d.get(prev) is not None
                    and d[cur] > d[prev]
                )
            n += int(ok)
        counts.append(n)
        expected[f"n_{step}"] = n

    row = funnel_conversion(spark, sf_dir).collect()[0].asDict()
    for k, v in expected.items():
        assert row[k] == v, (k, row[k], v)
    # The funnel is a funnel: monotone non-increasing step counts.
    assert all(a >= b for a, b in zip(counts, counts[1:]))
    for prev, cur, a, b in zip(FUNNEL_STEPS, FUNNEL_STEPS[1:], counts, counts[1:]):
        import math

        assert row[f"rate_{cur}"] == math.floor(b / a * 10**6 + 0.5) / 10**6


def test_retention_matches_python_recompute(spark, sf_dir):
    ev = _events(spark, sf_dir)
    days = {(r["user_id"], r["ts"].date()) for r in ev}
    cohort = {}
    for u, d in days:
        if u not in cohort or d < cohort[u]:
            cohort[u] = d
    sizes = defaultdict(int)
    for u in cohort:
        sizes[cohort[u]] += 1
    cells = defaultdict(int)
    for u, d in days:
        cells[(cohort[u], (d - cohort[u]).days)] += 1

    got = {
        (r["cohort_day"], r["offset_days"]): (r["n_active"], r["cohort_size"])
        for r in retention_cohorts(spark, sf_dir).collect()
    }
    assert got == {
        (cd, off): (n, sizes[cd]) for (cd, off), n in cells.items()
    }
    # Day-0 sanity: every cohort is 100% retained on its first day.
    for (cd, off), (n, size) in got.items():
        if off == 0:
            assert n == size


def test_item_cooccurrence_pairs_and_cap(spark, tmp_path, monkeypatch):
    """Pin the in-row ordered-pair expansion against a hand-computed
    basket set, the basket cap (CAP smallest items kept, mirrored by the
    oracle's ROW_NUMBER guard), and the exact lift arithmetic."""
    import datetime as ddt

    import data_pipeline__s3_to_postgres_s3_spark.operators.events_analytics as EA

    t0 = ddt.datetime(2024, 5, 1, 12, 0)
    rows = []
    # user 1: items {1,2,3}; user 2: items {2,3}; user 3: item {9} (solo);
    # purchase/error events must be ignored even when they carry k.
    for eid, (u, k, typ) in enumerate(
        [
            (1, 1, "view"), (1, 2, "click"), (1, 3, "view"), (1, 2, "view"),
            (2, 2, "view"), (2, 3, "click"),
            (3, 9, "view"), (3, 7, "purchase"), (3, 8, "error"),
        ]
    ):
        rows.append((eid, t0, u, typ, 1.0, f'{{"k": {k}}}'))
    spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string"
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    got = {
        (r["item_a"], r["item_b"]): r
        for r in EA.item_cooccurrence(spark, str(tmp_path)).collect()
    }
    # N = 3 basket users; pairs only from users 1 and 2.
    assert set(got) == {(1, 2), (1, 3), (2, 3)}
    assert got[(2, 3)]["n_users_both"] == 2
    assert got[(2, 3)]["n_users_a"] == 2 and got[(2, 3)]["n_users_b"] == 2
    assert got[(2, 3)]["lift"] == 2 * 3 / (2 * 2)
    assert got[(1, 2)]["n_users_both"] == 1
    assert got[(1, 2)]["lift"] == 1 * 3 / (1 * 2)

    # Cap = 2: user 1's basket truncates to its two SMALLEST items {1,2} —
    # pair (1,3)/(2,3) lose user 1, (2,3) survives only via user 2.
    monkeypatch.setattr(EA, "BASKET_ITEM_CAP", 2)
    capped = {
        (r["item_a"], r["item_b"]): r["n_users_both"]
        for r in EA.item_cooccurrence(spark, str(tmp_path)).collect()
    }
    assert capped == {(1, 2): 1, (2, 3): 1}


def test_active_users_rolling_invariants(spark, sf_dir):
    """WAU dominates DAU on every day, and equals DAU on a day whose
    whole trailing window is that single day (the corpus start)."""
    from data_pipeline__s3_to_postgres_s3_spark.operators.events_analytics import (
        active_users_rolling,
    )

    rows = sorted(
        active_users_rolling(spark, sf_dir).collect(), key=lambda r: r["day"]
    )
    assert rows
    assert all(r["wau"] >= r["dau"] for r in rows)
    assert rows[0]["wau"] == rows[0]["dau"]  # no earlier days to add users


def test_props_bad_payload_gate_stays_green(spark, tmp_path):
    """Props re-encode hazard class (ADVICE r5/r6): non-integer '$.k'
    payloads — float, string, missing key, malformed JSON — must NULL
    identically on both engines (Spark try_cast ↔ DuckDB TRY_CAST), not
    throw under Spark 4's ANSI mode or hard-error in DuckDB. Gate-form
    check over every props-consuming oracle."""
    import datetime as dt

    import duckdb

    from data_pipeline__s3_to_postgres_s3_spark.registry import (
        ORACLES,
        QUERIES,
    )
    from .oracle_harness import compare

    base = dt.datetime(2024, 1, 1)
    payloads = [
        '{"k": 7}', '{"k": 3.5}', '{"k": "oops"}', '{"x": 1}',
        "not json", '{"k": 12}', '{"k": 7}', '{"k": null}',
    ]
    rows = [
        (
            i,
            base + dt.timedelta(minutes=i),
            100 + i % 3,
            ["view", "purchase", "click"][i % 3],
            float(i),
            payloads[i % len(payloads)],
        )
        for i in range(48)
    ]
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet/*.parquet')"
    )
    for name in (
        "event_props_extract",
        "item_cooccurrence",
        "item_triangles",
        "item_pagerank",
    ):
        report = compare(QUERIES[name](spark, str(tmp_path)), con, ORACLES[name])
        assert report["ok"], f"{name} under bad props payloads: {report}"
