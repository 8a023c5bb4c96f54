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
