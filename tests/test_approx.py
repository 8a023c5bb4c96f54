"""Approximate-aggregate accuracy: the sketches must land near their exact
twins — HLL++ distinct counts within the configured 2% standard error
(allow 3σ) and t-digest percentiles within a small relative band. There is
no cross-engine oracle for engine-specific sketches; THIS is their gate."""

from __future__ import annotations

from data_pipeline__s3_to_postgres_s3_spark.operators.relational import (
    approx_aggregates,
    value_percentiles,
)


def test_approx_close_to_exact(spark, sf_dir):
    exact = {r["event_type"]: r for r in value_percentiles(spark, sf_dir).collect()}
    approx = {r["event_type"]: r for r in approx_aggregates(spark, sf_dir).collect()}
    assert exact.keys() == approx.keys()
    for et in exact:
        e, a = exact[et], approx[et]
        assert abs(a["approx_users"] - e["n_users"]) <= 0.06 * e["n_users"] + 1
        assert abs(a["approx_p50"] - e["p50"]) <= 0.05 * abs(e["p50"]) + 0.5
        assert abs(a["approx_p99"] - e["p99"]) <= 0.05 * abs(e["p99"]) + 0.5


def test_cms_never_undercounts_and_replicates(spark, sf_dir):
    """heavy_hitters_cms semantics pin (r9): (1) CMS can only
    over-count, so overestimate >= 0 and cms_estimate >= exact_count on
    every probe row; (2) the sketch matches a pure-Python replica of the
    same hash family over the same token census (catches any silent
    drift in the md5-hex7 / (a·h+b) mod P mod W pipeline)."""
    import hashlib
    from collections import Counter

    import pyarrow.parquet as pq

    from data_pipeline__s3_to_postgres_s3_spark.operators.textops import (
        CMS_PRIME,
        CMS_ROWS_AB,
        CMS_TOPK,
        CMS_WIDTH,
        heavy_hitters_cms,
    )

    rows = heavy_hitters_cms(spark, sf_dir).collect()
    assert len(rows) == CMS_TOPK
    for r in rows:
        assert r["overestimate"] >= 0, r
        assert r["cms_estimate"] == r["exact_count"] + r["overestimate"]

    texts = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["text"]
    ).column("text").to_pylist()
    counts = Counter(
        tok
        for t in texts
        for tok in (t or "").split(" ")
        if tok != ""
    )
    cells = [Counter() for _ in CMS_ROWS_AB]

    def buckets(token):
        h = int(hashlib.md5(token.encode()).hexdigest()[:7], 16)
        return [(a * h + b) % CMS_PRIME % CMS_WIDTH for a, b in CMS_ROWS_AB]

    for tok, n in counts.items():
        for r, b in enumerate(buckets(tok)):
            cells[r][b] += n
    for row in rows:
        est = min(
            cells[r][b] for r, b in enumerate(buckets(row["token"]))
        )
        assert row["exact_count"] == counts[row["token"]]
        assert row["cms_estimate"] == est, row
