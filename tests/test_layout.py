"""Z-order layout manifest semantics (operators/layout.py).

The oracle differential (test_correctness_oracle / the driver window)
pins cross-engine agreement; these tests pin the LAYOUT claims the
manifest makes — the bit math itself, the bi-dimensional clustering
property (each file covers ~1/2^(FILES_LOG2/2) of EACH dimension's
range, which is what buys data skipping on both columns), and the
NULL-key sentinel file.
"""

from __future__ import annotations

import datetime

from data_pipeline__s3_to_postgres_s3_spark.operators.layout import (
    Z_BITS,
    Z_FILES_LOG2,
    _morton_sql,
    zorder_manifest,
)


def _morton_py(x: int, y: int) -> int:
    z = 0
    for i in range(Z_BITS):
        z |= ((x >> i) & 1) << (2 * i + 1)
        z |= ((y >> i) & 1) << (2 * i)
    return z


def test_morton_sql_matches_python_reference(spark):
    cases = [(0, 0), (1, 0), (0, 1), (65535, 65535), (43690, 21845), (7, 12)]
    rows = spark.sql(
        "SELECT "
        + ", ".join(
            f"({_morton_sql(str(x), str(y))}) AS z{i}"
            for i, (x, y) in enumerate(cases)
        )
    ).collect()[0]
    for i, (x, y) in enumerate(cases):
        assert rows[f"z{i}"] == _morton_py(x, y), (x, y)


def test_zorder_files_cluster_both_dimensions(spark, sf_dir):
    """Every file's extent must cover ~1/4 of the custkey range AND ~1/4
    of the date range (16 files = 4x4 grid on the two top-bit pairs) —
    the property a linear sort order cannot deliver on its second
    column. Grid rounding can leak one adjacent cell, hence the 0.30
    slack over the ideal 0.25."""
    m = {r["file_id"]: r for r in zorder_manifest(spark, sf_dir).collect()}
    assert set(m) == set(range(1 << Z_FILES_LOG2))
    ck_lo = min(r["min_custkey"] for r in m.values())
    ck_hi = max(r["max_custkey"] for r in m.values())
    d_lo = min(r["min_orderdate"] for r in m.values())
    d_hi = max(r["max_orderdate"] for r in m.values())
    ck_span = ck_hi - ck_lo
    d_span = (d_hi - d_lo).days
    for r in m.values():
        assert (r["max_custkey"] - r["min_custkey"]) <= 0.30 * ck_span, r
        assert (
            (r["max_orderdate"] - r["min_orderdate"]).days <= 0.30 * d_span
        ), r
    # Data-skipping payoff: a point predicate on custkey prunes to <= 1/4
    # of the files, and the same holds for a point date.
    probe_ck = (ck_lo + ck_hi) // 2
    hit = [
        r
        for r in m.values()
        if r["min_custkey"] <= probe_ck <= r["max_custkey"]
    ]
    assert len(hit) <= (1 << Z_FILES_LOG2) // 4
    probe_d = d_lo + (d_hi - d_lo) / 2
    hit_d = [
        r
        for r in m.values()
        if r["min_orderdate"] <= probe_d <= r["max_orderdate"]
    ]
    assert len(hit_d) <= (1 << Z_FILES_LOG2) // 4


def test_zorder_null_keys_land_in_sentinel_file(spark, tmp_path):
    rows = [
        (1, 10, datetime.datetime(2000, 1, 1)),
        (2, 900, datetime.datetime(2001, 6, 1)),
        (3, None, datetime.datetime(2000, 3, 1)),  # null custkey
        (4, 500, None),  # null date
        (5, None, None),  # both null
        (6, 400, datetime.datetime(2000, 9, 9)),
    ]
    spark.createDataFrame(
        rows, "o_orderkey bigint, o_custkey bigint, o_orderdate timestamp"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    m = {r["file_id"]: r for r in zorder_manifest(spark, str(tmp_path)).collect()}
    assert -1 in m
    assert m[-1]["n_rows"] == 3
    # Sentinel extents: present values aggregate normally, all-null
    # dimensions surface the sentinel (never a NULL/NaN cell).
    assert m[-1]["min_custkey"] == 500 and m[-1]["max_custkey"] == 500
    assert m[-1]["min_orderdate"] == datetime.date(2000, 3, 1)
    assert m[-1]["min_z"] == -1 and m[-1]["max_z"] == -1
    assert sum(r["n_rows"] for r in m.values()) == len(rows)


def test_write_zordered_files_prune_on_both_dimensions(spark, sf_dir, tmp_path):
    """The PHYSICAL layout: written part-files must carry narrow min/max
    extents on BOTH dimensions (what parquet footer stats expose to a
    reader), and a point predicate on either column must skip at least
    half the files. Schema must be unchanged (no helper columns leak)."""
    import glob

    import pyarrow.parquet as pq

    from data_pipeline__s3_to_postgres_s3_spark.operators.layout import (
        write_zordered,
    )

    out = str(tmp_path / "orders_z")
    write_zordered(spark, sf_dir, out)
    files = sorted(glob.glob(f"{out}/part-*.parquet"))
    assert len(files) >= 8  # 16 requested; range split may merge tiny tails
    extents = []
    n_total = 0
    for f in files:
        t = pq.read_table(f, columns=["o_custkey", "o_orderdate"])
        n_total += t.num_rows
        ck = t.column("o_custkey").to_pylist()
        od = t.column("o_orderdate").to_pylist()
        extents.append((min(ck), max(ck), min(od), max(od)))
        assert "_z" not in t.schema.names
    src = pq.read_table(f"{sf_dir}/orders.parquet")
    assert n_total == src.num_rows
    ck_lo = min(e[0] for e in extents)
    ck_hi = max(e[1] for e in extents)
    d_lo = min(e[2] for e in extents)
    d_hi = max(e[3] for e in extents)
    ck_span = ck_hi - ck_lo
    d_span = (d_hi - d_lo).total_seconds()
    # Range boundaries are sample-based so a file can straddle one cell
    # border; mean extents must still sit near the ideal 1/4 per dim.
    mean_ck = sum(e[1] - e[0] for e in extents) / len(extents)
    mean_d = sum((e[3] - e[2]).total_seconds() for e in extents) / len(extents)
    assert mean_ck <= 0.40 * ck_span
    assert mean_d <= 0.40 * d_span
    probe_ck = (ck_lo + ck_hi) // 2
    assert sum(1 for e in extents if e[0] <= probe_ck <= e[1]) <= len(files) / 2
    probe_d = d_lo + (d_hi - d_lo) / 2
    assert sum(1 for e in extents if e[2] <= probe_d <= e[3]) <= len(files) / 2
