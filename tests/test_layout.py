"""Z-order layout manifest semantics (operators/layout.py).

The oracle differential (test_correctness_oracle / the driver window)
pins cross-engine agreement; these tests pin the LAYOUT claims the
manifest makes — the bit math itself, the bi-dimensional clustering
property (each file covers ~1/2^(FILES_LOG2/2) of EACH dimension's
range, which is what buys data skipping on both columns), the NULL-key
sentinel file, and the PHYSICAL write: cell-pure files whose parquet
footer stats deliver the pruning the manifest predicts, end-to-end.
"""

from __future__ import annotations

import datetime
import glob

import pyarrow.parquet as pq
import pytest

from data_pipeline__s3_to_postgres_s3_spark.operators.layout import (
    Z_BITS,
    Z_FID_TOKENS,
    Z_FILES_LOG2,
    _morton_sql,
    write_zordered,
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


def test_fid_tokens_perfect_hash(spark):
    """The physical write's file split relies on pmod(murmur3(token), 17)
    being injective over Z_FID_TOKENS — one Z-cell per shuffle partition.
    The table is solved at import by a pure-Python replica of Spark's
    Murmur3 int hash; pin (a) replica == F.hash bit-for-bit over a wide
    value sweep and (b) injectivity against Spark itself, so neither a
    solver bug nor a (hypothetical) hash change can slip through."""
    from pyspark.sql import functions as F

    from data_pipeline__s3_to_postgres_s3_spark.operators.layout import (
        _murmur3_int,
    )

    sweep = list(range(-5, 200)) + [2**31 - 1, -(2**31), 123456789]
    df = spark.createDataFrame([(v,) for v in sweep], "v int")
    got = [r[0] for r in df.select(F.hash("v")).collect()]
    assert got == [_murmur3_int(v) for v in sweep]

    assert len(Z_FID_TOKENS) == (1 << Z_FILES_LOG2) + 1  # 16 cells + sentinel
    tok_df = spark.createDataFrame([(t,) for t in Z_FID_TOKENS], "t int")
    residues = [
        r[0]
        for r in tok_df.select(
            F.pmod(F.hash("t"), F.lit(len(Z_FID_TOKENS)))
        ).collect()
    ]
    assert len(set(residues)) == len(Z_FID_TOKENS), residues


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


@pytest.fixture(scope="module")
def zordered_files(spark, sf_dir, tmp_path_factory):
    """Write once, assert twice (extents + end-to-end skip proof):
    the physical write is the expensive step of this module."""
    out = str(tmp_path_factory.mktemp("layout") / "orders_z")
    write_zordered(spark, sf_dir, out)
    # The sentinel cell's partition is empty when the corpus has no
    # NULL keys; its 0-row file carries no stats and no reader touches
    # it — exclude it from the layout assertions.
    return [
        f
        for f in sorted(glob.glob(f"{out}/part-*.parquet"))
        if pq.ParquetFile(f).metadata.num_rows > 0
    ]


def _file_extents(files):
    """Per-file (min, max) of both dimensions from parquet FOOTER stats —
    the exact metadata a data-skipping reader consults; no data pages are
    read."""
    extents = []
    n_total = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        n_total += md.num_rows
        names = {
            md.row_group(0).column(i).path_in_schema: i
            for i in range(md.row_group(0).num_columns)
        }
        ck_lo = ck_hi = d_lo = d_hi = None
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            ck = g.column(names["o_custkey"]).statistics
            od = g.column(names["o_orderdate"]).statistics
            ck_lo = ck.min if ck_lo is None else min(ck_lo, ck.min)
            ck_hi = ck.max if ck_hi is None else max(ck_hi, ck.max)
            d_lo = od.min if d_lo is None else min(d_lo, od.min)
            d_hi = od.max if d_hi is None else max(d_hi, od.max)
        extents.append((ck_lo, ck_hi, d_lo, d_hi))
    return extents, n_total


def test_write_zordered_files_prune_on_both_dimensions(
    spark, sf_dir, zordered_files
):
    """The PHYSICAL layout: every written file is one Z-cell (the
    perfect-hash split makes this hold by construction, not by sampling
    luck), so per-file footer extents cover <= ~1/4 + grid rounding of
    EACH dimension. Schema must be unchanged (no helper columns leak)."""
    files = zordered_files
    # One non-empty file per populated cell (+1 if the corpus had NULL
    # keys → sentinel file).
    assert (1 << Z_FILES_LOG2) <= len(files) <= len(Z_FID_TOKENS)
    extents, n_total = _file_extents(files)
    src = pq.read_table(f"{sf_dir}/orders.parquet", columns=["o_orderkey"])
    assert n_total == src.num_rows
    schema = pq.ParquetFile(files[0]).schema_arrow
    for helper in ("_z", "_tok", "_ck", "_dy"):
        assert helper not in schema.names
    ck_lo = min(e[0] for e in extents)
    ck_hi = max(e[1] for e in extents)
    d_lo = min(e[2] for e in extents)
    d_hi = max(e[3] for e in extents)
    ck_span = ck_hi - ck_lo
    d_span = (d_hi - d_lo).total_seconds()
    # Cell-pure files: EVERY file (not just the mean) sits within one
    # grid cell = 1/4 of each dimension + one cell of grid rounding.
    for e in extents:
        assert e[1] - e[0] <= 0.30 * ck_span, e
        assert (e[3] - e[2]).total_seconds() <= 0.30 * d_span, e


def test_zorder_skip_proof_point_predicates(zordered_files):
    """End-to-end data-skipping proof on the WRITTEN files: a stats-based
    reader (Spark's parquet filter pushdown, DuckDB zone maps) touches a
    file only if the predicate intersects its footer min/max. For a
    single-customer and a single-month predicate, that must be <= 1/4 of
    the files on EACH dimension — the bi-dimensional payoff Z-order buys.
    Fails if anyone reverts the write to a non-cell-aligned split."""
    files = zordered_files
    extents, _ = _file_extents(files)
    ck_lo = min(e[0] for e in extents)
    ck_hi = max(e[1] for e in extents)
    d_lo = min(e[2] for e in extents)
    d_hi = max(e[3] for e in extents)
    # Single-customer point probes at several points across the range:
    # one custkey band = 1/4 of the files.
    for frac in (0.1, 0.5, 0.9):
        probe_ck = ck_lo + int(frac * (ck_hi - ck_lo))
        touched = sum(1 for e in extents if e[0] <= probe_ck <= e[1])
        assert touched <= len(files) / 4, (probe_ck, touched)
    # Single-day point probes: one date band = 1/4 of the files.
    span = d_hi - d_lo
    for frac in (0.1, 0.5, 0.9):
        probe_d = d_lo + frac * span
        touched = sum(1 for e in extents if e[2] <= probe_d <= e[3])
        assert touched <= len(files) / 4, (probe_d, touched)
    # A 30-day RANGE can legitimately straddle two adjacent date bands
    # (that is Z-order, not a layout bug) — bounded by 1/2 the files,
    # still 2x better than a custkey-linear layout's full scan.
    for frac in (0.1, 0.5, 0.9):
        m_lo = d_lo + frac * span
        m_hi = m_lo + datetime.timedelta(days=30)
        touched = sum(1 for e in extents if e[2] <= m_hi and m_lo <= e[3])
        assert touched <= len(files) / 2, (m_lo, touched)


def test_zorder_skip_estimate_reconciles_and_pays_off(spark, sf_dir):
    """The estimate must equal a Python recomputation from the manifest
    rows, and at sf show the healthy 4x4 payoff: expected point-predicate
    fraction ~1/4 (+grid rounding) per dimension — vs 1.0 on the
    non-sort column of a linear layout."""
    from data_pipeline__s3_to_postgres_s3_spark.operators.layout import (
        zorder_manifest,
        zorder_skip_estimate,
    )

    m = [
        r
        for r in zorder_manifest(spark, sf_dir).collect()
        if r["file_id"] != -1
    ]
    got = {r["dimension"]: r for r in zorder_skip_estimate(spark, sf_dir).collect()}
    assert set(got) == {"custkey", "orderdate"}
    ck_ext = sum(r["max_custkey"] - r["min_custkey"] + 1 for r in m)
    ck_span = (
        max(r["max_custkey"] for r in m) - min(r["min_custkey"] for r in m) + 1
    )
    dt_ext = sum(
        (r["max_orderdate"] - r["min_orderdate"]).days + 1 for r in m
    )
    dt_span = (
        max(r["max_orderdate"] for r in m) - min(r["min_orderdate"] for r in m)
    ).days + 1
    for dim, ext, span in (
        ("custkey", ck_ext, ck_span),
        ("orderdate", dt_ext, dt_span),
    ):
        r = got[dim]
        assert r["n_files"] == len(m)
        assert r["sum_extent"] == ext and r["span"] == span, dim
        assert r["expected_files"] == ext / span
        assert r["expected_frac"] == ext / span / len(m)
        # the payoff: ~1/4 of files per point predicate on EITHER dim
        assert 0.15 <= r["expected_frac"] <= 0.35, r


def test_zorder_grid_survives_int32_keys_with_wide_range(spark, tmp_path):
    """ANSI-overflow pin for the grid normalization (round-8 advisor
    finding): with an int32-encoded o_custkey and a key RANGE past ~32k
    (sf1 has 150k customers), (ck - min) * 65535 exceeds 2^31 — an
    INT*INT product errors under Spark 4 ANSI unless both coordinates
    are widened to BIGINT before the arithmetic. The operator widens at
    the helper-column chokepoint; this fails loudly if that cast is
    ever dropped."""
    rows = [
        (1, 1, datetime.datetime(2000, 1, 1)),
        (2, 150_000, datetime.datetime(2005, 6, 1)),
        (3, 75_000, datetime.datetime(2002, 3, 1)),
    ]
    spark.createDataFrame(
        rows, "o_orderkey int, o_custkey int, o_orderdate timestamp"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    m = zorder_manifest(spark, str(tmp_path)).collect()
    assert sum(r["n_rows"] for r in m) == len(rows)
    assert {r["min_custkey"] for r in m} <= {1, 75_000, 150_000}
    out = str(tmp_path / "orders_z")
    write_zordered(spark, str(tmp_path), out)
    total = sum(
        pq.ParquetFile(f).metadata.num_rows
        for f in glob.glob(f"{out}/part-*.parquet")
    )
    assert total == len(rows)
