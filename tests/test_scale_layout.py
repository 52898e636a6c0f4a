"""Scale-layout proofs: the physical-plan properties the 100 TB
design depends on, asserted from .explain output.

- partition pruning: a date-partitioned fact table must turn a date
  filter into PartitionFilters at the scan (touching only matching
  directories), not a full scan + post-filter.
- bucketed co-located join: two tables bucketed on the join key must
  sort-merge join with NO Exchange (the shuffle was pre-paid at
  write time) — this is how repeated big-fact joins amortize at
  scale.
"""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from stock_data_project_spark.catalog import load_table
from tests.conftest import SF_SMOKE


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_date_partitioned_scan_prunes(spark):
    ev = load_table(spark, SF_SMOKE, "events").withColumn(
        "dt", F.to_date("ts").cast("string")
    )
    with tempfile.TemporaryDirectory() as d:
        out = os.path.join(d, "events_by_day")
        ev.write.mode("overwrite").partitionBy("dt").parquet(out)
        back = spark.read.parquet(out).filter(F.col("dt") == "2024-01-05")
        plan = _plan(back)
        assert "PartitionFilters" in plan and "2024-01-05" in plan
        n_days = len([p for p in os.listdir(out) if p.startswith("dt=")])
        assert n_days > 1  # pruning actually had something to skip
        assert back.count() > 0


@pytest.mark.filterwarnings("ignore")
def test_bucketed_join_has_no_exchange(spark):
    from stock_data_project_spark.sources import write_bucketed

    orders = load_table(spark, SF_SMOKE, "orders")
    li = load_table(spark, SF_SMOKE, "lineitem")
    # bucketed tables need saveAsTable -> default warehouse dir
    # (spark-warehouse/ under cwd, gitignored); dropped in finally
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    try:
        write_bucketed(orders, "b_orders", "o_orderkey", 8)
        write_bucketed(li, "b_lineitem", "l_orderkey", 8)
        # coalesce_files pre-repartitions on the bucket hash → exactly
        # one parquet file per bucket (not n_tasks × n_buckets)
        loc = (
            spark.sql("DESCRIBE TABLE EXTENDED b_orders")
            .filter(F.col("col_name") == "Location")
            .collect()[0]["data_type"]
        )
        files = [f for f in os.listdir(loc.removeprefix("file:")) if f.endswith(".parquet")]
        assert len(files) == 8, files
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("b_lineitem").join(
            spark.table("b_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, plan
        assert joined.count() == li.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_write_sorted_produces_prunable_ranges(spark):
    """write_sorted's contract, checked on the parquet FOOTERS: the
    per-file [min, max] ranges of the sort column are non-overlapping
    (modulo the boundary value), while a plain hash-scattered write
    of the same data has near-total overlap — i.e. min/max pruning
    goes from useless to decisive."""
    import pyarrow.parquet as pq

    from stock_data_project_spark.sources.writers import write_sorted

    ev = load_table(spark, SF_SMOKE, "events").select("event_id", "ts", "value")

    def file_ranges(path):
        out = []
        for f in os.listdir(path):
            if not f.endswith(".parquet"):
                continue
            md = pq.read_metadata(os.path.join(path, f))
            col = md.schema.to_arrow_schema().get_field_index("event_id")
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(col).statistics
                mins.append(st.min)
                maxs.append(st.max)
            out.append((min(mins), max(maxs)))
        return sorted(out)

    def overlaps(ranges):
        n = 0
        for i, (lo, hi) in enumerate(ranges):
            for lo2, hi2 in ranges[i + 1 :]:
                if lo2 < hi:  # strict: touching at one value is fine
                    n += 1
        return n

    with tempfile.TemporaryDirectory() as d:
        sorted_path = os.path.join(d, "sorted")
        scattered_path = os.path.join(d, "scattered")
        write_sorted(ev, sorted_path, "event_id", n_files=6)
        ev.repartition(6).write.parquet(scattered_path)
        sr, hr = file_ranges(sorted_path), file_ranges(scattered_path)
        assert len(sr) >= 4  # range exchange actually split the data
        assert overlaps(sr) == 0, sr
        assert overlaps(hr) > len(hr), hr  # hash write: near-total overlap

        # and the row groups INSIDE each sorted file are monotone
        for f in os.listdir(sorted_path):
            if not f.endswith(".parquet"):
                continue
            md = pq.read_metadata(os.path.join(sorted_path, f))
            col = md.schema.to_arrow_schema().get_field_index("event_id")
            stats = [md.row_group(i).column(col).statistics for i in range(md.num_row_groups)]
            for a, b in zip(stats, stats[1:]):
                assert a.max <= b.min


def test_cell_partitioned_codes_prune_at_scan(spark, tmp_path):
    """The ivfpq claim 'the probed-cell filter is partition pruning
    when codes are laid out by cell', as evidence: write the PQ code
    table partitioned by centroid_id, read it back with the probe
    filter, and the scan must show PartitionFilters with only the
    probed cells' files touched."""
    from pyspark.sql import functions as F

    from stock_data_project_spark.operators.ivf import ivf_fit, ivf_transform
    from stock_data_project_spark.operators.pq import pq_encode, pq_fit

    emb = load_table(spark, SF_SMOKE, "embeddings")
    centroids = ivf_fit(emb, 8)
    assigned = ivf_transform(emb, centroids, 1)
    codes = pq_encode(assigned, pq_fit(emb, m=16, nbits=4), drop_vec=True)
    path = str(tmp_path / "codes_by_cell")
    codes.write.partitionBy("centroid_id").parquet(path)

    back = spark.read.parquet(path)
    probed = back.filter(F.col("centroid_id").isin([0, 1]))
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "centroid_id" in plan
    # only the probed cells' rows stream out of the scan
    got_cells = {r["centroid_id"] for r in probed.select("centroid_id").distinct().collect()}
    assert got_cells <= {0, 1}
    n_all = back.count()
    n_probed = probed.count()
    assert 0 < n_probed < n_all


def test_write_zordered_prunes_both_dimensions(spark):
    """Z-order contract on the parquet FOOTERS: with two z columns,
    EACH column's mean per-file fractional range is well below 1,
    while a 1-D sorted write leaves the other column's ranges
    near-total. (16 files so the curve has room to localize both
    dimensions.)"""
    import pyarrow.parquet as pq

    from stock_data_project_spark.sources.writers import write_sorted, write_zordered

    ev = load_table(spark, SF_SMOKE, "events").select(
        "event_id", "user_id", "value"
    )

    def mean_frac_range(path, col_name):
        fracs, los, his = [], [], []
        metas = []
        for f in os.listdir(path):
            if f.endswith(".parquet"):
                metas.append(pq.read_metadata(os.path.join(path, f)))
        col = metas[0].schema.to_arrow_schema().get_field_index(col_name)
        per_file = []
        for md in metas:
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(col).statistics
                mins.append(st.min)
                maxs.append(st.max)
            per_file.append((min(mins), max(maxs)))
        glo = min(lo for lo, _ in per_file)
        ghi = max(hi for _, hi in per_file)
        span = (ghi - glo) or 1
        return sum((hi - lo) / span for lo, hi in per_file) / len(per_file)

    with tempfile.TemporaryDirectory() as d:
        z_path = os.path.join(d, "z")
        s_path = os.path.join(d, "s")
        write_zordered(ev, z_path, ["event_id", "user_id"], n_files=16)
        write_sorted(ev, s_path, "event_id", n_files=16)
        # 1-D sort: first column tightly clustered, second near-total
        assert mean_frac_range(s_path, "event_id") < 0.15
        assert mean_frac_range(s_path, "user_id") > 0.8
        # z-order: BOTH columns localized (≈ 1/sqrt(16) ideal = 0.25;
        # allow curve-boundary slack)
        assert mean_frac_range(z_path, "event_id") < 0.6
        assert mean_frac_range(z_path, "user_id") < 0.6
        # and both strictly better than the 1-D write's weak axis
        assert mean_frac_range(z_path, "user_id") < mean_frac_range(
            s_path, "user_id"
        )


def test_write_zordered_roundtrip_and_guards(spark):
    from stock_data_project_spark.sources.writers import write_zordered

    ev = load_table(spark, SF_SMOKE, "events").select("event_id", "user_id")
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "z")
        write_zordered(ev, p, ["event_id", "user_id"], n_files=4)
        back = spark.read.parquet(p)
        assert back.count() == ev.count()
        assert set(back.columns) == {"event_id", "user_id"}  # _z dropped
    import pytest

    with pytest.raises(ValueError, match="bits"):
        write_zordered(ev, "/tmp/never", ["event_id", "user_id"], bits=32)
    with pytest.raises(ValueError, match="z_cols"):
        write_zordered(ev, "/tmp/never", [])
