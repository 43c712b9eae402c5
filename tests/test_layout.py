"""Z-order layout: the pruning win must be measurable on real parquet
footer stats, not asserted rhetorically. A 2-D box probe against the
curve-clustered layout must skip files that a 1-D sorted layout
cannot."""

from __future__ import annotations

from pyspark.sql import functions as F

from streaming_data_spark.operators.layout import (
    files_matching_box,
    morton_code,
    zorder_write,
)
from streaming_data_spark.schemas import load_table

N_FILES = 8
BOX = dict(x_col="l_partkey", x_lo=1, x_hi=40, y_col="l_suppkey", y_lo=1, y_hi=3)


def test_zorder_layout_prunes_2d_box_better_than_1d_sort(spark, sf_oracle, tmp_path):
    li = load_table(spark, sf_oracle, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )
    zpath = str(tmp_path / "zorder")
    xpath = str(tmp_path / "xsort")
    zorder_write(li, "l_partkey", "l_suppkey", zpath, n_files=N_FILES)
    # 1-D baseline: same file count, sorted on x only
    (
        li.repartitionByRange(N_FILES, "l_partkey")
        .sortWithinPartitions("l_partkey")
        .write.mode("overwrite")
        .parquet(xpath)
    )
    z_hit, z_total = files_matching_box(zpath, **BOX)
    x_hit, x_total = files_matching_box(xpath, **BOX)
    assert z_total == x_total == N_FILES
    # the x-sorted layout prunes the x-range but is blind to y; the
    # curve layout must touch at most as many files AND actually skip
    assert z_hit <= x_hit, (z_hit, x_hit)
    assert z_hit < N_FILES, "curve layout skipped nothing"


def test_zorder_write_preserves_rows_and_schema(spark, sf_oracle, tmp_path):
    li = load_table(spark, sf_oracle, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )
    path = str(tmp_path / "z2")
    zorder_write(li, "l_partkey", "l_suppkey", path, n_files=4)
    back = spark.read.parquet(path)
    assert back.columns == li.columns  # helper key dropped
    assert back.count() == li.count()
    assert back.exceptAll(li).isEmpty()


def test_morton_code_locality_property(spark):
    """Rows close in (x, y) share curve-key prefixes: quadrant bits
    are the TOP bits, so the curve sorts the plane by nested
    quadrants. Check the defining recursive property directly: the
    top two interleaved bits are (y_hi, x_hi) of the half-range
    split."""
    bits = 4
    rows = [(x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(rows, ["x", "y"]).withColumn(
        "z", morton_code(F.col("x"), F.col("y"), bits)
    )
    for r in df.collect():
        want_top = ((r["y"] >> 3) << 1) | (r["x"] >> 3)
        assert (r["z"] >> (2 * bits - 2)) == want_top, r


def test_compact_parquet_rewrites_small_files_content_identical(spark, tmp_path):
    """Compaction must shrink the file count to the byte-target sizing
    and preserve content EXACTLY (row multiset, schema); a second run
    under the threshold must no-op and say so."""
    from streaming_data_spark.operators.layout import compact_parquet

    path = str(tmp_path / "fragmented")
    df = spark.range(0, 20_000).withColumn("v", F.col("id") * 2)
    df.repartition(64).write.parquet(path)  # 64 tiny files

    before = spark.read.parquet(path)
    before_rows = sorted((r.id, r.v) for r in before.collect())

    stats = compact_parquet(spark, path, target_file_bytes=10 * 1024 * 1024)
    assert stats["files_before"] == 64
    assert stats["files_after"] < 64 and stats["skipped"] is False
    # 20k longs << 10 MiB target → sizing should land on very few files
    assert stats["files_after"] <= 4, stats

    after = spark.read.parquet(path)
    assert sorted((r.id, r.v) for r in after.collect()) == before_rows
    assert after.schema == before.schema

    again = compact_parquet(
        spark, path, target_file_bytes=10 * 1024 * 1024,
        min_files_to_compact=stats["files_after"] + 1,
    )
    assert again["skipped"] is True
    assert again["files_after"] == stats["files_after"]


def test_compact_parquet_lock_excludes_writers_and_compactions(spark, tmp_path):
    """With enforcement on (the default): an in-dir keyed-writer lock
    makes compaction refuse outright, and a held sibling compact lock
    blocks a second compaction; both locks release/clear cleanly."""
    import json
    import os

    import pytest

    from streaming_data_spark.operators.layout import compact_parquet

    path = str(tmp_path / "locked")
    spark.range(0, 1000).repartition(8).write.parquet(path)

    writer_lock = os.path.join(path, "_sds_writer.lock")
    with open(writer_lock, "w") as fh:
        fh.write(json.dumps({"pid": 0}))
    with pytest.raises(RuntimeError, match="keyed writer holds"):
        compact_parquet(spark, path, target_file_bytes=1 << 20)
    os.remove(writer_lock)

    compact_lock = path + ".compact.lock"
    with open(compact_lock, "w") as fh:
        fh.write(json.dumps({"pid": 0}))
    with pytest.raises(RuntimeError, match="another compaction holds"):
        compact_parquet(spark, path, target_file_bytes=1 << 20)
    os.remove(compact_lock)

    stats = compact_parquet(spark, path, target_file_bytes=1 << 20)
    assert stats["skipped"] is False and stats["files_after"] < 8
    assert not os.path.exists(compact_lock)  # released on success


def test_compact_parquet_detects_stale_old_dir(spark, tmp_path):
    """A leftover .compact.old from a crashed swap must fail FAST with
    a recovery message — before the expensive rewrite, not at the
    rename."""
    import os

    import pytest

    from streaming_data_spark.operators.layout import compact_parquet

    path = str(tmp_path / "t")
    spark.range(100).repartition(4).write.parquet(path)
    os.makedirs(path + ".compact.old/junk")
    with pytest.raises(RuntimeError, match="stale .*compact.old"):
        compact_parquet(spark, path, target_file_bytes=1 << 20)
