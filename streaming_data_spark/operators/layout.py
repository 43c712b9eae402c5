"""[EXT] Multi-dimension data layout: Z-order (Morton curve)
clustering for file/row-group skipping.

At 100 TB the scan is the query cost, and min/max footer stats are
the only thing standing between a point probe and a full scan. A
layout sorted on ONE column prunes filters on that column and nothing
else; interleaving the bits of two filter dimensions into a Morton
key gives every file a small bounding BOX in (x, y) space, so filters
on EITHER dimension (or both) skip files from the same single sort
order. This is the public curve behind Delta/Iceberg ``OPTIMIZE
ZORDER BY`` — implemented here with plain DataFrame ops:
repartitionByRange(zval) + sortWithinPartitions(zval) + parquet.

The curve math itself is the oracle-matched registry query
``x26_zorder_curve`` (queries_ext18.py — DuckDB computes the
identical bit arithmetic); the pruning WIN is measured on real
parquet footer stats in tests/test_layout.py, not asserted by
hand-waving.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZORDER_BITS = 16


def morton_code(x: Column, y: Column, bits: int = ZORDER_BITS) -> Column:
    """Interleave the low ``bits`` of x (even positions) and y (odd
    positions) into one long. Pure shift/mask — whole-stage codegen,
    no UDF."""
    mask = (1 << bits) - 1
    xm = x.bitwiseAND(F.lit(mask))
    ym = y.bitwiseAND(F.lit(mask))
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(xm, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(ym, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def zorder_write(
    df: DataFrame,
    x_col: str,
    y_col: str,
    path: str,
    n_files: int = 8,
    bits: int = ZORDER_BITS,
) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered along the
    (x, y) Morton curve.

    repartitionByRange on the curve key gives each output file a
    contiguous curve segment (range exchange uses sampled bounds — no
    driver-side sort); sortWithinPartitions tightens row-group stats
    inside each file. The helper key is dropped before writing so the
    on-disk schema is the caller's. At cluster scale n_files maps to
    the target file-size policy (e.g. total_bytes / 512 MB), and the
    same two lines run unchanged.
    """
    keyed = df.withColumn("_sds_z", morton_code(F.col(x_col), F.col(y_col), bits))
    (
        keyed.repartitionByRange(n_files, "_sds_z")
        .sortWithinPartitions("_sds_z")
        .drop("_sds_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def files_matching_box(
    path: str,
    x_col: str,
    x_lo: int,
    x_hi: int,
    y_col: str,
    y_lo: int,
    y_hi: int,
) -> tuple[int, int]:
    """(files that COULD contain rows in the box, total files), judged
    purely by parquet footer min/max stats — i.e. exactly what a
    stats-based scan planner can skip without reading data pages.

    Test/audit helper (driver-side, reads only footers — bytes per
    file, not data). The production path is the engine's own
    pushdown; this measures what that pushdown has to work with.
    """
    import os

    import pyarrow.parquet as pq

    parts = sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith(".parquet")
    )
    hit = 0
    for f in parts:
        md = pq.ParquetFile(f).metadata
        overlaps = False
        for rg in range(md.num_row_groups):
            row_group = md.row_group(rg)
            stats = {}
            for ci in range(row_group.num_columns):
                col = row_group.column(ci)
                name = col.path_in_schema
                if name in (x_col, y_col) and col.statistics is not None:
                    stats[name] = (col.statistics.min, col.statistics.max)
            if x_col in stats and y_col in stats:
                (xmn, xmx), (ymn, ymx) = stats[x_col], stats[y_col]
                if xmn <= x_hi and xmx >= x_lo and ymn <= y_hi and ymx >= y_lo:
                    overlaps = True
                    break
            else:  # missing stats: cannot skip
                overlaps = True
                break
        hit += int(overlaps)
    return hit, len(parts)


def compact_parquet(
    spark,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    min_files_to_compact: int = 2,
    enforce_single_writer: bool = True,
) -> dict:
    """Rewrite a parquet directory's many small files into ~target-size
    files — the OPTIMIZE/compaction maintenance pass every streaming
    sink eventually needs (each micro-batch commit writes
    files-per-trigger × partitions small files; a month of 1-minute
    triggers turns a table scan into an open()-bound listing crawl,
    and at 100 TB the NameNode/listing cost dominates long before the
    bytes do).

    Sizing: output file count = ceil(current_bytes / target) measured
    from the ACTUAL on-disk footprint (not row counts — compression
    ratios vary per table). The rewrite is repartition(n) + overwrite
    via a temp directory, then a two-rename swap. POSIX has no atomic
    directory exchange, so the swap has a WINDOW between the two
    renames where ``path`` does not exist: a reader listing exactly
    then fails with path-not-found (it never sees a half-written mix
    — each listing is all-old or all-new), and a crash inside the
    window leaves the data parked at ``<path>.compact.old`` for
    manual recovery. Run it when the table is quiet, or under the
    same single-writer lock as write_if_absent; Delta/Iceberg
    OPTIMIZE is the upgrade that closes the window with a real
    atomic commit.

    ``enforce_single_writer`` (default on): takes a SIBLING lock file
    (``<path>.compact.lock`` — beside the directory, because the swap
    renames the directory out from under anything stored inside it)
    to exclude concurrent compactions, and refuses when a keyed
    writer's in-dir ``_sds_writer.lock`` is present. Advisory and
    best-effort like the writer lock itself: a writer that STARTS
    after the check still races the swap, so schedule compaction in
    the same maintenance slot that owns writes.

    Returns {files_before, files_after, bytes} for observability.
    Skips (and reports) when the directory already has fewer than
    ``min_files_to_compact`` data files.
    """
    import json
    import os
    import shutil
    import time

    def _data_files(p):
        return [
            os.path.join(p, f)
            for f in os.listdir(p)
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        ]

    lock_fd = None
    lock = path.rstrip("/") + ".compact.lock"
    if enforce_single_writer:
        writer_lock = os.path.join(path, "_sds_writer.lock")
        if os.path.exists(writer_lock):
            raise RuntimeError(
                f"keyed writer holds {writer_lock}; compacting under an "
                "active writer would drop its in-flight append"
            )
        try:
            lock_fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            raise RuntimeError(
                f"another compaction holds {lock} (remove only if its "
                "owner is dead — it carries pid + timestamp)"
            ) from None
    try:
        if enforce_single_writer:
            # content write INSIDE the try: if it fails (disk full,
            # signal) the finally still releases the .compact.lock
            with os.fdopen(lock_fd, "w") as fh:
                fh.write(json.dumps({"pid": os.getpid(), "ts": time.time()}))
        # Stale-swap detection AFTER the lock (a live compaction
        # legitimately has .compact.old between its renames — the lock
        # check above reports THAT case correctly as a concurrent
        # holder) but BEFORE any expensive work: a crash after the
        # second rename but before the rmtree leaves the previous data
        # parked at <path>.compact.old, and a later run would only
        # discover it at os.rename(path, old) — after the full Spark
        # rewrite — with an ENOTEMPTY that reads like corruption.
        stale_old = path.rstrip("/") + ".compact.old"
        if os.path.exists(stale_old):
            raise RuntimeError(
                f"stale {stale_old} found (a prior compaction crashed "
                "after its swap); verify the table, then delete the "
                ".compact.old directory before compacting again"
            )

        before = _data_files(path)
        total = sum(os.path.getsize(f) for f in before)
        if len(before) < min_files_to_compact:
            return {"files_before": len(before), "files_after": len(before),
                    "bytes": total, "skipped": True}

        n_out = max(1, -(-total // target_file_bytes))  # ceil
        tmp = path.rstrip("/") + ".compact.tmp"
        old = path.rstrip("/") + ".compact.old"
        (
            spark.read.parquet(path)
            .repartition(n_out)
            .write.mode("overwrite")
            .parquet(tmp)
        )
        os.rename(path, old)
        os.rename(tmp, path)
        shutil.rmtree(old)
    finally:
        if enforce_single_writer:
            os.remove(lock)
    return {
        "files_before": len(before),
        "files_after": len(_data_files(path)),
        "bytes": total,
        "skipped": False,
    }
