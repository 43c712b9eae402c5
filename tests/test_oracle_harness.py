"""Meta-tests of the oracle gate itself: a differential harness that
cannot FAIL is worse than none — every green sweep leans on `compare`
actually raising for each mismatch class, so prove it does."""

from __future__ import annotations

import pandas as pd
import pytest

from tests.oracle import compare


def _sdf(spark, pdf):
    return spark.createDataFrame(pdf)


def test_compare_passes_on_equal_frames_any_order(spark):
    got = _sdf(spark, pd.DataFrame({"k": [2, 1], "v": [2.0, 1.0]}))
    want = pd.DataFrame({"v": [1.0, 2.0], "k": [1, 2]})  # cols+rows reordered
    compare(got, want, "equal")


def test_compare_raises_on_rowcount_mismatch(spark):
    got = _sdf(spark, pd.DataFrame({"k": [1, 2]}))
    with pytest.raises(AssertionError, match="rowcount"):
        compare(got, pd.DataFrame({"k": [1]}), "rows")


def test_compare_raises_on_column_mismatch(spark):
    got = _sdf(spark, pd.DataFrame({"k": [1]}))
    with pytest.raises(AssertionError, match="column mismatch"):
        compare(got, pd.DataFrame({"other": [1]}), "cols")


def test_compare_raises_on_value_mismatch(spark):
    got = _sdf(spark, pd.DataFrame({"k": [1, 2], "s": ["a", "b"]}))
    want = pd.DataFrame({"k": [1, 2], "s": ["a", "X"]})
    with pytest.raises(AssertionError, match="mismatch at row"):
        compare(got, want, "vals")


def test_compare_raises_on_one_ulp_float_drift_and_labels_it(spark):
    """Floats are compared EXACTLY (atol=0) — a 1-ulp cross-engine
    drift must fail, and the message must flag it as rounding drift
    so the fix (round the order-dependent sum) is obvious."""
    import numpy as np

    base = 1.2345
    drifted = np.nextafter(base, 2.0)
    got = _sdf(spark, pd.DataFrame({"v": [base]}))
    with pytest.raises(AssertionError, match="rounding drift"):
        compare(got, pd.DataFrame({"v": [drifted]}), "ulp")


def test_compare_accepts_nan_equals_nan_and_null_pairs(spark):
    got = _sdf(spark, pd.DataFrame({"v": [float("nan"), 1.0], "s": [None, "x"]}))
    want = pd.DataFrame({"v": [float("nan"), 1.0], "s": [None, "x"]})
    compare(got, want, "nans")


def test_compare_distinguishes_null_from_value(spark):
    got = _sdf(spark, pd.DataFrame({"s": ["a", None]}))
    want = pd.DataFrame({"s": ["a", "b"]})
    with pytest.raises(AssertionError):
        compare(got, want, "null-vs-value")


def test_run_oracle_rejects_uncast_integer_sum():
    """The r7 blind spot, closed: DuckDB's integer sum() binds to
    HUGEINT, which the driver's engine-type hash distinguishes from
    BIGINT but fetchdf() coerces away. run_oracle must fail FAST on an
    un-CAST sum() so the defect can't ride an unverified wave again."""
    import duckdb

    from tests.oracle import run_oracle

    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM (VALUES (1), (2)) v(x)")
    with pytest.raises(AssertionError, match="HUGEINT"):
        run_oracle(con, "SELECT sum(x) AS s FROM t", "uncast-sum")
    # the pinned fix passes, value intact
    out = run_oracle(con, "SELECT CAST(sum(x) AS BIGINT) AS s FROM t", "cast-sum")
    assert out["s"].iloc[0] == 3
    con.close()


def test_compare_raises_on_float_null_vs_zero(spark):
    """The gate's historical blind spot: a float NULL/NaN on one side
    must NOT equal 0.0 on the other (fillna(0) alone would let a
    query emitting NULL where the oracle emits 0.0 sail through every
    sweep)."""
    got = _sdf(spark, pd.DataFrame({"v": [float("nan"), 1.0]}))
    want = pd.DataFrame({"v": [0.0, 1.0]})
    with pytest.raises(AssertionError, match="float mismatch"):
        compare(got, want, "null-vs-zero")
    with pytest.raises(AssertionError, match="float mismatch"):
        compare(_sdf(spark, want), pd.DataFrame({"v": [float("nan"), 1.0]}), "zero-vs-null")
