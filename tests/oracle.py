"""Oracle-differential harness mirroring the driver's correctness gate:
run the Spark query and the DuckDB oracle SQL on the same parquet,
compare row-count + column set + order-insensitive values.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

# DuckDB types the driver's hash can produce for an oracle column but
# Spark never produces — e.g. integer sum() returns HUGEINT (int128).
# fetchdf() silently coerces these to int64/float64, so a value-exact
# pandas compare passes while the driver's engine-type-level hash fails
# (the r7 lesson: 13 driver-red queries, all this one artifact).
# PIN: always CAST(sum(<int>) AS BIGINT) in oracle SQL.
FORBIDDEN_DUCK_TYPES = frozenset(
    {"HUGEINT", "UHUGEINT", "UBIGINT", "UINTEGER", "USMALLINT", "UTINYINT"}
)


def check_oracle_types(rel, name: str = "") -> None:
    """Fail if a DuckDB relation exposes a type Spark cannot emit."""
    bad = [
        (c, str(t))
        for c, t in zip(rel.columns, rel.types)
        if str(t) in FORBIDDEN_DUCK_TYPES
    ]
    assert not bad, (
        f"{name}: oracle produces non-Spark-comparable DuckDB types {bad} — "
        f"wrap the expression, e.g. CAST(sum(...) AS BIGINT); the driver "
        f"hashes at the engine-type level and HUGEINT != BIGINT there"
    )


def run_oracle(con: duckdb.DuckDBPyConnection, sql: str, name: str = "") -> pd.DataFrame:
    """Run oracle SQL with the dtype gate applied BEFORE pandas coercion."""
    rel = con.sql(sql)
    check_oracle_types(rel, name)
    return rel.df()


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    out = df.copy()
    for c in out.columns:
        s = out[c]
        if isinstance(s.dtype, pd.DatetimeTZDtype):
            out[c] = s.dt.tz_localize(None)
        if str(out[c].dtype).startswith("datetime64"):
            out[c] = out[c].astype("datetime64[us]")
        elif s.dtype == object:
            pass
        elif np.issubdtype(s.dtype, np.integer):
            out[c] = s.astype("int64")
        elif np.issubdtype(s.dtype, np.floating):
            out[c] = s.astype("float64")
    out = out[sorted(out.columns)]
    return out.sort_values(by=list(out.columns), ignore_index=True, na_position="last")


def compare(spark_df, oracle_df: pd.DataFrame, name: str = "") -> None:
    got = _canon(spark_df.toPandas())
    want = _canon(oracle_df)
    assert list(got.columns) == list(want.columns), (
        f"{name}: column mismatch {list(got.columns)} vs {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: rowcount {len(got)} vs {len(want)}"
    for c in got.columns:
        g, w = got[c], want[c]
        if np.issubdtype(g.dtype, np.floating) or np.issubdtype(w.dtype, np.floating):
            g = g.astype("float64")
            w = w.astype("float64")
            both_nan = g.isna() & w.isna()
            # one-sided NaN/NULL must NOT equal anything: fillna(0)
            # alone would let NULL-vs-0.0 drift through the gate
            both_num = ~g.isna() & ~w.isna()
            eq = both_nan | (
                both_num & np.isclose(g.fillna(0), w.fillna(0), rtol=0, atol=0)
            )
            exact = eq.all()
            if not exact:
                close = (
                    both_nan
                    | (both_num & np.isclose(g.fillna(0), w.fillna(0), rtol=1e-9))
                ).all()
                bad = (~eq).idxmax()
                raise AssertionError(
                    f"{name}.{c}: float mismatch at row {bad}: {g[bad]!r} vs {w[bad]!r}"
                    + (" (within 1e-9 — rounding drift)" if close else "")
                )
        else:
            eq = (g.isna() & w.isna()) | (g == w)
            if not eq.all():
                bad = (~eq).idxmax()
                raise AssertionError(
                    f"{name}.{c}: mismatch at row {bad}: {g[bad]!r} vs {w[bad]!r}"
                )
