"""Local replica of the driver's oracle gate: run a registry query on
Spark and its SQL twin on DuckDB over the same parquet, compare
row-count, column names, and order-insensitive values.

Used by tests/test_oracle_parity.py so every mismatch is caught before
the driver's per-round CORRECTNESS check."""

from __future__ import annotations

import math

import duckdb

from cryptocoininsights_data_engineer_project_spark.catalog import TABLES

REL_TOL = 1e-9


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _normalize(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if hasattr(v, "isoformat"):  # date/datetime
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_normalize(x) for x in v)
    try:  # Decimal → float
        import decimal

        if isinstance(v, decimal.Decimal):
            return float(v)
    except Exception:
        pass
    return v


def _rows_to_multiset(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(_normalize(r[i]) for i in idx))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


def _values_close(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        return math.isclose(a, b, rel_tol=REL_TOL, abs_tol=1e-9)
    return a == b


# DuckDB result type → the Spark simpleString type(s) it should pair
# with. The driver's gate compares schemas, so a BIGINT oracle column
# against a Spark int (ntile, year, size, ...) is a formal mismatch
# even when every value agrees — catch it locally.
_DUCK_TO_SPARK = {
    "BIGINT": {"bigint"},
    "INTEGER": {"int"},
    "SMALLINT": {"smallint"},
    "TINYINT": {"tinyint"},
    "DOUBLE": {"double"},
    "FLOAT": {"float"},
    "VARCHAR": {"string"},
    "BOOLEAN": {"boolean"},
    "DATE": {"date"},
    "TIMESTAMP": {"timestamp", "timestamp_ntz"},
    "TIMESTAMP WITH TIME ZONE": {"timestamp"},
}


def _type_problems(spark_df, res, name: str) -> list[str]:
    spark_types = dict(spark_df.dtypes)
    problems = []
    for col, duck_t in zip(
        [c[0] for c in res.description], [str(c[1]) for c in res.description]
    ):
        expected = _DUCK_TO_SPARK.get(duck_t)
        s_t = spark_types.get(col)
        if duck_t.startswith("DECIMAL"):
            expected = {duck_t.lower().replace(" ", "")}
        if expected is None:  # lists/structs/hugeint: values-only compare
            continue
        if s_t is not None and s_t not in expected:
            problems.append(
                f"{name}: column {col} type mismatch spark={s_t} duck={duck_t}"
            )
    return problems


def compare(spark_df, con, sql: str, name: str = "") -> list[str]:
    """Return a list of mismatch descriptions (empty = pass)."""
    problems: list[str] = []
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    res = con.execute(sql)
    d_cols = [c[0] for c in res.description]
    d_rows = res.fetchall()

    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"{name}: columns differ spark={sorted(s_cols)} duck={sorted(d_cols)}")
        return problems
    problems.extend(_type_problems(spark_df, res, name))
    if len(s_rows) != len(d_rows):
        problems.append(f"{name}: row count spark={len(s_rows)} duck={len(d_rows)}")
    s_norm = _rows_to_multiset(s_cols, s_rows)
    d_norm = _rows_to_multiset(d_cols, d_rows)
    for i, (sr, dr) in enumerate(zip(s_norm, d_norm)):
        if len(sr) != len(dr) or not all(_values_close(a, b) for a, b in zip(sr, dr)):
            problems.append(f"{name}: first differing row #{i}: spark={sr} duck={dr}")
            break
    return problems
