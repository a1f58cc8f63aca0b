"""Local mirror of the driver's Spark-vs-DuckDB compare.

Row-count + column-name + order-insensitive value compare, with the
same normalization spirit the driver uses (sort columns by name, sort
rows, compare values; floats rounded)."""

from __future__ import annotations

import math

import duckdb

from isidorus_web_scraper_spark.sources.testdata import TABLE_NAMES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    conn = duckdb.connect()
    for name in TABLE_NAMES:
        conn.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    return conn


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def compare(spark_df, conn, sql: str) -> None:
    spark_rows = spark_df.collect()
    spark_cols = sorted(spark_df.columns)
    rel = conn.sql(sql)
    duck_cols = sorted(rel.columns)
    assert spark_cols == duck_cols, f"columns differ: {spark_cols} vs {duck_cols}"
    duck_rows = rel.fetchall()
    assert len(spark_rows) == len(duck_rows), (
        f"row counts differ: spark={len(spark_rows)} duckdb={len(duck_rows)}"
    )
    col_order = {c: i for i, c in enumerate(rel.columns)}

    def _sort_key(row):
        # None sorts before any value without ever comparing None to a
        # concrete type (tuple compare short-circuits on the flag)
        return tuple((v is not None, 0 if v is None else v) for v in row)

    duck_sorted = sorted(
        (
            tuple(_norm(r[col_order[c]]) for c in duck_cols)
            for r in duck_rows
        ),
        key=_sort_key,
    )
    spark_sorted = sorted(
        (tuple(_norm(r[c]) for c in spark_cols) for r in spark_rows),
        key=_sort_key,
    )
    for i, (s, d) in enumerate(zip(spark_sorted, duck_sorted)):
        assert s == d, f"row {i} differs:\n  spark={s}\n  duck ={d}"
