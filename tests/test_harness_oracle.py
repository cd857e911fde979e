"""Emulates the driver's correctness gate: every harness query with an oracle
is run via Spark AND DuckDB at sf0.001 and compared (row count + schema names
+ order-insensitive values). Rows-only queries are smoke-checked."""

import os

import duckdb
import pandas as pd
import pytest

from transmogrify_webcrawler_spark import harness

SF_DIR = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _norm(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
        elif "datetime" in str(pdf[c].dtype):
            pdf[c] = pdf[c].astype(str)
    return pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)


ORACLE_KEYS = sorted(harness.oracle_sql())
ROWS_ONLY = sorted(set(harness.queries()) - set(harness.oracle_sql())
                   - {"crawl_mini"})


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_matches_oracle(spark, ddb, name):
    got = harness.queries()[name](spark, SF_DIR).toPandas()
    want = ddb.sql(harness.oracle_sql()[name]).df()
    assert sorted(got.columns) == sorted(want.columns), name
    assert len(got) == len(want), (name, len(got), len(want))
    g, w = _norm(got), _norm(want)
    pd.testing.assert_frame_equal(g, w, check_dtype=False, check_exact=False,
                                  rtol=1e-9, atol=1e-9)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    df = harness.queries()[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
