"""Driver-contract parity: every oracle-checked query must match its
DuckDB SQL bit-exactly (the driver compares value hashes, so rtol is not
enough).  Runs at sf0.001 to stay fast; the driver gate re-runs the same
comparison at sf0.01."""

import duckdb
import pandas as pd
import pytest

from elasticsearch_assets_ray.pipelines import contract

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return c


@pytest.mark.parametrize("name", sorted(contract.oracle_sql()))
def test_oracle_parity_bit_exact(name, con, ray_session):
    got = contract.queries()[name](SF_DIR)
    df = got.to_pandas() if hasattr(got, "to_pandas") else got
    want = con.execute(contract.oracle_sql()[name]).fetchdf()
    a = df[sorted(df.columns)].sort_values(sorted(df.columns)).reset_index(drop=True)
    b = want[sorted(want.columns)].sort_values(sorted(want.columns)).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)


def test_rows_only_queries_nonempty(ray_session):
    qs = contract.queries()
    for name in ["minhash_pairs", "simhash_pairs", "lang_id", "knn_lsh", "date_slices"]:
        res = qs[name](SF_DIR)
        df = res.to_pandas() if hasattr(res, "to_pandas") else res
        assert len(df) >= 0  # runs, stable schema
        assert len(df.columns) >= 2


def test_entry_runs(ray_session):
    res = contract.entry()
    df = res.to_pandas() if hasattr(res, "to_pandas") else res
    assert len(df) > 0
    assert {"query_id", "rank", "doc_id", "score"} <= set(df.columns)
