import hashlib

import numpy as np
import pyarrow.parquet as pq

from elasticsearch_assets_ray.analysis.tokenizer import code_tokens
from elasticsearch_assets_ray.corpus.synth import (
    make_corpus_batch,
    make_gen_docs,
    reference_queries,
)


def test_determinism_independent_of_batching():
    a = make_corpus_batch(np.arange(0, 50))
    b1 = make_corpus_batch(np.arange(0, 25))
    b2 = make_corpus_batch(np.arange(25, 50))
    import pyarrow as pa

    assert a.equals(pa.concat_tables([b1, b2]))


def test_schema_and_content(small_corpus):
    files = sorted(__import__("pathlib").Path(small_corpus).glob("*.parquet"))
    tbl = pq.read_table(files[0])
    assert tbl.column_names == ["repo", "path", "commit", "lang", "content"]
    row = tbl.slice(0, 1).to_pylist()[0]
    assert len(row["commit"]) == 40
    assert row["content"]


def test_hot_token_skew(small_corpus):
    import pathlib

    n_hot = total = 0
    for f in sorted(pathlib.Path(small_corpus).glob("*.parquet")):
        for text in pq.read_table(f, columns=["content"]).column("content").to_pylist():
            toks = set(code_tokens(text))
            total += 1
            if "import" in toks or "return" in toks:
                n_hot += 1
    assert n_hot / total >= 0.6  # FIXTURES.md skew requirement


def test_hot_repo_exists(small_corpus):
    import pathlib
    from collections import Counter

    c = Counter()
    for f in sorted(pathlib.Path(small_corpus).glob("*.parquet")):
        c.update(pq.read_table(f, columns=["repo"]).column("repo").to_pylist())
    counts = sorted(c.values())
    median = counts[len(counts) // 2]
    assert max(counts) >= 5 * median  # one dominating repo


def test_reference_queries_shape():
    q = reference_queries()
    assert q.column_names == ["query_id", "query", "k"]
    assert q.num_rows >= 15
    assert "zzzzqqqq" in q.column("query").to_pylist()  # absent-term query


def test_gen_docs_deterministic_and_routed():
    a = make_gen_docs(20, seed=1)
    b = make_gen_docs(20, seed=1)
    assert a.equals(b)
    c = make_gen_docs(10, seed=2, id_start_key="a")
    assert all(i.startswith("a") for i in c.column("id").to_pylist())
