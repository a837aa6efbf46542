"""Trusted pure-Python BM25 oracle for conformance testing.

Plays the role the reference's ``MockClient`` + live Elasticsearch played
in its jest suite (``/root/reference/test/mock_client.js:3-65``): a tiny,
obviously-correct implementation the distributed engine must match
rank-identically (scores equal within 1e-6; ties broken by ascending
doc_id — ES's behavior for equal ``_score``).

Deliberately shares NOTHING with the engine except the tokenizer module
(so tokenization is never the divergence) — dict-of-dicts index, plain
``math.log``, no codec, no numpy scoring.

Determinism contract (both sides pin the same accumulation order, SURVEY.md
§7.4): per document, term contributions are summed in sorted-unique-term
order, float64 throughout; idf uses the Lucene/ES formula
``ln(1 + (N - df + 0.5) / (df + 0.5))`` with GLOBAL df (ES "dfs_query_then_fetch").
"""

from __future__ import annotations

import math
from collections import Counter
from pathlib import Path

from ..analysis.tokenizer import analyzer_for_lang, clip_tokens, get_analyzer
from ..config import BM25Params


class BM25Oracle:
    def __init__(self, params: BM25Params | None = None):
        self.params = params or BM25Params()
        self.postings: dict[str, dict[int, int]] = {}  # term -> doc_id -> tf
        self.dl: dict[int, int] = {}

    @classmethod
    def from_docs(
        cls, docs: list[tuple[int, list[str]]], params: BM25Params | None = None
    ) -> "BM25Oracle":
        o = cls(params)
        for doc_id, tokens in docs:
            o.add(doc_id, tokens)
        return o

    @classmethod
    def from_parquet(
        cls,
        corpus: str | Path | list[str],
        analyzer: str = "code",
        text_column: str = "content",
        lang_column: str = "lang",
        params: BM25Params | None = None,
        min_token_len: int = 1,
        max_token_len: int = 64,
        file_order: list[str] | None = None,
    ) -> "BM25Oracle":
        """Read the corpus single-process (oracle scale only) with doc_id =
        global row number under sorted-file order — the engine's scheme.

        ``file_order``: explicit file sequence overriding the sorted-path
        default.  Pass an appended index's ``manifest.corpus_paths`` —
        appends keep existing files' doc ids frozen in MANIFEST order, so
        an appended file that sorts before existing ones would otherwise
        make oracle and engine doc ids diverge."""
        import pyarrow.parquet as pq

        from ..index.manifest import list_corpus_files

        o = cls(params)
        doc_id = 0
        files = file_order if file_order is not None else list_corpus_files(corpus)
        for f in files:
            tbl = pq.read_table(
                f,
                columns=[text_column] + ([lang_column] if analyzer == "per_lang" else []),
            )
            texts = tbl.column(text_column).to_pylist()
            langs = (
                tbl.column(lang_column).to_pylist()
                if analyzer == "per_lang"
                else [None] * len(texts)
            )
            for text, lang in zip(texts, langs):
                fn = analyzer_for_lang(lang) if analyzer == "per_lang" else get_analyzer(analyzer)
                o.add(doc_id, clip_tokens(fn(text), min_token_len, max_token_len))
                doc_id += 1
        return o

    def add(self, doc_id: int, tokens: list[str]) -> None:
        self.dl[doc_id] = len(tokens)
        for t, tf in Counter(tokens).items():
            self.postings.setdefault(t, {})[doc_id] = tf

    @property
    def num_docs(self) -> int:
        return len(self.dl)

    @property
    def avgdl(self) -> float:
        return sum(self.dl.values()) / len(self.dl) if self.dl else 0.0

    def idf(self, term: str) -> float:
        df = len(self.postings.get(term, ()))
        return math.log(1.0 + (self.num_docs - df + 0.5) / (df + 0.5))

    def search(self, query_tokens: list[str], k: int = 10) -> list[tuple[int, float]]:
        """Top-k (doc_id, score), score desc then doc_id asc."""
        k1, b = self.params.k1, self.params.b
        avgdl = self.avgdl
        scores: dict[int, float] = {}
        for term in sorted(set(query_tokens)):
            plist = self.postings.get(term)
            if not plist:
                continue
            w = self.idf(term)
            for doc_id, tf in plist.items():
                norm = tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * self.dl[doc_id] / avgdl))
                scores[doc_id] = scores.get(doc_id, 0.0) + w * norm
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]

    def search_bool(
        self,
        must: list[str] | None = None,
        should: list[str] | None = None,
        must_not: list[str] | None = None,
        filter: list[str] | None = None,
        k: int = 10,
        minimum_should_match: int | None = None,
    ) -> list[tuple[int, float]]:
        """ES bool-query oracle: set algebra over the dict index.

        Same clause semantics as ``QueryEngine.search_bool`` (must=AND
        scored, filter=AND unscored, must_not=NOT, should=optional scored
        with minimum_should_match defaulting to 1 only when no
        must/filter clause exists); scoring terms = distinct must∪should.
        """
        must = sorted(set(must or []))
        should = sorted(set(should or []))
        must_not = sorted(set(must_not or []))
        filter = sorted(set(filter or []))
        if not (must or should or filter):
            raise ValueError("bool query needs at least one positive clause")

        def docs_with(t: str) -> set[int]:
            return set(self.postings.get(t, ()))

        eligible = set(self.dl)
        for t in must + filter:
            eligible &= docs_with(t)
        for t in must_not:
            eligible -= docs_with(t)
        msm = minimum_should_match
        if msm is None:
            msm = 0 if (must or filter) else 1
        if msm > 0:
            eligible = {
                d for d in eligible
                if sum(d in docs_with(t) for t in should) >= msm
            }

        k1, b = self.params.k1, self.params.b
        avgdl = self.avgdl
        scores: dict[int, float] = {d: 0.0 for d in eligible}
        for term in sorted(set(must) | set(should)):
            w = self.idf(term)
            for doc_id, tf in self.postings.get(term, {}).items():
                if doc_id not in scores:
                    continue
                norm = tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * self.dl[doc_id] / avgdl))
                scores[doc_id] += w * norm
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]
