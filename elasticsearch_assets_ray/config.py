"""Validated configuration dataclasses.

The reference validates operator configs with convict schemas plus
``selfValidation`` / ``crossValidation`` hooks (e.g. "slicers must not
exceed the id alphabet size", ``/root/reference/asset/id_reader/index.js:108-126``).
We mirror that with eagerly-validated dataclasses.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class BM25Params:
    """BM25 scoring parameters (k1=1.2, b=0.75 per the north rule)."""

    k1: float = 1.2
    b: float = 0.75
    # when set, top-k cuts preserve ties under round(score, round_decimals)
    # — any doc whose ROUNDED score equals the rounded kth-best survives
    # every per-shard / merge truncation, so a downstream re-rank on
    # rounded scores (the oracle comparison policy) can never lose a tie
    # member to an upstream cut
    round_decimals: int | None = None

    def __post_init__(self) -> None:
        if self.k1 < 0:
            raise ValueError(f"k1 must be >= 0, got {self.k1}")
        if not (0.0 <= self.b <= 1.0):
            raise ValueError(f"b must be in [0, 1], got {self.b}")
        if self.round_decimals is not None and self.round_decimals < 0:
            raise ValueError("round_decimals must be None or >= 0")


@dataclass(frozen=True)
class IndexConfig:
    """Configuration for an inverted-index build.

    Sizing defaults descend from the reference's operational constants
    (reader slice 5k docs, ``asset/elasticsearch_reader/index.js:48-58``;
    bulk batch 500, ``asset/elasticsearch_bulk/index.js:176-186``) scaled to
    Arrow-batch processing.

    Scale notes (100 TB / 10^12 docs): ``partition_target_docs`` bounds the
    docs a single tokenize task holds; ``shard_target_docs`` bounds the doc
    range a merged segment covers, which in turn bounds the posting list of
    even a 100%-df term within one merge group — the shard id acts as the
    doc-range salt for skewed terms (SURVEY.md §7.3).  Both are constants
    per doc, so the plan scales linearly with corpus size.
    """

    analyzer: str = "code"
    bm25: BM25Params = field(default_factory=BM25Params)
    block_size: int = 128  # postings per block-max block
    partition_target_docs: int = 5_000  # docs per tokenize partition
    shard_target_docs: int = 40_000  # docs per index shard (merge salt range)
    min_token_len: int = 1
    max_token_len: int = 64
    # corpus schema binding — the reference is schema-less (any JSON doc,
    # ``asset/elasticsearch_reader/reader.js:14-28``); we bind columns by
    # name instead: the indexed text column, an optional analyzer-selector
    # column, an optional original-id column (the ES ``_key`` / preserve_id
    # analogue, ``asset/elasticsearch_index_selector/index.js:45-56``), and
    # passthrough metadata columns stored in the doc store.
    text_col: str = "content"
    lang_col: str | None = "lang"
    id_col: str | None = None
    meta_cols: tuple[str, ...] = ("repo", "path")
    # ingest-time derived fields (the ES ingest-pipeline analogue; the
    # reference's index_selector computes per-doc fields the same way,
    # ``asset/elasticsearch_index_selector/index.js:45-56``): each spec is
    # a parameterized recipe string ``"<col>=<kind>:<args>"`` resolved by
    # ``index.build.parse_derived_meta`` — strings (not callables) so the
    # spec travels in the build manifest's plan fingerprint and resolves
    # identically inside Ray workers.  A derived column is computed per
    # partition right after the projected read and stored in docmeta when
    # listed in ``meta_cols``.  Supported kinds:
    #   ``ts_from_int:<src_col>:<epoch0_s>:<mult>:<mod_s>`` — a
    #   deterministic timestamp[us] spread over [epoch0, epoch0+mod):
    #   ``epoch0 + (src * mult) % mod`` seconds (SQL-reproducible).
    derived_meta: tuple[str, ...] = ()
    # "fused": tokenize+merge in one task per shard — the shard→partition
    # routing is fixed at plan time, so the partials exchange is a planned
    # no-op and the generic sort shuffle is skipped entirely (measured to
    # dominate build wall time).  "groupby": explicit
    # groupby(shard_id).map_groups exchange — the general mechanism, used
    # when partials must actually move (and as the semantic reference).
    merge_strategy: str = "fused"
    # posting-stream codec: "varint" (LEB128 gaps, batch-encoded fast
    # path) or "for" (per-block frame-of-reference bit packing — the
    # PForDelta family without exception patching; smaller streams,
    # non-batched encode)
    postings_codec: str = "varint"
    # store per-posting token positions (Lucene-style positional index):
    # adds a `positions` blob column to every segment (varint in-doc
    # position gaps, absolute restart per doc) and enables phrase
    # queries (QueryEngine.search_phrase).  Off by default — positions
    # roughly double segment size for prose corpora.
    store_positions: bool = False
    # ES ``index_phrases: true``: additionally index 2-token SHINGLES
    # (``t1\x1ft2`` terms with the first token's position) so exact
    # phrase queries run as term lookups (2-term phrases) or
    # low-df shingle intersections (longer) instead of unigram
    # position intersections — the index-time answer to hot-hot
    # phrases.  Costs index size/build time (off by default, like ES);
    # requires store_positions.  Doc lengths, avgdl, dictionary walks
    # (prefix/wildcard/fuzzy) and BM25 stats all stay UNIGRAM.
    index_phrases: bool = False
    # With index_phrases: also store the SHINGLE terms' positional
    # payloads.  2-term phrases never read them (pf = the shingle's tf)
    # — only 3+-term phrases use shingle positions for their slot
    # intersection.  ``False`` halves the positional layout weight for
    # 2-term-dominant workloads; 3+-term phrases then fall back to the
    # (identical-result) unigram position path.  Layout-affecting.
    shingle_positions: bool = True

    def __post_init__(self) -> None:
        if self.block_size < 8:
            raise ValueError(f"block_size must be >= 8, got {self.block_size}")
        if self.partition_target_docs < 1:
            raise ValueError("partition_target_docs must be >= 1")
        if self.shard_target_docs < self.partition_target_docs:
            # a shard is a contiguous range of whole partitions
            raise ValueError(
                "shard_target_docs must be >= partition_target_docs "
                f"({self.shard_target_docs} < {self.partition_target_docs})"
            )
        if not (1 <= self.min_token_len <= self.max_token_len):
            raise ValueError("need 1 <= min_token_len <= max_token_len")
        if self.analyzer == "per_lang" and self.lang_col is None:
            raise ValueError("analyzer='per_lang' requires lang_col")
        if self.merge_strategy not in ("fused", "groupby"):
            raise ValueError(f"unknown merge_strategy {self.merge_strategy!r}")
        if self.postings_codec not in ("varint", "for"):
            raise ValueError(f"unknown postings_codec {self.postings_codec!r}")
        if self.index_phrases and not self.store_positions:
            raise ValueError("index_phrases requires store_positions")
        if not self.index_phrases and not self.shingle_positions:
            # normalize: without shingles the flag is meaningless, and a
            # normalized value keeps plan fingerprints stable
            object.__setattr__(self, "shingle_positions", True)
        for spec in self.derived_meta:
            if "=" not in spec:
                raise ValueError(f"derived_meta spec needs '=': {spec!r}")
            name = spec.split("=", 1)[0]
            if name not in self.meta_cols:
                raise ValueError(
                    f"derived column {name!r} must be listed in meta_cols "
                    "to be stored in docmeta"
                )
