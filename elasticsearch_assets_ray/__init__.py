"""elasticsearch_assets_ray — a Ray-Data-native full-text indexing and
search engine with the capability surface of terascope/elasticsearch-assets.

The reference (``/root/reference``, v1.6.1) is a Teraslice operator bundle
that adaptively slices an Elasticsearch keyspace, transforms record arrays
into bulk requests, and writes them back — delegating the actual inverted
index build and BM25 scoring to Elasticsearch itself.  This package
implements BOTH halves from scratch on Ray Data:

* the engine ES provided: inverted index build (code-aware tokenization,
  delta+varint compressed posting lists, block-max metadata, shard merge via
  a ``groupby`` shuffle with doc-range salting for skewed terms) and BM25
  top-k serving (block-max WAND in stateful scorer actors) — see
  :mod:`~elasticsearch_assets_ray.index` and
  :mod:`~elasticsearch_assets_ray.search`;
* the reference's operator surface: adaptive date-range / id-prefix
  partition planning (``planner``), index routing + action modes (``ops``),
  bulk sink semantics, cached state storage, deterministic data generation
  (``corpus``);
* the large-scale training-data ops a 100 TB pipeline needs: dedup
  (exact / Jaccard / MinHash-LSH / SimHash / embedding-cosine), similarity
  search, text analysis, geo filters, multimodal plumbing (``ops``);
* filtered/projected reads with a lucene-style query compiler
  (``sources``) and the mget-style doc store (``state``).

Everything is expressed Ray-Data-first: ``ray.data.Dataset`` pipelines over
zero-copy Arrow batches, actor pools for stateful stages, explicit
partitioning for the wide steps.  No module calls ``ray.init()``.
"""

__version__ = "0.1.0"

from .config import BM25Params, IndexConfig  # noqa: E402
from .index.build import IndexInfo, build_index  # noqa: E402
from .index.compact import compact_index  # noqa: E402
from .index.deletes import delete_docs  # noqa: E402
from .index.global_merge import (  # noqa: E402
    append_global_postings,
    merge_global_postings,
    refresh_global_postings,
)
from .index.persistent import PersistentIndexer  # noqa: E402
from .search.engine import (  # noqa: E402
    QueryEngine,
    score_queries_dataset,
    score_queries_dataset_distributed,
)
from .search.multifield import MultiFieldEngine  # noqa: E402
from .search.term_engine import TermPartitionedEngine  # noqa: E402

__all__ = [
    "BM25Params",
    "IndexConfig",
    "IndexInfo",
    "MultiFieldEngine",
    "PersistentIndexer",
    "QueryEngine",
    "TermPartitionedEngine",
    "append_global_postings",
    "build_index",
    "compact_index",
    "delete_docs",
    "merge_global_postings",
    "refresh_global_postings",
    "score_queries_dataset",
    "score_queries_dataset_distributed",
    "__version__",
]
