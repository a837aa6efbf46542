"""Driver contract for the graft builder (Ray Data target).

Thin delegation to :mod:`elasticsearch_assets_ray.pipelines.contract`,
which holds every implemented pipeline from SURVEY.md §2 (plus the
training-data ops: dedup, similarity search, text analysis) and their
DuckDB oracle SQL.

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the library) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from elasticsearch_assets_ray.pipelines import contract as _contract


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: parquet corpus →
    inverted-index build (checkpoint-resumable) → actor-pool BM25 top-k →
    doc-store hydration."""
    return _contract.entry()


def queries() -> dict[str, Callable[[str], Any]]:
    return _contract.queries()


def oracle_sql() -> dict[str, str]:
    return _contract.oracle_sql()
