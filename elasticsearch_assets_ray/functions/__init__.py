"""Scalar/UDF function surface — the engine's equivalent of the
reference's script hooks and utility transforms (§2.9/§2.11): pure batch
functions usable inside any ``map_batches`` stage, re-exported from their
home modules, plus the user-extension registry.

Register a custom analyzer (the reference's operator-plugin analogue)::

    from elasticsearch_assets_ray.functions import register_analyzer
    register_analyzer("my_lang", lambda text: text.split())
"""

from ..analysis.tokenizer import (  # noqa: F401
    code_tokens,
    get_analyzer,
    register_analyzer,
    simple_tokens,
    text_tokens,
)
from ..ops.geo import haversine_meters, parse_distance, parse_point  # noqa: F401
from ..ops.routing import timeseries_index_name  # noqa: F401
from ..ops.textstats import quality_score, token_count_batch  # noqa: F401
from ..sources.query import compile_query  # noqa: F401
from ..sources.reader import parse_date  # noqa: F401

__all__ = [
    "code_tokens",
    "simple_tokens",
    "text_tokens",
    "get_analyzer",
    "register_analyzer",
    "haversine_meters",
    "parse_distance",
    "parse_point",
    "timeseries_index_name",
    "quality_score",
    "token_count_batch",
    "compile_query",
    "parse_date",
]
