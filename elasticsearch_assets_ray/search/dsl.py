"""ES JSON query DSL → clause trees, including the ``wrapper`` query.

The reference forwards request bodies to Elasticsearch verbatim — a
user's saved queries are JSON DSL objects (``{"bool": {...}}``,
``{"match": {...}}``), not Lucene strings
(``/root/reference/asset/elasticsearch_reader/index.js:106-127`` builds
exactly such bodies; ``asset/simple_api_reader/index.js:67-84``
translates them for the API transport).  This module closes the gap
between that JSON surface and the engines' clause-tree machinery: it
compiles a *documented subset* of the JSON DSL into the same eval_tree
nodes :mod:`.sqs` / :mod:`.qs` produce, so BOTH serving engines run
JSON queries through their existing ``_eval_sqs_tree`` paths with
Lucene BooleanQuery scoring — nothing engine-specific lives here.

The ``wrapper`` query (``{"wrapper": {"query": "<base64 JSON>"}}``) is
ES's escape hatch for embedding a raw DSL body inside another request;
it decodes and recurses, so wrappers nest arbitrarily.

Supported query kinds (one top-level key per query object, as in ES):

- ``match`` — analyzed text, ``operator`` ``"or"``/``"and"`` (OR/AND
  fold of term leaves); on a non-default field: docmeta equality
  (constant score 1.0 — the same disclosed keyword divergence as
  :mod:`.qs`).
- ``match_phrase`` — analyzed phrase with ``slop`` (slop > 0 runs the
  in-repo Lucene SloppyPhraseMatcher, the eval_tree contract).
- ``term`` / ``terms`` — NOT analyzed (the ES contract): on the
  default text field a raw lowercase token leaf, elsewhere docmeta
  equality; ``terms`` is the OR fold.
- ``range`` — ``gt``/``gte``/``lt``/``lte`` bounds (numbers or ISO
  dates — the engines coerce, timestamps compare in epoch micros).
- ``exists`` — docmeta non-null, constant score 1.0.
- ``prefix`` / ``wildcard`` / ``fuzzy`` — dictionary multi-term
  queries on the default text field, same leaves and rewrites as
  ``query_string`` (prefix/wildcard constant_score 1.0; fuzzy is the
  scoring_boolean dictionary expansion).
- ``bool`` — ``must`` (scored AND), ``filter`` (non-scoring gate:
  ``("filter", scored, required)`` keeps only the scored side's
  scores, the ES filter-context contract), ``should`` (scored OR;
  with ``must``/``filter`` present and ``minimum_should_match`` 0 —
  the ES default — shoulds are optional score boosts), ``must_not``
  (AND-NOT).  ``minimum_should_match`` takes any non-negative
  integer: m ≥ 2 compiles to the ``("msm", m, children)`` count node
  (≥ m should clauses must match; score = sum of ALL matching
  shoulds, the Lucene contract); ES's percentage/negative spellings
  are not modeled (disclosed).
- ``dis_max`` / ``boosting`` / ``constant_score`` — the compound
  nodes the engines already evaluate.
- ``query_string`` / ``simple_query_string`` — delegate to the
  existing parsers (full respective grammars).
- ``wrapper`` — base64-decode and recurse.
- every leaf accepts ES's ``boost`` parameter (``("boost", node, f)``).

- ``match_all`` — an exists gate over the always-present ``doc_id``
  doc value at constant score 1.0 (``boost`` honored); ``match_none``
  → None (matches nothing).
- ``span_*`` kinds (span_term / span_or / span_near / span_first /
  span_not incl. the ``dist`` sugar / span_containing / span_within /
  span_multi over prefix-wildcard-regexp-fuzzy) — normalized from the
  ES JSON form to the engines' native span trees
  (:func:`normalize_span`) and routed to ``search_spans`` by
  :func:`search_dsl` (wrapper-wrapped spans included);
  ``field_masking_span`` needs per-field mask engines — use
  ``MultiFieldEngine.search_spans`` directly (disclosed).

- ``more_like_this`` / ``pinned`` / ``terms_set`` / ``function_score``
  / ``match_phrase_prefix`` (query + max_expansions + slop; slop > 0
  runs Lucene sloppy semantics over the expansion-union last slot)
  — routed by :func:`search_dsl` to the engines' dedicated entry
  points (``_search_dedicated``): MLT takes ``like = {"_id": …}`` with
  ES percentage ``minimum_should_match``; pinned/function_score take a
  ``match`` (or plain-string) text query; function specs use the
  repo's normalized ``{"type": …}`` form (the ES per-function JSON
  sugar is not translated, disclosed).

Disclosed unsupported kinds (raise ``DslError``): per-field
``minimum_should_match`` strings, ``regexp`` (served by the engines'
dedicated ``regexp_search``), standalone ``rank_feature`` /
``distance_feature`` (compose them as ``function_score`` functions),
``nested`` (the events-table operator, ``ops/nested.py``), joins/geo/
kNN (dedicated APIs; kNN serves through the ``retriever`` request
section).  A ``bool`` with only ``must_not`` matches nothing (same
lenient contract as the string parsers).
"""

from __future__ import annotations

import base64
import json


class DslError(ValueError):
    pass


_LEAF_PARAM = {
    # leaf kind -> the parameter key holding the value in the
    # long-form object, e.g. {"term": {"f": {"value": v, "boost": b}}}
    "term": "value",
    "prefix": "value",
    "wildcard": "value",
    "fuzzy": "value",
    "match": "query",
    "match_phrase": "query",
    "match_phrase_prefix": "query",
}


def _field_body(kind: str, body) -> tuple[str, object, float]:
    """Unpack ``{field: short_or_long_form}`` → (field, value, boost)."""
    if not isinstance(body, dict) or len(body) != 1:
        raise DslError(f"{kind} takes exactly one field, got {body!r}")
    ((field, spec),) = body.items()
    if isinstance(spec, dict):
        key = _LEAF_PARAM[kind]
        if key not in spec:
            raise DslError(f"{kind} on {field!r} missing {key!r}")
        return field, spec, float(spec.get("boost", 1.0))
    return field, {_LEAF_PARAM[kind]: spec}, 1.0


def _fold(nodes, op: str):
    out = None
    for n in nodes:
        if n is None:
            continue
        out = n if out is None else (op, out, n)
    return out


def _boosted(node, boost: float):
    if node is None or boost == 1.0:
        return node
    return ("boost", node, float(boost))


def dsl_to_tree(
    query: dict,
    analyze,
    default_field: str,
    meta_fields=None,
) -> tuple | None:
    """One ES JSON query object → eval_tree clause tree (None ⇔ the
    query analyzes away and matches nothing, the lenient contract the
    string parsers share).  ``analyze`` is the index analyzer;
    ``default_field`` names the indexed text column; ``meta_fields``
    (optional collection) rejects clauses on unmapped fields like an ES
    strict mapping."""
    if not isinstance(query, dict) or len(query) != 1:
        raise DslError(f"a query object has exactly one key: {query!r}")
    ((kind, body),) = query.items()

    def is_meta(field: str) -> bool:
        if field == default_field:
            return False
        if meta_fields is not None and field not in meta_fields:
            raise DslError(f"unknown field {field!r}")
        return True

    def sub(q):
        return dsl_to_tree(q, analyze, default_field, meta_fields)

    if kind == "match_all":
        # every doc carries a non-null doc_id doc value in this repo's
        # docmeta layout (the mget key), so match_all is an exists gate
        # over it at the ES constant score 1.0 (boost overridable)
        boost = float(body.get("boost", 1.0)) if isinstance(body, dict) \
            else 1.0
        return ("constscore", ("metaexists", "doc_id"), boost)

    if kind == "match_none":
        return None

    if kind == "wrapper":
        if not isinstance(body, dict) or "query" not in body:
            raise DslError("wrapper needs {'query': <base64>}")
        try:
            raw = base64.b64decode(body["query"], validate=True)
            inner = json.loads(raw)
        except Exception as e:  # noqa: BLE001 — one normalized error
            raise DslError(f"wrapper payload undecodable: {e}") from e
        return sub(inner)

    if kind == "bool":
        if not isinstance(body, dict):
            raise DslError("bool body must be an object")
        def many(key):
            v = body.get(key) or []
            return [v] if isinstance(v, dict) else list(v)
        must = _fold([sub(q) for q in many("must")], "and")
        req = _fold([sub(q) for q in many("filter")], "and")
        should_children = [t for t in (sub(q) for q in many("should"))
                           if t is not None]
        should = _fold(should_children, "or")
        msm = body.get("minimum_should_match")
        if msm is None:  # the ES default: shoulds become optional the
            # moment a must/filter clause exists
            msm = 0 if (must is not None or req is not None) else 1
        else:
            # any Lucene spec form — int, negative int, "75%", "-25%",
            # conditional "3<90%" — resolved against the WRITTEN should
            # count (Lucene counts clauses in the built BooleanQuery;
            # an analyzed-away clause is still a clause there)
            from .sqs import calculate_min_should_match

            try:
                msm = calculate_min_should_match(len(many("should")), msm)
            except (ValueError, TypeError) as e:
                raise DslError(
                    f"bad minimum_should_match {body.get('minimum_should_match')!r}: {e}"
                ) from e
            if msm > len(should_children):
                # Lucene: minShouldMatch above the optional-clause count
                # rewrites the WHOLE BooleanQuery to MatchNoDocsQuery
                return None
        node = must
        if should is not None and msm >= 1:
            # ≥ m should clauses REQUIRED: m=1 is the plain OR; m>1 is
            # the ("msm", m, children) count node (score = Σ matching
            # shoulds either way, the Lucene contract)
            should = (should if msm == 1
                      else ("msm", msm, tuple(should_children)))
        if should is not None:
            if msm >= 1:
                if node is None:
                    node = should
                else:  # base ∩ should docs, base+should summed scores
                    node = ("filter",
                            ("filter", ("or", node, should), node),
                            should)
            else:  # OPTIONAL: score boost over the required doc set
                if node is not None:
                    node = ("filter", ("or", node, should), node)
                elif req is not None:
                    # filter-only bool + optional should: every filter
                    # doc matches (score 0), shoulds add their scores
                    node = ("or", ("constscore", req, 0.0), should)
                else:  # unreachable (msm defaults to 1 here) — lenient
                    node = should
        if req is not None:
            # non-scoring gate (ES filter context).  A filter-only bool
            # matches req's docs at score 0.0 — constscore 0.0 spells
            # that exactly.
            node = ("constscore", req, 0.0) if node is None else (
                "filter", node, req)
        for q in many("must_not"):
            n = sub(q)
            if node is not None and n is not None:
                node = ("andnot", node, n)
        return _boosted(node, float(body.get("boost", 1.0)))

    if kind in ("dis_max", "dismax"):
        children = tuple(
            t for t in (sub(q) for q in body.get("queries", []))
            if t is not None
        )
        if not children:
            return None
        return _boosted(
            ("dismax", float(body.get("tie_breaker", 0.0)), children),
            float(body.get("boost", 1.0)))

    if kind == "boosting":
        pos = sub(body["positive"])
        neg = sub(body["negative"]) if body.get("negative") else None
        if pos is None:
            return None
        if neg is None:
            return pos
        return ("boosting", pos, neg,
                float(body.get("negative_boost", 0.5)))

    if kind == "constant_score":
        child = sub(body["filter"])
        if child is None:
            return None
        return ("constscore", child, float(body.get("boost", 1.0)))

    if kind == "query_string":
        from .qs import parse_query_string

        return parse_query_string(
            body["query"] if isinstance(body, dict) else str(body),
            analyze,
            (body.get("default_operator", "or").lower()
             if isinstance(body, dict) else "or"),
            default_field=default_field,
            meta_fields=meta_fields,
        )

    if kind == "simple_query_string":
        from .sqs import parse_simple_query_string

        return parse_simple_query_string(
            body["query"] if isinstance(body, dict) else str(body),
            analyze,
            (body.get("default_operator", "or").lower()
             if isinstance(body, dict) else "or"),
        )

    if kind == "match":
        field, spec, boost = _field_body(kind, body)
        if is_meta(field):
            return _boosted(("metaterm", field, str(spec["query"])), boost)
        op = str(spec.get("operator", "or")).lower()
        if op not in ("or", "and"):
            raise DslError(f"match operator {op!r}")
        toks = analyze(str(spec["query"]))
        return _boosted(_fold([("term", t) for t in toks], op), boost)

    if kind == "match_phrase":
        field, spec, boost = _field_body(kind, body)
        if is_meta(field):
            return _boosted(("metaterm", field, str(spec["query"])), boost)
        toks = analyze(str(spec["query"]))
        if not toks:
            return None
        slop = int(spec.get("slop", 0))
        node = ("term", toks[0]) if len(toks) == 1 and slop == 0 \
            else ("phrase", toks, slop)
        return _boosted(node, boost)

    if kind == "term":
        field, spec, boost = _field_body(kind, body)
        v = spec["value"]
        if is_meta(field):
            return _boosted(("metaterm", field, v), boost)
        return _boosted(("term", str(v).lower()), boost)

    if kind == "terms":
        if not isinstance(body, dict) or len(body) < 1:
            raise DslError("terms needs {field: [values...]}")
        opts = {k: v for k, v in body.items() if k == "boost"}
        rest = {k: v for k, v in body.items() if k != "boost"}
        if len(rest) != 1:
            raise DslError("terms takes exactly one field")
        ((field, values),) = rest.items()
        leaves = [
            ("metaterm", field, v) if is_meta(field)
            else ("term", str(v).lower())
            for v in values
        ]
        return _boosted(_fold(leaves, "or"),
                        float(opts.get("boost", 1.0)))

    if kind == "range":
        if not isinstance(body, dict) or len(body) != 1:
            raise DslError("range takes exactly one field")
        ((field, spec),) = body.items()
        if not is_meta(field):
            raise DslError("range needs a docmeta field")
        lo = spec.get("gte", spec.get("gt"))
        hi = spec.get("lte", spec.get("lt"))
        node = ("metarange", field,
                None if lo is None else str(lo),
                None if hi is None else str(hi),
                "gte" in spec, "lte" in spec)
        return _boosted(node, float(spec.get("boost", 1.0)))

    if kind == "exists":
        if not isinstance(body, dict) or "field" not in body:
            raise DslError("exists needs {'field': name}")
        is_meta(body["field"])  # mapping check only
        return _boosted(("metaexists", body["field"]),
                        float(body.get("boost", 1.0)))

    if kind == "prefix":
        field, spec, boost = _field_body(kind, body)
        if is_meta(field):
            raise DslError("prefix supports the text field only")
        return _boosted(("prefix", str(spec["value"]).lower()), boost)

    if kind == "wildcard":
        field, spec, boost = _field_body(kind, body)
        if is_meta(field):
            raise DslError("wildcard supports the text field only")
        pat = str(spec["value"]).lower()
        if (pat.endswith("*") and "?" not in pat and "*" not in pat[:-1]
                and len(pat) > 1):
            return _boosted(("prefix", pat[:-1]), boost)
        return _boosted(("wildcard", pat), boost)

    if kind == "fuzzy":
        field, spec, boost = _field_body(kind, body)
        if is_meta(field):
            raise DslError("fuzzy supports the text field only")
        fz = spec.get("fuzziness", 2)
        fz = 2 if str(fz).upper() == "AUTO" else int(fz)
        base = analyze(str(spec["value"]))
        if not base:
            return None
        return _boosted(("fuzzy", base[-1], fz), boost)

    raise DslError(f"unsupported query kind {kind!r}")


def wrap_query(query: dict) -> dict:
    """Encode a DSL object as ES's ``wrapper`` query (the inverse of
    the decode path — handy for tests and for callers persisting
    queries as opaque strings)."""
    payload = base64.b64encode(
        json.dumps(query, sort_keys=True).encode()).decode()
    return {"wrapper": {"query": payload}}


_SPAN_KINDS = frozenset((
    "span_term", "span_or", "span_near", "span_first", "span_not",
    "span_containing", "span_within", "span_multi",
))


def _span_leaf_field(query: dict) -> str | None:
    """First leaf field named inside an ES JSON span body (span_term /
    span_multi leaves carry ``{field: spec}``) — how the source field of
    a ``span_field_masking`` inner query is discovered (ES infers it
    from the inner query's mapping the same way)."""
    ((kind, body),) = query.items()
    if kind == "span_term":
        return next(iter(body))
    if kind == "span_multi":
        inner = body["match"] if "match" in body else body
        ((_mk, mb),) = inner.items()
        return next(iter(mb))
    for v in (body.values() if isinstance(body, dict) else body):
        vals = v if isinstance(v, list) else [v]
        for c in vals:
            if isinstance(c, dict) and c:
                f = _span_leaf_field(c)
                if f is not None:
                    return f
    return None


def normalize_span(query: dict, default_field: str) -> dict:
    """ES JSON span-query form → the engines' native span-tree dicts
    (:mod:`.spans` — same node names, unwrapped values).  Leaf field
    qualifiers must equal the search field, EXCEPT under a
    ``span_field_masking`` wrapper: its inner query's leaves name the
    SOURCE field (uniform — ES's one-field-per-span-query rule), and
    the normalized node carries ``query_field`` for
    :func:`..search.spans.resolve_masks`.  Masked trees execute via the
    multi-field entry points (``MultiFieldEngine.search_spans`` /
    ``TermPartitionedEngine.search_spans`` with ``mask_engines``)."""
    ((kind, body),) = query.items()

    def unfield(b, value_key="value"):
        if not isinstance(b, dict) or len(b) != 1:
            raise DslError(f"span leaf takes one field: {b!r}")
        ((field, spec),) = b.items()
        if field != default_field:
            raise DslError(
                "span leaf field must match the span query's field "
                f"({field!r} != {default_field!r}; wrap foreign-field "
                "clauses in span_field_masking)"
            )
        if isinstance(spec, dict):
            return spec
        return {value_key: spec}

    if kind in ("span_field_masking", "field_masking_span"):
        inner_q = body["query"]
        masked_as = body.get("field", default_field)
        src = _span_leaf_field(inner_q)
        if src is None:
            raise DslError("span_field_masking inner query has no leaf")
        return {"span_field_masking": {
            "query": normalize_span(inner_q, src),
            "query_field": src,
            "field": masked_as,
        }}

    if kind == "span_term":
        return {"span_term": str(unfield(body)["value"]).lower()}
    if kind == "span_or":
        cls = body["clauses"] if isinstance(body, dict) else body
        return {"span_or": [normalize_span(c, default_field)
                            for c in cls]}
    if kind == "span_near":
        return {"span_near": {
            "clauses": [normalize_span(c, default_field)
                        for c in body["clauses"]],
            "slop": int(body.get("slop", 0)),
            "in_order": bool(body.get("in_order", True)),
        }}
    if kind == "span_first":
        return {"span_first": {
            "match": normalize_span(body["match"], default_field),
            "end": int(body["end"]),
        }}
    if kind == "span_not":
        out = {"include": normalize_span(body["include"], default_field),
               "exclude": normalize_span(body["exclude"], default_field)}
        if body.get("dist") is not None:  # ES sugar: pre = post = dist
            out["pre"] = out["post"] = int(body["dist"])
        else:
            out["pre"] = int(body.get("pre", 0))
            out["post"] = int(body.get("post", 0))
        return {"span_not": out}
    if kind in ("span_containing", "span_within"):
        return {kind: {
            "big": normalize_span(body["big"], default_field),
            "little": normalize_span(body["little"], default_field),
        }}
    if kind == "span_multi":
        inner = body["match"] if "match" in body else body
        ((mk, mb),) = inner.items()
        if mk not in ("prefix", "wildcard", "regexp", "fuzzy"):
            raise DslError(f"span_multi cannot wrap {mk!r}")
        spec = unfield(mb)
        out = {mk: str(spec["value"]).lower()}
        if "max_expansions" in body:
            out["max_expansions"] = int(body["max_expansions"])
        if mk == "fuzzy":
            fz = spec.get("fuzziness", 2)
            out["fuzziness"] = 2 if str(fz).upper() == "AUTO" else int(fz)
            if "prefix_length" in spec:
                out["prefix_length"] = int(spec["prefix_length"])
        return {"span_multi": out}
    raise DslError(f"unknown span kind {kind!r}")


def search_dsl(engine, query: dict, k: int = 10):
    """Run one JSON DSL query on either serving engine: translate to a
    clause tree with the ENGINE's analyzer/mapping and evaluate through
    its existing ``_eval_sqs_tree`` path (shard-parallel sparse algebra
    on the doc layout, coordinator gather on the term layout) — hits
    are ``[(doc_id, score), ...]`` under the standard tie contract.
    Span queries (``span_*`` kinds, incl. wrapped in ``wrapper``) route
    to the engines' positional span kernel (``search_spans``)."""
    import base64 as _b64
    import json as _json

    q = query
    while isinstance(q, dict) and len(q) == 1 and "wrapper" in q:
        try:
            q = _json.loads(_b64.b64decode(q["wrapper"]["query"],
                                           validate=True))
        except Exception as e:  # noqa: BLE001
            raise DslError(f"wrapper payload undecodable: {e}") from e
    if isinstance(q, dict) and len(q) == 1 and \
            next(iter(q)) in _SPAN_KINDS:
        return engine.search_spans(
            normalize_span(q, _default_field(engine)), k=k)
    if isinstance(q, dict) and len(q) == 1 and \
            next(iter(q)) in _DEDICATED_KINDS:
        return _search_dedicated(engine, q, k)
    tree = dsl_to_tree(
        q,
        engine._sqs_analyze(),
        _default_field(engine),
        meta_fields=None,
    )
    if tree is None:
        return []
    return engine._eval_sqs_tree(tree, k)


_DEDICATED_KINDS = frozenset((
    "more_like_this", "pinned", "terms_set", "function_score",
    "match_phrase_prefix",
))


def _match_text(q: dict, default_field: str) -> str:
    """Extract the free text of a ``match`` (or bare-string) organic
    query — the form the dedicated engine entry points take."""
    if isinstance(q, str):
        return q
    if isinstance(q, dict) and len(q) == 1 and "match" in q:
        ((field, spec),) = q["match"].items()
        if field != default_field:
            raise DslError("organic query must match the text field")
        return str(spec["query"] if isinstance(spec, dict) else spec)
    raise DslError(
        "this query kind takes a match (or plain-string) text query"
    )


def _normalized_function_filter(q: dict) -> dict:
    """ES per-function ``filter`` JSON → the funcscore docmeta
    predicate (``{"field", "term"}`` / ``{"field", "range": [lo, hi,
    lo_incl, hi_incl]}``).  Only term/range docmeta filters exist in
    the kernel (funcscore.py's disclosed surface) — anything else
    raises rather than approximates."""
    if not isinstance(q, dict) or len(q) != 1:
        raise DslError(f"function filter takes one query: {q!r}")
    ((kind, body),) = q.items()
    if kind == "term":
        ((f, v),) = body.items()
        if isinstance(v, dict):
            v = v["value"]
        return {"field": f, "term": v}
    if kind == "range":
        ((f, spec),) = body.items()
        lo = spec.get("gte", spec.get("gt"))
        hi = spec.get("lte", spec.get("lt"))
        return {"field": f, "range": [
            lo, hi, "gt" not in spec, "lt" not in spec]}
    raise DslError(
        f"function filters are docmeta term/range only (got {kind!r})")


def normalize_function(fn: dict) -> dict:
    """One ES ``functions``-list entry (the per-function JSON sugar:
    ``{"filter": …, "weight": …, "<function>": …}``) → the repo's
    normalized funcscore spec (funcscore.py ``{"type": …}`` dicts).
    Entries already carrying ``"type"`` pass through untouched, so
    callers can mix both forms.  Function keys: ``field_value_factor``,
    decay ``gauss``/``exp``/``linear`` (one field object), ``script_score``
    (``{"script": {"source": …}}``), ``random_score``; an entry with
    only ``weight`` is the ES pure-weight function."""
    if not isinstance(fn, dict):
        raise DslError(f"function entry must be an object: {fn!r}")
    if "type" in fn:
        return dict(fn)
    out = None
    for key, spec in fn.items():
        if key in ("filter", "weight"):
            continue
        if out is not None:
            raise DslError("a function entry takes exactly one function")
        if key == "field_value_factor":
            out = {"type": "field_value_factor"}
            for k2 in ("field", "factor", "modifier", "missing"):
                if k2 in spec:
                    out[k2] = spec[k2]
        elif key in ("gauss", "exp", "linear"):
            if not isinstance(spec, dict) or len(spec) != 1:
                raise DslError(f"decay takes one field object: {spec!r}")
            ((field, d),) = spec.items()
            out = {"type": "decay", "function": key, "field": field}
            for k2 in ("origin", "scale", "offset", "decay"):
                if k2 in d:
                    out[k2] = d[k2]
        elif key == "script_score":
            script = spec.get("script") if isinstance(spec, dict) else None
            if isinstance(script, dict):
                script = script.get("source")
            if not isinstance(script, str):
                raise DslError(
                    "script_score needs {'script': {'source': <expr>}}")
            out = {"type": "script_score", "script": script}
        elif key == "random_score":
            out = {"type": "random_score"}
            for k2 in ("seed", "field"):
                if k2 in spec:
                    out[k2] = spec[k2]
        else:
            raise DslError(f"unknown score function {key!r}")
    if out is None:
        out = {"type": "weight"}
    if "weight" in fn:
        out["weight"] = float(fn["weight"])
    if "filter" in fn:
        out["filter"] = _normalized_function_filter(fn["filter"])
    return out


def _search_dedicated(engine, q: dict, k: int):
    """JSON kinds served by dedicated engine entry points rather than
    the clause-tree walker: ``more_like_this`` (like = one indexed doc
    by ``_id``; ES percentage ``minimum_should_match`` honored),
    ``pinned`` (ids-first + organic match), ``terms_set`` (per-doc
    ``minimum_should_match_field``), ``function_score`` with a
    FUNCTIONS LIST — either the repo's normalized ``{"type": …}``
    specs or the ES per-function JSON sugar
    (:func:`normalize_function` translates filter/weight/decay/fvf/
    script_score/random_score entries)."""
    ((kind, body),) = q.items()
    field = _default_field(engine)
    if kind == "more_like_this":
        like = body.get("like")
        if isinstance(like, list):
            if len(like) != 1:
                raise DslError("more_like_this takes exactly one like")
            like = like[0]
        if not isinstance(like, dict) or "_id" not in like:
            raise DslError("more_like_this like must be {'_id': doc_id}")
        msm = body.get("minimum_should_match", 0.3)
        if isinstance(msm, str) and msm.endswith("%"):
            msm = float(msm[:-1]) / 100.0
        kw = {}
        for name in ("max_query_terms", "min_term_freq", "min_doc_freq"):
            if name in body:
                kw[name] = int(body[name])
        return engine.more_like_this(int(like["_id"]), k=k,
                                     minimum_should_match=float(msm),
                                     **kw)
    if kind == "pinned":
        from .engine import pinned_search

        organic = _match_text(body.get("organic"), field)
        return pinned_search(engine, [int(d) for d in body["ids"]],
                             organic, k=k)
    if kind == "terms_set":
        if not isinstance(body, dict) or len(body) != 1:
            raise DslError("terms_set takes exactly one field")
        ((f2, spec),) = body.items()
        if f2 != field:
            raise DslError("terms_set runs over the indexed text field")
        mf = spec.get("minimum_should_match_field")
        if not mf:
            raise DslError("terms_set needs minimum_should_match_field")
        return engine.search_terms_set(
            [str(t).lower() for t in spec["terms"]], mf, k=k)
    if kind == "match_phrase_prefix":
        f2, spec, boost = _field_body(kind, body)
        if f2 != field:
            raise DslError(
                "match_phrase_prefix runs over the indexed text field")
        if boost != 1.0:
            raise DslError(
                "match_phrase_prefix boost is not wired (the dedicated "
                "entry point returns engine-contract scores)")
        slop = int(spec.get("slop", 0))
        return engine.search_phrase_prefix(
            str(spec["query"]), k=k,
            max_expansions=int(spec.get("max_expansions", 50)),
            slop=slop,
            # ES phrase slop is Lucene sloppy semantics — same mode the
            # match_phrase tree node picks when slop > 0
            slop_mode="lucene" if slop else "ordered",
        )
    if kind == "function_score":
        organic = _match_text(body.get("query"), field)
        return engine.search_function_score_multi(
            organic,
            [normalize_function(f) for f in body.get("functions", [])],
            score_mode=body.get("score_mode", "multiply"),
            boost_mode=body.get("boost_mode", "multiply"),
            max_boost=body.get("max_boost"),
            k=k,
        )
    raise DslError(kind)


def _default_field(engine) -> str:
    info = getattr(engine, "info", None)
    if info is not None:
        return info.manifest.text_col
    # term-partitioned layout: resolve through the source index's
    # manifest (the same path its own search_query_string takes)
    src = engine.meta.get("source_index")
    if src:
        from ..index.build import IndexInfo

        return IndexInfo(src).manifest.text_col
    return "content"
