"""ES search REQUEST bodies end to end: ``{"query": …, "from"/"size",
"aggs": …}`` against either serving engine.

This is the shape the reference ships over the wire — a full request
object, not a bare query (``/root/reference/asset/elasticsearch_reader/
index.js:106-127`` builds exactly such bodies) — so it is the last
JSON-facing seam between a reference user and this repo: hand
``execute_request`` the body and either engine serves it.

Two dispatch paths, both onto machinery that already exists:

- **Hits** run the FULL JSON query DSL (:mod:`.dsl` → the shared
  eval_tree sparse algebra): any query ``dsl_to_tree`` accepts works,
  ``from``/``size`` page the ranked list (cursor-free ES paging —
  ``search_after`` stays the deep-paging path), and the response is
  ES-shaped (``hits.total.value``, ``_id``/``_score`` rows,
  ``max_score``).
- **Aggregations** dispatch onto the engines' exact aggregation
  methods (``aggregate`` / ``date_histogram`` / ``metric_aggs``).
  Those methods take the bool-CLAUSE grammar, not a clause tree, so
  the request's query down-converts via :func:`dsl_to_clause_query` —
  a CONSERVATIVE translator covering the query shapes aggregations are
  actually run with (match, term/terms/range/exists on doc-values
  fields, and bools composed of those); anything beyond it raises
  ``DslError`` rather than silently approximating.  Scores never
  matter under an aggregation (only the match SET does), which is what
  makes the down-conversion exact where it applies.

Supported agg kinds (each may carry a ``stats`` sub-agg where the
underlying method does): ``terms`` (field/size/order/include/exclude/
min_doc_count), ``date_histogram`` (calendar_interval/fixed_interval/
min_doc_count/extended_bounds/time_zone/offset),
``value_count``/``missing``/``weighted_avg`` (``metric_aggs``).
Unknown agg kinds raise ``DslError`` (the engines' other aggregations
— significant_terms, composite, percentiles, stats, … — have
dedicated methods; wire them here as needed).
"""

from __future__ import annotations

from .dsl import DslError, search_dsl


def dsl_to_clause_query(query: dict | None, default_field: str) -> dict:
    """A JSON DSL query → the engines' bool-CLAUSE dict ({must, should,
    must_not, filter, minimum_should_match, filter_meta, filter_range})
    — the grammar ``aggregate``/``date_histogram``/``metric_aggs``
    evaluate.  CONSERVATIVE: only query shapes whose match set the
    clause grammar expresses exactly are accepted; anything else raises
    ``DslError``.  ``None`` (ES's implicit match_all) raises — pick an
    explicit query for aggregations in this engine."""
    if query is None:
        raise DslError(
            "aggregations need an explicit query (match_all is not "
            "expressible in the clause grammar)"
        )
    if not isinstance(query, dict) or len(query) != 1:
        raise DslError(f"a query object has exactly one key: {query!r}")
    ((kind, body),) = query.items()

    out: dict = {"must": [], "should": [], "must_not": [],
                 "filter_meta": {}, "filter_range": {}}

    def text_tokens(kind2, body2, *, context):
        if not isinstance(body2, dict) or len(body2) != 1:
            raise DslError(f"{kind2} takes exactly one field")
        ((field, spec),) = body2.items()
        if isinstance(spec, dict):
            q = spec.get("query", spec.get("value"))
            op = str(spec.get("operator", "or")).lower()
        else:
            q, op = spec, "or"
        if field != default_field:
            return None  # not text — caller falls back to meta handling
        if len(str(q).split()) > 1:
            # multi-token exactness: the clause grammar treats each
            # token independently, so the ONLY exact translations are
            # operator-'and' under must/filter (all tokens required ≡
            # token conjunction) and operator-'or' under should/must_not
            # (any token ≡ token disjunction).  The other two pairings
            # would silently widen (and-under-should) or over-exclude
            # (and-under-must_not) the agg doc set — raise instead.
            if context in ("must", "filter") and op != "and":
                raise DslError(
                    f"multi-token OR match in {context} context has no "
                    "clause-grammar equivalent — use operator 'and'"
                )
            if context in ("should", "must_not") and op == "and":
                raise DslError(
                    f"multi-token AND match in {context} context has no "
                    "clause-grammar equivalent — use operator 'or'"
                )
        return str(q)

    def add_meta(kind2, body2, negate=False):
        ((field, spec),) = body2.items()
        if negate:
            raise DslError("negated doc-values clauses are not "
                           "expressible in the clause grammar")
        if kind2 == "term":
            v = spec["value"] if isinstance(spec, dict) else spec
            _merge_meta(out["filter_meta"], field, [v])
        elif kind2 == "terms":
            _merge_meta(out["filter_meta"], field, list(spec))
        elif kind2 == "range":
            if "gt" in spec or "lt" in spec:
                raise DslError("clause-grammar ranges are inclusive "
                               "(gte/lte only)")
            if field in out["filter_range"]:
                raise DslError(f"duplicate range on {field!r}")
            out["filter_range"][field] = (spec.get("gte"),
                                          spec.get("lte"))
        else:
            raise DslError(f"unsupported agg-context clause {kind2!r}")

    def add_clause(q2: dict, context: str):
        ((k2, b2),) = q2.items()
        if k2 in ("match", "match_phrase", "term"):
            if k2 == "match_phrase":
                raise DslError("phrases are not expressible in the "
                               "clause grammar")
            toks = text_tokens(k2, b2, context=context)
            if toks is not None:
                out[context].append(toks)
                return
            if k2 == "match":  # keyword-field match = term equality
                if context == "should":
                    # filter_meta entries are REQUIRED — routing an OR
                    # branch there would turn it into an AND gate
                    # (mirrors the term/terms/range-under-should guard)
                    raise DslError(
                        "doc-values clauses under should are not "
                        "expressible in the clause grammar"
                    )
                ((field, spec),) = b2.items()
                v = spec["query"] if isinstance(spec, dict) else spec
                add_meta("term", {field: v},
                         negate=(context == "must_not"))
                return
        if k2 in ("term", "terms", "range"):
            if context == "should":
                raise DslError("doc-values clauses under should are "
                               "not expressible in the clause grammar")
            add_meta(k2, b2, negate=(context == "must_not"))
            return
        raise DslError(
            f"query kind {k2!r} is not supported under aggregations"
        )

    if kind == "match":
        ((_f, spec),) = body.items()
        if _f != default_field:
            # a keyword-field match at the ROOT is the whole query —
            # term equality is exact here (unlike under `should`,
            # where a required filter_meta entry would AND-gate an OR
            # branch; add_clause raises for that case)
            v = spec.get("query", spec.get("value")) \
                if isinstance(spec, dict) else spec
            add_meta("term", {_f: v})
        else:
            op = (str(spec.get("operator", "or")).lower()
                  if isinstance(spec, dict) else "or")
            add_clause({kind: body}, "must" if op == "and" else "should")
    elif kind in ("term", "terms", "range"):
        add_meta(kind, body)
    elif kind == "bool":
        msm = body.get("minimum_should_match")
        if msm not in (None, 0, 1):
            raise DslError("clause-grammar minimum_should_match is "
                           "clause-count-free — only 0/1 map exactly")
        for key in ("must", "filter", "should", "must_not"):
            v = body.get(key) or []
            for q2 in ([v] if isinstance(v, dict) else v):
                add_clause(q2, "filter" if key == "filter" else key)
        if msm is not None:
            out["minimum_should_match"] = msm
    else:
        raise DslError(
            f"query kind {kind!r} is not supported under aggregations"
        )

    clause = {}
    for key in ("must", "should", "must_not"):
        if out[key]:
            clause[key] = " ".join(out[key])
    if out["filter_meta"]:
        clause["filter_meta"] = out["filter_meta"]
    if out["filter_range"]:
        clause["filter_range"] = out["filter_range"]
    if "minimum_should_match" in out:
        clause["minimum_should_match"] = out["minimum_should_match"]
    if not clause:
        raise DslError("query translated to an empty clause set")
    return clause


def _merge_meta(meta: dict, field: str, values: list):
    cur = meta.get(field)
    if cur is None:
        meta[field] = values if len(values) > 1 else values[0]
        return
    raise DslError(f"duplicate doc-values filter on {field!r} — the "
                   "clause grammar holds one predicate per field")


def execute_request(engine, body: dict, default_field: str | None = None,
                    retriever_ctx=None) -> dict:
    """Run one ES search request body → ES-shaped response dict.

    A body with a ``retriever`` section (the 8.14 syntax — standard /
    knn / rrf trees) executes through
    :func:`~.retriever.execute_retriever` and needs ``retriever_ctx``
    (a :class:`~.retriever.RetrieverContext`); its hit ``_id``\\ s are
    ORIGINAL doc ids (the retriever contract), and ``query``/``aggs``
    cannot combine with it in one request (as in ES)."""
    from .dsl import _default_field

    if default_field is None:
        default_field = _default_field(engine)
    size = int(body.get("size", 10))
    frm = int(body.get("from", 0))
    if size < 0 or frm < 0:
        raise DslError("from/size must be non-negative")

    if "retriever" in body or "knn" in body:
        # retriever/knn hits are ORIGINAL doc ids (the retriever
        # contract) — the docmeta point-read sections key on engine doc
        # ids, so they are not wired on these paths
        for sec in ("_source", "fields", "highlight"):
            if body.get(sec):
                raise DslError(
                    f"{sec} is not wired on retriever/knn bodies "
                    "(hits are original doc ids)")

    if "retriever" in body:
        if body.get("query") is not None or body.get("aggs") or \
                body.get("aggregations"):
            raise DslError("retriever does not combine with query/aggs")
        if retriever_ctx is None:
            raise DslError("a retriever body needs retriever_ctx")
        from .retriever import execute_retriever

        ranked = execute_retriever(body["retriever"], retriever_ctx,
                                   k=frm + size)
        page = ranked[frm:frm + size]
        return {"hits": {
            "total": {"value": len(ranked), "relation": "gte"},
            "max_score": (ranked[0][1] if ranked else None),
            "hits": [{"_id": int(d), "_score": float(s)}
                     for d, s in page],
        }}

    if "knn" in body:
        # ES 8 top-level knn search section.  The sandbox corpus keys
        # queries by embedding row (``query_vector_id``, the retriever
        # contract's form); a raw ``query_vector`` would need the ANN
        # APIs directly.  Score-combining knn WITH a query is ES's
        # weighted-sum hybrid — not wired; use retriever rrf instead.
        if body.get("query") is not None or body.get("aggs") or \
                body.get("aggregations"):
            raise DslError(
                "knn does not combine with query/aggs here — use the "
                "retriever rrf section for hybrid ranking")
        if retriever_ctx is None:
            raise DslError("a knn body needs retriever_ctx")
        from .retriever import execute_retriever

        spec = dict(body["knn"])
        depth = max(frm + size, int(spec.get("k", size)))
        ranked = execute_retriever({"knn": spec}, retriever_ctx,
                                   k=depth)
        page = ranked[frm:frm + size]
        return {"hits": {
            "total": {"value": len(ranked), "relation": "gte"},
            "max_score": (ranked[0][1] if ranked else None),
            "hits": [{"_id": int(d), "_score": float(s)}
                     for d, s in page],
        }}

    query = body.get("query")

    resp: dict = {}
    if "suggest" in body:
        # ES suggest section: named suggesters over the dictionary.
        # term → suggest_term; phrase → suggest_phrase; completion →
        # suggest_completion (each already ES-shaped per entry).
        resp["suggest"] = {}
        section = dict(body["suggest"])
        # ES's shared-text form: a top-level "text" beside the named
        # suggesters is each suggester's default input
        shared = section.pop("text", None)
        for name, spec in section.items():
            if not isinstance(spec, dict):
                raise DslError(f"suggester {name!r} must be an object")
            text = spec.get("text") or spec.get("prefix") or shared or ""
            if "term" in spec:
                opts = spec["term"] or {}
                rows = engine.suggest_term(
                    text, size=int(opts.get("size", 5)),
                    suggest_mode=opts.get("suggest_mode", "missing"),
                    max_edits=int(opts.get("max_edits", 2)),
                    prefix_length=int(opts.get("prefix_length", 1)),
                )
                by_tok: dict = {}
                for r in rows:
                    by_tok.setdefault(r["token"], []).append(
                        {"text": r["suggestion"], "score": r["score"],
                         "freq": r["freq"]})
                resp["suggest"][name] = [
                    {"text": t, "options": o} for t, o in by_tok.items()
                ]
            elif "phrase" in spec:
                opts = spec["phrase"] or {}
                resp["suggest"][name] = engine.suggest_phrase(
                    text, size=int(opts.get("size", 5)))
            elif "completion" in spec:
                opts = spec["completion"] or {}
                resp["suggest"][name] = engine.suggest_completion(
                    text, size=int(opts.get("size", 10)))
            else:
                raise DslError(
                    f"suggester {name!r} needs term/phrase/completion")
        if query is None:
            resp["hits"] = {"total": {"value": 0, "relation": "eq"},
                            "max_score": None, "hits": []}
            return resp

    if query is not None and "collapse" in body:
        # ES field collapsing: one hit per group (the group's best),
        # inner_hits carrying the group's top docs.  The organic query
        # is the match-text form (search_collapse's contract); the
        # repo's collapse is exact over the FULL match set (disclosed
        # divergence in our favor vs ES's window-bounded pass).
        from .dsl import _match_text

        col = body["collapse"]
        field = col["field"]
        inner = ((col.get("inner_hits") or {}).get("size", 3))
        text = _match_text(query, default_field)
        rows = engine.search_collapse(
            text, field, k_groups=frm + size,
            inner_size=max(int(inner), 1),
        )
        groups: dict = {}
        for r in rows:
            groups.setdefault(r["group"], []).append(r)
        ordered = sorted(groups.values(),
                         key=lambda g: g[0]["group_rank"])
        page = ordered[frm:frm + size]
        hits = []
        for g in page:
            best = g[0]
            h = {"_id": int(best["doc_id"]),
                 "_score": float(best["score"]),
                 "fields": {field: [best["group"]]}}
            if col.get("inner_hits"):
                h["inner_hits"] = {"hits": {"hits": [
                    {"_id": int(r["doc_id"]),
                     "_score": float(r["score"])} for r in g
                ]}}
            hits.append(h)
        resp["hits"] = {
            "total": {"value": len(ordered), "relation": "gte"},
            "max_score": (hits[0]["_score"] if hits else None),
            "hits": hits,
        }

    if query is not None and "rescore" in body:
        # ES rescore: re-rank the query window with a phrase rescorer.
        # query = match text, rescore_query = match_phrase on the text
        # field (rescore_with_phrase's contract).
        from .dsl import _match_text
        from .engine import rescore_with_phrase

        rs = body["rescore"]
        rq = (rs.get("query") or {})
        inner = rq.get("rescore_query") or {}
        if len(inner) != 1 or "match_phrase" not in inner:
            raise DslError(
                "rescore is wired for a match_phrase rescore_query")
        phrase = _match_text(
            {"match": inner["match_phrase"]}, default_field)
        ranked = rescore_with_phrase(
            engine, _match_text(query, default_field), phrase,
            k=frm + size,
            window_size=int(rs.get("window_size", 50)),
            query_weight=float(rq.get("query_weight", 1.0)),
            rescore_weight=float(rq.get("rescore_weight", 1.0)),
            score_mode=rq.get("score_mode", "total"),
        )
        page = ranked[frm:frm + size]
        resp["hits"] = {
            "total": {"value": len(ranked), "relation": "gte"},
            "max_score": (ranked[0][1] if ranked else None),
            "hits": [{"_id": int(d), "_score": float(s)}
                     for d, s in page],
        }

    sort_field, sort_dir = _parse_sort(body.get("sort"))
    # a collapse/rescore section may already have produced the hits —
    # the ranking branches below are skipped and control falls through
    # to the point-read hydration sections (their _ids are engine doc
    # ids)
    if query is not None and "hits" not in resp and sort_field is not None:
        # ES body-level sort: matching docs ordered by a doc-values
        # column (score not computed, like ES without track_scores).
        # The query takes the clause grammar (the aggs restriction);
        # totals are exact — the sort pass sees the full match count.
        # search_after = [sort_value, doc_id] (the ES deep-pagination
        # cursor with the doc tiebreak) replaces `from` and pushes the
        # cut into the shards.
        after = body.get("search_after")
        if after is not None:
            if frm:
                raise DslError("search_after does not combine with from")
            if not isinstance(after, (list, tuple)) or len(after) != 2:
                raise DslError(
                    "search_after takes [sort_value, doc_id] for a "
                    "single-field sort")
            after = (after[0], int(after[1]))
        clause = dsl_to_clause_query(query, default_field)
        total, ranked = engine.search_sort(
            clause, sort_field, k=frm + size, order=sort_dir,
            after=after)
        page = ranked[frm:frm + size]
        resp["hits"] = {
            "total": {"value": int(total), "relation": "eq"},
            "max_score": None,
            "hits": [{"_id": int(d), "_score": None, "sort": [v]}
                     for d, v in page],
        }
    elif query is not None and "hits" not in resp:
        # track_total_hits (default true = exact totals, one full-rank
        # pass serving both the total and the page).  An integer (or
        # ES's false = 10_000) caps the rank at max(from+size, N) so a
        # size-10 page stops costing O(matching docs); a capped total
        # reports relation "gte", as in ES.
        tth = body.get("track_total_hits", True)
        if tth is True:
            k = 1 << 30
        else:
            k = max(frm + size, 10_000 if tth is False else int(tth))
        ranked = search_dsl(engine, query, k=k)
        ms = body.get("min_score")
        if ms is not None:
            # ES min_score: hits below the cutoff drop from hits AND
            # totals (scores are rank-ordered, so this keeps a prefix)
            ranked = [(d, s) for d, s in ranked if s >= float(ms)]
        page = ranked[frm:frm + size]
        exact_total = tth is True or len(ranked) < k
        resp["hits"] = {
            "total": {"value": len(ranked),
                      "relation": "eq" if exact_total else "gte"},
            "max_score": (ranked[0][1] if ranked else None),
            "hits": [{"_id": int(d), "_score": float(s)}
                     for d, s in page],
        }
    elif "hits" not in resp:
        resp["hits"] = {"total": {"value": 0, "relation": "eq"},
                        "max_score": None, "hits": []}

    src = body.get("_source")
    if src and resp["hits"]["hits"]:
        # ES _source filtering, served from docmeta point reads (the
        # engine's hits are global doc ids — the DocStore key space).
        # true → every docmeta column; a list/string → those columns.
        # Original text is a corpus-parquet hydration (search_highlight
        # / CorpusTextReader), not docmeta — not duplicated here.
        from ..state.docstore import DocStore

        cols = (None if src is True
                else [src] if isinstance(src, str) else list(src))
        store = DocStore(_engine_index_dir(engine),
                         columns=(["doc_id"] + cols) if cols else None)
        page_hits = resp["hits"]["hits"]
        rows = store.mget([h["_id"] for h in page_hits]).to_pylist()
        for h, row in zip(page_hits, rows):
            h["_source"] = {k: v for k, v in row.items()
                            if k != "doc_id"}

    flds = body.get("fields")
    if flds and resp["hits"]["hits"]:
        # ES `fields` retrieval: like _source but values come back as
        # ARRAYS per field (the ES fields-response contract); docmeta
        # point reads, page-sized.
        from ..state.docstore import DocStore

        cols = [f if isinstance(f, str) else str(f["field"])
                for f in flds]
        store = DocStore(_engine_index_dir(engine),
                         columns=["doc_id"] + cols)
        page_hits = resp["hits"]["hits"]
        rows = store.mget([h["_id"] for h in page_hits]).to_pylist()
        for h, row in zip(page_hits, rows):
            h["fields"] = {c: [row[c]] for c in cols}

    hl = body.get("highlight")
    if hl is not None and (sort_field is not None or "collapse" in body
                           or "rescore" in body):
        # the highlighter window is the SCORE ranking — keying sorted /
        # collapsed / rescored pages off it would silently skip hits
        raise DslError(
            "highlight is wired for the relevance-ranked path only")
    if hl is not None and query is not None and resp["hits"]["hits"]:
        # ES highlight section over the indexed text field.  Wired for
        # text-match queries (the positional-sidecar highlighter keys
        # on the match terms); other query kinds raise rather than
        # highlight the wrong terms.
        from .dsl import _match_text

        text = _match_text(query, default_field)
        fields = hl.get("fields") or {default_field: {}}
        if set(fields) != {default_field}:
            raise DslError(
                "highlight is wired for the indexed text field only")
        fspec = fields[default_field] or {}
        pre = (fspec.get("pre_tags") or hl.get("pre_tags")
               or ["<em>"])[0]
        post = (fspec.get("post_tags") or hl.get("post_tags")
                or ["</em>"])[0]
        frag = int(fspec.get("fragment_size",
                             hl.get("fragment_size", 100)))
        nfrag = int(fspec.get("number_of_fragments",
                              hl.get("number_of_fragments", 5)))
        rend = engine.search_highlight(
            text, k=frm + size, pre_tag=pre, post_tag=post,
            fragment_size=frag, number_of_fragments=max(nfrag, 0),
        )
        by_id = {r["doc_id"]: r for r in rend}
        for h in resp["hits"]["hits"]:
            r = by_id.get(h["_id"])
            if r is not None and r.get("n_matches"):
                # ES: number_of_fragments=0 returns the whole field
                h["highlight"] = {default_field: (
                    r["fragments"] if nfrag else [r["highlighted"]])}

    aggs = body.get("aggs") or body.get("aggregations")
    if aggs:
        clause = dsl_to_clause_query(query, default_field)
        resp["aggregations"] = {
            name: _run_agg(engine, clause, spec)
            for name, spec in aggs.items()
        }
    return resp


def execute_count(engine, body: dict | None = None,
                  default_field: str | None = None) -> dict:
    """ES ``_count`` API: ``{"count": N}`` for the body's query (or
    match_all when absent).  Runs the ranked path with exact totals —
    counts are exact by construction (the rank pass sees the full
    match set)."""
    from .dsl import _default_field

    if default_field is None:
        default_field = _default_field(engine)
    query = (body or {}).get("query")
    if query is None:
        # match_all count = corpus size minus deletes; engines expose
        # the live doc count via their match_all ranking
        query = {"match_all": {}}
    ranked = search_dsl(engine, query, k=1 << 30)
    return {"count": len(ranked)}


def _parse_sort(spec) -> tuple[str | None, str]:
    """ES ``sort`` section → (field, direction); (None, ...) = score
    order (absent, ``"_score"``, or an explicit score entry).  One
    non-score field is wired (``"f"`` / ``{"f": "desc"}`` /
    ``{"f": {"order": "desc"}}``, optionally in a one-element list);
    multi-key sorts raise rather than approximate."""
    if spec is None:
        return None, "desc"
    if isinstance(spec, list):
        if len(spec) != 1:
            raise DslError("one sort entry is wired (got a multi-key "
                           "sort)")
        spec = spec[0]
    if isinstance(spec, str):
        return (None, "desc") if spec == "_score" else (spec, "asc")
    if isinstance(spec, dict) and len(spec) == 1:
        ((field, opt),) = spec.items()
        direction = (opt.get("order", "asc") if isinstance(opt, dict)
                     else str(opt))
        if field == "_score":
            return None, direction
        if direction not in ("asc", "desc"):
            raise DslError(f"sort order {direction!r}")
        return field, direction
    raise DslError(f"unsupported sort spec {spec!r}")


def _engine_index_dir(engine) -> str:
    """The engine's source-index directory (docmeta home) — direct on
    the doc-partitioned engine, via layout metadata on the
    term-partitioned one (the ``_default_field`` resolution path)."""
    info = getattr(engine, "info", None)
    if info is not None:
        return str(info.index_dir)
    src = getattr(engine, "meta", {}).get("source_index")
    if src:
        return str(src)
    raise DslError("_source needs an engine with a source index")


def _sub_stats_field(spec: dict) -> str | None:
    sub = spec.get("aggs") or spec.get("aggregations") or {}
    for s in sub.values():
        if isinstance(s, dict) and "stats" in s:
            return s["stats"]["field"]
    if sub:
        raise DslError("only a stats sub-aggregation is wired here")
    return None


def _run_agg(engine, clause: dict, agg: dict) -> dict:
    kinds = [k for k in agg if k not in ("aggs", "aggregations")]
    if len(kinds) != 1:
        raise DslError(f"one agg kind per entry, got {kinds!r}")
    kind = kinds[0]
    spec = dict(agg[kind])
    spec["aggs"] = agg.get("aggs") or agg.get("aggregations")

    if kind == "terms":
        order = spec.get("order")
        if isinstance(order, dict):
            ((om, od),) = order.items()
            order = (om, od)
        buckets = engine.aggregate(
            clause, spec["field"],
            stats_on=_sub_stats_field(spec),
            order=order,
            size=spec.get("size"),
            include=spec.get("include"),
            exclude=spec.get("exclude"),
            min_doc_count=int(spec.get("min_doc_count", 1)),
        )
        return {"buckets": buckets}

    if kind == "date_histogram":
        interval = spec.get("calendar_interval") or \
            spec.get("fixed_interval") or spec.get("interval", "month")
        eb = spec.get("extended_bounds")
        if isinstance(eb, dict):
            eb = (eb.get("min"), eb.get("max"))
        buckets = engine.date_histogram(
            clause, spec["field"], interval=interval,
            stats_on=_sub_stats_field(spec),
            min_doc_count=int(spec.get("min_doc_count", 1)),
            extended_bounds=eb,
            time_zone=spec.get("time_zone"),
            offset=spec.get("offset"),
        )
        return {"buckets": buckets}

    if kind == "histogram":
        eb = spec.get("extended_bounds")
        if isinstance(eb, dict):
            eb = (eb.get("min"), eb.get("max"))
        return {"buckets": engine.histogram(
            clause, spec["field"], float(spec["interval"]),
            offset=float(spec.get("offset", 0.0)),
            stats_on=_sub_stats_field(spec),
            min_doc_count=int(spec.get("min_doc_count", 1)),
            extended_bounds=eb,
        )}

    if kind in ("range", "date_range"):
        return {"buckets": engine.range_agg(
            clause, spec["field"], spec["ranges"],
            stats_on=_sub_stats_field(spec),
        )}

    if kind in ("avg", "sum", "min", "max", "stats", "extended_stats"):
        if spec.get("aggs"):
            raise DslError(f"{kind} takes no sub-aggregations")
        st = engine.extended_stats(clause, spec["field"])
        if kind == "extended_stats":
            return st
        if kind == "stats":
            return {k2: st[k2]
                    for k2 in ("count", "min", "max", "avg", "sum")}
        return {"value": st[kind]}

    if kind == "percentiles":
        if spec.get("aggs"):
            raise DslError("percentiles takes no sub-aggregations")
        kw = {}
        if "percents" in spec:
            kw["percents"] = [float(p) for p in spec["percents"]]
        # ES serves t-digest approximations; "mode": "sketch" opts into
        # the analogous mergeable log-bucket sketch (disclosed mapping,
        # default exact nearest-rank)
        if "mode" in spec:
            kw["mode"] = spec["mode"]
        pr = engine.percentiles(clause, spec["field"], **kw)
        return {"values": {str(float(p)): v for p, v in pr.items()}}

    if kind == "cardinality":
        # ES's precision_threshold picks exact-vs-sketch by cardinality;
        # here absence = EXACT, an explicit "precision" (HLL register
        # bits) opts into the sketch — disclosed mapping
        return {"value": engine.cardinality(
            clause, spec["field"], precision=spec.get("precision"),
        )}

    if kind in ("value_count", "missing", "weighted_avg"):
        field = (spec["field"] if "field" in spec
                 else spec["value"]["field"])
        weight = (spec.get("weight", {}) or {}).get("field")
        m = engine.metric_aggs(clause, field, weight_field=weight)
        if kind == "value_count":
            return {"value": m["value_count"]}
        if kind == "missing":
            return {"doc_count": m["missing"]}
        return {"value": m.get("weighted_avg")}

    raise DslError(
        f"aggregation kind {kind!r} is not wired through "
        "execute_request — call the engine's dedicated method"
    )
