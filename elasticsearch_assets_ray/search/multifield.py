"""Multi-field search (ES ``multi_match``) over per-field indexes.

ES indexes each mapped field as its own inverted index over the same
documents; ``multi_match`` combines per-field BM25 scores per doc —
``best_fields`` (DisMax: max, plus ``tie_breaker`` × the rest) or
``most_fields`` (sum).  The reference passes multi_match through to ES
untranslated (its reader forwards the query DSL verbatim,
``/root/reference/asset/elasticsearch_reader/reader.js:6-31``); here each
field is a separate index built from the SAME corpus with the SAME
partition plan, so shard s of every field covers the same doc range and
the combination runs SHARD-SIDE: one actor holds shard s of all fields,
combines full per-field score arrays, and cuts top-k locally — network
traffic stays top-k per shard, never per-candidate.

Per-field df / avgdl / analyzer follow each field's own index (ES
semantics — a short ``path`` field has its own length norm).
"""

from __future__ import annotations

import math
from pathlib import Path

import numpy as np

import ray

from ..analysis.tokenizer import clip_tokens, get_analyzer
from ..config import BM25Params
from ..index.build import IndexInfo
from .engine import ShardData, _select_topk, merge_topk


def _check_aligned(infos: dict[str, IndexInfo]) -> None:
    """Every field index must share the shard plan (same doc ranges)."""
    base = None
    for f, info in infos.items():
        plan = [
            (s.shard_id, s.doc_base, s.num_docs)
            for s in sorted(info.manifest.shards.values(), key=lambda s: s.shard_id)
        ]
        if base is None:
            base = (f, plan)
        elif plan != base[1]:
            raise ValueError(
                f"field index {f!r} shard plan differs from {base[0]!r} — "
                "multi-field search needs indexes built from the same corpus "
                "with the same partition/shard config"
            )


class _MultiCore:
    """One shard group, all fields: {field: [ShardData]}, aligned."""

    def __init__(self, field_dirs: dict[str, str], shard_ids: list[int],
                 params: BM25Params):
        self.params = params
        infos = {f: IndexInfo(d) for f, d in field_dirs.items()}
        _check_aligned(infos)
        self.avgdl = {f: i.stats.avgdl for f, i in infos.items()}
        self.shards = {
            f: [ShardData(info, sid) for sid in shard_ids]
            for f, info in infos.items()
        }

    def local_dfs(self, per_field_terms: dict[str, list[str]]) -> dict:
        return {
            f: {t: sum(s.local_df(t) for s in self.shards[f]) for t in ts}
            for f, ts in per_field_terms.items()
        }

    def local_union_dfs(self, terms: list[str]) -> dict[str, int]:
        """Per term: docs in this actor's shards containing the term in
        ANY field (the ES ``combined_fields`` document frequency — a
        union, not a per-field sum).  Shards partition the doc space, so
        per-actor counts sum exactly across actors."""
        from ..index.codec import decode_postings

        fields = sorted(self.shards)
        n_shards = len(next(iter(self.shards.values())))
        out = {t: 0 for t in terms}
        for si in range(n_shards):
            s0 = self.shards[fields[0]][si]
            dead = np.zeros(s0.num_docs, dtype=bool)
            for f in fields:
                dead |= self.shards[f][si].deleted_mask
            for t in terms:
                present = None
                for f in fields:
                    s = self.shards[f][si]
                    i = s.terms.get(t)
                    if i is None:
                        continue
                    doc_ids, _ = decode_postings(s.blobs[i])
                    idx = (doc_ids - np.uint64(s.doc_base)).astype(np.int64)
                    if present is None:
                        present = np.zeros(s.num_docs, dtype=bool)
                    present[idx] = True
                if present is not None:
                    out[t] += int(np.count_nonzero(present & ~dead))
        return out

    def expand_field(self, field: str, spec: dict, m: int) -> list:
        """Per-actor span_multi expansion in ONE field's dictionaries
        (prefix/wildcard/regexp: first-m in term order — the per-actor
        cap is sound because the global first-m is a subset of the union
        of per-shard first-ms; fuzzy: (term, distance) pairs for the
        coordinator's (dist, term) cap)."""
        if "fuzzy" in spec:
            out: dict[str, int] = {}
            for s in self.shards[field]:
                out.update(s.expand_fuzzy(
                    spec["fuzzy"], int(spec.get("fuzziness", 1)),
                    int(spec.get("prefix_length", 0)),
                ))
            return sorted(out.items())
        terms: set[str] = set()
        for s in self.shards[field]:
            if "prefix" in spec:
                terms.update(s.expand_prefix(spec["prefix"], m))
            elif "wildcard" in spec:
                terms.update(s.expand_wildcard(spec["wildcard"], m))
            elif "regexp" in spec:
                terms.update(s.expand_regexp(spec["regexp"], m))
            elif "range" in spec:
                r = spec["range"]
                terms.update(s.expand_range(r.get("gte"), r.get("lte"),
                                            r.get("gt"), r.get("lt"), m))
            else:
                raise ValueError(f"bad span_multi spec: {spec!r}")
        return sorted(terms)[:m]

    def span_topk_masked(
        self,
        queries: list[tuple],
        outer_field: str,
    ) -> list[tuple[int, np.ndarray, np.ndarray]]:
        """Span-tree top-k where leaves may be FIELD-QUALIFIED stream
        keys (``span_field_masking`` resolved by the coordinator —
        ``search.spans.resolve_masks``).  Per shard, position streams
        decode from each leaf's own field index (shard plans are
        aligned, so local doc coordinates agree across fields); the
        engine-agnostic span kernel evaluates the tree; scoring uses the
        OUTER field's norms (dl/avgdl — Lucene SpanFieldMaskingQuery
        scores with the masked-as field's norms) and the coordinator's
        constituent idf sum (each leaf's idf from its REAL field's df).
        queries: [(qid, resolved_tree, idf_sum, avgdl_outer, k)]."""
        from .spans import all_terms, requirement_sets, span_freqs, split_mask_key
        from .term_engine import subset_positions

        fields = sorted(self.shards)
        n_shards = len(next(iter(self.shards.values())))
        k1, b = self.params.k1, self.params.b
        out = []
        for qid, tree, idf_sum, avgdl, k in queries:
            reqs = requirement_sets(tree)
            keys = sorted(all_terms(tree))
            parts = []
            for si in range(n_shards):
                s_outer = self.shards[outer_field][si]
                if s_outer.posblobs is None:
                    raise RuntimeError(
                        "span queries need store_positions=True indexes"
                    )
                dead = np.zeros(s_outer.num_docs, dtype=bool)
                for f in fields:
                    dead |= self.shards[f][si].deleted_mask
                # resolve each qualified key to (ShardData, term)
                sd_of: dict[str, tuple] = {}
                for key in keys:
                    f, t = split_mask_key(key)
                    sd = self.shards[f or outer_field][si]
                    if t in sd.terms:
                        sd_of[key] = (sd, t)
                empty = (np.empty(0, np.int64), np.empty(0, np.float64))
                decoded = {
                    key: sd._decoded_positions(t)
                    for key, (sd, t) in sd_of.items()
                }
                cand = None
                dead_end = False
                for rs in reqs:
                    avail = sorted(kk for kk in rs if kk in sd_of)
                    if not avail:
                        dead_end = True
                        break
                    if len(avail) == 1:
                        docs = decoded[avail[0]][0]
                    else:
                        docs = np.unique(
                            np.concatenate([decoded[kk][0] for kk in avail])
                        )
                    if cand is None:
                        cand = docs
                    else:
                        cand = cand[np.isin(cand, docs, assume_unique=True)]
                    if not len(cand):
                        dead_end = True
                        break
                if dead_end:
                    parts.append(empty)
                    continue
                streams: dict[str, tuple] = {}
                for key in sorted(sd_of):
                    idx, pos, tfcum = decoded[key]
                    tf = np.diff(tfcum)
                    idx_s, tf_s, pos_s = subset_positions(idx, tf, pos, cand)
                    streams[key] = (
                        np.repeat(idx_s, tf_s).astype(np.int64),
                        pos_s.astype(np.int64),
                    )
                hd, pf = span_freqs(tree, streams)
                if len(hd):
                    live = ~dead[hd]
                    hd, pf = hd[live], pf[live]
                if not len(hd):
                    parts.append(empty)
                    continue
                dl = s_outer.dl[hd]
                scores_local = idf_sum * pf * (k1 + 1.0) / (
                    pf + k1 * (1.0 - b + b * dl / avgdl)
                )
                dense = np.zeros(s_outer.num_docs, dtype=np.float64)
                dense[hd] = scores_local
                cand2, cs = _select_topk(hd, dense, k, self.params)
                parts.append(
                    ((cand2 + s_outer.doc_base).astype(np.int64), cs)
                )
            ids, sc = merge_topk(parts, k, self.params.round_decimals)
            out.append((qid, ids, sc))
        return out

    def combined_topk(
        self,
        queries: list[tuple],
        idf: dict[str, float],
        weights: dict[str, float],
        avgdl_c: float,
    ) -> list[tuple[int, np.ndarray, np.ndarray]]:
        """ES ``combined_fields`` (term-centric BM25F): per doc, the
        fields blend into ONE pseudo-field — tf_c = Σ_f w_f·tf_f,
        dl_c = Σ_f w_f·dl_f, idf from the UNION df — then plain BM25
        over (tf_c, dl_c, avgdl_c).  queries: [(qid, terms, k)].
        Accumulation order = sorted terms / sorted fields; integer tfs ×
        small rational weights keep the blended sums exact, so scores
        bit-match the SQL mirror after rounding."""
        from ..index.codec import decode_postings

        out = []
        fields = sorted(self.shards)
        n_shards = len(next(iter(self.shards.values())))
        k1, b = self.params.k1, self.params.b
        for qid, terms, k in queries:
            parts = []
            for si in range(n_shards):
                s0 = self.shards[fields[0]][si]
                n_docs = s0.num_docs
                dead = np.zeros(n_docs, dtype=bool)
                dl_c = np.zeros(n_docs, np.float64)
                for f in fields:
                    s = self.shards[f][si]
                    dead |= s.deleted_mask
                    dl_c += weights.get(f, 1.0) * s.dl
                scores = np.zeros(n_docs, np.float64)
                touched = np.zeros(n_docs, dtype=bool)
                for t in sorted(set(terms)):
                    tf_c = np.zeros(n_docs, np.float64)
                    for f in fields:
                        s = self.shards[f][si]
                        i = s.terms.get(t)
                        if i is None:
                            continue
                        doc_ids, tfs = decode_postings(s.blobs[i])
                        idx = (doc_ids - np.uint64(s.doc_base)).astype(
                            np.int64)
                        tf_c[idx] += weights.get(f, 1.0) * tfs
                    m = tf_c > 0
                    if not m.any():
                        continue
                    norm = tf_c * (k1 + 1.0) / (
                        tf_c + k1 * (1.0 - b + b * dl_c / avgdl_c))
                    scores[m] += idf[t] * norm[m]
                    touched |= m
                touched &= ~dead
                cand = np.nonzero(touched)[0]
                cand, cs = _select_topk(cand, scores, k, self.params)
                parts.append(((cand + s0.doc_base).astype(np.int64), cs))
            ids, sc = merge_topk(parts, k, self.params.round_decimals)
            out.append((qid, ids, sc))
        return out

    def multi_topk(
        self,
        queries: list[tuple],
        idfs: dict[str, dict[str, float]],
    ) -> list[tuple[int, np.ndarray, np.ndarray]]:
        """queries: [(qid, {field: terms}, {field: boost}, mm_type,
        tie_breaker, k)] → per query merged local top-k.

        Combination per doc (ES dis_max / most_fields):
        ``best_fields``: max_f(boost_f·score_f) + tie_breaker·Σ(rest);
        ``most_fields``: Σ_f boost_f·score_f;
        ``cross_fields``: TERM-centric — per term, DisMax across the
        fields whose analyzer produced that term (the BLENDED idf is
        baked into ``idfs`` by the driver), then sum over terms.  Field
        iteration is sorted field order — deterministic accumulation."""
        from ..index.codec import decode_postings

        out = []
        fields_all = sorted(self.shards)
        n_shards = len(next(iter(self.shards.values())))
        k1, b = self.params.k1, self.params.b
        for qid, terms_of, boost_of, mm_type, tie, k in queries:
            if mm_type == "cross_fields":
                parts = []
                all_terms = sorted({t for ts in terms_of.values() for t in ts})
                for si in range(n_shards):
                    s0 = self.shards[fields_all[0]][si]
                    n_docs = s0.num_docs
                    dead = np.zeros(n_docs, dtype=bool)
                    for f in fields_all:
                        dead |= self.shards[f][si].deleted_mask
                    comb = np.zeros(n_docs, np.float64)
                    touched_any = np.zeros(n_docs, dtype=bool)
                    for t in all_terms:
                        per = []
                        for f in fields_all:
                            if t not in terms_of.get(f, ()):  # analyzer gate
                                continue
                            s = self.shards[f][si]
                            i = s.terms.get(t)
                            if i is None:
                                continue
                            doc_ids, tfs = decode_postings(s.blobs[i])
                            idx = (doc_ids - np.uint64(s.doc_base)).astype(
                                np.int64)
                            tf = tfs.astype(np.float64)
                            dl = s.dl[idx]
                            norm = tf * (k1 + 1.0) / (
                                tf + k1 * (1.0 - b + b * dl / self.avgdl[f]))
                            arr = np.zeros(n_docs, np.float64)
                            arr[idx] = (
                                boost_of.get(f, 1.0) * idfs[f][t] * norm)
                            per.append(arr)
                        if not per:
                            continue
                        M = np.stack(per)
                        best = M.max(axis=0)
                        comb += best + tie * (M.sum(axis=0) - best)
                        touched_any |= best > 0
                    touched_any &= ~dead
                    cand = np.nonzero(touched_any)[0]
                    cand, cs = _select_topk(cand, comb, k, self.params)
                    parts.append(((cand + s0.doc_base).astype(np.int64), cs))
                ids, sc = merge_topk(parts, k, self.params.round_decimals)
                out.append((qid, ids, sc))
                continue
            parts = []
            for si in range(n_shards):
                per_field = []
                touched_any = None
                # a tombstone is DOC-level: a doc deleted in any field
                # index is a deleted document — mask with the union of
                # the fields' delete masks, not per-field
                dead = None
                for f in fields_all:
                    dm = self.shards[f][si].deleted_mask
                    dead = dm.copy() if dead is None else (dead | dm)
                for f in fields_all:
                    if f not in terms_of or not terms_of[f]:
                        continue
                    s = self.shards[f][si]
                    sc, touched = s.dense_scores(
                        terms_of[f], idfs[f], self.params, self.avgdl[f]
                    )
                    sc = sc * boost_of.get(f, 1.0)
                    touched &= ~dead
                    per_field.append(sc)
                    touched_any = (
                        touched if touched_any is None else touched_any | touched
                    )
                if touched_any is None:
                    parts.append(
                        (np.empty(0, np.int64), np.empty(0, np.float64))
                    )
                    continue
                M = np.stack(per_field)  # (n_fields, n_docs)
                if mm_type == "most_fields":
                    comb = M.sum(axis=0)
                elif mm_type == "best_fields":
                    best = M.max(axis=0)
                    comb = best + tie * (M.sum(axis=0) - best)
                else:
                    raise ValueError(f"unknown multi_match type {mm_type!r}")
                sd = self.shards[fields_all[0]][si]
                cand = np.nonzero(touched_any)[0]
                cand, cs = _select_topk(cand, comb, k, self.params)
                parts.append(
                    ((cand + sd.doc_base).astype(np.int64), cs)
                )
            ids, sc = merge_topk(parts, k, self.params.round_decimals)
            out.append((qid, ids, sc))
        return out


@ray.remote
class MultiShardScorer(_MultiCore):
    """Ray actor wrapper (all fields' shard state loaded once)."""


class MultiFieldEngine:
    """ES ``multi_match`` serving over per-field indexes.

    ``fields``: {field_name: index_dir}.  All indexes must share the
    partition/shard plan (asserted at actor load)."""

    def __init__(
        self,
        fields: dict[str, str | Path],
        num_actors: int = 4,
        params: BM25Params | None = None,
    ):
        if not fields:
            raise ValueError("need at least one field index")
        self.params = params or BM25Params()
        self.infos = {f: IndexInfo(d) for f, d in fields.items()}
        _check_aligned(self.infos)
        first = next(iter(self.infos.values()))
        self.num_docs = first.stats.num_docs
        shard_ids = first.shard_ids()
        num_actors = max(1, min(num_actors, len(shard_ids)))
        groups: list[list[int]] = [[] for _ in range(num_actors)]
        for i, sid in enumerate(shard_ids):
            groups[i % num_actors].append(sid)
        dirs = {f: str(d) for f, d in fields.items()}
        self.actors = [
            MultiShardScorer.remote(dirs, g, self.params) for g in groups
        ]
        self._analyzers = {
            f: (
                get_analyzer(
                    "code" if info.manifest.analyzer == "per_lang"
                    else info.manifest.analyzer
                ),
                info.manifest.min_token_len,
                info.manifest.max_token_len,
            )
            for f, info in self.infos.items()
        }

    def _analyze(self, field: str, query: str) -> list[str]:
        fn, mn, mx = self._analyzers[field]
        return sorted(set(clip_tokens(fn(query), mn, mx)))

    def multi_match(
        self,
        query: str,
        fields: dict[str, float] | list[str] | None = None,
        type: str = "best_fields",
        tie_breaker: float = 0.0,
        k: int = 10,
    ) -> list[tuple[int, float]]:
        """ES ``multi_match``: the query analyzes PER FIELD (each field's
        own analyzer), scores per field with that field's df/avgdl, and
        combines per doc (``best_fields`` DisMax with ``tie_breaker``, or
        ``most_fields`` sum).  ``fields`` maps field → boost (list form
        = boost 1.0).

        ``cross_fields`` is TERM-centric (Lucene BlendedTermQuery): per
        term, the document frequency BLENDS to the max across the fields
        whose analyzer produced that term, each field still scores with
        its own tf/dl/avgdl/boost, and the per-term field scores combine
        by DisMax + ``tie_breaker``; terms then sum (bool SHOULD).
        Disclosed simplification vs ES: ES groups fields by analyzer and
        blends within each group — identical to this when the analyzed
        query tokens coincide across fields (the dominant
        shared-analyzer case); fields whose analyzer did not produce a
        term simply don't join that term's blend here."""
        if fields is None:
            boost_of = {f: 1.0 for f in self.infos}
        elif isinstance(fields, dict):
            boost_of = dict(fields)
        else:
            boost_of = {f: 1.0 for f in fields}
        unknown = set(boost_of) - set(self.infos)
        if unknown:
            raise KeyError(f"unknown fields: {sorted(unknown)}")
        terms_of = {
            f: self._analyze(f, query) for f in sorted(boost_of)
        }
        if not any(terms_of.values()):
            return []
        # global idf per field (each field's own df + N)
        df_parts = ray.get(
            [a.local_dfs.remote(terms_of) for a in self.actors]
        )
        idfs: dict[str, dict[str, float]] = {}
        dfs: dict[str, dict[str, int]] = {
            f: {t: sum(p[f][t] for p in df_parts) for t in ts}
            for f, ts in terms_of.items()
        }
        if type == "cross_fields":
            # blended df = max across the fields that produced the term
            n = self.num_docs
            blend = {
                t: max(d[t] for d in dfs.values() if t in d)
                for t in {t for ts in terms_of.values() for t in ts}
            }
            idfs = {
                f: {
                    t: math.log(1.0 + (n - blend[t] + 0.5) / (blend[t] + 0.5))
                    for t in ts
                }
                for f, ts in terms_of.items()
            }
        else:
            for f, ts in terms_of.items():
                n = self.infos[f].stats.num_docs
                idfs[f] = {}
                for t in ts:
                    df = dfs[f][t]
                    idfs[f][t] = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        per_actor = ray.get(
            [
                a.multi_topk.remote(
                    [(0, terms_of, boost_of, type, tie_breaker, k)], idfs
                )
                for a in self.actors
            ]
        )
        parts = [(res[0][1], res[0][2]) for res in per_actor]
        ids, sc = merge_topk(parts, k, self.params.round_decimals)
        return list(zip(ids.tolist(), sc.tolist()))

    def search_spans(
        self, tree: dict, field: str, k: int = 10
    ) -> list[tuple[int, float]]:
        """Lucene span queries WITH ``span_field_masking`` (ES masks a
        span clause over a sibling field — e.g. a ``stem``-analyzed
        field — so it combines positionally inside a span query on
        ``field``; the reference ships span bodies to ES verbatim,
        ``/root/reference/asset/elasticsearch_reader/reader.js:7-14``).

        Masks resolve to field-qualified stream keys at the coordinator
        (``search.spans.resolve_masks``); ``span_multi`` wrappers
        (prefix / wildcard / regexp / fuzzy) expand against their OWN
        field's dictionary (global, deterministic);
        idf = Σ leaf idfs, each from its real field's df (Lucene
        collects term statistics from the actual term); norms come from
        the masked-as field (ES-documented scoring caveat).  Requires
        position-compatible fields — the aligned-shard-plan contract
        plus 1:1 analyzers (``simple``/``stem``)."""
        from .spans import (
            leaf_terms,
            mask_key,
            resolve_masks,
            rewrite_multi,
            split_mask_key,
        )

        if field not in self.infos:
            raise KeyError(f"unknown field {field!r}")
        tree = resolve_masks(tree, field)

        def expand(spec: dict, mx: int) -> list[str]:
            f = spec.get("field", field)
            per_actor = ray.get(
                [a.expand_field.remote(f, spec, mx) for a in self.actors]
            )
            if "fuzzy" in spec:
                merged: dict[str, int] = {}
                for part in per_actor:
                    merged.update(dict(part))
                ranked = sorted(merged.items(), key=lambda kv: (kv[1], kv[0]))
                terms = sorted(t for t, _ in ranked[:mx])
            else:
                terms = sorted(set().union(*map(set, per_actor)))[:mx]
            if f == field:
                return terms
            return [mask_key(f, t) for t in terms]

        tree = rewrite_multi(tree, expand)
        leaves = leaf_terms(tree)
        if not leaves:
            return []
        per_field: dict[str, list[str]] = {}
        for key in sorted(set(leaves)):
            f, t = split_mask_key(key)
            per_field.setdefault(f or field, []).append(t)
        df_parts = ray.get(
            [a.local_dfs.remote(per_field) for a in self.actors]
        )
        n = float(self.num_docs)
        idf_of: dict[str, float] = {}
        for f, ts in per_field.items():
            for t in ts:
                df = sum(p[f][t] for p in df_parts)
                key = t if f == field else mask_key(f, t)
                idf_of[key] = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        idf_sum = float(sum(idf_of[key] for key in leaves))
        avgdl = self.infos[field].stats.avgdl
        per_actor = ray.get(
            [a.span_topk_masked.remote([(0, tree, idf_sum, avgdl, k)], field)
             for a in self.actors]
        )
        parts = [(res[0][1], res[0][2]) for res in per_actor]
        ids, sc = merge_topk(parts, k, self.params.round_decimals)
        return list(zip(ids.tolist(), sc.tolist()))

    def combined_fields(
        self,
        query: str,
        fields: dict[str, float] | list[str] | None = None,
        k: int = 10,
    ) -> list[tuple[int, float]]:
        """ES ``combined_fields``: term-centric BM25F — all fields blend
        into one pseudo-field per term (tf_c = Σ_f w_f·tf_f, dl_c =
        Σ_f w_f·dl_f, avgdl_c = Σ_f w_f·avgdl_f — exact under fixed
        weights since Σ_d dl_c = Σ_f w_f Σ_d dl_f), idf from the UNION
        document frequency (a doc counts once no matter how many fields
        hit).  ES requires one shared analyzer across the fields; we
        assert the indexes agree.  Unlike ``multi_match`` (field-centric
        DisMax/sum of per-field BM25), a term matching two fields here
        saturates through ONE tf curve.  The reference forwards
        combined_fields DSL to ES verbatim
        (/root/reference/asset/elasticsearch_reader/reader.js:6-31)."""
        if fields is None:
            weights = {f: 1.0 for f in self.infos}
        elif isinstance(fields, dict):
            weights = dict(fields)
        else:
            weights = {f: 1.0 for f in fields}
        unknown = set(weights) - set(self.infos)
        if unknown:
            raise KeyError(f"unknown fields: {sorted(unknown)}")
        flds = sorted(weights)
        sigs = {
            (self.infos[f].manifest.analyzer,
             self.infos[f].manifest.min_token_len,
             self.infos[f].manifest.max_token_len)
            for f in flds
        }
        if len(sigs) > 1:
            raise ValueError(
                "combined_fields requires one shared analyzer across "
                f"fields (ES contract); got {sorted(sigs)}"
            )
        terms = self._analyze(flds[0], query)
        if not terms:
            return []
        df_parts = ray.get(
            [a.local_union_dfs.remote(terms) for a in self.actors]
        )
        n = float(self.num_docs)
        idf = {}
        for t in terms:
            df = sum(p[t] for p in df_parts)
            idf[t] = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        avgdl_c = sum(
            weights[f] * self.infos[f].stats.avgdl for f in flds
        )
        per_actor = ray.get(
            [
                a.combined_topk.remote([(0, terms, k)], idf, weights,
                                       avgdl_c)
                for a in self.actors
            ]
        )
        parts = [(res[0][1], res[0][2]) for res in per_actor]
        ids, sc = merge_topk(parts, k, self.params.round_decimals)
        return list(zip(ids.tolist(), sc.tolist()))

    def shutdown(self) -> None:
        for a in self.actors:
            ray.kill(a)
        self.actors = []
