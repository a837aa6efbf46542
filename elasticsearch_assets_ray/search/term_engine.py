"""BM25 serving over the TERM-partitioned global index.

The doc-partitioned engine (`search.engine`) routes every query to every
shard actor; this engine is the other classical layout: postings live
with their TERM (the groupby-on-term merge output,
``index/global_merge.py``), so a query touches ONLY the bucket actors
owning its terms — the per-query fan-out is bounded by the query's term
count, not the cluster size.  The trade: scoring needs each posting's
document length, which lives with the DOC partitions — resolved by the
precomputed-impact trick (``store_norms=True`` at merge time bakes
``tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl))`` per posting, float64, k1/b/avgdl
frozen at merge), so serving is a pure gather + weighted merge:

    query → analyze (manifest-recorded analyzer + clip)
          → terms grouped by bucket → ONLY those bucket actors fetch
            (term, df, doc_ids, norms) with salt parts un-salted
          → coordinator: per-term scatter-accumulate into a doc-indexed
            score buffer, sorted-term order → exact BM25 scores
          → top-k (score desc, doc_id asc; rounded-tie aware)

Score identity: the per-posting norm is the exact float64 expression the
dense doc-partitioned scorer evaluates, idf uses the same formula, and
the accumulation is the SAME sequential per-term ``scores[ids] += c`` (in
sorted-term order) as the oracle and the doc engine's dense kernel — rank
AND score bit-identical to ``BM25Oracle`` (tested).  (Only the
sort+reduceat fallback for corpora beyond ``DENSE_SCATTER_MAX_DOCS``
differs, by one ulp of summation associativity.)

Skip path (``method="wand"``/``"auto"``): per-term per-block max-norms
are computed once at actor LOAD time (``max.reduceat`` over the sorted
norm arrays — no layout change, every merged index gets the skip) and
shipped with the gather; the coordinator runs the same window-partitioned
block-max OR as the doc engine's ``wand_topk``: window bounds are the
union of the terms' block last-doc-ids, windows are processed in
descending upper-bound order (``Σ_t idf_t · block_max_norm``), and once
the running kth-best meets the next bound the rest are skipped.  Exact:
rank+score identical to the dense gather (tested), including the
rounded-tie guard.

Partitioning assumption (custom-operator contract): a hot term's salt
parts all live in ITS bucket — fetching a term is one actor call; the
per-actor memory bound is its buckets' total postings (hash-balanced
across ``n_buckets``).
"""

from __future__ import annotations

import json
import math
from pathlib import Path

import numpy as np
import pyarrow.dataset as pds

import ray

from ..analysis.tokenizer import clip_tokens, get_analyzer
from ..index.codec import decode_postings_many

# auto method heuristic — same calibration as the doc engine
# (search/engine.py): the vectorized dense merge has a ~1 ms floor per 1M
# gathered postings; window skipping only wins when the query's posting
# mass is a tiny fraction of the corpus
WAND_AUTO_MIN_DOCS = 50_000
WAND_AUTO_MAX_DENSITY = 0.001


_ABSENT = ("__absent__",)  # negative-cache sentinel for unknown terms


def subset_positions(
    ids: np.ndarray, tfs: np.ndarray, pos: np.ndarray, cand: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Restrict a positional posting — ``ids`` (sorted doc ids), ``tfs``
    (doc-aligned), ``pos`` (flat, doc-run-concatenated) — to the docs in
    sorted ``cand``: the doc-conjunction gate's segment gather, shared by
    the coordinator fast path and the remote-side subset fetch."""
    es = np.nonzero(np.isin(ids, cand, assume_unique=True))[0]
    if len(es) == len(ids):
        return ids, tfs, pos
    tf64 = tfs.astype(np.int64)
    tfcum = np.concatenate([[0], np.cumsum(tf64)])
    seg_lens = tf64[es]
    seg_starts = tfcum[:-1][es]
    cum = np.cumsum(seg_lens)
    total = int(cum[-1]) if len(cum) else 0
    intra = np.arange(total, dtype=np.int64) - np.repeat(
        cum - seg_lens, seg_lens
    )
    pos_sub = pos[np.repeat(seg_starts, seg_lens) + intra]
    return ids[es], tfs[es], pos_sub


def _load_meta(global_dir: str | Path) -> dict:
    p = Path(global_dir) / "_globalmeta.json"
    if not p.exists():
        raise FileNotFoundError(
            f"no _globalmeta.json in {global_dir} — build the layout with "
            "merge_global_postings(...)"
        )
    return json.loads(p.read_text())


class _BucketCore:
    """Holds a set of term-hash buckets in memory: term → un-salted
    (doc_ids, norms, df, block_last_doc, block_max_norm).

    Loading is vectorized: one (term, salt) sort per bucket table, one
    batch postings decode, one bucket-wide ``lexsort`` that orders every
    term's postings by doc id in a single pass, then per-term array
    slices.  (The former per-row ``.as_py()`` loop was the actor-init hot
    spot — a bucket at scale holds millions of term rows.)"""

    BLOCK = 128  # norms-block granularity for the block-max skip path

    def __init__(self, global_dir: str, bucket_ids: list[int]):
        self.global_dir = str(global_dir)
        self.bucket_ids = list(bucket_ids)
        self._load_full(_load_meta(global_dir))

    def _load_full(self, meta: dict) -> None:
        """(Re)load every committed part of the owned buckets."""
        from ..index.global_merge import _bucket_paths

        self.terms: dict[str, tuple[np.ndarray, np.ndarray, int,
                                    np.ndarray, np.ndarray]] = {}
        # positional sidecar (store_positions layouts): term →
        # (tfs aligned to doc order, flat in-doc positions doc-aligned)
        self.positions: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        # per-posting doc lengths (and, for layouts without a positional
        # sidecar, tfs), ids-aligned, u4 (v2 layouts): retained so a live
        # refresh can re-derive every norm under a MOVED avgdl without
        # reloading postings (appends move avgdl)
        self.dls: dict[str, np.ndarray] = {}
        self.tfs: dict[str, np.ndarray] = {}
        for b in self.bucket_ids:
            self._load_paths(_bucket_paths(self.global_dir, b, meta), meta)
        self._note_loaded(meta)

    def _note_loaded(self, meta: dict) -> None:
        self._loaded_gens = list(meta.get("generations", []))
        self._loaded_fps = dict(meta.get("shard_fps", {}))
        self._loaded_avgdl = float(meta.get("avgdl", 1.0))
        # dictionary-walk caches rebuild lazily — an append generation
        # can introduce brand-new terms that a stale sorted list would
        # hide from prefix/wildcard/fuzzy walks
        self._term_list = None
        self._rev_terms = None

    def refresh(self, expected_gens: list[str] | None = None) -> str:
        """Adopt layout changes IN PLACE: committed append generations
        load incrementally (only the new part files are read) and every
        norm re-derives under the meta's moved avgdl (the dls retained at
        load make that one vectorized pass per term); anything an append
        can't represent (re-merge swap, in-place shard rewrite, v1
        layout) falls back to a full reload of the owned buckets.
        Returns "noop" | "appended" | "reloaded"."""
        from ..index.global_merge import _bucket_paths

        meta = _load_meta(self.global_dir)
        gens = list(meta.get("generations", []))
        fps = dict(meta.get("shard_fps", {}))
        avgdl = float(meta.get("avgdl", 1.0))
        v2 = int(meta.get("layout_version", 1)) >= 2
        base_same = set(self._loaded_gens) <= set(gens) and all(
            fps.get(s) == f for s, f in self._loaded_fps.items()
        )
        if base_same and gens == self._loaded_gens:
            if avgdl != self._loaded_avgdl:  # tombstone-only drift
                if not v2:
                    self._load_full(meta)
                    return "reloaded"
                self._renorm(meta)
                self._note_loaded(meta)
                return "appended"
            return "noop"
        if not base_same or not v2:
            self._load_full(meta)
            return "reloaded"
        new_gens = [g for g in gens if g not in self._loaded_gens]
        gp = Path(self.global_dir)
        for b in self.bucket_ids:
            paths = [
                str(gp / g / f"bucket={b}")
                for g in new_gens
                if (gp / g / f"bucket={b}").exists()
            ]
            if paths:
                self._load_paths(paths, meta)
        if avgdl != self._loaded_avgdl:
            self._renorm(meta)
        self._note_loaded(meta)
        return "appended"

    def _blocks(self, ids: np.ndarray, norms: np.ndarray):
        nb = (len(ids) + self.BLOCK - 1) // self.BLOCK
        if not nb:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        bstarts = np.arange(nb, dtype=np.int64) * self.BLOCK
        block_last = ids[np.minimum(bstarts + self.BLOCK - 1, len(ids) - 1)]
        return block_last, np.maximum.reduceat(norms, bstarts)

    def _renorm(self, meta: dict) -> None:
        """Re-derive every BM25 norm (and block-max metadata) under the
        meta's CURRENT avgdl from the retained per-posting (dl, tf) — the
        v2-layout property that makes in-place refresh exact (identical
        to a cold load of the same layout, tested)."""
        k1, bm_b = float(meta.get("k1", 1.2)), float(meta.get("b", 0.75))
        avgdl = float(meta.get("avgdl", 1.0))
        for t, (ids, _norms, df, _bl, _bm) in self.terms.items():
            dl = self.dls[t].astype(np.float64)
            if t in self.positions:
                tf = self.positions[t][0].astype(np.float64)
            else:
                tf = self.tfs[t].astype(np.float64)
            new_norms = tf * (k1 + 1.0) / (
                tf + k1 * (1.0 - bm_b + bm_b * dl / avgdl)
            )
            bl, bm = self._blocks(ids, new_norms)
            self.terms[t] = (ids, new_norms, df, bl, bm)

    def _load_paths(self, paths: list[str], meta: dict) -> None:
        """Load bucket part dirs and MERGE into the resident term maps —
        an empty state makes this the cold load; an append generation's
        doc ids all exceed the resident ones (asserted), so per-term
        arrays concatenate in doc order with no re-sort."""
        if not meta.get("store_norms"):
            raise ValueError(
                "term-partitioned serving needs store_norms=True at merge time"
            )
        import pyarrow as pa
        import pyarrow.compute as pc

        from ..index.codec import decode_positions

        has_pos = bool(meta.get("store_positions"))
        v2 = int(meta.get("layout_version", 1)) >= 2
        k1, bm_b = float(meta.get("k1", 1.2)), float(meta.get("b", 0.75))
        avgdl = float(meta.get("avgdl", 1.0))
        if True:  # preserved indentation of the former per-bucket body
            if not paths:
                return
            cols = ["term", "salt", "postings", "df"]
            cols.append("dls" if v2 else "norms")
            if has_pos:
                cols.append("positions")
            tbl = pds.dataset([pds.dataset(p) for p in paths]).to_table(
                columns=cols
            )
            if tbl.num_rows == 0:
                return
            order = pc.sort_indices(
                tbl, sort_keys=[("term", "ascending"), ("salt", "ascending")]
            )
            tbl = tbl.take(order)
            enc = tbl.column("term").combine_chunks().dictionary_encode()
            tcodes = enc.indices.to_numpy()
            term_names = enc.dictionary.to_pylist()
            doc_flat, tf_flat, offs = decode_postings_many(
                tbl.column("postings").to_pylist()
            )
            doc_flat = doc_flat.astype(np.int64)
            tf_flat = tf_flat.astype(np.int64)
            if v2:
                # layout v2 ships per-posting doc lengths; the BM25 norm
                # derives HERE under the meta's CURRENT avgdl — this is
                # what keeps served scores exact across incremental
                # appends (an append moves avgdl; baked v1 norms can't)
                dl_u4 = np.frombuffer(
                    b"".join(tbl.column("dls").to_pylist()), dtype="<u4"
                )
                dl_flat = dl_u4.astype(np.float64)
                tf_f = tf_flat.astype(np.float64)
                norm_flat = tf_f * (k1 + 1.0) / (
                    tf_f + k1 * (1.0 - bm_b + bm_b * dl_flat / avgdl)
                )
            else:
                norm_flat = np.frombuffer(
                    b"".join(tbl.column("norms").to_pylist()), dtype="<f8"
                )
            dfs = tbl.column("df").to_numpy()
            counts = np.diff(offs)
            # row runs per term (rows sorted by term, salt)
            change = np.concatenate([[True], tcodes[1:] != tcodes[:-1]])
            run_starts = np.nonzero(change)[0]
            run_ends = np.concatenate([run_starts[1:], [len(tcodes)]])
            # ONE bucket-wide sort puts every term's postings in doc order:
            # key = (term run, doc id)
            term_of_posting = np.repeat(
                np.arange(len(run_starts), dtype=np.int64),
                np.add.reduceat(counts, run_starts),
            )
            o = np.lexsort((doc_flat, term_of_posting))
            if has_pos:
                # gather each entry's position segment through the same
                # doc-order permutation: segment starts/lengths follow the
                # entry permutation, expanded to one flat gather.
                # shingle_positions=False layouts store EMPTY blobs for
                # shingle terms — their entries contribute zero gaps to
                # the concatenated stream (tf zeroed for the decode), and
                # no positions are retained for them below.
                tf_pos = tf_flat
                term_is_sh = None
                if not bool(meta.get("shingle_positions", True)):
                    from ..index.build import SHINGLE_SEP

                    term_is_sh = np.fromiter(
                        (SHINGLE_SEP in t for t in term_names),
                        dtype=bool, count=len(term_names),
                    )
                    row_is_sh = term_is_sh[tcodes]
                    if row_is_sh.any():
                        tf_pos = np.where(
                            np.repeat(row_is_sh, counts), 0, tf_flat
                        )
                pos_flat_pre = decode_positions(
                    b"".join(tbl.column("positions").to_pylist()), tf_pos
                ).astype(np.int64)
                tfcum = np.concatenate([[0], np.cumsum(tf_pos)])
                seg_starts = tfcum[:-1][o]
                seg_lens = tf_pos[o]
                total = int(seg_lens.sum())
                cum = np.cumsum(seg_lens)
                intra = np.arange(total, dtype=np.int64) - np.repeat(
                    cum - seg_lens, seg_lens
                )
                pos_flat = pos_flat_pre[np.repeat(seg_starts, seg_lens) + intra]
                tok_offs = np.concatenate([[0], cum])
                tf_sorted = tf_pos[o]
            else:
                term_is_sh = None
            doc_flat, norm_flat = doc_flat[o], norm_flat[o]
            if v2:
                dl_sorted = dl_u4[o]
                tf_u4 = tf_flat[o].astype(np.uint32)
            post_offs = np.concatenate(
                [offs[run_starts], [offs[-1]]]
            ).astype(np.int64)
            for ri in range(len(run_starts)):
                lo, hi = post_offs[ri], post_offs[ri + 1]
                ids = doc_flat[lo:hi]
                norms = norm_flat[lo:hi]
                df = int(dfs[run_starts[ri]:run_ends[ri]].sum())
                name = term_names[tcodes[run_starts[ri]]]
                dl_t = dl_sorted[lo:hi] if v2 else None
                tf_t = tf_u4[lo:hi] if v2 else None
                pos_t = (
                    (tf_sorted[lo:hi], pos_flat[tok_offs[lo]:tok_offs[hi]])
                    if has_pos else None
                )
                if (
                    term_is_sh is not None
                    and term_is_sh[tcodes[run_starts[ri]]]
                ):
                    pos_t = None  # shingle_positions=False: tf-only term
                old = self.terms.get(name)
                if old is not None:
                    o_ids, o_norms, o_df = old[0], old[1], old[2]
                    if len(ids) and len(o_ids) and ids[0] <= o_ids[-1]:
                        raise ValueError(
                            "append generation doc ids overlap resident "
                            f"postings for term {name!r} — full reload "
                            "required"
                        )
                    ids = np.concatenate([o_ids, ids])
                    norms = np.concatenate([o_norms, norms])
                    df += o_df
                    if v2:
                        dl_t = np.concatenate([self.dls[name], dl_t])
                        tf_t = np.concatenate([self.tfs[name], tf_t])
                    if has_pos and pos_t is not None:
                        otf, opos = self.positions[name]
                        pos_t = (
                            np.concatenate([otf, pos_t[0]]),
                            np.concatenate([opos, pos_t[1]]),
                        )
                block_last, block_max = self._blocks(ids, norms)
                self.terms[name] = (ids, norms, df, block_last, block_max)
                if v2:
                    self.dls[name] = dl_t
                    self.tfs[name] = tf_t
                if has_pos and pos_t is not None:
                    self.positions[name] = pos_t

    def expand_prefix(self, prefix: str, cap: int | None = None) -> list[str]:
        """This core's dictionary terms with the prefix, in term order
        (the union of per-bucket first-Ns contains the global first-N —
        the same soundness argument as the shard engine's per-shard
        cap).  Shared walk: ``engine.prefix_expand_sorted``."""
        from .engine import prefix_expand_sorted

        return prefix_expand_sorted(self._sorted_terms(), prefix, cap)

    def df_candidates(self, min_df: int) -> dict[str, int]:
        """Terms with df ≥ ``min_df`` — EXACT here (a term lives wholly
        in its owning bucket, so local df IS global df; no pigeonhole
        bound needed, unlike the doc-partitioned engine)."""
        terms = self._sorted_terms()
        d = self.df_of(terms)
        return {t: v for t, v in d.items() if v >= min_df}

    def terms_page(self, prefix: str, after: str | None,
                   size: int) -> list[str]:
        """ES ``_terms_enum`` bucket page: first ``size`` matching terms
        strictly after the cursor (same soundness as the shard engine's
        per-actor page)."""
        out = []
        for t in self.expand_prefix(prefix):
            if after is not None and t <= after:
                continue
            out.append(t)
            if len(out) >= size:
                break
        return out

    def expand_wildcard(self, pattern: str, cap: int | None = None) -> list[str]:
        """Wildcard (* / ?) dictionary matches in term order — the shard
        engine's shared ``wildcard_expand_sorted`` walk.  Leading
        wildcards with a trailing literal bisect a lazily-built reversed
        dictionary (invalidated on refresh) instead of scanning."""
        from .engine import trailing_wildcard_literal, wildcard_expand_sorted

        rev = None
        if pattern and pattern[0] in "*?" and trailing_wildcard_literal(
            pattern
        ):
            rev = getattr(self, "_rev_terms", None)
            if rev is None:
                rev = self._rev_terms = sorted(
                    t[::-1] for t in self._sorted_terms()
                )
        return wildcard_expand_sorted(
            self._sorted_terms(), pattern, cap, rev_list=rev
        )

    def expand_regexp(self, pattern: str, cap: int | None = None) -> list[str]:
        """Anchored-regexp dictionary matches in term order — the shard
        engine's shared ``regexp_expand_sorted`` walk."""
        from .engine import regexp_expand_sorted

        return regexp_expand_sorted(self._sorted_terms(), pattern, cap)

    def expand_range(self, gte=None, lte=None, gt=None, lt=None,
                     cap: int | None = None) -> list[str]:
        """Lexical-range dictionary matches in term order — the shared
        ``range_expand_sorted`` walk."""
        from .engine import range_expand_sorted

        return range_expand_sorted(self._sorted_terms(), gte, lte, gt, lt,
                                   cap)

    def _sorted_terms(self) -> list[str]:
        # dictionary WALKS (prefix/wildcard/regexp/fuzzy) see unigrams
        # only — index_phrases shingle terms ("hash\x1fjoin") would
        # otherwise match prefix walks of their first token.  Exact
        # lookups (self.terms) still serve shingles.
        tl = getattr(self, "_term_list", None)
        if tl is None:
            from ..index.build import SHINGLE_SEP

            tl = self._term_list = sorted(
                t for t in self.terms if SHINGLE_SEP not in t
            )
        return tl

    def expand_fuzzy(
        self, term: str, max_edits: int = 1, prefix_length: int = 0,
        transpositions: bool = False,
    ) -> list[tuple[str, int]]:
        """This core's dictionary terms within edit distance (the shard
        engine's vectorized-DP expansion over the bucket dictionary)."""
        from .engine import fuzzy_expand_sorted

        return fuzzy_expand_sorted(
            self._sorted_terms(), term, max_edits, prefix_length,
            transpositions,
        )

    def match_docs(self, terms: list[str], k: int) -> "np.ndarray":
        """k smallest global doc ids containing any of ``terms`` (the
        constant_score doc gather for prefix/wildcard queries)."""
        parts = [
            self.terms[t][0] for t in terms if t in self.terms
        ]
        if not parts:
            return np.empty(0, dtype=np.int64)
        return np.unique(np.concatenate(parts))[:k]

    def df_of(self, terms: list[str]) -> dict[str, int]:
        """Document frequencies only — no posting arrays ship (the MLT
        candidate-selection probe; candidates can be hundreds of terms)."""
        return {
            t: self.terms[t][2] for t in terms if t in self.terms
        }

    def cf_of(self, terms: list[str]) -> dict[str, int]:
        """Collection frequencies (ttf) from the retained per-posting
        tfs (layout v2) — the termvectors term-statistics probe."""
        return {
            t: int(self.tfs[t].sum()) for t in terms if t in self.tfs
        }

    def fetch(self, terms: list[str], positions: bool = False):
        """→ {term: (doc_ids, norms, df, block_last, block_max)} for the
        terms this core owns; with ``positions=True`` each tuple gains
        (tfs, flat in-doc positions) — phrase serving."""
        if not positions:
            return {t: self.terms[t] for t in terms if t in self.terms}
        out = {}
        for t in terms:
            v = self.terms.get(t)
            if v is None:
                continue
            if t not in self.positions:
                raise RuntimeError(
                    "global layout lacks the positional sidecar — rebuild "
                    "merge_global_postings over a store_positions index"
                )
            out[t] = v + self.positions[t]
        return out

    def fetch_tf(self, terms: list[str]) -> dict:
        """→ {term: (doc_ids, tfs)} from the retained per-posting tf
        column (layout v2) — the ``sparse_vector`` impact surface; no
        norms, dls or positions ship."""
        out = {}
        for t in terms:
            v = self.terms.get(t)
            if v is None:
                continue
            tf = self.tfs.get(t)
            if tf is None:
                raise RuntimeError(
                    "layout v1 retains no per-posting tfs — rebuild "
                    "merge_global_postings (layout v2) for sparse_vector "
                    "serving"
                )
            out[t] = (v[0], tf)
        return out

    def fetch_tf_dl(self, terms: list[str]) -> dict:
        """→ {term: (doc_ids, tfs, dls)} from the retained per-posting
        tf AND dl columns (layout v2) — the SynonymQuery wire: raw term
        frequencies sum ACROSS the group before saturation, so
        pre-saturated norms can't serve it; dls re-derive the norm
        under the blended tf coordinator-side."""
        out = {}
        for t in terms:
            v = self.terms.get(t)
            if v is None:
                continue
            tf, dl = self.tfs.get(t), self.dls.get(t)
            if tf is None or dl is None:
                raise RuntimeError(
                    "layout v1 retains no per-posting tfs/dls — rebuild "
                    "merge_global_postings (layout v2) for synonym "
                    "serving"
                )
            out[t] = (v[0], tf, dl)
        return out

    def position_mass(self, terms: list[str]) -> dict:
        """term → total stored positions (Σ tf — the positional wire
        cost of a full fetch), O(1) per term.  Feeds the coordinator's
        phrase-gate decision; terms without a sidecar are absent."""
        out = {}
        for t in terms:
            v = self.positions.get(t)
            if v is not None:
                out[t] = int(len(v[1]))
        return out

    def fetch_dls_subset(
        self, term: str, docs: np.ndarray
    ) -> np.ndarray | None:
        """Per-doc lengths for sorted ``docs``, served from the term's
        retained per-posting dl column (the dls-v2 invariant) — every
        requested doc must sit in the term's posting list (phrase-matched
        docs always do).  None ⇔ this layout retains no dls (v1) or a
        doc is missing — callers fall back to docstore hydration."""
        v = self.terms.get(term)
        dls = self.dls.get(term)
        if v is None or dls is None:
            return None
        ids = v[0]
        idx = np.searchsorted(ids, docs)
        if (idx >= len(ids)).any() or (ids[np.minimum(idx, len(ids) - 1)]
                                       != docs).any():
            return None
        return dls[idx].astype(np.float64)

    def fetch_positions_subset(
        self, terms: list[str], cand: np.ndarray
    ) -> dict:
        """Positional fetch gated REMOTE-SIDE by a candidate doc set:
        only the postings of docs in sorted ``cand`` (the phrase terms'
        doc conjunction, computed by the coordinator from the cheap
        non-positional round) ship back.  Wire cost scales with the
        conjunction, not the hot terms' full position mass.  Tuple shape
        stays 7-wide so consumers index (tfs, positions) at [5]/[6];
        norms/block fields are None — the phrase path never reads them."""
        out = {}
        for t in terms:
            v = self.terms.get(t)
            if v is None:
                continue
            if t not in self.positions:
                raise RuntimeError(
                    "global layout lacks the positional sidecar — rebuild "
                    "merge_global_postings over a store_positions index"
                )
            tfs, pos = self.positions[t]
            ids_sub, tfs_sub, pos_sub = subset_positions(
                v[0], tfs, pos, cand
            )
            out[t] = (ids_sub, None, v[2], None, None, tfs_sub, pos_sub)
        return out


@ray.remote
def _phrase_chunk_kernel(
    slot_refs: list,
    seqs: list[int],
    lo: int,
    hi: int,
    cand: np.ndarray,
    shift_bits: int,
    slop: int,
    slop_mode: str,
    rpt_groups: list | None,
    rpt_multi: bool = False,
) -> tuple[np.ndarray, np.ndarray]:
    """One doc-range chunk [lo, hi) of a phrase query, reading the
    terms' FULL posting arrays zero-copy from the object store
    (``slot_refs`` are per-slot ``ray.put`` handles of (ids, tf64, pos,
    tfcum) — put once per term, reused across queries) and slicing
    locally.  Runs the identical inline kernel on its slice: the
    subset-gather → key-pack → intersect chain for exact/ordered use,
    or the lockstep sloppy matcher for lucene mode.  Exact by per-doc
    independence (forced-parallel parity tests)."""
    # each slot is a LIST of posting refs — singleton for a plain term,
    # several for a multi-phrase slot (match_phrase_prefix expansions);
    # slop modes union the group's position streams per slot
    slices = []
    for slot in slot_refs:
        group = []
        for r in (slot if isinstance(slot, list) else [slot]):
            ids, tf64, pos, tfcum = (
                ray.get(r) if isinstance(r, ray.ObjectRef) else r
            )
            a = int(np.searchsorted(ids, lo, side="left"))
            b = int(np.searchsorted(ids, hi, side="left"))
            group.append((ids[a:b], tf64[a:b], pos[tfcum[a]:tfcum[b]]))
        slices.append(group)
    return _phrase_slices_compute(
        slices, seqs, cand, shift_bits, slop, slop_mode, rpt_groups,
        rpt_multi,
    )


def _phrase_slices_compute(
    slices: list,
    seqs: list[int],
    cand: np.ndarray,
    shift_bits: int,
    slop: int,
    slop_mode: str,
    rpt_groups: list | None,
    rpt_multi: bool = False,
) -> tuple[np.ndarray, np.ndarray]:
    """The shared chunk compute: per-slot GROUPS of (ids, tf64, pos)
    posting slices → (matched doc ids, phrase freqs) for this chunk's
    candidates — the subset-gather → key-pack → intersect chain for
    exact/ordered, the lockstep sloppy matcher for lucene mode.  Both
    parallel kernels (full-ref slicing and actor-gated subsets) call
    this; per-doc independence makes any doc-disjoint split exact.

    Multi-term slots (several slices in a group) union their position
    streams per slot in every mode; ``(rpt_groups, rpt_multi)`` carry
    the lucene-mode repeat plan (``sloppy.repeat_plan``)."""
    from .sloppy import sloppy_freqs_for_candidates

    shift = np.int64(shift_bits)

    def slot_keys_union(group):
        # one token per position → keys are disjoint across the
        # group's terms; sort-merge, no dedup needed
        parts = []
        for ids, tf64, pos in group:
            ids_s, tfs_s, pos_s = subset_positions(ids, tf64, pos, cand)
            docs_flat = np.repeat(ids_s, tfs_s).astype(
                np.int64, copy=False
            )
            parts.append((docs_flat << shift) | pos_s.astype(np.int64))
        return parts[0] if len(parts) == 1 else np.sort(
            np.concatenate(parts)
        )

    if slop > 0 and slop_mode == "lucene":
        mask = np.int64((1 << shift_bits) - 1)
        slot_docs, slot_pos = [], []
        for group in slices:
            keys = slot_keys_union(group)
            slot_docs.append((keys >> shift).astype(np.int64, copy=False))
            slot_pos.append((keys & mask).astype(np.int64, copy=False))
        return sloppy_freqs_for_candidates(
            slot_docs, slot_pos, slop, repeat_groups=rpt_groups,
            multi_term=rpt_multi,
        )
    if slop > 0:
        # ordered sloppy: the inline greedy successor chain on raw
        # (doc<<bits|pos) keys, over this chunk's slices only
        keys_per_slot = [slot_keys_union(group) for group in slices]
        starts = keys_per_slot[0]
        cur = starts
        okm = np.ones(len(starts), dtype=bool)
        for nxt in keys_per_slot[1:]:
            pos_in = np.searchsorted(nxt, cur + 1)
            valid = pos_in < len(nxt)
            cand_k = (
                nxt[np.minimum(pos_in, max(len(nxt) - 1, 0))]
                if len(nxt) else np.zeros_like(cur)
            )
            valid &= (cand_k >> shift) == (cur >> shift)
            okm &= valid
            cur = np.where(valid, cand_k, cur)
        mask = np.int64((1 << shift_bits) - 1)
        span = (cur & mask) - (starts & mask)
        okm &= span <= (len(slices) - 1 + slop)
        cur = starts[okm]
        if len(cur) == 0:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        hd, pf = np.unique(cur >> shift, return_counts=True)
        return hd.astype(np.int64), pf.astype(np.float64)
    cur = None
    for group, seq in zip(slices, seqs):
        parts = []
        for ids, tf64, pos in group:
            ids_s, tfs_s, pos_s = subset_positions(ids, tf64, pos, cand)
            docs_flat = np.repeat(ids_s, tfs_s).astype(np.int64, copy=False)
            p = pos_s.astype(np.int64)
            if seq:
                keep = p >= seq
                if not keep.all():
                    docs_flat, p = docs_flat[keep], p[keep]
                p = p - seq
            parts.append((docs_flat << shift) | p)
        # multi-phrase slot: one token per position, so keys across the
        # group's terms are disjoint — sort-merge, no dedup needed
        keys = parts[0] if len(parts) == 1 else np.sort(
            np.concatenate(parts)
        )
        cur = keys if cur is None else np.intersect1d(
            cur, keys, assume_unique=True
        )
        if len(cur) == 0:
            return np.empty(0, np.int64), np.empty(0, np.float64)
    hd, pf = np.unique(cur >> shift, return_counts=True)
    return hd.astype(np.int64), pf.astype(np.float64)


@ray.remote
def _phrase_gated_chunk_kernel(
    part_refs: list,
    toks: list[str],
    cand: np.ndarray,
    shift_bits: int,
    slop: int,
    slop_mode: str,
    rpt_groups: list | None,
    rpt_multi: bool = False,
) -> tuple[np.ndarray, np.ndarray]:
    """One doc-range chunk of a GATED-parallel phrase: ``part_refs``
    are ObjectRefs of per-owning-actor ``fetch_positions_subset``
    results for THIS chunk's candidates — actor → task object flow,
    nothing ever materializes on the coordinator and no full-mass
    ``ray.put`` happens (the huge-mass regime where both the put and
    the coordinator copy dominate).  Same shared compute as the
    full-ref kernel."""
    fetched: dict = {}
    for r in part_refs:
        fetched.update(ray.get(r))
    empty = (np.empty(0, np.int64), np.empty(0, np.float64))
    slices = []
    for slot in toks:
        # a slot is one term or a LIST of terms (multi-phrase slot —
        # the match_phrase_prefix expansion union): individual
        # expansions absent in this chunk are fine, an EMPTY slot
        # means no match here
        group = []
        for t in (slot if isinstance(slot, list) else [slot]):
            e = fetched.get(t)
            if e is None or len(e[0]) == 0:
                continue
            ids_sub, _n, _df, _bl, _bm, tfs_sub, pos_sub = e
            group.append((ids_sub, tfs_sub.astype(np.int64), pos_sub))
        if not group:
            return empty
        slices.append(group)
    return _phrase_slices_compute(
        slices, list(range(len(toks))), cand, shift_bits, slop,
        slop_mode, rpt_groups, rpt_multi,
    )


@ray.remote
class TermBucketActor(_BucketCore):
    """Ray actor wrapper: buckets load once, queries gather from it."""


class TermPartitionedEngine:
    """Distributed BM25 top-k over the term-partitioned layout.

    ``method``: ``"dense"`` always merges every gathered posting;
    ``"wand"`` always runs the window-partitioned block-max skip;
    ``"auto"`` (default) picks per query, like the doc engine."""

    def __init__(self, global_dir: str | Path, num_actors: int = 4,
                 round_decimals: int | None = None, method: str = "auto"):
        self.global_dir = str(global_dir)
        self.meta = _load_meta(global_dir)
        if not self.meta.get("store_norms"):
            raise ValueError(
                "term-partitioned serving needs store_norms=True at merge time"
            )
        if method not in ("dense", "wand", "auto"):
            raise ValueError(f"unknown method {method!r}")
        self.method = method
        self.n = int(self.meta["num_docs"])
        self.round_decimals = round_decimals
        n_buckets = int(self.meta["n_buckets"])
        num_actors = max(1, min(num_actors, n_buckets))
        groups: list[list[int]] = [[] for _ in range(num_actors)]
        self._actor_of_bucket: dict[int, int] = {}
        for b in range(n_buckets):
            groups[b % num_actors].append(b)
            self._actor_of_bucket[b] = b % num_actors
        self.actors = [
            TermBucketActor.remote(self.global_dir, g) for g in groups
        ]
        name = self.meta.get("analyzer", "code")
        self._analyzer = get_analyzer("code" if name == "per_lang" else name)
        self._clip = (
            int(self.meta.get("min_token_len", 1)),
            int(self.meta.get("max_token_len", 64)),
        )
        self._n_buckets = n_buckets
        # bucket routing must use the LAYOUT's recorded hash (fnv1a64 on
        # new merges; md5 on layouts predating the term_hash key)
        self._term_hash = self.meta.get("term_hash", "md5")

    def _analyze(self, query: str) -> list[str]:
        return sorted(set(clip_tokens(self._analyzer(query), *self._clip)))

    def _analyze_seq(self, query: str) -> list[str]:
        """Order-preserving, duplicates-kept analysis (phrase/intervals
        ``match`` text — position semantics need the original order)."""
        return clip_tokens(self._analyzer(query), *self._clip)

    # coordinator-side bounded term cache: hot terms repeat across
    # queries, and their (ids, norms) arrays are the expensive part of the
    # gather (a 740k-posting term ships ~12 MB per fetch).  FIFO-evicted
    # by total cached postings.
    CACHE_MAX_POSTINGS = 8_000_000

    def fetch_terms(self, terms: list[str], positions: bool = False) -> dict:
        """Gather term postings with ONE call per owning actor (terms from
        any number of queries can share the round trip); repeat terms hit
        the coordinator cache instead of the wire.  ``positions=True``
        extends each tuple with (tfs, flat positions) — cached under a
        separate key so term and phrase traffic don't evict each other's
        shape."""
        from ..index.global_merge import _term_bucket

        if not hasattr(self, "_term_cache"):
            self._term_cache: dict[tuple, tuple] = {}
            self._cache_postings = 0
        fetched: dict[str, tuple] = {}
        missing: list[str] = []
        for t in terms:
            got = self._term_cache.get((t, positions))
            if got is not None:
                if got is not _ABSENT:
                    fetched[t] = got
            else:
                missing.append(t)
        if missing:
            by_actor: dict[int, list[str]] = {}
            for t in missing:
                a = self._actor_of_bucket[_term_bucket(t, self._n_buckets, self._term_hash)]
                by_actor.setdefault(a, []).append(t)
            futs = [
                self.actors[a].fetch.remote(ts, positions)
                for a, ts in by_actor.items()
            ]
            got_new: dict[str, tuple] = {}
            for part in ray.get(futs):
                got_new.update(part)
            def _cost(v: tuple) -> int:
                # positional entries carry a flat positions array that can
                # be 10-100× the posting count — charge it, or phrase
                # traffic blows far past the documented cache bound
                return len(v[0]) + (len(v[6]) if len(v) > 6 else 0)

            for t in missing:
                v = got_new.get(t)
                if v is None:
                    self._term_cache[(t, positions)] = _ABSENT
                    continue
                fetched[t] = v
                self._term_cache[(t, positions)] = v
                self._cache_postings += _cost(v)
            while (self._cache_postings > self.CACHE_MAX_POSTINGS
                   and self._term_cache):
                old_k, old_v = next(iter(self._term_cache.items()))
                del self._term_cache[old_k]
                if old_v is not _ABSENT:
                    self._cache_postings -= _cost(old_v)
        return fetched

    # remote-side phrase gate: ship position subsets instead of full
    # streams when the doc conjunction is small relative to the uncached
    # terms' posting mass (df as the proxy — positions-per-doc assumed
    # comparable across the phrase terms)
    PHRASE_GATE_FRAC = 0.5
    # hot-phrase coordinator work (key packing + intersect / lockstep
    # matcher) fans out over doc-range chunk TASKS past this total
    # positional mass — per-doc independence makes the split exact
    PHRASE_PARALLEL_TASKS = 8
    PHRASE_PARALLEL_MIN_MASS = 2_000_000
    # MULTI-phrase (phrase_prefix) fan-out guards only — plain phrases
    # have no upper bound (see the gate comment in search_phrase: even
    # ~120M-mass hot-hot slop wins 4.4x warm).  Wide expansions pay one
    # ray.put PER TERM for a marginal warm win (measured: 50 expansions
    # ≈ 1 s of puts; prefix queries are autocomplete-shaped,
    # cold-dominated), so they stay inline past these.
    PHRASE_PARALLEL_MAX_MASS = 48_000_000
    PHRASE_PARALLEL_MAX_TERMS = 12

    # gated-parallel threshold: when the remote gate fires AND the
    # candidate-subset mass itself exceeds this, the subsets go
    # per-chunk straight from bucket actors to chunk tasks (the
    # coordinator never materializes them) — the huge-mass hot-hot
    # regime where even gated-inline is matcher-bound (measured at 4M:
    # inline 35 s warm vs chunked ~8 s)
    GATED_PARALLEL_MIN_COST = 8_000_000

    def _fetch_phrase_postings(
        self, terms: list[str], cand: np.ndarray | None = None,
        gated_parallel_min: int | None = None,
    ) -> tuple[dict, np.ndarray] | tuple[str, np.ndarray, dict] | None:
        """Positional postings for a phrase's (deduplicated, sorted)
        terms, plus their doc conjunction.

        Two rounds: the cheap non-positional fetch (coordinator-cached)
        yields doc-id lists; the conjunction then gates the positional
        round REMOTE-SIDE (:meth:`_BucketCore.fetch_positions_subset`) —
        only surviving docs' position segments cross the wire.  Falls
        back to the full positional fetch (which feeds the coordinator
        cache) when the conjunction is large, or serves straight from
        already-cached positional entries.  Bit-exact either way: the
        coordinator's own doc-conjunction gate makes the subset a no-op
        on results.  None ⇔ some term is absent (phrase can't match).

        A non-None ``cand`` (sorted doc ids) REPLACES the conjunction —
        the multi-phrase caller (match_phrase_prefix) supplies the
        fixed-conjunction ∩ expansion-union set, under which plain
        per-term conjunction would be wrong."""
        from ..index.global_merge import _term_bucket

        base = self.fetch_terms(terms, positions=False)
        if any(t not in base for t in terms):
            return None
        if cand is None:
            for t in terms:
                ids = base[t][0]
                cand = ids if cand is None else cand[
                    np.isin(cand, ids, assume_unique=True)
                ]
                if len(cand) == 0:
                    return {}, cand
        elif len(cand) == 0:
            return {}, cand
        fetched: dict[str, tuple] = {}
        uncached: list[str] = []
        cache = getattr(self, "_term_cache", {})
        for t in terms:
            got = cache.get((t, True))
            if got is not None and got is not _ABSENT:
                fetched[t] = got
            else:
                uncached.append(t)
        if uncached:
            by_actor: dict[int, list[str]] = {}
            for t in uncached:
                a = self._actor_of_bucket[_term_bucket(t, self._n_buckets, self._term_hash)]
                by_actor.setdefault(a, []).append(t)
            # exact per-term positional mass (Σ tf), O(1) actor-side,
            # memoized — the wire cost a full positional fetch would pay
            if not hasattr(self, "_mass_cache"):
                self._mass_cache: dict[str, int] = {}
            need_mass = {
                a: [t for t in ts if t not in self._mass_cache]
                for a, ts in by_actor.items()
            }
            futs = [
                self.actors[a].position_mass.remote(ts)
                for a, ts in need_mass.items() if ts
            ]
            for part in ray.get(futs):
                self._mass_cache.update(part)
            mass = {t: self._mass_cache.get(t, 0) for t in uncached}
            full_cost = sum(
                int(base[t][2]) + mass[t] for t in uncached
            )
            gated_cost = sum(
                len(cand) * (1 + mass[t] / max(int(base[t][2]), 1))
                for t in uncached
            )
            # prefer the full fetch while it still FITS the coordinator
            # cache (pays the wire once, repeats are free); gate only
            # when the mass would blow the budget AND the conjunction's
            # expected segment mass is materially smaller
            fits_cache = full_cost <= self.CACHE_MAX_POSTINGS
            if (not fits_cache
                    and gated_cost < self.PHRASE_GATE_FRAC * full_cost):
                if (gated_parallel_min is not None
                        and gated_cost >= gated_parallel_min
                        and len(cand) > self.PHRASE_PARALLEL_TASKS):
                    # huge-mass regime: hand the caller the candidate
                    # set + dfs and let it fan per-chunk actor subsets
                    # straight to chunk tasks — no coordinator copy
                    return "gated_parallel", cand, base
                futs = [
                    self.actors[a].fetch_positions_subset.remote(ts, cand)
                    for a, ts in by_actor.items()
                ]
                for part in ray.get(futs):
                    fetched.update(part)
            else:
                fetched.update(self.fetch_terms(uncached, positions=True))
        if any(t not in fetched for t in terms):
            return None
        return fetched, cand

    # ------------------------------------------------------------- scoring

    def _tie_cut(self, docs: np.ndarray, scores: np.ndarray, k: int):
        if len(docs) > max(k, 1) * 4:
            # prune to the kth-score tie class BEFORE the deterministic
            # lexsort (a hot query touches ~every doc; lexsorting 1M
            # candidates costs ~150 ms, partition+small-sort ~10 ms) —
            # same pattern as the doc engine's dense_topk
            kth = np.partition(scores, len(scores) - k)[len(scores) - k]
            r = self.round_decimals
            if r is not None:
                keep = np.round(scores, r) >= np.round(kth, r)
            else:
                keep = scores >= kth
            docs, scores = docs[keep], scores[keep]
        cut = np.lexsort((docs, -scores))
        if self.round_decimals is None or len(cut) <= k:
            cut = cut[:k]
        else:
            r = self.round_decimals
            kth_r = np.round(scores[cut[k - 1]], r) if k else None
            c = k
            while c < len(cut) and np.round(scores[cut[c]], r) == kth_r:
                c += 1
            cut = cut[:c]
        return list(zip(docs[cut].tolist(), scores[cut].tolist()))

    # above this corpus size the per-query scatter accumulator (8 bytes ×
    # num_docs) stops being worth its memory; fall back to the sort-merge
    DENSE_SCATTER_MAX_DOCS = 20_000_000

    def _score_dense(self, terms: list[str], fetched: dict, k: int):
        # contributions in SORTED term order — the accumulation-order pin
        # that keeps scores bit-identical to the dense scorer / oracle
        d_parts: list[np.ndarray] = []
        c_parts: list[np.ndarray] = []
        for t in terms:
            got = fetched.get(t)
            if got is None:
                continue
            ids, norms, df = got[0], got[1], got[2]
            idf = math.log(1.0 + (self.n - df + 0.5) / (df + 0.5))
            d_parts.append(ids)
            c_parts.append(idf * norms)
        return self._merge_contribs(d_parts, c_parts, k)

    def _merge_contribs(self, d_parts, c_parts, k):
        """Merge per-term (doc ids, contributions) into per-doc sums and
        tie-cut top-k — the scatter/sort-merge tail shared by dense and
        weighted-expansion (fuzzy) scoring."""
        if not d_parts:
            return []
        if len(d_parts) == 1:
            # single contributing term: ids are already unique — no merge
            return self._tie_cut(d_parts[0], c_parts[0], k)
        if self.n <= self.DENSE_SCATTER_MAX_DOCS:
            # scatter-accumulate into a doc-id-indexed buffer (the doc
            # engine's dense kernel): each term's ids are unique, so
            # ``acc[ids] += c`` is a plain vectorized scatter; per-doc
            # addition order is term order — identical floats to the
            # sort-merge.  ~20× faster than the 2.8M-element argsort a
            # hot 3-term query needs at 1M docs (measured 304 → ~15 ms).
            acc = np.zeros(self.n, dtype=np.float64)
            touched = np.zeros(self.n, dtype=bool)
            for ids, c in zip(d_parts, c_parts):
                acc[ids] += c
                touched[ids] = True
            docs = np.nonzero(touched)[0]
            return self._tie_cut(docs, acc[docs], k)
        d_all = np.concatenate(d_parts)
        c_all = np.concatenate(c_parts)
        order = np.argsort(d_all, kind="stable")
        d_all, c_all = d_all[order], c_all[order]
        starts = np.nonzero(np.concatenate([[True], d_all[1:] != d_all[:-1]]))[0]
        docs = d_all[starts]
        scores = np.add.reduceat(c_all, starts)
        return self._tie_cut(docs, scores, k)

    def _score_wand(self, terms: list[str], fetched: dict, k: int):
        """Window-partitioned block-max skip over the gathered arrays.

        Windows partition the doc-id space at the union of every term's
        block last-doc-ids, so a doc receives ALL its contributions in
        exactly one window; per-doc accumulation inside a window runs in
        sorted-term order — scores stay bit-identical to the dense merge.
        """
        metas = []  # (term slot in sorted order, ids, contribs, block_last, block_ub)
        for t in terms:
            got = fetched.get(t)
            if got is None:
                continue
            ids, norms, df, block_last, block_max = got
            idf = math.log(1.0 + (self.n - df + 0.5) / (df + 0.5))
            metas.append((ids, idf * norms, block_last, idf * block_max))
        if not metas:
            return []
        bounds = np.unique(np.concatenate([m[2] for m in metas]))
        n_win = len(bounds)
        ub_win = np.zeros(n_win, dtype=np.float64)
        block_of_win: list[np.ndarray] = []
        for ids, _c, block_last, block_ub in metas:
            bw = np.searchsorted(block_last, bounds, side="left")
            block_of_win.append(bw)
            valid = bw < len(block_ub)
            ub_win[valid] += block_ub[bw[valid]]
        tie_eps = (
            10.0 ** (-self.round_decimals)
            if self.round_decimals is not None
            else 0.0
        )
        order = np.argsort(-ub_win, kind="stable")
        cand_docs: list[np.ndarray] = []
        cand_scores: list[np.ndarray] = []
        n_cand = 0
        kth = -math.inf
        for w in order.tolist():
            if n_cand >= k and ub_win[w] < kth - tie_eps:
                break  # every later window has a smaller bound
            w_lo = int(bounds[w - 1]) if w > 0 else -1
            w_hi = int(bounds[w])
            # window-local scatter accumulator (width = the window's doc
            # range): the SAME sequential per-term += the oracle and the
            # doc engine's dense kernel use, so scores stay bit-identical
            # to both (a sort+reduceat merge lands one ulp off and can
            # flip raw-score tie order)
            width = w_hi - w_lo
            acc = np.zeros(width, dtype=np.float64)
            touched = np.zeros(width, dtype=bool)
            any_rows = False
            for ids, contribs, _bl, _bu in metas:
                lo = np.searchsorted(ids, w_lo, side="right")
                hi = np.searchsorted(ids, w_hi, side="right")
                if hi > lo:
                    ix = ids[lo:hi] - (w_lo + 1)
                    acc[ix] += contribs[lo:hi]
                    touched[ix] = True
                    any_rows = True
            if not any_rows:
                continue
            local = np.nonzero(touched)[0]
            docs = local + (w_lo + 1)
            scores = acc[local]
            cand_docs.append(docs)
            cand_scores.append(scores)
            n_cand += len(docs)
            if n_cand >= k:
                # refresh kth AND prune the pool to the still-viable tail
                # (score ≥ kth − tie_eps) — without the prune the pool
                # grows with every processed window and the per-window
                # partition goes quadratic on dense queries
                s_all = np.concatenate(cand_scores)
                d_pool = np.concatenate(cand_docs)
                kth = np.partition(s_all, len(s_all) - k)[len(s_all) - k]
                keep = s_all >= kth - tie_eps
                cand_scores = [s_all[keep]]
                cand_docs = [d_pool[keep]]
                n_cand = int(keep.sum())
        if not cand_docs:
            return []
        docs = np.concatenate(cand_docs)
        scores = np.concatenate(cand_scores)
        return self._tie_cut(docs, scores, k)

    def _score_from_fetch(self, terms: list[str], fetched: dict, k: int):
        if self.method == "wand":
            return self._score_wand(terms, fetched, k)
        if self.method == "auto" and self.n >= WAND_AUTO_MIN_DOCS:
            mass = sum(len(fetched[t][0]) for t in terms if t in fetched)
            if mass < WAND_AUTO_MAX_DENSITY * self.n:
                return self._score_wand(terms, fetched, k)
        return self._score_dense(terms, fetched, k)

    def search(self, query: str, k: int = 10) -> list[tuple[int, float]]:
        terms = self._analyze(query)
        if not terms:
            return []
        fetched = self.fetch_terms(terms)
        return self._score_from_fetch(terms, fetched, k)

    def search_sparse_vector(
        self, query_vector: dict[str, float], k: int = 10
    ) -> list[tuple[int, float]]:
        """ES ``sparse_vector`` query on the TERM-partitioned layout —
        identical results to :meth:`QueryEngine.search_sparse_vector`
        (parity tested).  One ``fetch_tf`` round per OWNING bucket actor
        (wire = the tokens' posting ids + u4 tfs, no norms/positions);
        contributions accumulate in sorted-token order (the float pin)
        through the shared scatter/sort-merge tail."""
        from ..index.global_merge import _term_bucket

        items = sorted((t, float(w)) for t, w in query_vector.items() if w)
        if not items:
            return []
        by_actor: dict[int, list[str]] = {}
        for t, _w in items:
            a = self._actor_of_bucket[
                _term_bucket(t, self._n_buckets, self._term_hash)
            ]
            by_actor.setdefault(a, []).append(t)
        fetched: dict[str, tuple] = {}
        for part in ray.get(
            [self.actors[a].fetch_tf.remote(ts)
             for a, ts in by_actor.items()]
        ):
            fetched.update(part)
        d_parts, c_parts = [], []
        for t, w in items:
            got = fetched.get(t)
            if got is None:
                continue
            ids, tfs = got
            d_parts.append(ids)
            c_parts.append(w * tfs.astype(np.float64))
        return self._merge_contribs(d_parts, c_parts, k)

    def search_synonyms(
        self,
        query: str | list,
        synonyms: dict[str, list[str]] | None = None,
        k: int = 10,
    ) -> list[tuple[int, float]]:
        """Lucene ``SynonymQuery`` on the TERM-partitioned layout —
        identical results to :meth:`QueryEngine.search_synonyms`
        (parity tested).  One ``fetch_tf_dl`` round per OWNING bucket
        actor (raw tfs + dls — pre-saturated norms can't serve a
        summed-tf group); per slot the members' postings merge
        (exact-integer tf sums), the norm re-derives under the blended
        tf, and contributions flow through the shared
        scatter/sort-merge tail."""
        import math

        from ..index.global_merge import _term_bucket

        if isinstance(query, str):
            toks = self._analyze(query)
            syn = synonyms or {}
            slots = [tuple(sorted({t, *syn.get(t, ())})) for t in toks]
        else:
            slots = [
                tuple(sorted(set(s))) if isinstance(s, (list, tuple, set))
                else (s,)
                for s in query
            ]
        if not slots:
            return []
        all_terms = sorted({t for s in slots for t in s})
        dfs = self.dfs(all_terms)
        n = self.n
        avgdl = float(self.meta["avgdl"])
        k1, b = float(self.meta["k1"]), float(self.meta["b"])
        by_actor: dict[int, list[str]] = {}
        for t in all_terms:
            a = self._actor_of_bucket[
                _term_bucket(t, self._n_buckets, self._term_hash)
            ]
            by_actor.setdefault(a, []).append(t)
        fetched: dict[str, tuple] = {}
        for part in ray.get(
            [self.actors[a].fetch_tf_dl.remote(ts)
             for a, ts in by_actor.items()]
        ):
            fetched.update(part)
        d_parts, c_parts = [], []
        for slot in slots:
            df = max(dfs[t] for t in slot)
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            got = [fetched[t] for t in slot if t in fetched]
            if not got:
                continue
            if len(got) == 1:
                ids = got[0][0]
                tf = got[0][1].astype(np.float64)
                dl = got[0][2].astype(np.float64)
            else:
                ids_c = np.concatenate([g[0] for g in got])
                tf_c = np.concatenate([g[1] for g in got]).astype(np.float64)
                dl_c = np.concatenate([g[2] for g in got]).astype(np.float64)
                ids, inv = np.unique(ids_c, return_inverse=True)
                tf = np.bincount(inv, weights=tf_c, minlength=len(ids))
                dl = np.zeros(len(ids), dtype=np.float64)
                dl[inv] = dl_c  # same doc → same dl; any occurrence wins
            d_parts.append(ids)
            c_parts.append(
                idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
            )
        return self._merge_contribs(d_parts, c_parts, k)

    def _constant_score_docs(self, expand_method: str, arg: str, k: int):
        # 1) expand over every bucket actor (dictionary walk); 2) gather
        # the k smallest matching doc ids, one round per OWNING actor
        futs = [
            getattr(a, expand_method).remote(arg) for a in self.actors
        ]
        from ..index.global_merge import _term_bucket

        terms = sorted(set().union(*map(set, ray.get(futs))))
        if not terms:
            return []
        by_actor: dict[int, list[str]] = {}
        for t in terms:
            ai = self._actor_of_bucket[_term_bucket(t, self._n_buckets, self._term_hash)]
            by_actor.setdefault(ai, []).append(t)
        parts = ray.get(
            [self.actors[a].match_docs.remote(ts, k)
             for a, ts in by_actor.items()]
        )
        # np.unique, not sort: two actors (different buckets, different
        # matching terms) can both report the same doc
        docs = np.unique(np.concatenate(parts))[:k] if parts else []
        return [(int(d), 1.0) for d in docs]

    def search_prefix(self, prefix: str, k: int = 10) -> list[tuple[int, float]]:
        """ES ``prefix`` query (constant_score rewrite) on the
        term-partitioned layout — identical results to
        ``QueryEngine.search_prefix`` (tested)."""
        if not prefix:
            return []
        return self._constant_score_docs("expand_prefix", prefix, k)

    def terms_enum(self, prefix: str = "", *, size: int = 10,
                   after: str | None = None) -> list[tuple[str, int]]:
        """ES ``_terms_enum`` on the term-partitioned layout: per-actor
        sorted pages (union ⊇ global first-``size``) merged on the
        coordinator, then one df round routed to each term's OWNING
        bucket (no posting arrays ship).  Identical output to
        ``QueryEngine.terms_enum`` over the same corpus (tested)."""
        from ..index.global_merge import _term_bucket

        pages = ray.get([
            a.terms_page.remote(prefix, after, size) for a in self.actors
        ])
        terms = sorted(set().union(*pages))[:size]
        by_actor: dict[int, list[str]] = {}
        for t in terms:
            a = self._actor_of_bucket[
                _term_bucket(t, self._n_buckets, self._term_hash)
            ]
            by_actor.setdefault(a, []).append(t)
        dfs: dict[str, int] = {}
        for part in ray.get(
            [self.actors[a].df_of.remote(ts) for a, ts in by_actor.items()]
        ):
            dfs.update(part)
        return [(t, dfs.get(t, 0)) for t in terms]

    def search_wildcard(self, pattern: str, k: int = 10) -> list[tuple[int, float]]:
        """ES ``wildcard`` query (constant_score rewrite) on the
        term-partitioned layout."""
        if not pattern:
            return []
        return self._constant_score_docs("expand_wildcard", pattern, k)

    def search_regexp(self, pattern: str, k: int = 10) -> list[tuple[int, float]]:
        """ES ``regexp`` query (constant_score rewrite, anchored
        pattern) on the term-partitioned layout — identical results to
        ``QueryEngine.search_regexp``."""
        if not pattern:
            return []
        return self._constant_score_docs("expand_regexp", pattern, k)

    def search_function_score(
        self,
        query: str | list[str],
        field: str,
        k: int = 10,
        factor: float = 1.0,
        modifier: str = "none",
        missing: float = 1.0,
        boost_mode: str = "multiply",
    ) -> list[tuple[int, float]]:
        """ES ``function_score`` (field_value_factor) served from the
        term-partitioned layout: the match set scores on the
        coordinator, field doc values hydrate id-aligned from the
        source docmeta lineage, the factor applies, and the tie cut
        runs on the COMBINED score — identical results to
        :meth:`QueryEngine.search_function_score` (parity tested)."""
        from .engine import apply_fvf_modifier
        from .datehist import values_partials_over_ids

        terms = (
            self._analyze(query) if isinstance(query, str)
            else sorted(set(query))
        )
        if not terms:
            return []
        fetched = self.fetch_terms(terms)
        if not fetched:
            return []
        hits = self._score_from_fetch(terms, fetched, 1 << 30)
        if not hits:
            return []
        ids = np.array([d for d, _ in hits], dtype=np.int64)
        base = np.array([s for _, s in hits], dtype=np.float64)
        src = self.meta.get("source_index")
        if not src:
            raise RuntimeError(
                "global layout predates source_index metadata — rebuild "
                "merge_global_postings for function_score serving"
            )
        sids = np.unique(ids)
        vals = np.concatenate(
            values_partials_over_ids(src, sids, field, "raw")
        ).astype(np.float64)
        v = vals[np.searchsorted(sids, ids)]
        nanm = np.isnan(v)
        if nanm.any():
            v = np.where(nanm, float(missing), v)
        f = apply_fvf_modifier(v, float(factor), modifier)
        final = base * f if boost_mode == "multiply" else base + f
        return self._tie_cut(ids, final, k)

    def search_terms_set(
        self, terms: str | list[str], minimum_field: str, k: int = 10,
    ) -> list[tuple[int, float]]:
        """ES ``terms_set`` on the term-partitioned layout: postings
        gather from the owning bucket actors, per-doc matched-term
        counts fold on the coordinator, and each doc's
        ``minimum_should_match_field`` value hydrates id-aligned from
        the source docmeta lineage — results identical to
        :meth:`QueryEngine.search_terms_set` (parity tested).
        Semantics pinned there: candidates need ≥1 match AND
        count ≥ the doc's own field value."""
        from .datehist import values_partials_over_ids

        terms_s = (
            sorted(set(self._analyze(terms))) if isinstance(terms, str)
            else sorted(set(terms))
        )
        if not terms_s:
            return []
        fetched = self.fetch_terms(terms_s)
        if not fetched:
            return []
        hits = self._score_from_fetch(terms_s, fetched, 1 << 30)
        if not hits:
            return []
        ids = np.array([d for d, _ in hits], dtype=np.int64)
        sc = np.array([s for _, s in hits], dtype=np.float64)
        all_ids = np.concatenate([
            fetched[t][0] for t in terms_s if t in fetched
        ]).astype(np.int64)
        uids, cnt = np.unique(all_ids, return_counts=True)
        src = self.meta.get("source_index")
        if not src:
            raise RuntimeError(
                "global layout predates source_index metadata — rebuild "
                "merge_global_postings for terms_set serving"
            )
        m = np.concatenate(
            values_partials_over_ids(src, uids, minimum_field, "raw")
        ).astype(np.float64)
        pos = np.searchsorted(uids, ids)
        ok = cnt[pos] >= m[pos]
        if not ok.any():
            return []
        return self._tie_cut(ids[ok], sc[ok], k)

    def search_match_bool_prefix(
        self, text: str, k: int = 10,
    ) -> list[tuple[int, float]]:
        """ES ``match_bool_prefix`` on the term-partitioned layout —
        terms as bool SHOULD clauses, last token as a constant-score
        prefix (identical semantics + results to the shard engine's
        method, parity tested)."""
        toks = self._sqs_analyze()(text)
        if not toks:
            return []
        tree: tuple = ("prefix", toks[-1])
        for t in reversed(toks[:-1]):
            tree = ("or", ("term", t), tree)
        return self._eval_sqs_tree(tree, k)

    def search_decay_score(
        self,
        query: str | list[str],
        field: str,
        function: str,
        origin: float,
        scale: float,
        offset: float = 0.0,
        decay: float = 0.5,
        boost_mode: str = "multiply",
        k: int = 10,
    ) -> list[tuple[int, float]]:
        """ES ``function_score`` with a DECAY function (gauss | exp |
        linear) served from the term-partitioned layout: the match set
        scores on the coordinator, field doc values hydrate id-aligned
        from the source docmeta lineage, the decay applies, and the tie
        cut runs on the COMBINED score — identical results to
        :meth:`QueryEngine.search_decay_score` (parity tested).  Docs
        missing the field take function value 1.0."""
        from .datehist import values_partials_over_ids
        from .engine import apply_decay

        terms = (
            self._analyze(query) if isinstance(query, str)
            else sorted(set(query))
        )
        if not terms:
            return []
        fetched = self.fetch_terms(terms)
        if not fetched:
            return []
        hits = self._score_from_fetch(terms, fetched, 1 << 30)
        if not hits:
            return []
        ids = np.array([d for d, _ in hits], dtype=np.int64)
        base = np.array([s for _, s in hits], dtype=np.float64)
        src = self.meta.get("source_index")
        if not src:
            raise RuntimeError(
                "global layout predates source_index metadata — rebuild "
                "merge_global_postings for function_score serving"
            )
        sids = np.unique(ids)
        vals = np.concatenate(
            values_partials_over_ids(src, sids, field, "raw")
        ).astype(np.float64)
        v = vals[np.searchsorted(sids, ids)]
        f = apply_decay(v, function, float(origin), float(scale),
                        float(offset), float(decay))
        nanm = np.isnan(v)
        if nanm.any():
            f = np.where(nanm, 1.0, f)
        final = base * f if boost_mode == "multiply" else base + f
        return self._tie_cut(ids, final, k)

    def search_function_score_multi(
        self,
        query: str | list[str],
        functions: list[dict],
        score_mode: str = "multiply",
        boost_mode: str = "multiply",
        max_boost: float | None = None,
        k: int = 10,
    ) -> list[tuple[int, float]]:
        """ES ``function_score`` with a FUNCTIONS LIST served from the
        term-partitioned layout — identical semantics (and results,
        parity tested) to :meth:`QueryEngine.search_function_score_multi`.
        The match set scores on the coordinator; every doc-values column
        the spec list touches (function fields, filter fields, script
        identifiers) hydrates ONCE id-aligned from the source docmeta
        lineage; the shared kernel combines."""
        from .datehist import values_partials_over_ids
        from .funcscore import combine_function_score, spec_fields

        terms = (
            self._analyze(query) if isinstance(query, str)
            else sorted(set(query))
        )
        if not terms:
            return []
        fetched = self.fetch_terms(terms)
        if not fetched:
            return []
        hits = self._score_from_fetch(terms, fetched, 1 << 30)
        if not hits:
            return []
        ids = np.array([d for d, _ in hits], dtype=np.int64)
        base = np.array([s for _, s in hits], dtype=np.float64)
        src = self.meta.get("source_index")
        if not src:
            raise RuntimeError(
                "global layout predates source_index metadata — rebuild "
                "merge_global_postings for function_score serving"
            )
        sids = np.unique(ids)
        order = np.searchsorted(sids, ids)
        cols: dict[str, np.ndarray] = {}
        for f in spec_fields(functions):
            raw = np.concatenate(
                values_partials_over_ids(src, sids, f, "raw")
            )
            cols[f] = raw[order]
        final = combine_function_score(
            base, functions, lambda f: cols[f],
            score_mode, boost_mode, max_boost,
        )
        return self._tie_cut(ids, final, k)

    def search_simple_query_string(
        self, query: str, k: int = 10, default_operator: str = "or",
        minimum_should_match: int | None = None,
    ) -> list[tuple[int, float]]:
        """ES ``simple_query_string`` served from the term-partitioned
        layout — same grammar, scoring and results as
        :meth:`QueryEngine.search_simple_query_string` (parity tested).
        Leaves gather from the bucket actors (term postings, phrase
        machinery, prefix doc sets); the sparse clause algebra runs on
        the coordinator — the layout's standing trade for bool-shaped
        queries."""
        from .sqs import apply_minimum_should_match, parse_simple_query_string

        tree = parse_simple_query_string(
            query, self._sqs_analyze(), default_operator
        )
        tree = apply_minimum_should_match(tree, minimum_should_match)
        if tree is None:
            return []
        return self._eval_sqs_tree(tree, k)

    def _sqs_analyze(self):
        def analyze(s: str) -> list[str]:
            return clip_tokens(self._analyzer(s), *self._clip)

        return analyze

    def search_query_string(
        self, query: str, k: int = 10, default_operator: str = "or",
        minimum_should_match: int | None = None,
    ) -> list[tuple[int, float]]:
        """ES ``query_string`` (the classic Lucene ``q=`` syntax) served
        from the term-partitioned layout — same grammar, scoring and
        results as :meth:`QueryEngine.search_query_string` (parity
        tested).  Text leaves gather from the bucket actors; docmeta
        leaves (``field:value``, ranges) scan the source docmeta
        lineage column-pruned (``datehist.meta_match_ids``)."""
        from .qs import parse_query_string
        from .sqs import apply_minimum_should_match

        src = self.meta.get("source_index")
        text_col = "content"
        if src:
            from ..index.build import IndexInfo

            text_col = IndexInfo(src).manifest.text_col
        tree = parse_query_string(
            query, self._sqs_analyze(), default_operator,
            default_field=text_col,
        )
        tree = apply_minimum_should_match(tree, minimum_should_match)
        if tree is None:
            return []
        return self._eval_sqs_tree(tree, k)

    def _eval_sqs_tree(self, tree: tuple, k: int) -> list[tuple[int, float]]:
        """Evaluate a clause tree (sqs grammar or the compound-query
        nodes — dismax / boosting / constscore) over bucket-actor
        gathers; the sparse algebra runs on the coordinator."""
        from .sqs import eval_tree, rewrite_fuzzy

        tree = rewrite_fuzzy(
            tree, lambda base, fz: self.expand_fuzzy(base, fuzziness=fz)
        )

        def leaf(node):
            empty = (np.empty(0, np.int64), np.empty(0, np.float64))
            if node[0] == "term":
                t = node[1]
                fetched = self.fetch_terms([t])
                if t not in fetched:
                    return empty
                res = self._score_from_fetch([t], fetched, 1 << 30)
            elif node[0] == "fuzzyexp":
                # weighted BM25 disjunction over the dictionary
                # expansion — the search_fuzzy kernel, kept sparse
                base = node[1]
                fetched = self.fetch_terms(sorted(t for t, _ in node[2]))
                d_parts, c_parts = [], []
                for t, dist in sorted(node[2]):  # sorted-term accumulation
                    got = fetched.get(t)
                    if got is None:
                        continue
                    ids, norms, df = got[0], got[1], got[2]
                    idf = math.log(1.0 + (self.n - df + 0.5) / (df + 0.5))
                    w = idf * (1.0 - dist / max(1, min(len(base), len(t))))
                    d_parts.append(ids)
                    c_parts.append(w * norms)
                if not d_parts:
                    return empty
                d_all = np.concatenate(d_parts)
                c_all = np.concatenate(c_parts)
                order = np.argsort(d_all, kind="stable")
                d_all, c_all = d_all[order], c_all[order]
                starts = np.nonzero(
                    np.concatenate([[True], d_all[1:] != d_all[:-1]])
                )[0]
                return (d_all[starts].astype(np.int64),
                        np.add.reduceat(c_all, starts))
            elif node[0] == "phrase":
                toks, slop = node[1], node[2]
                res = self.search_phrase(
                    list(toks), k=1 << 30, slop=slop,
                    slop_mode="lucene" if slop else "ordered",
                )
            elif node[0] == "prefix":
                res = self.search_prefix(node[1], k=1 << 30)
            elif node[0] == "wildcard":
                res = self.search_wildcard(node[1], k=1 << 30)
            elif node[0] in ("metaterm", "metarange", "metaexists"):
                # query_string docmeta leaf: keyword fields are not
                # inverted in this layout — a partition-parallel
                # column-pruned scan of the source docmeta lineage
                # (shared predicate semantics: qs.meta_pred_mask)
                from .datehist import meta_match_ids

                src = self.meta.get("source_index")
                if not src:
                    raise RuntimeError(
                        "global layout predates source_index metadata — "
                        "rebuild merge_global_postings for docmeta leaves"
                    )
                if node[0] == "metaterm":
                    pred = ("term", node[2])
                elif node[0] == "metaexists":
                    pred = ("exists",)
                else:
                    pred = ("range",) + tuple(node[2:])
                ids = meta_match_ids(src, node[1], pred)
                return ids, np.ones(len(ids), np.float64)
            else:
                raise ValueError(f"unknown sqs leaf {node[0]!r}")
            if not res:
                return empty
            ids = np.array([d for d, _ in res], dtype=np.int64)
            sc = np.array([s for _, s in res], dtype=np.float64)
            order = np.argsort(ids)
            return ids[order], sc[order]

        ids, sc = eval_tree(tree, leaf)
        if len(ids) == 0:
            return []
        return self._tie_cut(ids, sc, k)

    def search_dis_max(
        self, queries: list[str], tie_breaker: float = 0.0, k: int = 10,
    ) -> list[tuple[int, float]]:
        """ES ``dis_max`` served from the term-partitioned layout —
        identical semantics (and results, parity tested) to
        :meth:`QueryEngine.search_dis_max`."""
        from .sqs import parse_simple_query_string

        analyze = self._sqs_analyze()
        trees = [parse_simple_query_string(q, analyze, "or") for q in queries]
        trees = [t for t in trees if t is not None]
        if not trees:
            return []
        return self._eval_sqs_tree(
            ("dismax", float(tie_breaker), tuple(trees)), k
        )

    def search_boosting(
        self, positive: str, negative: str,
        negative_boost: float = 0.5, k: int = 10,
    ) -> list[tuple[int, float]]:
        """ES ``boosting`` query on the term-partitioned layout —
        identical semantics to :meth:`QueryEngine.search_boosting`."""
        from .sqs import parse_simple_query_string

        analyze = self._sqs_analyze()
        pos = parse_simple_query_string(positive, analyze, "or")
        if pos is None:
            return []
        neg = parse_simple_query_string(negative, analyze, "or")
        if neg is None:
            return self._eval_sqs_tree(pos, k)
        return self._eval_sqs_tree(
            ("boosting", pos, neg, float(negative_boost)), k
        )

    def search_constant_score(
        self, filter_query: str, boost: float = 1.0, k: int = 10,
    ) -> list[tuple[int, float]]:
        """ES ``constant_score`` on the term-partitioned layout —
        identical semantics to :meth:`QueryEngine.search_constant_score`."""
        from .sqs import parse_simple_query_string

        tree = parse_simple_query_string(filter_query, self._sqs_analyze(), "or")
        if tree is None:
            return []
        return self._eval_sqs_tree(("constscore", tree, float(boost)), k)

    def more_like_this(
        self,
        doc_id: int,
        k: int = 10,
        max_query_terms: int = 25,
        min_term_freq: int = 2,
        min_doc_freq: int = 5,
        minimum_should_match: float = 0.3,
    ) -> list[tuple[int, float]]:
        """ES ``more_like_this`` on the term-partitioned layout — same
        semantics as ``QueryEngine.more_like_this`` (tested identical):
        the source doc hydrates from the SOURCE index's partition
        lineage, candidate dfs probe without shipping postings
        (``df_of``), and the selected terms run through this engine's
        bool-should path."""
        from ..index.global_merge import _term_bucket
        from ..state.docstore import CorpusTextReader

        src = self.meta.get("source_index")
        if not src:
            raise RuntimeError(
                "global layout predates source_index metadata — rebuild "
                "merge_global_postings for MLT serving"
            )
        if not hasattr(self, "_text_reader"):
            self._text_reader = CorpusTextReader(src)
        text = self._text_reader.mget([doc_id])[0]
        toks = clip_tokens(self._analyzer(text), *self._clip)
        if not toks:
            return []
        tf: dict[str, int] = {}
        for t in toks:
            tf[t] = tf.get(t, 0) + 1
        cand = sorted(t for t, c in tf.items() if c >= min_term_freq)
        if not cand:
            return []
        by_actor: dict[int, list[str]] = {}
        for t in cand:
            a = self._actor_of_bucket[_term_bucket(t, self._n_buckets, self._term_hash)]
            by_actor.setdefault(a, []).append(t)
        dfs: dict[str, int] = {}
        for part in ray.get(
            [self.actors[a].df_of.remote(ts) for a, ts in by_actor.items()]
        ):
            dfs.update(part)
        scored = []
        for t in cand:
            df = dfs.get(t, 0)
            if df < min_doc_freq:
                continue
            idf = math.log(1.0 + (self.n - df + 0.5) / (df + 0.5))
            scored.append((-(tf[t] * idf), t))
        if not scored:
            return []
        scored.sort()
        selected = sorted(t for _, t in scored[:max_query_terms])
        msm = max(1, int(len(selected) * minimum_should_match))
        fetch_k = max(2 * k, k + 10)
        hits = self.search_bool(
            should=selected, minimum_should_match=msm, k=fetch_k
        )
        return [(d, s) for d, s in hits if d != doc_id][:k]

    def search_highlight(
        self,
        query: str,
        k: int = 10,
        pre_tag: str = "<em>",
        post_tag: str = "</em>",
        fragment_size: int = 100,
        number_of_fragments: int = 5,
    ) -> list[dict]:
        """ES ``highlight`` served from the TERM-partitioned layout —
        output identical to :meth:`QueryEngine.search_highlight` (parity
        tested; the rendering is shared code).  The term layout indexes
        positions by term, not by doc, so per-hit positions SLICE out of
        the positional term fetches the engine already gathers for phrase
        serving (one searchsorted per (term, hit) — no per-doc position
        index needed), and original text hydrates from the SOURCE index's
        partition lineage (the MLT path)."""
        from ..state.docstore import CorpusTextReader
        from .highlight import render_highlights

        terms = self._analyze(query)
        hits = self.search(query, k=k)
        if not hits:
            return []
        ids = [d for d, _ in hits]
        fetched = self.fetch_terms(terms, positions=True)
        # per-term occurrence-span index, computed once per term
        spans: dict[str, tuple] = {}
        for t, v in fetched.items():
            tfs = v[5].astype(np.int64)
            spans[t] = (v[0], v[6], np.concatenate([[0], np.cumsum(tfs)]))
        tpos_list: list[dict[str, list[int]]] = []
        for d in ids:
            tp: dict[str, list[int]] = {}
            for t, (pids, pos, tfcum) in spans.items():
                e = int(np.searchsorted(pids, d))
                if e < len(pids) and pids[e] == d:
                    tp[t] = pos[tfcum[e]:tfcum[e + 1]].astype(int).tolist()
            tpos_list.append(tp)
        idf_of = {
            t: math.log(1.0 + (self.n - v[2] + 0.5) / (v[2] + 0.5))
            for t, v in fetched.items()
        }
        src = self.meta.get("source_index")
        if not src:
            raise RuntimeError(
                "global layout predates source_index metadata — rebuild "
                "merge_global_postings for highlight serving"
            )
        if not hasattr(self, "_text_reader"):
            self._text_reader = CorpusTextReader(src)
        texts = self._text_reader.mget(ids)
        name = self.meta.get("analyzer", "code")
        analyzer = "code" if name == "per_lang" else name
        return render_highlights(
            hits, texts, tpos_list, idf_of, analyzer,
            self._clip[0], self._clip[1], pre_tag, post_tag,
            fragment_size, number_of_fragments,
        )

    def _matched_ids_and_source(
        self, query: str | list[str] | dict
    ) -> tuple[np.ndarray, str] | None:
        """Matched doc-id set for a ``match`` disjunction OR a full
        bool-clause dict + the source index whose docmeta partition
        lineage serves doc values (None ⇔ nothing matches).

        Dict queries take the grammar the shard engine's aggregations
        accept ({must, should, must_not, filter,
        minimum_should_match, filter_meta, filter_range}): text clauses
        evaluate through the engine's bool machinery; ``filter_meta`` /
        ``filter_range`` (INCLUSIVE bounds, the shard-engine contract)
        are partition-parallel column-pruned scans of the source
        docmeta lineage intersected on the coordinator.  (Formerly a
        dict silently matched nothing — its KEYS were treated as
        terms.)"""
        src = self.meta.get("source_index")
        if not src:
            raise RuntimeError(
                "global layout predates source_index metadata — rebuild "
                "merge_global_postings for doc-values aggregations"
            )
        if isinstance(query, dict):
            from .datehist import meta_match_ids

            bool_keys = ("must", "should", "must_not", "filter")
            ids: np.ndarray | None = None
            if any(query.get(k) for k in bool_keys):
                sub = {k: query.get(k, "") for k in bool_keys}
                if query.get("minimum_should_match") is not None:
                    sub["minimum_should_match"] = query[
                        "minimum_should_match"
                    ]
                ids = self._filter_match_ids(sub)
                if len(ids) == 0:
                    return None
            for field, allowed in sorted(
                (query.get("filter_meta") or {}).items()
            ):
                vals = (
                    list(allowed)
                    if isinstance(allowed, (list, tuple, set, frozenset))
                    else [allowed]
                )
                got = [meta_match_ids(src, field, ("term", v))
                       for v in vals]
                got = [g for g in got if len(g)]
                m = (np.unique(np.concatenate(got)) if got
                     else np.empty(0, np.int64))
                ids = (m if ids is None
                       else ids[np.isin(ids, m, assume_unique=True)])
                if len(ids) == 0:
                    return None
            for field, (lo, hi) in sorted(
                (query.get("filter_range") or {}).items()
            ):
                m = meta_match_ids(src, field, ("range", lo, hi,
                                                True, True))
                ids = (m if ids is None
                       else ids[np.isin(ids, m, assume_unique=True)])
                if len(ids) == 0:
                    return None
            if ids is None or len(ids) == 0:
                return None
            return ids.astype(np.int64), src
        terms = (
            self._analyze(query) if isinstance(query, str)
            else sorted(set(query))
        )
        if not terms:
            return None
        fetched = self.fetch_terms(terms)
        if not fetched:
            return None
        ids = np.unique(
            np.concatenate([v[0] for v in fetched.values()])
        ).astype(np.int64)
        return ids, src

    def aggregate(
        self,
        query: str | list[str],
        group_by: str,
        stats_on: str | None = None,
        order: tuple[str, str] | None = None,
        size: int | None = None,
        include=None,
        exclude=None,
        min_doc_count: int = 1,
    ) -> list[dict]:
        """ES search + ``terms`` aggregation served from the
        term-partitioned layout: the ``match`` disjunction's doc ids
        gather from the bucket actors, then route to the source index's
        docmeta partition lineage for the group/stats pass — identical
        buckets to :meth:`QueryEngine.aggregate`, including the
        ``order``/``size`` options (exact cut: every bucket crosses the
        O(buckets) merge before the sort) and the ``include`` /
        ``exclude`` / ``min_doc_count`` value filters
        (``datehist.filter_terms_buckets``)."""
        from .engine import merge_agg_partials
        from .datehist import (
            agg_partials_over_ids,
            filter_terms_buckets,
            order_terms_buckets,
        )

        got = self._matched_ids_and_source(query)
        if got is None:
            return []
        ids, src = got
        merged: dict = {}
        for p in agg_partials_over_ids(
            src, ids, group_by, ("terms", None), stats_on
        ):
            merge_agg_partials(merged, p)
        buckets = sorted(merged.items(), key=lambda kv: (-kv[1][0], kv[0]))
        rows = []
        for g, (c, sm, mn, mx) in buckets:
            row = {"key": g, "doc_count": c}
            if stats_on is not None:
                row.update(
                    {"sum": sm, "min": mn, "max": mx,
                     "avg": sm / c if c else None}
                )
            rows.append(row)
        rows = filter_terms_buckets(rows, include, exclude, min_doc_count)
        return order_terms_buckets(rows, order, size)

    def multi_terms(
        self,
        query: str | list[str],
        fields: list[str],
        stats_on: str | None = None,
        order: tuple[str, str] | None = None,
        size: int | None = None,
    ) -> list[dict]:
        """ES ``multi_terms`` (2 fields) on the term-partitioned layout:
        matched ids gather from the bucket actors, the composite
        (field1, field2) partial folds over the source docmeta lineage
        (``terms_pair`` spec) — identical buckets to
        :meth:`QueryEngine.multi_terms` (parity tested)."""
        from .datehist import agg_partials_over_ids, order_terms_buckets
        from .engine import merge_agg_partials

        if len(fields) != 2:
            raise ValueError("multi_terms supports exactly 2 fields")
        got = self._matched_ids_and_source(query)
        if got is None:
            return []
        ids, src = got
        merged: dict = {}
        for p in agg_partials_over_ids(
            src, ids, fields[0], ("terms_pair", fields[1]), stats_on
        ):
            merge_agg_partials(merged, p)
        buckets = sorted(merged.items(), key=lambda kv: (-kv[1][0], kv[0]))
        rows = []
        for g, (c, sm, mn, mx) in buckets:
            row = {"key": g, "doc_count": c}
            if stats_on is not None:
                row.update(
                    {"sum": sm, "min": mn, "max": mx,
                     "avg": sm / c if c else None}
                )
            rows.append(row)
        return order_terms_buckets(rows, order, size)

    def significant_text(
        self,
        query: str | list[str],
        size: int = 10,
        sample_size: int = 200,
    ) -> list[dict]:
        """ES ``significant_text`` on the term-partitioned layout —
        same semantics (and results, shared oracle) as
        :meth:`QueryEngine.significant_text`; the sample hydrates from
        the source docmeta lineage, the background df probes route to
        the owning bucket actors."""
        from .datehist import significant_terms_rows

        ids, texts = self.sample_match_texts(query, sample_size)
        if len(ids) == 0:
            return []
        analyze = self._sqs_analyze()
        fg: dict[str, tuple] = {}
        for text in texts:
            for t in set(analyze(text)):
                c = fg.get(t)
                fg[t] = (c[0] + 1,) if c else (1,)
        bg = {t: (df,) for t, df in self.dfs(sorted(fg)).items()}
        return significant_terms_rows(
            fg, bg, size, fg_total=len(ids), bg_total=self.n,
        )

    def sample_match_texts(
        self, query: str | list[str], sample_size: int
    ) -> tuple[np.ndarray, list[str]]:
        """Deterministic matched-doc sample + hydrated texts (the
        significant_text / graph_explore foreground) — matched ids
        gather from the bucket actors, texts point-read from the source
        lineage."""
        from ..state.docstore import CorpusTextReader

        got = self._matched_ids_and_source(query)
        if got is None:
            return np.empty(0, np.int64), []
        ids, src = got
        ids = ids[:sample_size]  # already unique ascending
        if len(ids) == 0:
            return ids, []
        if not hasattr(self, "_text_reader"):
            self._text_reader = CorpusTextReader(src)
        return ids, self._text_reader.mget(ids.tolist())

    def rare_terms(
        self, query: str | list[str], field: str,
        max_doc_count: int = 1, size: int | None = None,
    ) -> list[dict]:
        """ES ``rare_terms`` on the term-partitioned layout — identical
        semantics (and results, parity via the shared oracle) to
        :meth:`QueryEngine.rare_terms`."""
        from .datehist import rare_terms_buckets

        return rare_terms_buckets(
            self.aggregate(query, field), max_doc_count, size
        )

    def _filter_match_ids(self, q) -> np.ndarray:
        """Sorted matched-id set of one aggregation filter: a ``match``
        disjunction (text / term list) OR a full bool-clause dict
        ({must, should, must_not, filter, minimum_should_match})
        evaluated through the engine's bool machinery — the filter
        grammar ``filters_agg`` and ``adjacency_matrix`` share with the
        shard engine."""
        if isinstance(q, dict):
            if q.get("filter_meta") or q.get("filter_range"):
                # full grammar incl. docmeta filters — the lineage-scan
                # path (its bool part routes back here meta-free)
                got = self._matched_ids_and_source(q)
                return got[0] if got is not None else np.empty(
                    0, np.int64)
            try:
                hits = self.search_bool(
                    must=q.get("must", ""),
                    should=q.get("should", ""),
                    must_not=q.get("must_not", ""),
                    filter=q.get("filter", ""),
                    k=1 << 30,
                    minimum_should_match=q.get("minimum_should_match"),
                )
            except ValueError:  # no positive clause — matches nothing
                hits = []
            return np.array(sorted(d for d, _ in hits), dtype=np.int64)
        got = self._matched_ids_and_source(q)
        return got[0] if got is not None else np.empty(0, np.int64)

    def count(self, query) -> int:
        """ES ``_count``: the exact number of live documents matching
        ``query`` (free-text match / term list / full bool-clause dict,
        exactly like :meth:`aggregate`'s query argument) — one
        non-scoring eligibility round via the filters-agg machinery; no
        scores computed, no ids shipped.  Reference context: the role
        uses ES count probes for all slicing decisions
        (/root/reference/asset/elasticsearch_reader/elasticsearch_date_range/slicer.js)."""
        return int(self.filters_agg({"q": query})[0]["doc_count"])

    def filters_agg(
        self,
        filters: dict | list[tuple],
        stats_on: str | None = None,
        other_bucket: bool = False,
        other_bucket_key: str = "_other_",
    ) -> list[dict]:
        """ES ``filters`` aggregation served from the term-partitioned
        layout: per named filter (a ``match`` disjunction — text or a
        pre-analyzed term list — or a full bool-clause dict), the
        matched-id set gathers from the bucket actors and stats hydrate
        from the source docmeta lineage (extstats partials →
        sum/min/max/avg).  Buckets in declaration order, empty filters
        kept with ``doc_count`` 0 — identical rows to
        :meth:`QueryEngine.filters_agg`.  ``other_bucket=True`` appends
        the docs-matching-NO-filter bucket: count = n − |union|, stats
        from a full-lineage partition-parallel COMPLEMENT scan
        (``datehist.values_partials_excluding`` — corpus-scale by
        construction, one column-pruned read per partition)."""
        from .datehist import (
            merge_extstats,
            values_partials_excluding,
            values_partials_over_ids,
        )

        items = (
            list(filters.items()) if isinstance(filters, dict)
            else list(filters)
        )
        rows = []
        union_parts: list[np.ndarray] = []
        for name, q in items:
            ids = self._filter_match_ids(q)
            if other_bucket and len(ids):
                union_parts.append(ids)
            if len(ids) == 0:
                rows.append({"key": str(name), "doc_count": 0})
                continue
            src = self.meta.get("source_index")
            if not src:
                raise RuntimeError(
                    "global layout predates source_index metadata — "
                    "rebuild merge_global_postings for doc-values stats"
                )
            row = {"key": str(name), "doc_count": int(len(ids))}
            if stats_on is not None:
                n, s, _s2, mn, mx = merge_extstats(
                    values_partials_over_ids(src, ids, stats_on, "extstats")
                )
                if n:
                    # avg over the full match count — the shard engine's
                    # (and the SQL oracle's) sum/doc_count convention
                    row.update({"sum": s, "min": mn, "max": mx,
                                "avg": s / len(ids)})
            rows.append(row)
        if other_bucket:
            union = (
                np.unique(np.concatenate(union_parts))
                if union_parts else np.empty(0, np.int64)
            )
            other_n = self.n - int(len(union))
            row = {"key": other_bucket_key, "doc_count": other_n}
            if stats_on is not None and other_n:
                src = self.meta.get("source_index")
                if not src:
                    raise RuntimeError(
                        "global layout predates source_index metadata — "
                        "rebuild merge_global_postings for doc-values stats"
                    )
                n, s, _s2, mn, mx = merge_extstats(
                    values_partials_excluding(src, union, stats_on)
                )
                if n:
                    row.update({"sum": s, "min": mn, "max": mx,
                                "avg": s / other_n})
            rows.append(row)
        return rows

    def frequent_item_sets(
        self,
        *,
        minimum_support: int,
        minimum_set_size: int = 1,
        size: int | None = None,
        max_frequent_items: int = 1000,
    ) -> list[dict]:
        """ES ``frequent_item_sets`` (Apriori tier ≤ 2) on the
        term-partitioned layout: frequent singles are EXACT per bucket
        (a term is wholly bucket-owned); candidate pairs straddle
        buckets, so their doc lists gather through the existing
        ``fetch_terms`` round (wire mass = Σ df of the frequent terms —
        the same class as serving any hot-term query; the
        ``max_frequent_items`` valve bounds it) and intersect on the
        coordinator.  Identical buckets to
        :meth:`QueryEngine.frequent_item_sets` (parity tested)."""
        parts = ray.get([
            a.df_candidates.remote(minimum_support) for a in self.actors
        ])
        df: dict[str, int] = {}
        for p in parts:
            df.update(p)
        singles = sorted(df)
        if len(singles) > max_frequent_items:
            singles = sorted(
                sorted(singles, key=lambda t: (-df[t], t))
                [:max_frequent_items]
            )
        rows: list[dict] = []
        if minimum_set_size <= 1:
            rows += [{"items": [t], "support": int(df[t])}
                     for t in singles]
        if len(singles) > 1:
            fetched = self.fetch_terms(singles)
            docs = {
                t: np.asarray(fetched[t][0], dtype=np.int64)
                for t in singles if t in fetched
            }
            for i, a in enumerate(singles):
                for b in singles[i + 1:]:
                    da, db = docs.get(a), docs.get(b)
                    if da is None or db is None:
                        continue
                    c = len(np.intersect1d(da, db, assume_unique=True))
                    if c >= minimum_support:
                        rows.append({"items": [a, b], "support": int(c)})
        rows.sort(key=lambda r: (-r["support"], r["items"]))
        return rows[:size] if size is not None else rows

    def categorize_text(
        self,
        query,
        *,
        max_tokens: int = 5,
        size: int | None = None,
    ) -> list[dict]:
        """ES ``categorize_text`` on the term-partitioned layout —
        matched ids from the bucket actors, template counting in source
        corpus partition tasks; identical buckets to
        :meth:`QueryEngine.categorize_text` (parity tested)."""
        from .categorize import categorize_buckets, categorize_partials

        ids = self._filter_match_ids(query)
        if len(ids) == 0:
            return []
        src = self.meta.get("source_index")
        if not src:
            raise RuntimeError(
                "global layout predates source_index metadata — "
                "rebuild merge_global_postings for categorize_text"
            )
        return categorize_buckets(
            categorize_partials(src, ids, max_tokens), size
        )

    def scripted_metric(
        self,
        query,
        *,
        map_script: str,
        combine: str = "sum",
        finalize: str | None = None,
    ) -> dict:
        """ES ``scripted_metric`` on the term-partitioned layout: the
        matched-id set gathers from the bucket actors, extstats partials
        compute in source-docmeta partition tasks over the ``script:``
        runtime field, and the fold matches
        :meth:`QueryEngine.scripted_metric` exactly (parity tested)."""
        from .datehist import scripted_metric_result, values_partials_over_ids

        ids = self._filter_match_ids(query)
        parts = []
        if len(ids):
            src = self.meta.get("source_index")
            if not src:
                raise RuntimeError(
                    "global layout predates source_index metadata — "
                    "rebuild merge_global_postings for scripted_metric"
                )
            parts = values_partials_over_ids(
                src, ids, f"script:{map_script}", "extstats"
            )
        return scripted_metric_result(parts, combine, finalize)

    def adjacency_matrix(
        self,
        filters: dict | list[tuple],
        separator: str = "&",
    ) -> list[dict]:
        """ES ``adjacency_matrix`` served from the term-partitioned
        layout: each filter's FULL matched-id set gathers from the
        bucket actors — a ``match`` disjunction OR a full bool-clause
        dict ({must, should, must_not, filter, minimum_should_match},
        evaluated through the engine's bool machinery) — and pairwise
        intersections fold on the coordinator with sorted-array
        intersects; identical buckets to
        :meth:`QueryEngine.adjacency_matrix` (parity tested)."""
        items = (
            list(filters.items()) if isinstance(filters, dict)
            else list(filters)
        )
        sets: list[tuple[str, np.ndarray]] = []
        for n, q in items:
            sets.append((str(n), self._filter_match_ids(q)))
        merged: dict = {}
        for i, (n1, s1) in enumerate(sets):
            if len(s1):
                merged[n1] = len(s1)
            for n2, s2 in sets[i + 1:]:
                c = len(np.intersect1d(s1, s2, assume_unique=True))
                if c:
                    a, b = sorted((n1, n2))
                    merged[a + separator + b] = c
        return [
            {"key": k, "doc_count": int(merged[k])}
            for k in sorted(merged)
        ]

    def range_agg(
        self,
        query: str | list[str],
        field: str,
        ranges: list[dict | tuple],
        stats_on: str | None = None,
    ) -> list[dict]:
        """ES ``range`` / ``date_range`` aggregation served from the
        term-partitioned layout — same buckets as
        :meth:`QueryEngine.range_agg` (parity tested).  Matched doc ids
        route to the source index's docmeta partition lineage; each Ray
        task reads only the bucketing (+ stats) column for the matched
        rows — work scales with matched docs + touched partitions."""
        from .datehist import (
            agg_partials_over_ids,
            range_buckets_from_partials,
            to_epoch_us_bound,
        )

        norm = [
            (
                to_epoch_us_bound(r.get("from") if isinstance(r, dict) else r[0]),
                to_epoch_us_bound(r.get("to") if isinstance(r, dict) else r[1]),
            )
            for r in ranges
        ]
        got = self._matched_ids_and_source(query)
        if got is None:
            return range_buckets_from_partials([], norm, stats_on)
        ids, src = got
        partials = agg_partials_over_ids(
            src, ids, field, ("ranges", norm), stats_on
        )
        return range_buckets_from_partials(partials, norm, stats_on)

    def histogram(
        self,
        query: str | list[str],
        field: str,
        interval: float,
        offset: float = 0.0,
        stats_on: str | None = None,
        min_doc_count: int = 1,
        extended_bounds: tuple | None = None,
    ) -> list[dict]:
        """ES numeric ``histogram`` served from the term-partitioned
        layout — same buckets as :meth:`QueryEngine.histogram` (parity
        tested); matched ids route to the source docmeta lineage."""
        from .datehist import agg_partials_over_ids, buckets_from_partials

        got = self._matched_ids_and_source(query)
        if got is None:
            return buckets_from_partials(
                [], stats_on, interval=(float(interval), float(offset)),
                min_doc_count=min_doc_count,
                extended_bounds=extended_bounds,
            )
        ids, src = got
        partials = agg_partials_over_ids(
            src, ids, field, ("histogram", (float(interval), float(offset))),
            stats_on,
        )
        return buckets_from_partials(
            partials, stats_on, interval=(float(interval), float(offset)),
            min_doc_count=min_doc_count, extended_bounds=extended_bounds,
        )

    def composite(
        self,
        query: str | list[str],
        sources: list[tuple],
        size: int = 100,
        after: tuple | None = None,
    ) -> tuple[list[dict], tuple | None]:
        """ES ``composite`` aggregation served from the term-partitioned
        layout — same pages as :meth:`QueryEngine.composite` (parity
        tested); each docmeta partition-group task ships ≤ ``size``
        buckets per page."""
        from .datehist import composite_partials_over_ids, composite_render

        got = self._matched_ids_and_source(query)
        if got is None:
            return [], None
        ids, src = got
        parts = composite_partials_over_ids(
            src, ids,
            [s[2] for s in sources],
            [tuple(s[1:2]) + tuple(s[3:]) for s in sources],
            size, after,
        )
        return composite_render(parts, [s[0] for s in sources], size)

    def significant_terms(
        self, query: str | list[str], field: str, size: int = 10,
        background_filter=None,
    ) -> list[dict]:
        """ES ``significant_terms`` from the term-partitioned layout —
        same JLH rows as :meth:`QueryEngine.significant_terms` (parity
        tested).  Foreground counts come from the matched ids' docmeta
        lineage; the corpus-wide background sweep runs once per field
        and caches (cleared on refresh).  ``background_filter`` narrows
        the background to another query's match set (the ES option; no
        cache — filter-dependent)."""
        from .datehist import (
            agg_partials_over_ids,
            significant_terms_rows,
        )
        from .engine import merge_agg_partials

        got = self._matched_ids_and_source(query)
        if got is None:
            return []
        ids, src = got
        fg: dict = {}
        for part in agg_partials_over_ids(src, ids, field,
                                          ("terms", None)):
            merge_agg_partials(fg, part)
        if not fg:
            return []
        if background_filter is not None:
            bgot = self._matched_ids_and_source(background_filter)
            if bgot is None:
                return []
            bg = {}
            for part in agg_partials_over_ids(src, bgot[0], field,
                                              ("terms", None)):
                merge_agg_partials(bg, part)
            return significant_terms_rows(fg, bg, size)
        if not hasattr(self, "_bg_cache"):
            self._bg_cache: dict[str, dict] = {}
        bg = self._bg_cache.get(field)
        if bg is None:
            all_ids = np.arange(self.n, dtype=np.int64)
            bg = {}
            for part in agg_partials_over_ids(src, all_ids, field,
                                              ("terms", None)):
                merge_agg_partials(bg, part)
            self._bg_cache[field] = bg
        return significant_terms_rows(fg, bg, size)

    def top_hits(
        self, query: str | list[str], group_by: str, k: int = 3,
        sort: tuple[str, str] | None = None,
        source_fields: list[str] | None = None,
    ) -> list[dict]:
        """ES ``top_hits`` under a ``terms`` bucket, served from the
        term-partitioned layout: the FULL match set scores on the
        coordinator (the term layout's standing trade — doc values live
        with the source lineage), group values hydrate id-aligned from
        the docmeta partitions, and per-group top-k selection keeps the
        serving tie order.  Buckets in ES terms-agg order.

        ``sort`` / ``source_fields`` are the ES top_hits ``sort`` and
        ``_source`` options — same semantics and output shape as
        :meth:`QueryEngine.top_hits` (parity-tested): sort values
        hydrate from the source lineage beside the group column, and
        ``_source`` hydrates post-cut via the docstore point-join."""
        from .datehist import valid_mask, values_partials_over_ids

        # list-form queries are PRE-ANALYZED terms (the convention every
        # other method here follows) — never re-analyzed
        terms = (
            self._analyze(query) if isinstance(query, str)
            else sorted(set(query))
        )
        if not terms:
            return []
        fetched = self.fetch_terms(terms)
        if not fetched:
            return []
        hits = self._score_from_fetch(terms, fetched, self.n)
        if not hits:
            return []
        ids = np.array([d for d, _ in hits], dtype=np.int64)
        scs = np.array([s for _, s in hits], dtype=np.float64)
        src = self.meta.get("source_index")
        if not src:
            raise RuntimeError(
                "global layout predates source_index metadata — rebuild "
                "merge_global_postings for top_hits serving"
            )
        sids = np.unique(ids)
        parts = values_partials_over_ids(src, sids, group_by, "raw")
        gv = np.concatenate(parts)
        g_of_hit = gv[np.searchsorted(sids, ids)]
        vm = valid_mask(g_of_hit)
        if not vm.all():
            ids, scs, g_of_hit = ids[vm], scs[vm], g_of_hit[vm]
            if len(ids) == 0:
                return []
        from .datehist import per_group_head

        if sort is not None:
            from .engine import _sort_key

            field, direction = sort
            sv_parts = values_partials_over_ids(src, sids, field, "raw")
            sv_all = np.concatenate(sv_parts)
            scs = sv_all[np.searchsorted(sids, ids)]
            keyv = _sort_key(scs, direction == "desc")
        ug, ginv = np.unique(g_of_hit, return_inverse=True)
        counts = np.bincount(ginv, minlength=len(ug))
        if sort is not None:
            # re-rank the full match set by (sort value, doc asc) —
            # exact values, no tie class needed at a single level
            order = np.lexsort((ids, keyv, ginv))
        else:
            # hits arrive in serving rank order (the full match set — no
            # boundary cut, so no tie class to extend); a stable per-
            # group split keeps it: each group's first k occurrences
            pos = np.arange(len(ids), dtype=np.int64)
            order = np.lexsort((pos, ginv))
        out = []
        for gi, m in per_group_head(ginv, order, k):
            g = ug[gi]
            out.append({
                "key": g.item() if hasattr(g, "item") else g,
                "doc_count": int(counts[gi]),
                "hits": [
                    (int(ids[i]),
                     float(scs[i]) if sort is None
                     else (scs[i].item() if hasattr(scs[i], "item")
                           else scs[i]))
                    for i in m
                ],
            })
        out.sort(key=lambda r: (-r["doc_count"], r["key"]))
        if sort is None and source_fields is None:
            return out
        from .engine import _render_hit_dicts

        return _render_hit_dicts(out, sort, source_fields, src)

    def search_sort(
        self, query: str | list[str] | dict, field: str, k: int = 10,
        order: str = "desc", after: tuple | None = None,
    ) -> tuple[int, list[tuple[int, object]]]:
        """ES BODY-level ``sort`` served from the term-partitioned
        layout: matched ids → sort values hydrated id-aligned from the
        source docmeta lineage (the layout's standing doc-values trade,
        wire O(matches) like its aggregations) → top-k by (value, doc
        asc).  Identical results to :meth:`QueryEngine.search_sort`
        (parity-tested); NaNs sort last either direction."""
        from .datehist import values_partials_over_ids
        from .engine import _sort_key

        got = self._matched_ids_and_source(query)
        if got is None:
            return 0, []
        ids, src = got
        sids = np.unique(np.asarray(ids, dtype=np.int64))
        vals = np.concatenate(
            values_partials_over_ids(src, sids, field, "raw")
        )
        desc = str(order).lower() == "desc"
        total = int(len(sids))
        if after is not None:
            from .engine import _after_mask

            keep = _after_mask(vals, sids, after, desc)
            sids, vals = sids[keep], vals[keep]
        keyv = _sort_key(vals, desc)
        o = np.lexsort((sids, keyv))[:k]
        return total, [
            (int(sids[i]),
             vals[i].item() if hasattr(vals[i], "item") else vals[i])
            for i in o
        ]

    def extended_stats(self, query: str | list[str], field: str) -> dict:
        """ES ``extended_stats`` served from the term-partitioned layout
        (matched ids → source docmeta lineage, O(1)-wire partials)."""
        from .datehist import extstats_render, values_partials_over_ids

        got = self._matched_ids_and_source(query)
        if got is None:
            return extstats_render([])
        ids, src = got
        return extstats_render(
            values_partials_over_ids(src, ids, field, "extstats")
        )

    def metric_aggs(
        self,
        query: str | list[str],
        field: str,
        weight_field: str | None = None,
    ) -> dict:
        """ES ``value_count`` + ``missing`` + ``weighted_avg`` served
        from the term-partitioned layout (matched ids → source docmeta
        partition tasks, the weight column riding the stats slot) —
        identical results to :meth:`QueryEngine.metric_aggs`."""
        from .datehist import agg_partials_over_ids, metric_aggs_render

        got = self._matched_ids_and_source(query)
        if got is None:
            return metric_aggs_render([])
        ids, src = got
        return metric_aggs_render(
            agg_partials_over_ids(
                src, ids, field, ("field_counts", None), weight_field
            )
        )

    PCTL_SKETCH_K = 200

    def percentiles(
        self,
        query: str | list[str],
        field: str,
        percents=(1.0, 5.0, 25.0, 50.0, 75.0, 95.0, 99.0),
        mode: str = "exact",
    ) -> dict:
        """ES ``percentiles`` served from the term-partitioned layout —
        same semantics as :meth:`QueryEngine.percentiles` (parity
        tested): exact nearest-rank from sorted partials, or the
        mergeable log-bucket sketch whose exchange is bounded by the
        value range."""
        from .datehist import (
            merge_count_partials,
            pctl_exact,
            pctl_from_sketch,
            values_partials_over_ids,
        )

        got = self._matched_ids_and_source(query)
        if got is None:
            return {float(p): None for p in percents}
        ids, src = got
        if mode == "sketch":
            parts = values_partials_over_ids(
                src, ids, field, "sketch", sketch_k=self.PCTL_SKETCH_K
            )
            merged: dict = {}
            for p in parts:
                merge_count_partials(merged, p)
            return pctl_from_sketch(merged, percents, self.PCTL_SKETCH_K)
        parts = values_partials_over_ids(src, ids, field, "sorted")
        return pctl_exact([p for p in parts if len(p)], percents)

    def percentile_ranks(
        self,
        query: str | list[str],
        field: str,
        values: list[float],
    ) -> dict:
        """ES ``percentile_ranks`` from the term-partitioned layout —
        exact ``100·count(fv ≤ v)/n`` over the matched rows' sorted
        doc-value partials (same as
        :meth:`QueryEngine.percentile_ranks`, parity by construction)."""
        from .datehist import pctl_ranks_exact, values_partials_over_ids

        got = self._matched_ids_and_source(query)
        if got is None:
            return {float(v): None for v in values}
        ids, src = got
        parts = values_partials_over_ids(src, ids, field, "sorted")
        return pctl_ranks_exact([p for p in parts if len(p)], values)

    def cardinality(
        self,
        query: str | list[str],
        field: str,
        precision: int | None = None,
    ) -> float:
        """ES ``cardinality`` served from the term-partitioned layout:
        matched ids route to the source docmeta lineage; exact partials
        are per-task unique arrays, approx partials HLL registers (2^p
        bytes per task — the scale path)."""
        from .datehist import distinct_partials_over_ids

        got = self._matched_ids_and_source(query)
        if got is None:
            return 0.0
        ids, src = got
        parts = distinct_partials_over_ids(src, ids, field, hll_p=precision)
        if precision is not None:
            from ..ops.sketch import HyperLogLog

            h = HyperLogLog(p=precision)
            for b in parts:
                h.merge(HyperLogLog.from_bytes(b))
            return float(h.estimate())
        parts = [p for p in parts if len(p)]
        return float(len(np.unique(np.concatenate(parts)))) if parts else 0.0

    def boxplot(self, query: str | list[str], field: str) -> dict:
        """ES ``boxplot`` served from the term-partitioned layout —
        same exact nearest-rank semantics as
        :meth:`QueryEngine.boxplot` (parity-tested)."""
        from .datehist import values_partials_over_ids
        from .statagg import boxplot_exact

        got = self._matched_ids_and_source(query)
        if got is None:
            return boxplot_exact([])
        ids, src = got
        return boxplot_exact(
            values_partials_over_ids(src, ids, field, "sorted")
        )

    def variable_width_histogram(
        self, query, field: str, buckets: int = 10,
    ) -> list[dict]:
        """ES ``variable_width_histogram`` from the term-partitioned
        layout — identical buckets to
        :meth:`QueryEngine.variable_width_histogram` (parity tested)."""
        from .datehist import values_partials_over_ids
        from .statagg import variable_width_buckets

        got = self._matched_ids_and_source(query)
        if got is None:
            return []
        ids, src = got
        return variable_width_buckets(
            values_partials_over_ids(src, ids, field, "sorted"), buckets
        )

    def median_absolute_deviation(
        self, query: str | list[str], field: str
    ) -> float | None:
        """ES ``median_absolute_deviation`` served from the term-
        partitioned layout (exact nearest-rank twin)."""
        from .datehist import values_partials_over_ids
        from .statagg import mad_exact

        got = self._matched_ids_and_source(query)
        if got is None:
            return None
        ids, src = got
        return mad_exact(
            values_partials_over_ids(src, ids, field, "sorted")
        )

    def string_stats(self, query: str | list[str], field: str) -> dict:
        """ES ``string_stats`` served from the term-partitioned layout:
        matched ids route to the source docmeta lineage; per-task
        partials are alphabet-bounded codepoint histograms."""
        from .datehist import values_partials_over_ids
        from .statagg import string_stats_render

        got = self._matched_ids_and_source(query)
        if got is None:
            return string_stats_render([])
        ids, src = got
        rd_ = 6 if self.round_decimals is None else self.round_decimals
        return string_stats_render(
            values_partials_over_ids(src, ids, field, "stringstats"), rd_
        )

    def t_test(
        self,
        query_a: str | list[str],
        field: str | None = None,
        query_b: str | list[str] | None = None,
        fields: tuple[str, str] | None = None,
        type: str = "heteroscedastic",
    ) -> dict:
        """ES ``t_test`` served from the term-partitioned layout — same
        forms and moments arithmetic as :meth:`QueryEngine.t_test`
        (parity-tested; p-value divergence documented in
        ``statagg.ttest_from_moments``)."""
        from .datehist import (
            merge_extstats,
            multi_values_partials_over_ids,
            values_partials_over_ids,
        )
        from .statagg import ttest_from_moments

        rd_ = 6 if self.round_decimals is None else self.round_decimals
        if type == "paired":
            if fields is None:
                raise ValueError("paired t_test needs fields=(a, b)")
            got = self._matched_ids_and_source(query_a)
            if got is None:
                return {"t": None, "df": None}
            ids, src = got
            part = merge_extstats(multi_values_partials_over_ids(
                src, ids, [fields[0], fields[1]], "paireddiff"
            ))
            return ttest_from_moments(part, None, "paired", rd_)
        if field is None or query_b is None:
            raise ValueError("unpaired t_test needs field= and query_b=")

        def _moments(q):
            got = self._matched_ids_and_source(q)
            if got is None:
                return None
            ids, src = got
            return merge_extstats(
                values_partials_over_ids(src, ids, field, "extstats")
            )

        pa_, pb = _moments(query_a), _moments(query_b)
        if pa_ is None or pb is None:
            return {"t": None, "df": None}
        return ttest_from_moments(pa_, pb, type, rd_)

    def matrix_stats(
        self, query: str | list[str], fields: list[str]
    ) -> list[dict]:
        """ES ``matrix_stats`` served from the term-partitioned layout —
        O(k²) Gram partials over the source docmeta lineage."""
        from .datehist import multi_values_partials_over_ids
        from .statagg import matrix_stats_render

        got = self._matched_ids_and_source(query)
        if got is None:
            return []
        ids, src = got
        return matrix_stats_render(
            multi_values_partials_over_ids(src, ids, list(fields), "matrix"),
            list(fields),
            6 if self.round_decimals is None else self.round_decimals,
        )

    def top_metrics(
        self,
        query: str | list[str],
        metrics: list[str],
        sort: tuple[str, str],
        size: int = 1,
    ) -> list[dict]:
        """ES ``top_metrics`` served from the term-partitioned layout:
        the matched id set hydrates ONLY the sort column id-aligned,
        the top-``size`` cut happens on the coordinator, and metric
        columns hydrate for just the cut docs — O(size) hydration, not
        O(match count) per metric."""
        from .datehist import valid_mask, values_partials_over_ids
        from .statagg import merge_top_metrics

        got = self._matched_ids_and_source(query)
        if got is None:
            return []
        ids, src = got
        field, direction = sort
        desc = direction == "desc"
        sv_parts = values_partials_over_ids(src, ids, field, "raw")
        sv = np.concatenate(sv_parts) if sv_parts else np.empty(0)
        vm = valid_mask(sv)
        ids2, sv = ids[vm], sv[vm].astype(np.float64)
        if len(ids2) == 0:
            return []
        order = np.lexsort((ids2, -sv if desc else sv))[:size]
        top_ids, top_sv = ids2[order], sv[order]
        sid = np.sort(top_ids)
        met_cols = []
        for f in metrics:
            parts = values_partials_over_ids(src, sid, f, "raw")
            met_cols.append(np.concatenate(parts))
        out = []
        for i in range(len(top_ids)):
            j = int(np.searchsorted(sid, top_ids[i]))
            mv = tuple(
                None if (isinstance(c[j], float) and np.isnan(c[j]))
                else (c[j].item() if hasattr(c[j], "item") else c[j])
                for c in met_cols
            )
            out.append({
                "doc_id": int(top_ids[i]), "sort": float(top_sv[i]),
                "metrics": dict(zip(metrics, mv)),
            })
        return out

    def geo_distance_agg(
        self,
        query: str | list[str],
        lat_field: str,
        lon_field: str,
        origin: str | tuple[float, float],
        ranges: list[dict | tuple],
        stats_on: str | None = None,
    ) -> list[dict]:
        """ES ``geo_distance`` aggregation served from the
        term-partitioned layout — identical buckets to
        :meth:`QueryEngine.geo_distance_agg`: the distance is a
        haversine RUNTIME FIELD over the source docmeta lineage's
        lat/lon doc values, so this is exactly :meth:`range_agg`."""
        from .engine import QueryEngine
        from .geo import haversine_script

        lat0, lon0 = QueryEngine._geo_origin(origin)
        norm = [
            {
                "from": QueryEngine._geo_meters(
                    r.get("from") if isinstance(r, dict) else r[0]),
                "to": QueryEngine._geo_meters(
                    r.get("to") if isinstance(r, dict) else r[1]),
            }
            for r in ranges
        ]
        return self.range_agg(
            query, haversine_script(lat_field, lon_field, lat0, lon0),
            norm, stats_on,
        )

    def geotile_grid(
        self,
        query: str | list[str],
        lat_field: str,
        lon_field: str,
        precision: int = 7,
        size: int = 10,
        stats_on: str | None = None,
    ) -> list[dict]:
        """ES ``geotile_grid`` served from the term-partitioned layout
        (tile id = runtime field → the terms-agg machinery; same exact
        cut as :meth:`QueryEngine.geotile_grid`)."""
        from .geo import geotile_key, geotile_script

        buckets = self.aggregate(
            query, geotile_script(lat_field, lon_field, precision),
            stats_on=stats_on, size=size,
        )
        for b in buckets:
            b["key"] = geotile_key(b["key"], precision)
        return buckets

    def geohash_grid(
        self,
        query: str | list[str],
        lat_field: str,
        lon_field: str,
        precision: int = 5,
        size: int = 10,
        stats_on: str | None = None,
    ) -> list[dict]:
        """ES ``geohash_grid`` served from the term-partitioned layout
        (packed cell = runtime field → the terms-agg machinery; same
        exact cut as :meth:`QueryEngine.geohash_grid`)."""
        from .geo import geohash_cell_script, geohash_key

        buckets = self.aggregate(
            query, geohash_cell_script(lat_field, lon_field, precision),
            stats_on=stats_on, size=size,
        )
        for b in buckets:
            b["cell"] = float(b["key"])
            b["key"] = geohash_key(b["cell"], precision)
        return buckets

    def geo_bounds(
        self, query: str | list[str],
        lat_field: str = "lat", lon_field: str = "lon",
    ) -> dict:
        """ES ``geo_bounds`` from the term-partitioned layout."""
        from .geo import geo_bounds_render

        return geo_bounds_render(
            self.extended_stats(query, lat_field),
            self.extended_stats(query, lon_field),
        )

    def geo_centroid(
        self, query: str | list[str],
        lat_field: str = "lat", lon_field: str = "lon",
    ) -> dict:
        """ES ``geo_centroid`` from the term-partitioned layout."""
        from .geo import geo_centroid_render

        return geo_centroid_render(
            self.extended_stats(query, lat_field),
            self.extended_stats(query, lon_field),
        )

    def search_geo_distance(
        self,
        query: str | list[str],
        lat_field: str,
        lon_field: str,
        origin: str | tuple[float, float],
        distance: str | float,
        k: int = 10,
    ) -> list[tuple[int, float]]:
        """ES bool query + ``geo_distance`` filter on the
        term-partitioned layout: evaluated as a programmatic sqs
        ``("filter", match, metarange-over-runtime-field)`` tree — the
        geo predicate scans the source docmeta lineage column-pruned
        (``datehist.meta_match_ids`` reads only lat+lon), text clauses
        gather from the bucket actors."""
        from functools import reduce

        from .engine import QueryEngine
        from .geo import haversine_script

        lat0, lon0 = QueryEngine._geo_origin(origin)
        toks = (
            self._analyze(query) if isinstance(query, str)
            else sorted(set(query))
        )
        if not toks:
            return []
        scored = reduce(
            lambda a, b: ("or", a, b), [("term", t) for t in toks]
        )
        gate = ("metarange",
                haversine_script(lat_field, lon_field, lat0, lon0),
                None, QueryEngine._geo_meters(distance), True, True)
        return self._eval_sqs_tree(("filter", scored, gate), k)

    def search_geo_box(
        self,
        query: str | list[str],
        lat_field: str,
        lon_field: str,
        top_left: str | tuple[float, float],
        bottom_right: str | tuple[float, float],
        k: int = 10,
    ) -> list[tuple[int, float]]:
        """ES bool query + ``geo_bounding_box`` filter on the
        term-partitioned layout (two metarange gates over the stored
        lat/lon doc values)."""
        from functools import reduce

        from .engine import QueryEngine
        from .geo import bbox_range_filters

        toks = (
            self._analyze(query) if isinstance(query, str)
            else sorted(set(query))
        )
        if not toks:
            return []
        scored = reduce(
            lambda a, b: ("or", a, b), [("term", t) for t in toks]
        )
        filters = bbox_range_filters(
            lat_field, lon_field,
            QueryEngine._geo_origin(top_left),
            QueryEngine._geo_origin(bottom_right),
        )
        tree = scored
        for col, (lo, hi) in sorted(filters.items()):
            tree = ("filter", tree, ("metarange", col, lo, hi, True, True))
        return self._eval_sqs_tree(tree, k)

    def search_geo_polygon(
        self,
        query: str | list[str],
        lat_field: str,
        lon_field: str,
        vertices: list[tuple[float, float]],
        k: int = 10,
    ) -> list[tuple[int, float]]:
        """ES bool query + ``geo_polygon`` filter on the
        term-partitioned layout: the convex ring's per-edge half-plane
        runtime-field gates (``search.geo.polygon_halfplane_scripts``)
        chain as metarange filters over the source docmeta lineage —
        identical results to :meth:`QueryEngine.search_geo_polygon`."""
        from functools import reduce

        from .geo import polygon_halfplane_scripts

        toks = (
            self._analyze(query) if isinstance(query, str)
            else sorted(set(query))
        )
        if not toks:
            return []
        tree = reduce(
            lambda a, b: ("or", a, b), [("term", t) for t in toks]
        )
        filters = polygon_halfplane_scripts(lat_field, lon_field, vertices)
        for col, (lo, hi) in sorted(filters.items()):
            tree = ("filter", tree, ("metarange", col, lo, hi, True, True))
        return self._eval_sqs_tree(tree, k)

    def search_has_child(
        self,
        child_query: str | list[str],
        parent_field: str = "parent_id",
        score_mode: str = "none",
        min_children: int = 1,
        max_children: int | None = None,
        k: int | None = 10,
    ) -> list[tuple[int, float, int]]:
        """ES ``has_child`` served from the term-partitioned layout —
        identical rows to :meth:`QueryEngine.search_has_child`: the
        child match set (serving-rounded scores) gathers from the
        bucket actors, matched ids route to the source docmeta lineage
        for the id-aligned ``parent_id`` hydration, the per-parent
        reduction is the shared ``joinfield`` kernel."""
        from .datehist import values_partials_over_ids
        from .joinfield import finish_has_child, group_child_scores

        hits = self.search(child_query, k=1 << 30)
        if not hits:
            return []
        ids = np.array([d for d, _ in hits], dtype=np.int64)
        scs = np.array([s for _, s in hits], dtype=np.float64)
        if self.round_decimals is not None:
            # children contribute SERVING-rounded scores (the shard
            # engine's agg_join_children does the same) — grid values
            # keep the per-parent combine order-independent
            scs = np.round(scs, self.round_decimals)
        order = np.argsort(ids)
        ids, scs = ids[order], scs[order]
        src = self.meta.get("source_index")
        if not src:
            raise RuntimeError(
                "global layout predates source_index metadata — rebuild "
                "merge_global_postings for join-field queries"
            )
        parts = values_partials_over_ids(src, ids, parent_field, "raw")
        parents = np.concatenate(parts).astype(np.int64)
        merged = group_child_scores(parents, ids, scs)
        return finish_has_child(
            merged, score_mode, min_children, max_children, k,
            self.round_decimals,
        )

    def search_has_parent(
        self,
        parent_query: str | list[str],
        parent_field: str = "parent_id",
        score: bool = True,
        k: int | None = 10,
    ) -> list[tuple[int, float]]:
        """ES ``has_parent`` served from the term-partitioned layout:
        parent-typed matches via the ``parent_id == doc_id``
        runtime-field gate (programmatic sqs filter tree), then one
        broadcast ``isin`` scan of the docmeta lineage for the matched
        parents' children (``datehist.meta_pairs_in``)."""
        from functools import reduce

        from .datehist import meta_pairs_in
        from .joinfield import children_rows, self_parent_script

        toks = (
            self._analyze(parent_query) if isinstance(parent_query, str)
            else sorted(set(parent_query))
        )
        if not toks:
            return []
        scored = reduce(
            lambda a, b: ("or", a, b), [("term", t) for t in toks]
        )
        gate = ("metarange", self_parent_script(parent_field),
                0.0, 0.0, True, True)
        hits = self._eval_sqs_tree(("filter", scored, gate), 1 << 30)
        if not hits:
            return []
        pscores = {int(d): float(s) for d, s in hits}
        src = self.meta.get("source_index")
        if not src:
            raise RuntimeError(
                "global layout predates source_index metadata — rebuild "
                "merge_global_postings for join-field queries"
            )
        pids = np.fromiter(pscores, dtype=np.int64, count=len(pscores))
        ids, parents = meta_pairs_in(src, parent_field, pids)
        child = parents.astype(np.int64) != ids
        return children_rows(ids[child], parents[child].astype(np.int64),
                             pscores, score, k)

    def search_parent_id(
        self,
        parent: int,
        parent_field: str = "parent_id",
        k: int | None = 10,
        boost: float = 1.0,
    ) -> list[tuple[int, float]]:
        """ES ``parent_id`` query served from the term-partitioned
        layout — identical rows to
        :meth:`QueryEngine.search_parent_id`: one partition-parallel
        single-value scan of the source docmeta lineage
        (``datehist.meta_pairs_in``), parent row excluded, constant
        score ``boost``."""
        from .datehist import meta_pairs_in

        src = self.meta.get("source_index")
        if not src:
            raise RuntimeError(
                "global layout predates source_index metadata — rebuild "
                "merge_global_postings for join-field queries"
            )
        pids = np.asarray([parent], dtype=np.int64)
        ids, _ = meta_pairs_in(src, parent_field, pids)
        ids = np.sort(ids[ids != parent])
        if k is not None:
            ids = ids[:k]
        return [(int(d), float(boost)) for d in ids]

    def children_agg(
        self,
        parent_query: str | list[str],
        group_by: str,
        parent_field: str = "parent_id",
        stats_on: str | None = None,
        order: tuple[str, str] | None = None,
        size: int | None = None,
    ) -> list[dict]:
        """ES ``children`` aggregation served from the term-partitioned
        layout — identical rows to :meth:`QueryEngine.children_agg`:
        parent-typed matches via the runtime-field gate, parent keys and
        child stats hydrate id-aligned from the source docmeta lineage,
        children found by one broadcast ``isin`` scan
        (``datehist.meta_pairs_in``), reduced by the shared
        ``joinfield.keyed_partials`` kernel."""
        from functools import reduce

        from .datehist import (
            meta_pairs_in, order_terms_buckets, valid_mask,
            values_partials_over_ids,
        )
        from .joinfield import (
            family_agg_rows, keyed_partials, self_parent_script,
        )

        toks = (
            self._analyze(parent_query) if isinstance(parent_query, str)
            else sorted(set(parent_query))
        )
        if not toks:
            return []
        scored = reduce(
            lambda a, b: ("or", a, b), [("term", t) for t in toks]
        )
        gate = ("metarange", self_parent_script(parent_field),
                0.0, 0.0, True, True)
        hits = self._eval_sqs_tree(("filter", scored, gate), 1 << 30)
        if not hits:
            return []
        src = self._source_index_dir()
        pids = np.unique(np.array([d for d, _ in hits], dtype=np.int64))
        keys = np.concatenate(
            values_partials_over_ids(src, pids, group_by, "raw")
        )
        vm = valid_mask(keys)  # terms aggs omit missing-key parents
        pids, keys = pids[vm], keys[vm]
        if len(pids) == 0:
            return []
        cids, cparents = meta_pairs_in(src, parent_field, pids)
        cparents = cparents.astype(np.int64)
        child = cparents != cids
        cids, cparents = cids[child], cparents[child]
        vals = None
        if stats_on is not None and len(cids):
            o = np.argsort(cids)  # "raw" hydration aligns to sorted ids
            cids, cparents = cids[o], cparents[o]
            vals = np.concatenate(
                values_partials_over_ids(src, cids, stats_on, "raw")
            ).astype(np.float64)
        pos = np.searchsorted(pids, cparents)
        return order_terms_buckets(
            family_agg_rows(keys, keyed_partials(keys[pos], vals),
                            stats_on),
            order, size,
        )

    def parent_agg(
        self,
        child_query: str | list[str],
        group_by: str,
        parent_field: str = "parent_id",
        stats_on: str | None = None,
        order: tuple[str, str] | None = None,
        size: int | None = None,
    ) -> list[dict]:
        """ES ``parent`` aggregation served from the term-partitioned
        layout — identical rows to :meth:`QueryEngine.parent_agg`:
        matched child ids gather from the bucket actors, parent ids /
        bucket keys / stats hydrate id-aligned from the source docmeta
        lineage, each parent counted ONCE (unique-parent doc_count)."""
        from .datehist import (
            order_terms_buckets, valid_mask, values_partials_over_ids,
        )
        from .joinfield import keyed_partials

        got = self._matched_ids_and_source(child_query)
        if got is None:
            return []
        ids, src = got  # unique ascending
        pv = np.concatenate(
            values_partials_over_ids(src, ids, parent_field, "raw")
        ).astype(np.int64)
        parents = np.unique(pv[pv != ids])
        if len(parents) == 0:
            return []
        keys = np.concatenate(
            values_partials_over_ids(src, parents, group_by, "raw")
        )
        vm = valid_mask(keys)
        parents, keys = parents[vm], keys[vm]
        vals = (
            np.concatenate(
                values_partials_over_ids(src, parents, stats_on, "raw")
            ).astype(np.float64)
            if stats_on is not None and len(parents) else None
        )
        merged = keyed_partials(keys, vals)
        buckets = sorted(merged.items(), key=lambda kv: (-kv[1][0], kv[0]))
        rows = []
        for g, (c, sm, mn, mx) in buckets:
            row = {"key": g, "doc_count": c}
            if stats_on is not None:
                row.update({
                    "sum": sm, "min": mn, "max": mx,
                    "avg": sm / c if c else None,
                })
            rows.append(row)
        return order_terms_buckets(rows, order, size)

    def random_sampler(
        self,
        query: str | list[str] | dict,
        group_by: str,
        probability: float,
        seed: int = 0,
        stats_on: str | None = None,
        order: tuple[str, str] | None = None,
        size: int | None = None,
    ) -> list[dict]:
        """ES ``random_sampler`` served from the term-partitioned layout
        — identical rows to :meth:`QueryEngine.random_sampler` (shared
        deterministic Knuth-hash sample): matched ids gather from the
        bucket actors, the sampled subset routes to the source docmeta
        lineage for the terms partials."""
        from .datehist import agg_partials_over_ids, order_terms_buckets
        from .engine import merge_agg_partials
        from .sampler import random_sample_mask, scale_sampled_rows

        ids = self._filter_match_ids(query)
        ids = ids[random_sample_mask(ids, probability, seed)]
        if len(ids) == 0:
            return []
        src = self._source_index_dir()
        merged: dict = {}
        for p in agg_partials_over_ids(
            src, ids, group_by, ("terms", None), stats_on
        ):
            merge_agg_partials(merged, p)
        buckets = sorted(merged.items(), key=lambda kv: (-kv[1][0], kv[0]))
        rows = []
        for g, (c, sm, mn, mx) in buckets:
            row = {"key": g, "doc_count": c}
            if stats_on is not None:
                row.update({
                    "sum": sm, "min": mn, "max": mx,
                    "avg": sm / c if c else None,
                })
            rows.append(row)
        return order_terms_buckets(
            scale_sampled_rows(rows, probability), order, size
        )

    def global_agg(
        self,
        group_by: str,
        stats_on: str | None = None,
        order: tuple[str, str] | None = None,
        size: int | None = None,
    ) -> list[dict]:
        """ES ``global`` aggregation served from the term-partitioned
        layout — identical rows to :meth:`QueryEngine.global_agg`: a
        partition-parallel column-pruned scan of the WHOLE source
        docmeta lineage (no id routing — every row is in scope)."""
        from .datehist import agg_partials_full, order_terms_buckets
        from .engine import merge_agg_partials

        merged: dict = {}
        for p in agg_partials_full(
            self._source_index_dir(), group_by, stats_on
        ):
            merge_agg_partials(merged, p)
        buckets = sorted(merged.items(), key=lambda kv: (-kv[1][0], kv[0]))
        rows = []
        for g, (c, sm, mn, mx) in buckets:
            row = {"key": g, "doc_count": c}
            if stats_on is not None:
                row.update({
                    "sum": sm, "min": mn, "max": mx,
                    "avg": sm / c if c else None,
                })
            rows.append(row)
        return order_terms_buckets(rows, order, size)

    def missing_agg(
        self,
        query: str | list[str] | dict,
        field: str,
        stats_on: str | None = None,
    ) -> dict:
        """ES ``missing`` aggregation served from the term-partitioned
        layout — identical row to :meth:`QueryEngine.missing_agg`:
        matched ids gather from the bucket actors, the ``field`` values
        hydrate id-aligned from the docmeta lineage, the missing subset
        re-hydrates its stats column."""
        from .datehist import valid_mask, values_partials_over_ids

        empty = {"doc_count": 0}
        if stats_on is not None:
            empty.update({"sum": None, "min": None, "max": None,
                          "avg": None})
        ids = self._filter_match_ids(query)
        if len(ids) == 0:
            return empty
        src = self._source_index_dir()
        fv = np.concatenate(
            values_partials_over_ids(src, ids, field, "raw")
        )
        miss = ids[~valid_mask(fv)]
        row = {"doc_count": int(len(miss))}
        if stats_on is not None:
            vals = (
                np.concatenate(
                    values_partials_over_ids(src, miss, stats_on, "raw")
                ).astype(np.float64)
                if len(miss) else np.empty(0)
            )
            vals = vals[~np.isnan(vals)]
            vc = len(vals)
            row.update({
                "sum": float(vals.sum()) if vc else None,
                "min": float(vals.min()) if vc else None,
                "max": float(vals.max()) if vc else None,
                "avg": float(vals.sum()) / vc if vc else None,
            })
        return row

    def search_terms_lookup(
        self,
        lookup_doc: int,
        k: int | None = None,
        boost: float = 1.0,
    ) -> list[tuple[int, float]]:
        """ES terms-lookup query served from the TERM-partitioned layout
        — identical rows to :meth:`QueryEngine.search_terms_lookup`: the
        term list hydrates from the source docmeta lineage (one point
        read), the match set gathers from the owning bucket actors."""
        from ..state.docstore import CorpusTextReader

        src = self._source_index_dir()
        if not hasattr(self, "_text_reader"):
            self._text_reader = CorpusTextReader(src)
        text = self._text_reader.mget([lookup_doc])[0]
        terms = sorted(set(self._analyze(text)))
        if not terms:
            return []
        ids = self._filter_match_ids(terms)
        if k is not None:
            ids = ids[:k]
        return [(int(d), float(boost)) for d in ids]

    def search_script_query(
        self, source: str, k: int = 10
    ) -> list[tuple[int, float]]:
        """ES ``script`` query (filter context, constant score) from
        the TERM-partitioned layout: a partition-parallel column-pruned
        scan of the source docmeta lineage evaluates the compiled
        expression (``datehist.script_match_ids``); k smallest ids,
        score 1.0 — identical rows to
        :meth:`QueryEngine.search_script_query`."""
        from .datehist import script_match_ids

        ids = script_match_ids(self._source_index_dir(), source)
        return [(int(d), 1.0) for d in ids[:k]]

    def _source_index_dir(self) -> str:
        """The source index's docmeta lineage path (join-field /
        aggregation hydration) — layouts predating ``source_index``
        metadata must rebuild."""
        src = self.meta.get("source_index")
        if not src:
            raise RuntimeError(
                "global layout predates source_index metadata — rebuild "
                "merge_global_postings for join-field queries"
            )
        return src

    def date_histogram(
        self,
        query: str | list[str],
        field: str,
        interval: str = "month",
        stats_on: str | None = None,
        min_doc_count: int = 1,
        extended_bounds: tuple | None = None,
        group_by: str | None = None,
        time_zone: str | None = None,
        offset=None,
    ) -> list[dict]:
        """ES ``date_histogram`` over the docs matching the ``match``
        disjunction, served from the term-partitioned layout — same
        bucket keys/stats as :meth:`QueryEngine.date_histogram` (parity
        tested).  The term layout holds postings, not doc values, so the
        matched doc-id set routes to the SOURCE index's docmeta partition
        lineage (the hydration path MLT already uses): one Ray task per
        partition group reads only the date (+ stats) column for the
        matched rows and returns an associative bucket partial — work
        scales with matched docs + touched partitions, never corpus
        size."""
        from .datehist import buckets_from_partials, datehist_partials_over_ids

        if group_by is not None:
            min_doc_count = 1  # ES zero-fill applies to the parent only
        got = self._matched_ids_and_source(query)
        if got is None:
            # nothing matches — ES still zero-fills extended_bounds
            return buckets_from_partials(
                [], stats_on, interval=interval,
                min_doc_count=min_doc_count,
                extended_bounds=extended_bounds,
                time_zone=time_zone, offset=offset,
            )
        ids, src = got
        if group_by is not None:
            from .datehist import agg_partials_over_ids

            partials = agg_partials_over_ids(
                src, ids, field,
                ("interval_terms", (interval, group_by, time_zone, offset)),
                stats_on,
            )
        elif offset is not None:
            from .datehist import agg_partials_over_ids

            partials = agg_partials_over_ids(
                src, ids, field,
                ("interval_off", (interval, time_zone, offset)),
                stats_on,
            )
        elif time_zone is not None:
            from .datehist import agg_partials_over_ids

            partials = agg_partials_over_ids(
                src, ids, field, ("interval_tz", (interval, time_zone)),
                stats_on,
            )
        else:
            partials = datehist_partials_over_ids(
                src, ids, field, interval, stats_on
            )
        return buckets_from_partials(
            partials, stats_on, interval=interval,
            min_doc_count=min_doc_count, extended_bounds=extended_bounds,
            time_zone=time_zone, offset=offset,
        )

    def expand_prefix(self, prefix: str, max_expansions: int = 50) -> list[str]:
        """Global prefix expansion over the bucket dictionaries, first
        ``max_expansions`` in term order — identical results to
        ``QueryEngine.expand_prefix`` (union of per-actor first-Ns
        contains the global first-N)."""
        per_actor = ray.get(
            [a.expand_prefix.remote(prefix, max_expansions)
             for a in self.actors]
        )
        out = sorted(set().union(*map(set, per_actor)))
        return out[:max_expansions]

    def expand_wildcard(self, pattern: str,
                        max_expansions: int = 50) -> list[str]:
        """Global wildcard expansion over the bucket dictionaries, first
        ``max_expansions`` in term order (per-actor cap sound by the
        expand_prefix argument)."""
        per_actor = ray.get(
            [a.expand_wildcard.remote(pattern, max_expansions)
             for a in self.actors]
        )
        out = sorted(set().union(*map(set, per_actor)))
        return out[:max_expansions]

    def expand_regexp(self, pattern: str,
                      max_expansions: int = 50) -> list[str]:
        """Global regexp expansion, first ``max_expansions`` in term
        order."""
        per_actor = ray.get(
            [a.expand_regexp.remote(pattern, max_expansions)
             for a in self.actors]
        )
        out = sorted(set().union(*map(set, per_actor)))
        return out[:max_expansions]

    def expand_fuzzy_capped(
        self, term: str, fuzziness: int = 1, prefix_length: int = 0,
        max_expansions: int = 50,
    ) -> list[str]:
        """:meth:`expand_fuzzy`'s (distance asc, term asc) cap, terms
        only, sorted — the span_multi fuzzy wrapper's expansion."""
        return sorted(
            t for t, _ in self.expand_fuzzy(
                term, fuzziness, prefix_length, max_expansions
            )
        )

    def expand_range_capped(self, gte=None, lte=None, gt=None, lt=None,
                            max_expansions: int = 50) -> list[str]:
        """Global lexical-range expansion over the bucket dictionaries,
        first ``max_expansions`` in term order."""
        per_actor = ray.get(
            [a.expand_range.remote(gte, lte, gt, lt, max_expansions)
             for a in self.actors]
        )
        out = sorted(set().union(*map(set, per_actor)))
        return out[:max_expansions]

    def _expand_span_multi(self, spec: dict, m: int) -> list[str]:
        """span_multi wrapper dispatch (prefix/wildcard/regexp/fuzzy/
        range) — deterministic global expansions, identical results to
        ``QueryEngine._expand_span_multi`` regardless of layout."""
        from .spans import expand_multi_spec

        return expand_multi_spec(
            spec, m, self.expand_prefix, self.expand_wildcard,
            self.expand_regexp, self.expand_fuzzy_capped,
            range_fn=self.expand_range_capped,
        )

    def dfs(self, terms: list[str]) -> dict[str, int]:
        """Global document frequencies — terms route to their owning
        bucket actors, no posting arrays ship (the ``df_of`` probe)."""
        from ..index.global_merge import _term_bucket

        by_actor: dict[int, list[str]] = {}
        for t in terms:
            a = self._actor_of_bucket[
                _term_bucket(t, self._n_buckets, self._term_hash)
            ]
            by_actor.setdefault(a, []).append(t)
        out: dict[str, int] = {}
        for part in ray.get(
            [self.actors[a].df_of.remote(ts) for a, ts in by_actor.items()]
        ):
            out.update(part)
        return {t: out.get(t, 0) for t in terms}

    def search_collapse(
        self,
        query: str | list[str],
        field: str,
        k_groups: int = 10,
        inner_size: int = 3,
    ) -> list[dict]:
        """ES field collapsing on the term-partitioned layout — same
        semantics (and results, parity tested) as
        :meth:`QueryEngine.search_collapse`.  The match set scores on
        the coordinator; group doc values hydrate id-aligned from the
        source docmeta lineage."""
        from .collapse import collapse_rows
        from .datehist import values_partials_over_ids

        terms = (
            self._analyze(query) if isinstance(query, str)
            else sorted(set(query))
        )
        if not terms:
            return []
        fetched = self.fetch_terms(terms)
        if not fetched:
            return []
        hits = self._score_from_fetch(terms, fetched, 1 << 30)
        if not hits:
            return []
        ids = np.array([d for d, _ in hits], dtype=np.int64)
        sc = np.array([s for _, s in hits], dtype=np.float64)
        src = self.meta.get("source_index")
        if not src:
            raise RuntimeError(
                "global layout predates source_index metadata — rebuild "
                "merge_global_postings for collapse serving"
            )
        sids = np.unique(ids)
        raw = np.concatenate(
            values_partials_over_ids(src, sids, field, "raw")
        )
        gv = np.asarray(raw, dtype=object)[np.searchsorted(sids, ids)]
        return collapse_rows(ids, sc, gv, k_groups, inner_size,
                             self.round_decimals)

    def cfs(self, terms: list[str]) -> dict[str, int]:
        """Global collection frequencies (ttf) — terms route to their
        owning bucket actors (retained per-posting tfs, no arrays ship)."""
        from ..index.global_merge import _term_bucket

        by_actor: dict[int, list[str]] = {}
        for t in terms:
            a = self._actor_of_bucket[
                _term_bucket(t, self._n_buckets, self._term_hash)
            ]
            by_actor.setdefault(a, []).append(t)
        out: dict[str, int] = {}
        for part in ray.get(
            [self.actors[a].cf_of.remote(ts) for a, ts in by_actor.items()]
        ):
            out.update(part)
        return {t: out.get(t, 0) for t in terms}

    def termvectors(
        self,
        doc_id: int,
        term_statistics: bool = False,
        field_statistics: bool = False,
    ) -> dict:
        """ES ``_termvectors`` on the term-partitioned layout — same
        realtime semantics (and results, parity tested) as
        :meth:`QueryEngine.termvectors`: text hydrates from the source
        docmeta lineage, stats probe the bucket actors / source build
        stats."""
        from ..state.docstore import CorpusTextReader
        from .termvectors import build_termvector

        src = self.meta.get("source_index")
        if not src:
            raise RuntimeError(
                "global layout predates source_index metadata — rebuild "
                "merge_global_postings for termvectors"
            )
        if not hasattr(self, "_text_reader"):
            self._text_reader = CorpusTextReader(src)
        text = self._text_reader.mget([doc_id])[0]
        out = build_termvector(text, self._sqs_analyze())
        if term_statistics and out["terms"]:
            ts = sorted(out["terms"])
            dfs, cfs = self.dfs(ts), self.cfs(ts)
            for t, row in out["terms"].items():
                row["doc_freq"] = int(dfs.get(t, 0))
                row["ttf"] = int(cfs.get(t, 0))
        if field_statistics:
            from ..index.build import IndexInfo

            info = IndexInfo(src)
            out["field_statistics"] = {
                "doc_count": int(info.stats.num_docs),
                "sum_ttf": int(info.stats.total_tokens),
                "sum_doc_freq": int(sum(
                    s.num_postings for s in info.manifest.shards.values()
                )),
            }
        return out

    def explain(self, query: str, doc_id: int) -> dict:
        """ES ``_explain`` on the term-partitioned layout — same
        breakdown (and score, tested) as :meth:`QueryEngine.explain`."""
        from .termvectors import explain_from_termvector

        tv = self.termvectors(doc_id, term_statistics=True)
        return explain_from_termvector(
            tv, self._analyze(query), self.n,
            float(self.meta["avgdl"]),
            float(self.meta["k1"]), float(self.meta["b"]),
        )

    def suggest_term(
        self, text: str, size: int = 5, suggest_mode: str = "missing",
        max_edits: int = 2, prefix_length: int = 1,
        max_candidates: int = 200,
    ) -> list[dict]:
        """ES ``term`` suggester on the term-partitioned layout — same
        semantics (and results, parity tested) as
        :meth:`QueryEngine.suggest_term`."""
        from .suggest import rank_term_suggestions

        tokens = list(dict.fromkeys(self._analyze(text)))
        out: list[dict] = []
        for tok in tokens:
            cands = self.expand_fuzzy(
                tok, fuzziness=max_edits, prefix_length=prefix_length,
                max_expansions=max_candidates,
            )
            dfs = self.dfs(sorted({t for t, _ in cands} | {tok}))
            for row in rank_term_suggestions(
                tok, cands, dfs, dfs.get(tok, 0), size, suggest_mode,
            ):
                out.append({"token": tok, **row})
        return out

    def suggest_completion(
        self, prefix: str, size: int = 10, max_candidates: int = 1000,
    ) -> list[dict]:
        """ES ``completion`` suggester analogue on the term-partitioned
        layout — same semantics (and results, parity tested) as
        :meth:`QueryEngine.suggest_completion`."""
        from .suggest import rank_completions

        if not prefix:
            return []
        terms = self.expand_prefix(prefix, max_expansions=max_candidates)
        return rank_completions(terms, self.dfs(terms), size)

    def suggest_phrase(
        self, text: str, size: int = 3, max_edits: int = 1,
        prefix_length: int = 1, num_candidates: int = 6,
        max_errors: int = 2, collate: bool = False,
        collate_prune: bool = False,
    ) -> list[dict]:
        """ES ``phrase`` suggester (did-you-mean) on the term-partitioned
        layout — same semantics (and results, parity tested) as
        :meth:`QueryEngine.suggest_phrase`, including ``collate`` /
        ``collate_prune``; bigram counts resolve from the owning bucket
        actors' retained shingle tfs."""
        from ..index.build import SHINGLE_SEP
        from .suggest import suggest_phrase

        if not self.meta.get("index_phrases"):
            raise ValueError(
                "phrase suggester needs an index_phrases=True layout "
                "(shingle postings supply the bigram counts)"
            )
        if not hasattr(self, "_src_total_tokens"):
            from ..index.build import IndexInfo

            self._src_total_tokens = int(
                IndexInfo(self.meta["source_index"]).stats.total_tokens
            )
        collate_fn = (
            (lambda words: bool(self.search_phrase(list(words), k=1)))
            if collate or collate_prune else None
        )
        return suggest_phrase(
            text, self._sqs_analyze(), self.expand_fuzzy, self.cfs,
            self._src_total_tokens, SHINGLE_SEP,
            size=size, max_edits=max_edits, prefix_length=prefix_length,
            num_candidates=num_candidates, max_errors=max_errors,
            collate_match=collate_fn, collate_prune=collate_prune,
        )

    def expand_fuzzy(
        self, term: str, fuzziness: int = 1, prefix_length: int = 0,
        max_expansions: int = 50,
    ) -> list[tuple[str, int]]:
        """Global fuzzy expansion over the bucket dictionaries —
        deterministic (dist asc, term asc) cap, identical results to
        ``QueryEngine.expand_fuzzy`` regardless of layout."""
        per_actor = ray.get(
            [a.expand_fuzzy.remote(term, fuzziness, prefix_length)
             for a in self.actors]
        )
        merged: dict[str, int] = {}
        for part in per_actor:
            merged.update(dict(part))
        ranked = sorted(merged.items(), key=lambda kv: (kv[1], kv[0]))
        return ranked[:max_expansions]

    def search_fuzzy(
        self, term: str, fuzziness: int = 1, prefix_length: int = 0,
        max_expansions: int = 50, k: int = 10,
    ) -> list[tuple[int, float]]:
        """ES ``fuzzy`` (scoring_boolean rewrite) on the term-partitioned
        layout: per-bucket dictionary DP expansion, deterministic
        (dist, term) cap, then a weighted gather —
        Σ_t boost(t)·idf(t)·norm(tf_t) with the FuzzyTermsEnum boost —
        identical semantics (and results, tested) to
        ``QueryEngine.search_fuzzy``."""
        ranked = self.expand_fuzzy(term, fuzziness, prefix_length,
                                   max_expansions)
        if not ranked:
            return []
        fetched = self.fetch_terms(sorted(t for t, _ in ranked))
        d_parts, c_parts = [], []
        for t, dist in sorted(ranked):  # sorted-term accumulation order
            got = fetched.get(t)
            if got is None:
                continue
            ids, norms, df = got[0], got[1], got[2]
            idf = math.log(1.0 + (self.n - df + 0.5) / (df + 0.5))
            w = idf * (1.0 - dist / max(1, min(len(term), len(t))))
            d_parts.append(ids)
            c_parts.append(w * norms)
        return self._merge_contribs(d_parts, c_parts, k)

    def search_bool(
        self,
        must: str | list[str] = "",
        should: str | list[str] = "",
        must_not: str | list[str] = "",
        filter: str | list[str] = "",
        k: int = 10,
        minimum_should_match: int | None = None,
    ) -> list[tuple[int, float]]:
        """ES ``bool`` query on the term-partitioned layout: clause terms
        gather from their bucket actors (one round), the clause algebra
        runs as sorted-array set ops on the coordinator, and scoring sums
        idf·norm over the distinct (must ∪ should) terms — the same
        semantics (and SQL oracle) as ``QueryEngine.search_bool``.

        Candidate work is bounded by the clause terms' posting mass —
        the same cost shape as a term query; no doc-axis state needed."""

        def _clause(v) -> list[str]:
            if isinstance(v, str):
                return self._analyze(v) if v else []
            return sorted(set(v))

        must_s, should_s = _clause(must), _clause(should)
        not_s, filt_s = _clause(must_not), _clause(filter)
        if not (must_s or should_s or filt_s):
            raise ValueError("bool query needs at least one positive clause")
        scoring = sorted(set(must_s) | set(should_s))
        all_terms = sorted(set(scoring) | set(not_s) | set(filt_s))
        fetched = self.fetch_terms(all_terms)

        def docs_of(t: str) -> np.ndarray:
            got = fetched.get(t)
            return got[0] if got is not None else np.empty(0, np.int64)

        def inter_all(ts: list[str]) -> np.ndarray | None:
            cur: np.ndarray | None = None
            for t in ts:
                d = docs_of(t)
                cur = d if cur is None else np.intersect1d(
                    cur, d, assume_unique=True
                )
                if len(cur) == 0:
                    break
            return cur

        # eligibility mask, built on the union of scoring/filter docs
        ok: np.ndarray | None = None  # None = unconstrained yet
        if must_s:
            ok = inter_all(must_s)
        if filt_s:
            f = inter_all(filt_s)
            ok = f if ok is None else np.intersect1d(ok, f, assume_unique=True)
        msm = minimum_should_match
        if msm is None:
            msm = 0 if (must_s or filt_s) else (1 if should_s else 0)
        if msm > 0 and should_s:
            sd = np.concatenate([docs_of(t) for t in should_s])
            ud, cnt = np.unique(sd, return_counts=True)
            sm = ud[cnt >= msm]
            ok = sm if ok is None else np.intersect1d(ok, sm, assume_unique=True)
        elif msm > 0:
            return []
        if ok is None:
            # nothing constrained the doc set (e.g. should-only with an
            # explicit msm=0): ES would match ALL docs — fail loud like
            # the doc-partitioned engine rather than scan the corpus
            raise ValueError(
                "bool query constrains no documents (all-docs scan refused)"
            )
        if len(ok) == 0:
            return []
        if not_s:
            nd = np.unique(np.concatenate([docs_of(t) for t in not_s])) if (
                any(len(docs_of(t)) for t in not_s)
            ) else np.empty(0, np.int64)
            ok = np.setdiff1d(ok, nd, assume_unique=True)
        if len(ok) == 0:
            return []

        # score the eligible docs: per term, gather the norm of each
        # eligible doc's entry (sorted-term accumulation order, pinned)
        scores = np.zeros(len(ok), dtype=np.float64)
        for t in scoring:
            got = fetched.get(t)
            if got is None:
                continue
            ids, norms, df = got[0], got[1], got[2]
            idf = math.log(1.0 + (self.n - df + 0.5) / (df + 0.5))
            pos = np.searchsorted(ids, ok)
            pos_c = np.minimum(pos, len(ids) - 1) if len(ids) else pos
            hit = (len(ids) > 0) & (ids[pos_c] == ok) if len(ids) else (
                np.zeros(len(ok), dtype=bool)
            )
            scores[hit] += idf * norms[pos_c[hit]]
        return self._tie_cut(ok, scores, k)

    # in-doc positions must fit under the doc-id shift; 2^21 tokens/doc is
    # far past any clip-tokenized document, and 2^42 doc ids covers 10^12
    _POS_BITS = 21

    def search_phrase(
        self, phrase: str | list[str], k: int = 10, slop: int = 0,
        slop_mode: str = "ordered",
    ) -> list[tuple[int, float]]:
        """Exact phrase (ES ``match_phrase``, slop 0) over the
        term-partitioned layout: the phrase terms' postings + positional
        sidecars gather from their owning bucket actors (per-query volume
        = the terms' posting mass, exactly the doc-partitioned fan-out
        cost shifted to the term axis), the start-position intersection
        runs key-vectorized on the coordinator, and doc lengths hydrate
        for MATCHED docs only via the source index's docmeta point reads
        (the Lucene norms-file analogue).  Scores are rank- and
        score-identical to ``QueryEngine.search_phrase`` (tested)."""
        if isinstance(phrase, str):
            toks = clip_tokens(self._analyzer(phrase), *self._clip)
        else:
            toks = list(phrase)
        if not toks:
            return []
        idf_override = None
        if (
            slop == 0
            and len(toks) >= 2
            and bool(self.meta.get("index_phrases"))
            and (
                bool(self.meta.get("shingle_positions", True))
                or len(toks) == 2
            )
        ):
            # index_phrases rewrite (see ShardData.phrase_topk): idf_sum
            # stays the UNIGRAM constituents' sum (Lucene PhraseWeight),
            # probed without shipping postings; the slots become n−1
            # shingle terms.  A 2-term phrase needs no positions at all:
            # pf = the shingle's tf, so score = idf_sum × its norms —
            # one non-positional fetch.
            from ..index.build import SHINGLE_SEP

            uni_dfs = self.dfs(sorted(set(toks)))
            if any(uni_dfs[t] == 0 for t in set(toks)):
                return []
            idf_override = float(sum(
                math.log(1.0 + (self.n - uni_dfs[t] + 0.5)
                         / (uni_dfs[t] + 0.5))
                for t in toks  # WITH repeats
            ))
            toks = [
                toks[i] + SHINGLE_SEP + toks[i + 1]
                for i in range(len(toks) - 1)
            ]
            if len(toks) == 1:
                g = self.fetch_terms(toks).get(toks[0])
                if g is None:
                    return []
                return self._tie_cut(
                    g[0].astype(np.int64), idf_override * g[1], k
                )
        # position-skip doc gating (see ShardData.phrase_topk), applied
        # REMOTE-SIDE when the conjunction is selective: only candidate
        # docs' position segments ship from the bucket actors
        got = self._fetch_phrase_postings(
            sorted(set(toks)),
            gated_parallel_min=self.GATED_PARALLEL_MIN_COST,
        )
        if got is None:
            return []
        if isinstance(got[0], str) and got[0] == "gated_parallel":
            _, cand_docs, base = got
            if len(cand_docs) == 0:
                return []
            if idf_override is not None:
                idf_sum = idf_override
            else:
                idf_sum = 0.0
                for t in toks:  # WITH repeats — Lucene PhraseWeight
                    df = base[t][2]
                    idf_sum += math.log(
                        1.0 + (self.n - df + 0.5) / (df + 0.5)
                    )
            rpt_groups = None
            if slop > 0 and slop_mode == "lucene":
                from .sloppy import repeat_groups_of

                rpt_groups = repeat_groups_of(toks)
            hd, pf = self._phrase_gated_parallel(
                toks, cand_docs, slop, slop_mode, rpt_groups
            )
            if len(hd) == 0:
                return []
            dl_term = min(set(toks), key=lambda t: int(base[t][2]))
            return self._phrase_score_tail(
                hd, pf.astype(np.float64), idf_sum, k, dl_term=dl_term
            )
        fetched, cand_docs = got
        if len(cand_docs) == 0:
            return []
        if idf_override is not None:
            idf_sum = idf_override
        else:
            idf_sum = 0.0
            for t in toks:  # WITH repeats — Lucene PhraseWeight
                df = fetched[t][2]
                idf_sum += math.log(1.0 + (self.n - df + 0.5) / (df + 0.5))

        shift = np.int64(self._POS_BITS)
        # parallel-path gate shared by all three phrase modes: enough
        # positional mass to beat task overhead, enough candidates to
        # chunk, and FULL entries (subset/gated fetches route inline).
        # NO upper mass bound here: even at ~120M values (4M corpus,
        # hot-hot lucene slop) the fan-out beats inline 4.4x warm
        # (8.0 vs 35.2 s measured) — object-store pressure degrades the
        # win but never inverts it for single-term slots
        parallel_ok = (
            sum(len(fetched[t][6]) for t in set(toks))
            >= self.PHRASE_PARALLEL_MIN_MASS
            and len(cand_docs) > self.PHRASE_PARALLEL_TASKS
            and all(fetched[t][1] is not None for t in set(toks))
        )
        # matched docs sit in every phrase term's posting list — route
        # the dl gather to the RAREST term's actor (smallest base)
        dl_term = min(set(toks), key=lambda t: int(fetched[t][2]))

        def slot_keys(t: str, seq: int) -> np.ndarray:
            ids, _norms, _df, _bl, _bm, tfs, pos = fetched[t]
            if len(pos) and int(pos.max()) >= (1 << self._POS_BITS):
                raise ValueError("document exceeds 2^21 token positions")
            # doc-conjunction gate, shared segment gather (a no-op pass
            # when the fetch was already gated remote-side)
            ids_sub, tfs_sub, pos_sub = subset_positions(
                ids, tfs, pos, cand_docs
            )
            docs_flat = np.repeat(ids_sub, tfs_sub)
            p = pos_sub.astype(np.int64)
            if seq:
                keep = p >= seq
                if not keep.all():
                    docs_flat, p = docs_flat[keep], p[keep]
                p = p - seq
            return (docs_flat << shift) | p

        if slop > 0 and slop_mode == "lucene":
            # Lucene SloppyPhraseMatcher semantics (reordering + weighted
            # sloppyFreq), shared matcher with the shard engine — parity
            # is structural (see search.sloppy)
            from .sloppy import repeat_groups_of, sloppy_freqs_for_candidates

            rpt_groups = repeat_groups_of(toks)
            if parallel_ok:
                # hot-hot phrases: the matcher is coordinator-bound here
                # (the doc engine parallelizes it per shard) — fan out
                # over doc-range chunks, exact by per-doc independence
                hd, pf = self._phrase_parallel(
                    toks, fetched, cand_docs, shift, slop, "lucene",
                    rpt_groups,
                )
            else:
                slot_docs, slot_pos = [], []
                for t in toks:
                    ids, _n, _d, _bl, _bm, tfs, pos = fetched[t]
                    slot_docs.append(np.repeat(ids, tfs).astype(np.int64))
                    slot_pos.append(pos.astype(np.int64))
                hd, pf = sloppy_freqs_for_candidates(
                    slot_docs, slot_pos, slop, repeat_groups=rpt_groups
                )
            if len(hd) == 0:
                return []
            return self._phrase_score_tail(hd, pf, idf_sum, k,
                                           dl_term=dl_term)

        if slop > 0:
            # ordered sloppy matching — the shard engine's greedy minimal
            # successor chain on global keys (see ShardData.phrase_topk
            # for the semantics and the documented Lucene divergence)
            if parallel_ok:
                hd, pf_c = self._phrase_parallel(
                    toks, fetched, cand_docs, shift, slop, "ordered"
                )
                if len(hd) == 0:
                    return []
                return self._phrase_score_tail(
                    hd, pf_c.astype(np.float64), idf_sum, k,
                    dl_term=dl_term,
                )
            starts = slot_keys(toks[0], 0)
            cur = starts
            ok = np.ones(len(starts), dtype=bool)
            for t in toks[1:]:
                nxt = slot_keys(t, 0)
                pos_in = np.searchsorted(nxt, cur + 1)
                valid = pos_in < len(nxt)
                cand_k = nxt[np.minimum(pos_in, max(len(nxt) - 1, 0))] if len(
                    nxt
                ) else np.zeros_like(cur)
                valid &= (cand_k >> shift) == (cur >> shift)
                ok &= valid
                cur = np.where(valid, cand_k, cur)
            mask = np.int64((1 << self._POS_BITS) - 1)
            span = (cur & mask) - (starts & mask)
            ok &= span <= (len(toks) - 1 + slop)
            cur = starts[ok]
        else:
            if parallel_ok:
                hd, pf_c = self._phrase_parallel(
                    toks, fetched, cand_docs, shift
                )
                if len(hd) == 0:
                    return []
                return self._phrase_score_tail(
                    hd, pf_c.astype(np.float64), idf_sum, k,
                    dl_term=dl_term,
                )
            cur = slot_keys(toks[0], 0)
            for seq, t in enumerate(toks[1:], start=1):
                if len(cur) == 0:
                    break
                cur = np.intersect1d(cur, slot_keys(t, seq),
                                     assume_unique=True)
        if len(cur) == 0:
            return []
        hd, pf_c = np.unique(cur >> shift, return_counts=True)
        return self._phrase_score_tail(hd, pf_c.astype(np.float64), idf_sum, k,
                                       dl_term=dl_term)

    def search_spans(
        self, tree: dict, k: int = 10,
        mask_engines: dict[str, "TermPartitionedEngine"] | None = None,
        outer_field: str = "text",
    ) -> list[tuple[int, float]]:
        """Lucene span queries over the TERM-partitioned layout — same
        tree shape, kernel and scoring as ``QueryEngine.search_spans``
        (``search.spans``; parity is structural).  The tree's
        requirement-set conjunction gates the positional fetch exactly
        like the phrase path (``_fetch_phrase_postings`` with an explicit
        candidate set — or-group requirements make plain per-term
        conjunction wrong, the match_phrase_prefix precedent), so only
        candidate docs' position segments cross the wire; doc lengths
        hydrate from a singleton-requirement term's retained dl column
        when one exists, else from source docmeta point reads.

        ``mask_engines`` serves ``span_field_masking``: a map of sibling
        FIELD name → that field's own TermPartitionedEngine (same
        corpus, position-compatible analyzer).  Masked leaves resolve to
        field-qualified stream keys; their postings/positions fetch from
        the sibling engine (doc ids share the corpus coordinate space),
        idf uses the sibling field's df, and norms stay with THIS
        (masked-as) field — Lucene SpanFieldMaskingQuery semantics."""
        from . import spans as mod

        if mask_engines:
            tree = mod.resolve_masks(tree, outer_field)

            def expand(spec: dict, mx: int) -> list[str]:
                f = spec.get("field")
                eng = self if f is None else mask_engines[f]
                terms = eng._expand_span_multi(spec, mx)
                if f is None:
                    return terms
                return [mod.mask_key(f, t) for t in terms]

            tree = mod.rewrite_multi(tree, expand)
        else:
            tree = mod.rewrite_multi(tree, self._expand_span_multi)
        return self._positional_tree_search(
            tree, k, mod, mask_engines=mask_engines
        )

    def search_intervals(
        self, tree: dict, k: int = 10
    ) -> list[tuple[int, float]]:
        """ES ``intervals`` query served from the TERM-partitioned
        layout — same tree shape, kernel and scoring as
        ``QueryEngine.search_intervals`` (``search.intervals``; parity
        is structural); the positional fetch is gated exactly like
        :meth:`search_spans`."""
        from . import intervals as mod

        tree = mod.desugar(tree, self._analyze_seq)
        tree = mod.rewrite_multi(tree, self._expand_span_multi)
        return self._positional_tree_search(tree, k, mod)

    def _positional_tree_search(
        self, tree: dict, k: int, mod,
        mask_engines: dict[str, "TermPartitionedEngine"] | None = None,
    ):
        """Shared span/intervals serving tail: requirement-gated
        positional fetch + the kernel module's tree evaluation.  With
        ``mask_engines``, stream keys may be field-qualified
        (``span_field_masking``): each field's postings/positions fetch
        from its own engine; doc ids share the corpus coordinate."""
        from .spans import split_mask_key

        def engine_of(key: str) -> tuple["TermPartitionedEngine", str]:
            f, t = split_mask_key(key)
            return (self, t) if f is None else (mask_engines[f], t)

        leaves = mod.leaf_terms(tree)
        if not leaves:
            return []
        reqs = mod.requirement_sets(tree)
        keys = sorted(mod.all_terms(tree))
        # one non-positional fetch round per engine
        by_field: dict[str | None, list[str]] = {}
        for key in keys:
            f, t = split_mask_key(key)
            by_field.setdefault(f, []).append(key)
        base: dict[str, tuple] = {}
        for f, ks in by_field.items():
            eng = self if f is None else mask_engines[f]
            got = eng.fetch_terms(
                [split_mask_key(kk)[1] for kk in ks], positions=False
            )
            for kk in ks:
                t = split_mask_key(kk)[1]
                if t in got:
                    base[kk] = got[t]
        present = sorted(kk for kk in keys if kk in base)
        cand: np.ndarray | None = None
        for rs in reqs:
            avail = sorted(kk for kk in rs if kk in base)
            if not avail:
                return []
            if len(avail) == 1:
                docs = base[avail[0]][0]
            else:
                docs = np.unique(
                    np.concatenate([base[kk][0] for kk in avail])
                )
            if cand is None:
                cand = docs
            else:
                cand = cand[np.isin(cand, docs, assume_unique=True)]
            if len(cand) == 0:
                return []
        # one positional round per engine, all gated by the same cand
        fetched: dict[str, tuple] = {}
        for f, ks in by_field.items():
            eng = self if f is None else mask_engines[f]
            pres = sorted(
                {split_mask_key(kk)[1] for kk in ks if kk in base}
            )
            if not pres:
                continue
            got = eng._fetch_phrase_postings(pres, cand=cand)
            if got is None:  # pragma: no cover - present ⊆ base guards
                return []
            part, cand = got
            if len(cand) == 0:
                return []
            for kk in ks:
                t = split_mask_key(kk)[1]
                if t in part:
                    fetched[kk] = part[t]
        streams: dict[str, tuple] = {}
        for kk in present:
            ids, _n, _d, _bl, _bm, tfs, pos = fetched[kk]
            ids_s, tfs_s, pos_s = subset_positions(ids, tfs, pos, cand)
            streams[kk] = (
                np.repeat(ids_s, tfs_s).astype(np.int64),
                pos_s.astype(np.int64),
            )
        hd, pf = mod.span_freqs(tree, streams)
        if len(hd) == 0:
            return []
        idf_sum = 0.0
        for kk in leaves:  # WITH repeats — the constituent idf sum
            df = int(base[kk][2]) if kk in base else 0
            idf_sum += math.log(1.0 + (self.n - df + 0.5) / (df + 0.5))
        # dl hydration: a singleton requirement term's postings contain
        # every matched doc; pick the rarest such UNQUALIFIED term (dls
        # must come from THIS field's layout), else docmeta point reads
        singles = [
            next(iter(rs)) for rs in reqs
            if len(rs) == 1 and next(iter(rs)) in base
            and split_mask_key(next(iter(rs)))[0] is None
        ]
        dl_term = (
            min(singles, key=lambda t: int(base[t][2])) if singles else None
        )
        return self._phrase_score_tail(hd, pf, idf_sum, k, dl_term=dl_term)

    def search_phrase_prefix(
        self, phrase: str | list[str], k: int = 10,
        max_expansions: int = 50, slop: int = 0,
        slop_mode: str = "ordered",
    ) -> list[tuple[int, float]]:
        """ES ``match_phrase_prefix`` served from the term-partitioned
        layout: the last term expands to ``max_expansions`` dictionary
        terms in term order (union of the bucket actors' walks — the
        same global-first-N the doc engine computes), and the phrase
        intersects with the last slot as the expansions' position-key
        UNION (Lucene MultiPhraseQuery).  idf = Σ idfs of the fixed
        terms + Σ idfs of every expansion; tf = multi-phrase start
        count — rank/score identical to
        :meth:`QueryEngine.search_phrase_prefix` (tested).

        ``slop`` admits sloppy matching over the multi-term slots:
        ``slop_mode="ordered"`` runs the greedy successor chain on the
        per-slot key unions, ``"lucene"`` the SloppyPhraseMatcher with
        the multi-term repeat plan (an expansion repeating a fixed term
        engages the collision machinery — ``sloppy.repeat_plan``).

        The positional fetch is GATED like plain phrases, but under the
        multi-phrase candidate set (fixed-term conjunction ∩ expansion
        union) rather than the all-terms conjunction — only candidate
        docs' position segments cross the wire when the gate's cost
        model says the subset is materially cheaper."""
        from .sloppy import repeat_plan

        if isinstance(phrase, str):
            toks = clip_tokens(self._analyzer(phrase), *self._clip)
        else:
            toks = list(phrase)
        if not toks:
            return []
        per_actor = ray.get(
            [a.expand_prefix.remote(toks[-1], max_expansions)
             for a in self.actors]
        )
        expansions = sorted(set().union(*map(set, per_actor)))
        expansions = expansions[:max_expansions]
        if not expansions:
            return []
        fixed = toks[:-1]
        terms_all = sorted(set(fixed) | set(expansions))
        base = self.fetch_terms(terms_all, positions=False)
        if any(t not in base for t in fixed):
            return []
        expansions = [e for e in expansions if e in base]
        if not expansions:
            return []
        cand = None
        for t in sorted(set(fixed)):
            ids = base[t][0]
            cand = ids if cand is None else cand[
                np.isin(cand, ids, assume_unique=True)
            ]
            if len(cand) == 0:
                return []
        exp_union = np.unique(
            np.concatenate([base[e][0] for e in expansions])
        )
        cand = exp_union if cand is None else cand[
            np.isin(cand, exp_union, assume_unique=True)
        ]
        if len(cand) == 0:
            return []
        need = sorted(set(fixed) | set(expansions))
        got = self._fetch_phrase_postings(
            need, cand=cand,
            gated_parallel_min=self.GATED_PARALLEL_MIN_COST,
        )
        if got is None:
            return []
        if isinstance(got[0], str) and got[0] == "gated_parallel":
            # huge-mass selective multi-phrase: per-chunk actor→task
            # subset refs, the expansion union as the last slot
            _, cand, base2 = got
            if len(cand) == 0:
                return []
            idf_sum = 0.0
            for t in list(fixed) + list(expansions):  # fixed WITH repeats
                df = base2[t][2]
                idf_sum += math.log(1.0 + (self.n - df + 0.5) / (df + 0.5))
            slots_t = list(fixed) + [list(expansions)]
            rpt_groups, rpt_multi = (
                repeat_plan(slots_t)
                if slop > 0 and slop_mode == "lucene" else ([], False)
            )
            hd, pf = self._phrase_gated_parallel(
                slots_t, cand, slop, slop_mode, rpt_groups, rpt_multi
            )
            if len(hd) == 0:
                return []
            dl_term = (
                min(set(fixed), key=lambda t: int(base2[t][2]))
                if fixed else None
            )
            return self._phrase_score_tail(
                hd, pf.astype(np.float64), idf_sum, k, dl_term=dl_term
            )
        fetched, cand = got
        idf_sum = 0.0
        for t in list(fixed) + list(expansions):  # fixed WITH repeats
            df = fetched[t][2]
            idf_sum += math.log(1.0 + (self.n - df + 0.5) / (df + 0.5))

        shift = np.int64(self._POS_BITS)
        # matched docs ⊆ every FIXED term's postings; with no fixed term
        # no single posting list covers them — docstore fallback
        dl_term = (
            min(set(fixed), key=lambda t: int(fetched[t][2]))
            if fixed else None
        )
        all_terms = set(fixed) | set(expansions)
        # hot multi-phrases fan out over doc-range chunks like plain
        # phrases — the expansion union is just a multi-term last slot.
        # The mass window applies AND the term count must stay small:
        # each term is one ray.put, and a 50-expansion prefix pays ~1 s
        # of puts for a marginal warm win (measured at 1M — prefix
        # queries are autocomplete-shaped, cold-dominated), so wide
        # expansions stay inline
        mass = sum(len(fetched[t][6]) for t in all_terms)
        parallel_ok = (
            self.PHRASE_PARALLEL_MIN_MASS <= mass
            <= self.PHRASE_PARALLEL_MAX_MASS
            and len(all_terms) <= self.PHRASE_PARALLEL_MAX_TERMS
            and len(cand) > self.PHRASE_PARALLEL_TASKS
            and all(fetched[t][1] is not None for t in all_terms)
        )
        slots_t = list(fixed) + [list(expansions)]
        rpt_groups, rpt_multi = (
            repeat_plan(slots_t)
            if slop > 0 and slop_mode == "lucene" else ([], False)
        )
        if parallel_ok:
            hd, pf = self._phrase_parallel(
                slots_t, fetched, cand, shift, slop, slop_mode,
                rpt_groups, rpt_multi,
            )
            if len(hd) == 0:
                return []
            return self._phrase_score_tail(
                hd, pf.astype(np.float64), idf_sum, k, dl_term=dl_term
            )
        if slop > 0:
            # sloppy modes run the shared slices compute inline (the
            # same kernel the chunk tasks run, over all candidates)
            slices = [
                [(fetched[t][0], fetched[t][5].astype(np.int64),
                  fetched[t][6])
                 for t in ([slot] if isinstance(slot, str) else slot)]
                for slot in slots_t
            ]
            hd, pf = _phrase_slices_compute(
                slices, list(range(len(slots_t))), cand,
                int(self._POS_BITS), slop, slop_mode, rpt_groups,
                rpt_multi,
            )
            if len(hd) == 0:
                return []
            return self._phrase_score_tail(
                hd, pf.astype(np.float64), idf_sum, k, dl_term=dl_term
            )

        def slot_keys(t: str, seq: int) -> np.ndarray:
            ids, _norms, _df, _bl, _bm, tfs, pos = fetched[t]
            if len(pos) and int(pos.max()) >= (1 << self._POS_BITS):
                raise ValueError("document exceeds 2^21 token positions")
            ids_sub, tfs_sub, pos_sub = subset_positions(
                ids, tfs, pos, cand
            )
            docs_flat = np.repeat(ids_sub, tfs_sub)
            p = pos_sub.astype(np.int64)
            if seq:
                keep = p >= seq
                if not keep.all():
                    docs_flat, p = docs_flat[keep], p[keep]
                p = p - seq
            return (docs_flat << shift) | p

        cur = None
        for seq, t in enumerate(fixed):
            sk = slot_keys(t, seq)
            cur = sk if cur is None else np.intersect1d(
                cur, sk, assume_unique=True
            )
            if len(cur) == 0:
                return []
        # last slot: one token occupies one position, so expansion keys
        # are disjoint across terms — the union stays unique
        last = np.unique(np.concatenate(
            [slot_keys(e, len(toks) - 1) for e in expansions]
        ))
        cur = last if cur is None else np.intersect1d(
            cur, last, assume_unique=True
        )
        if len(cur) == 0:
            return []
        hd, pf = np.unique(cur >> shift, return_counts=True)
        return self._phrase_score_tail(
            hd, pf.astype(np.float64), idf_sum, k, dl_term=dl_term
        )

    def _phrase_parallel(
        self,
        toks: list[str],
        fetched: dict,
        cand: np.ndarray,
        shift: np.int64,
        slop: int = 0,
        slop_mode: str = "ordered",
        rpt_groups: list | None = None,
        rpt_multi: bool = False,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Hot-phrase coordinator work fanned out over doc-range chunk
        tasks — exact by per-doc independence (forced-parallel parity
        tests).  Each unique term's FULL posting arrays go to the object
        store ONCE (``ray.put``, FIFO-bounded ref cache reused across
        queries); tasks read them zero-copy and slice locally, so the
        per-query wire cost is O(candidates), not O(position mass).
        Restores the per-shard parallelism the doc-partitioned engine
        gets structurally.

        ``toks`` entries may be a LIST of terms (a multi-phrase slot —
        the match_phrase_prefix expansion union); slop modes union the
        group's position streams per slot inside the chunk kernel."""
        flat_terms = set()
        for slot in toks:
            flat_terms.update(slot if isinstance(slot, list) else [slot])
        if not hasattr(self, "_chunk_put_cache"):
            self._chunk_put_cache: dict[str, tuple] = {}
            self._chunk_put_postings = 0
        refs = {}
        for t in flat_terms:
            got = self._chunk_put_cache.get(t)
            if got is None:
                ids, _n, _d, _bl, _bm, tfs, pos = fetched[t]
                if len(pos) and int(pos.max()) >= (1 << self._POS_BITS):
                    raise ValueError(
                        "document exceeds 2^21 token positions"
                    )
                tf64 = tfs.astype(np.int64)
                tfcum = np.concatenate([[0], np.cumsum(tf64)])
                cost = len(ids) + len(pos)
                got = (ray.put((ids, tf64, pos, tfcum)), cost)
                self._chunk_put_cache[t] = got
                self._chunk_put_postings += cost
                protected = flat_terms
                while self._chunk_put_postings > self.CACHE_MAX_POSTINGS:
                    victim = next(
                        (k for k in self._chunk_put_cache
                         if k not in protected), None,
                    )
                    if victim is None:
                        break  # only this query's terms remain pinned
                    _, c = self._chunk_put_cache.pop(victim)
                    self._chunk_put_postings -= c
            refs[t] = got[0]
        n_tasks = self.PHRASE_PARALLEL_TASKS
        qs = cand[np.linspace(0, len(cand) - 1,
                              n_tasks + 1).astype(np.int64)]
        cuts = np.unique(qs[1:-1])
        bounds = np.concatenate(
            [[np.iinfo(np.int64).min], cuts, [np.iinfo(np.int64).max]]
        )
        slot_refs = [
            [refs[t] for t in slot] if isinstance(slot, list)
            else [refs[slot]]
            for slot in toks
        ]
        seqs = list(range(len(toks)))
        futs = []
        for i in range(len(bounds) - 1):
            lo, hi = int(bounds[i]), int(bounds[i + 1])
            a = int(np.searchsorted(cand, lo, side="left"))
            b = int(np.searchsorted(cand, hi, side="left"))
            cand_c = cand[a:b]
            if len(cand_c) == 0:
                continue
            futs.append(
                _phrase_chunk_kernel.remote(
                    slot_refs, seqs, lo, hi, cand_c, int(shift),
                    slop, slop_mode, rpt_groups, rpt_multi,
                )
            )
        if not futs:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        parts = ray.get(futs)
        hd = np.concatenate([p[0] for p in parts])
        pf = np.concatenate([p[1] for p in parts])
        return hd, pf  # chunks are disjoint ascending doc ranges

    def _phrase_gated_parallel(
        self,
        toks: list[str],
        cand: np.ndarray,
        slop: int = 0,
        slop_mode: str = "ordered",
        rpt_groups: list | None = None,
        rpt_multi: bool = False,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Huge-mass phrase execution: per doc-range chunk, each owning
        bucket actor ships that chunk's candidate-subset positions as
        an ObjectRef consumed DIRECTLY by the chunk task — the
        coordinator never materializes positions and no full-mass
        ``ray.put`` happens.  Per-query wire = the gated subset mass,
        split across chunks; compute = the shared chunk kernel in
        parallel.  Exact by per-doc independence (forced-route parity
        tests).

        ``toks`` entries may be a LIST of terms (a multi-phrase slot —
        the match_phrase_prefix expansion union); slop modes union the
        group's position streams per slot inside the chunk kernel."""
        from ..index.global_merge import _term_bucket

        flat_terms: set[str] = set()
        for slot in toks:
            flat_terms.update(slot if isinstance(slot, list) else [slot])
        by_actor: dict[int, list[str]] = {}
        for t in sorted(flat_terms):
            ai = self._actor_of_bucket[
                _term_bucket(t, self._n_buckets, self._term_hash)
            ]
            by_actor.setdefault(ai, []).append(t)
        n_tasks = self.PHRASE_PARALLEL_TASKS
        qs = cand[np.linspace(0, len(cand) - 1,
                              n_tasks + 1).astype(np.int64)]
        cuts = np.unique(qs[1:-1])
        bounds = np.concatenate(
            [[np.iinfo(np.int64).min], cuts, [np.iinfo(np.int64).max]]
        )
        futs = []
        for i in range(len(bounds) - 1):
            lo, hi = int(bounds[i]), int(bounds[i + 1])
            a = int(np.searchsorted(cand, lo, side="left"))
            b = int(np.searchsorted(cand, hi, side="left"))
            cand_c = cand[a:b]
            if len(cand_c) == 0:
                continue
            part_refs = [
                self.actors[ai].fetch_positions_subset.remote(ts, cand_c)
                for ai, ts in by_actor.items()
            ]
            futs.append(
                _phrase_gated_chunk_kernel.remote(
                    part_refs, list(toks), cand_c, int(self._POS_BITS),
                    slop, slop_mode, rpt_groups, rpt_multi,
                )
            )
        if not futs:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        parts = ray.get(futs)
        return (
            np.concatenate([p[0] for p in parts]),
            np.concatenate([p[1] for p in parts]),
        )

    def _phrase_score_tail(
        self, hd: np.ndarray, pf: np.ndarray, idf_sum: float, k: int,
        dl_term: str | None = None,
    ) -> list[tuple[int, float]]:
        """BM25 over phrase frequencies (int or sloppy-float).  Doc
        lengths for the MATCHED docs come from ``dl_term``'s retained
        per-posting dl column on its owning bucket actor (matched docs ⊆
        every phrase term's posting list — one subset gather, no file
        I/O); layouts without retained dls fall back to the source
        index's docmeta point reads (the Lucene norms-file analogue)."""
        from ..index.global_merge import _term_bucket

        dl = None
        if dl_term is not None:
            a = self._actor_of_bucket[_term_bucket(dl_term, self._n_buckets, self._term_hash)]
            dl = ray.get(
                self.actors[a].fetch_dls_subset.remote(dl_term, hd)
            )
        if dl is None:
            from ..state.docstore import DocStore

            if not hasattr(self, "_dl_store"):
                src = self.meta.get("source_index")
                if not src:
                    raise RuntimeError(
                        "global layout predates source_index metadata — "
                        "rebuild merge_global_postings for phrase serving"
                    )
                self._dl_store = DocStore(src, columns=["doc_id", "dl"])
            dl = (
                self._dl_store.mget(hd).column("dl").to_numpy()
                .astype(np.float64)
            )
        k1, b = float(self.meta["k1"]), float(self.meta["b"])
        avgdl = float(self.meta["avgdl"])
        scores = idf_sum * pf * (k1 + 1.0) / (
            pf + k1 * (1.0 - b + b * dl / avgdl)
        )
        return self._tie_cut(hd.astype(np.int64), scores, k)

    def field_caps(self) -> dict:
        """ES ``_field_caps`` from the term-partitioned layout: the
        capabilities of the SOURCE index whose docmeta lineage serves
        doc values here (engine.field_caps over it)."""
        from .engine import field_caps

        src = self.meta.get("source_index")
        if not src:
            raise RuntimeError(
                "global layout predates source_index metadata — rebuild "
                "merge_global_postings for field capabilities"
            )
        return field_caps(src)

    def refresh(self) -> list[str]:
        """Adopt layout changes WITHOUT reconstructing the engine: every
        bucket actor loads only committed NEW append generations
        in place (re-deriving all norms under the moved avgdl from its
        retained per-posting dl/tf — the dls-v2 property) and falls back
        to reloading its buckets when the base layout was swapped.
        Coordinator caches that depend on the layout (term fetch cache,
        dl/text stores, corpus stats) reset.  Results after refresh are
        identical to a freshly constructed engine (tested).  Returns the
        per-actor statuses ("noop" | "appended" | "reloaded")."""
        statuses = ray.get([a.refresh.remote() for a in self.actors])
        self.meta = _load_meta(self.global_dir)
        self.n = int(self.meta["num_docs"])
        if int(self.meta["n_buckets"]) != self._n_buckets:
            raise RuntimeError(
                "n_buckets changed under a live engine — reconstruct"
            )
        self._term_cache = {}
        self._cache_postings = 0
        for attr in ("_dl_store", "_text_reader", "_mass_cache",
                     "_chunk_put_cache", "_chunk_put_postings",
                     "_bg_cache"):
            if hasattr(self, attr):
                delattr(self, attr)
        return statuses

    def shutdown(self) -> None:
        for a in self.actors:
            ray.kill(a)
        self.actors = []


class TermBulkScorer:
    """Dataset stage over an existing :class:`TermPartitionedEngine`'s
    bucket actors — the term-partitioned mirror of
    ``engine.DistributedBulkScorer``: each query BATCH gathers all of its
    queries' terms with one round trip per owning bucket actor, then
    scores every query from the shared fetch (formerly one actor round
    trip per query × bucket).

    Input batch: (query_id:int64, query:string[, k:int32]).
    Output: (query_id:int64, rank:int32, doc_id:int64, score:float64).
    """

    def __init__(self, engine: "TermPartitionedEngine"):
        # plain picklables + actor handles; tasks talk straight to the
        # long-lived bucket actors
        self.eng = engine

    def __call__(self, batch):
        import pyarrow as pa

        qids = batch.column("query_id").to_pylist()
        texts = batch.column("query").to_pylist()
        ks = (
            batch.column("k").to_pylist()
            if "k" in batch.column_names
            else [10] * len(qids)
        )
        eng = self.eng
        per_q_terms = [eng._analyze(q) for q in texts]
        all_terms = sorted({t for ts in per_q_terms for t in ts})
        fetched = eng.fetch_terms(all_terms) if all_terms else {}
        o_qid, o_rank, o_doc, o_score = [], [], [], []
        for qid, terms, k in zip(qids, per_q_terms, ks):
            if not terms:
                continue
            for r, (d, s) in enumerate(
                eng._score_from_fetch(terms, fetched, int(k))
            ):
                o_qid.append(qid)
                o_rank.append(r + 1)
                o_doc.append(d)
                o_score.append(s)
        return pa.table(
            {
                "query_id": pa.array(o_qid, pa.int64()),
                "rank": pa.array(o_rank, pa.int32()),
                "doc_id": pa.array(o_doc, pa.int64()),
                "score": pa.array(o_score, pa.float64()),
            }
        )


def score_queries_dataset_term(queries_ds, engine: "TermPartitionedEngine",
                               batch_size: int = 256):
    """Bulk-score a query Dataset against the term-partitioned engine.

    The query table usually arrives as ONE block (``from_arrow``, a small
    parquet) — without a repartition every query would score inside a
    single task regardless of ``batch_size``; splitting to one block per
    batch lets the scoring fan out across the cluster while each task
    still amortizes one term-fetch round per batch."""
    n = queries_ds.count()
    blocks = max(1, -(-n // batch_size))
    if blocks > 1:
        queries_ds = queries_ds.repartition(blocks)
    return queries_ds.map_batches(
        TermBulkScorer(engine),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
    )
