"""Text-analysis stages for large-scale training-data pipelines.

All stages are vectorized ``map_batches`` callables over Arrow batches.
Tokenization is the ``simple`` analyzer (SQL-parity:
``regexp_split_to_array(lower(text), '[^a-z0-9]+')``) so every stat here
has an exact DuckDB oracle; the driver correctness gate exercises that
parity (see ``__ray_entry__.py``).

The heuristics (language-ID, quality score) follow the standard
web-corpus-curation recipes (stopword-hit language ID; length / digit /
stopword-ratio quality signals à la C4/Gopher rules).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..analysis.tokenizer import _STOPWORDS, simple_tokens

_DIGITS_RE = re.compile(r"^[0-9]+$")

# per-language stopword sets for the n-gram/stopword language-ID heuristic
LANG_STOPWORDS: dict[str, frozenset[str]] = {
    "en": frozenset("the a an and of to in is it you that was for on are with they this have from or by".split()),
    "de": frozenset("der die das und ist ich nicht du sie es ein eine zu den von mit auf im wir er sich des".split()),
    "fr": frozenset("le la les et de des un une est que je tu il elle nous vous dans pour sur avec ne pas au".split()),
    "es": frozenset("el la los las y de un una es que en no se por con para su al lo como mas pero".split()),
}
_CJK_RE = re.compile(r"[一-鿿㐀-䶿]")


def clipped_tokens(text: str, max_len: int = 64) -> list[str]:
    """The contract tokenization: simple analyzer, token length <= 64."""
    return [t for t in simple_tokens(text) if len(t) <= max_len]


def quality_score(token_count: np.ndarray, digit_tokens: np.ndarray,
                  stopword_count: np.ndarray) -> np.ndarray:
    """Composite quality in [0,1] from length / digit / stopword signals.

    The exact arithmetic (operand order included) is mirrored in the
    DuckDB oracle SQL, so results are bit-identical pre-rounding.
    """
    tc = token_count.astype(np.float64)
    safe = np.maximum(tc, 1.0)
    return (
        0.5 * np.minimum(tc / 100.0, 1.0)
        + 0.3 * (1.0 - digit_tokens.astype(np.float64) / safe)
        + 0.2 * np.minimum(stopword_count.astype(np.float64) * 3.0 / safe, 1.0)
    )


class TextStats:
    """Per-document stats + rolling fingerprint (map_batches callable).

    Output: doc_id, token_count, distinct_tokens, stopword_count,
    digit_tokens, fingerprint (md5 of the sorted distinct-token set — the
    canonical "document fingerprint" for fuzzy-dedup bucketing), quality
    (composite score; op order pinned so the SQL oracle is bit-identical
    — small-rational inputs make ROUNDED comparison unsafe, exact safe).

    Vectorized: ONE Arrow-kernel tokenize per batch
    (``tokenize_codes_arrow`` — the index build's RE2 split +
    dictionary-encode + integer-gather path); stopword/digit flags are
    memoized once per DISTINCT term and counted with ``bincount``;
    distinct tokens come from one composite-key ``np.unique``.  The only
    remaining per-doc Python is the fingerprint md5 over each doc's
    (already-sorted) distinct-term slice.  Values are identical to the
    per-doc ``clipped_tokens`` formulation (``python_reference``,
    parity-tested) — the DuckDB oracle pin is the external guarantee."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col
        self._flag_cache: dict[str, tuple[bool, bool]] = {}

    def _term_flags(self, terms: list[str]) -> tuple[np.ndarray, np.ndarray]:
        sw = np.empty(len(terms), dtype=bool)
        dg = np.empty(len(terms), dtype=bool)
        cache = self._flag_cache
        for i, t in enumerate(terms):
            f = cache.get(t)
            if f is None:
                f = cache[t] = (t in _STOPWORDS, bool(_DIGITS_RE.match(t)))
            sw[i], dg[i] = f
        return sw, dg

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..index.build import tokenize_codes_arrow

        n = batch.num_rows
        terms, codes, doc_rel, dls = tokenize_codes_arrow(
            batch.column(self.text_col), "simple", 1, 64, {}
        )
        tc = np.asarray(dls, dtype=np.int64)
        nt = len(terms)
        if len(codes):
            sw_mask, dg_mask = self._term_flags(terms)
            sw = np.bincount(doc_rel[sw_mask[codes]], minlength=n).astype(np.int64)
            dg = np.bincount(doc_rel[dg_mask[codes]], minlength=n).astype(np.int64)
            # distinct (doc, term) pairs; terms are lexicographically
            # sorted, so within a doc the codes slice IS the sorted
            # distinct-token set the fingerprint hashes
            uniq = np.unique(doc_rel * np.int64(nt) + codes)
            ud = (uniq // nt).astype(np.int64)
            uc = (uniq % nt).astype(np.int64)
            dt = np.bincount(ud, minlength=n).astype(np.int64)
        else:
            sw = np.zeros(n, dtype=np.int64)
            dg = np.zeros(n, dtype=np.int64)
            ud = np.empty(0, np.int64)
            uc = np.empty(0, np.int64)
            dt = np.zeros(n, dtype=np.int64)
        term_arr = np.asarray(terms, dtype=object)
        bounds = np.searchsorted(ud, np.arange(n + 1, dtype=np.int64))
        fps = [
            hashlib.md5(" ".join(term_arr[uc[lo:hi]]).encode()).hexdigest()
            for lo, hi in zip(bounds[:-1].tolist(), bounds[1:].tolist())
        ]
        q = quality_score(tc, dg, sw)
        return pa.table(
            {
                "doc_id": batch.column(self.id_col),
                "token_count": pa.array(tc),
                "distinct_tokens": pa.array(dt),
                "stopword_count": pa.array(sw),
                "digit_tokens": pa.array(dg),
                "fingerprint": pa.array(fps, pa.string()),
                "quality": pa.array(q),
            }
        )

    def python_reference(self, batch: pa.Table) -> pa.Table:
        """The original per-doc formulation — kept as the parity oracle
        for the vectorized ``__call__`` (tested equal)."""
        texts = batch.column(self.text_col).to_pylist()
        n = len(texts)
        tc = np.zeros(n, dtype=np.int64)
        dt = np.zeros(n, dtype=np.int64)
        sw = np.zeros(n, dtype=np.int64)
        dg = np.zeros(n, dtype=np.int64)
        fps: list[str] = []
        for i, text in enumerate(texts):
            toks = clipped_tokens(text)
            tc[i] = len(toks)
            uniq = sorted(set(toks))
            dt[i] = len(uniq)
            sw[i] = sum(1 for t in toks if t in _STOPWORDS)
            dg[i] = sum(1 for t in toks if _DIGITS_RE.match(t))
            fps.append(hashlib.md5(" ".join(uniq).encode()).hexdigest())
        q = quality_score(tc, dg, sw)
        return pa.table(
            {
                "doc_id": batch.column(self.id_col),
                "token_count": pa.array(tc),
                "distinct_tokens": pa.array(dt),
                "stopword_count": pa.array(sw),
                "digit_tokens": pa.array(dg),
                "fingerprint": pa.array(fps, pa.string()),
                "quality": pa.array(q),
            }
        )


class LangID:
    """Stopword-hit language identification (map_batches callable).

    CJK codepoints → ``zh``; otherwise the language whose stopword set
    hits the most tokens (ties → lexicographically first language, then
    ``en`` when nothing hits at all).  Output: doc_id, lang, pred_lang.
    """

    def __init__(self, text_col: str = "text", id_col: str = "doc_id",
                 lang_col: str | None = "lang"):
        self.text_col = text_col
        self.id_col = id_col
        self.lang_col = lang_col
        self._langs = sorted(LANG_STOPWORDS)
        self._flag_cache: dict[str, np.ndarray] = {}

    def predict(self, text: str) -> str:
        """Per-doc reference formulation (parity oracle for the
        vectorized ``__call__``; tested equal)."""
        if _CJK_RE.search(text):
            return "zh"
        toks = simple_tokens(text)
        best_lang, best_hits = "en", 0
        for lang in sorted(LANG_STOPWORDS):
            hits = sum(1 for t in toks if t in LANG_STOPWORDS[lang])
            if hits > best_hits:
                best_lang, best_hits = lang, hits
        return best_lang

    def _term_lang_flags(self, terms: list[str]) -> np.ndarray:
        out = np.empty((len(terms), len(self._langs)), dtype=bool)
        cache = self._flag_cache
        for i, t in enumerate(terms):
            f = cache.get(t)
            if f is None:
                f = cache[t] = np.fromiter(
                    (t in LANG_STOPWORDS[lg] for lg in self._langs),
                    dtype=bool, count=len(self._langs),
                )
            out[i] = f
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        """Vectorized: one Arrow tokenize per batch, per-DISTINCT-term
        stopword-set membership flags (memoized), per-language occurrence
        counts via ``bincount``, arg-max in sorted-language order (first
        max wins = the reference's strict-``>`` scan).  Stopwords are all
        shorter than the 64-char clip, so the clipped kernel counts the
        same hits as unclipped ``simple_tokens``."""
        from ..index.build import tokenize_codes_arrow

        text = batch.column(self.text_col)
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        n = batch.num_rows
        cjk = pc.match_substring_regex(text, _CJK_RE.pattern).to_numpy(
            zero_copy_only=False
        )
        terms, codes, doc_rel, _ = tokenize_codes_arrow(text, "simple", 1, 64, {})
        hits = np.zeros((n, len(self._langs)), dtype=np.int64)
        if len(codes):
            masks = self._term_lang_flags(terms)
            for j in range(len(self._langs)):
                sel = masks[codes, j]
                if sel.any():
                    hits[:, j] = np.bincount(doc_rel[sel], minlength=n)
        best = np.argmax(hits, axis=1)
        preds = np.asarray(self._langs, dtype=object)[best]
        preds[hits.max(axis=1) == 0] = "en"
        preds[cjk.astype(bool)] = "zh"
        cols = {"doc_id": batch.column(self.id_col)}
        if self.lang_col and self.lang_col in batch.column_names:
            cols["lang"] = batch.column(self.lang_col)
        cols["pred_lang"] = pa.array(preds.tolist(), pa.string())
        return pa.table(cols)


# GPT-2-style pre-tokenizer pattern, restricted to constructs with
# IDENTICAL semantics in Python re and RE2 (no lookahead, explicit ASCII
# classes) so the DuckDB oracle counts the exact same tokens:
# contractions | space?+letters | space?+digits | space?+punct-run |
# bare apostrophe | whitespace-run
BPE_ISH_PATTERN = (
    r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s']+|'|\s+"
)
_WS_TOKEN_RE = re.compile(r"[^ \t\n\r\f\v]+")


class BPETokenCount:
    """Token counting for budget estimation: whitespace tokens + a
    BPE-ish pre-tokenizer segment count (the standard first stage of
    byte-pair encoders — actual BPE merges are model-specific and priced
    roughly proportional to these segments).

    Output: doc_id, ws_tokens, bpe_tokens."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col
        self._bpe = re.compile(BPE_ISH_PATTERN)

    def __call__(self, batch: pa.Table) -> pa.Table:
        # the pattern is RE2/re-identical by construction (see above), so
        # Arrow's count_substring_regex counts the exact findall segments
        # without materializing a Python str per doc (parity-tested)
        text = batch.column(self.text_col)
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        ws = pc.count_substring_regex(text, _WS_TOKEN_RE.pattern)
        bpe = pc.count_substring_regex(text, BPE_ISH_PATTERN)
        return pa.table(
            {
                "doc_id": batch.column(self.id_col),
                "ws_tokens": pc.cast(ws, pa.int64()),
                "bpe_tokens": pc.cast(bpe, pa.int64()),
            }
        )

    def python_reference(self, batch: pa.Table) -> pa.Table:
        """Per-doc ``re.findall`` formulation (parity oracle; tested)."""
        texts = batch.column(self.text_col).to_pylist()
        ws = np.fromiter(
            (len(_WS_TOKEN_RE.findall(t)) for t in texts),
            dtype=np.int64, count=len(texts),
        )
        bpe = np.fromiter(
            (len(self._bpe.findall(t)) for t in texts),
            dtype=np.int64, count=len(texts),
        )
        return pa.table(
            {
                "doc_id": batch.column(self.id_col),
                "ws_tokens": pa.array(ws),
                "bpe_tokens": pa.array(bpe),
            }
        )


def token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Contract-tokenization token count, appended as a column (one
    Arrow-kernel tokenize; identical to ``len(clipped_tokens(t))``)."""
    from ..index.build import tokenize_codes_arrow

    _, _, _, dls = tokenize_codes_arrow(
        batch.column(text_col), "simple", 1, 64, {}
    )
    return batch.append_column(
        "token_count", pa.array(np.asarray(dls, dtype=np.int64))
    )


def _fold_ngrams(terms, codes, doc_rel, n: int):
    """Shared n-gram composite-code assembly: adjacent token codes fold
    into one int64 composite per gram (base = the batch vocabulary
    size); returns ``(ucomp, pinv, docs, grams)`` — per-batch distinct
    composites, the occurrence→distinct map, each occurrence's doc, and
    the distinct gram STRINGS (Arrow takes + one join kernel; never a
    per-occurrence Python string).  Guards the int64 capacity: ``nt^n``
    past 2^62 would wrap silently and collide distinct grams."""
    nt = np.int64(len(terms))
    if len(codes) < n:
        return None
    if n > 1 and float(nt) ** n > float(1 << 62):
        raise ValueError(
            f"n-gram composite overflow: vocab {int(nt)} at n={n} "
            "exceeds int64 — lower n or shrink the batch")
    same = doc_rel[n - 1:] == doc_rel[:len(doc_rel) - n + 1]
    comp = codes[: len(codes) - n + 1].astype(np.int64).copy()
    for i in range(1, n):
        comp = comp * nt + codes[i: len(codes) - n + 1 + i]
    comp = comp[same]
    docs = doc_rel[: len(doc_rel) - n + 1][same]
    if len(comp) == 0:
        return None
    ucomp, pinv = np.unique(comp, return_inverse=True)
    ta = pa.array(terms) if not isinstance(terms, pa.Array) else terms
    parts = []
    rest = ucomp.copy()
    for _ in range(n):
        parts.append(rest % nt)
        rest //= nt
    cols = [ta.take(pa.array(p)) for p in reversed(parts)]
    grams = pc.binary_join_element_wise(*cols, " ")
    return ucomp, pinv, docs, grams


def top_ngrams(
    ds,
    n: int = 2,
    k: int = 100,
    text_col: str = "text",
    n_buckets: int = 64,
) -> pa.Table:
    """Corpus-wide top-``k`` token ``n``-grams by occurrence count — the
    boilerplate/contamination survey every web-scale text pipeline runs
    before training (C4/RefinedWeb drop documents dominated by the
    corpus's hottest n-grams; decontamination seeds from them).

    Shape: the ``term_stats`` fixed-bucket reduction (SURVEY §2.6's
    pattern) over n-gram COMPOSITE CODES — one Arrow-kernel tokenize
    per batch (the index build's kernel, so the gram vocabulary matches
    the query analyzers and the DuckDB ``_TOKSP`` oracle), adjacent
    codes fold into one int64 composite per gram (no per-token Python,
    no gram strings on the wire until per-batch distinct), then ONE
    exchange over ``n_buckets`` hash buckets with a per-bucket top-k
    cut — exact, because buckets partition the gram space, and the
    driver never sees more than ``n_buckets × k`` rows.

    Returns (ngram, cf, df, rank): cf = total occurrences, df = docs
    containing, ordered (cf desc, df desc, ngram asc), rank 1..k.
    """
    from ..index.build import tokenize_codes_arrow_chunked
    from ..index.global_merge import _term_buckets_vec

    def partial(batch: pa.Table) -> pa.Table:
        terms, codes, doc_rel, _ = tokenize_codes_arrow_chunked(
            batch.column(text_col), "simple", 1, 64, {}
        )
        folded = (
            _fold_ngrams(terms, codes, doc_rel, n)
            if len(terms) else None
        )
        if folded is None:
            return pa.table({
                "ngram": pa.array([], pa.string()),
                "cf": pa.array([], pa.int64()),
                "df": pa.array([], pa.int64()),
                "tb": pa.array([], pa.int32()),
            })
        ucomp, pinv, docs, grams = folded
        cf = np.bincount(pinv, minlength=len(ucomp)).astype(np.int64)
        ud = np.unique(docs.astype(np.int64) * len(ucomp) + pinv)
        df = np.bincount(
            (ud % len(ucomp)).astype(np.int64), minlength=len(ucomp)
        ).astype(np.int64)
        return pa.table({
            "ngram": grams,
            "cf": pa.array(cf),
            "df": pa.array(df),
            "tb": pa.array(
                _term_buckets_vec(grams, n_buckets, "fnv1a64"), pa.int32()
            ),
        })

    def reduce_bucket(g: pa.Table) -> pa.Table:
        enc = g.column("ngram").combine_chunks().dictionary_encode()
        codes = enc.indices.to_numpy()
        nd = len(enc.dictionary)
        cf = np.bincount(
            codes, weights=g.column("cf").to_numpy(), minlength=nd
        ).astype(np.int64)
        df = np.bincount(
            codes, weights=g.column("df").to_numpy(), minlength=nd
        ).astype(np.int64)
        t = pa.table({"ngram": enc.dictionary, "cf": pa.array(cf),
                      "df": pa.array(df)})
        order = pc.sort_indices(
            t, sort_keys=[("cf", "descending"), ("df", "descending"),
                          ("ngram", "ascending")],
        )
        return t.take(order[:k])

    from .dedup import to_arrow  # local import: avoid a module cycle

    agg = to_arrow(
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True)
        .groupby("tb")
        .map_groups(reduce_bucket, batch_format="pyarrow",
                    zero_copy_batch=True)
    )
    order = pc.sort_indices(
        agg, sort_keys=[("cf", "descending"), ("df", "descending"),
                        ("ngram", "ascending")],
    )
    top = agg.take(order[:k])
    return top.append_column(
        "rank", pa.array(np.arange(1, top.num_rows + 1), pa.int64())
    )


def boilerplate_ngram_stats(
    ds,
    n: int = 2,
    k: int = 100,
    keep_millis: int = 300,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> pa.Table:
    """Per-doc boilerplate load against the corpus's hottest ``k``
    n-grams (the C4-style filter composed on
    :func:`top_ngrams`): (doc_id, total_ngrams, hot_ngrams, hot_frac,
    keep) for every doc with ≥1 n-gram, ``keep`` ⇔ hot occurrences ≤
    ``keep_millis``/1000 of the doc's n-grams — the threshold compares
    INTEGERS (``hot·1000 ≤ total·keep_millis``) so the flag is exact;
    ``hot_frac`` is the single int÷int division (bit-stable across
    engines).

    Two phases, both bounded: the survey's one bucketed exchange, then
    the hot set (``k`` strings) broadcast once via ``ray.put`` into a
    streaming membership pass — never a join shuffle.
    """
    import ray as _ray

    top = top_ngrams(ds, n=n, k=k, text_col=text_col)
    hot_ref = _ray.put(set(top.column("ngram").to_pylist()))

    class _HotFrac:
        def __init__(self):
            # once per actor (ST1 pattern); Arrow value_set for the
            # vectorized is_in kernel
            self.hot = pa.array(sorted(_ray.get(hot_ref)), pa.string())

        def __call__(self, batch: pa.Table) -> pa.Table:
            from ..index.build import tokenize_codes_arrow_chunked

            terms, codes, doc_rel, _ = tokenize_codes_arrow_chunked(
                batch.column(text_col), "simple", 1, 64, {}
            )
            ndocs = batch.num_rows
            empty = pa.table({
                "doc_id": pa.array([], pa.int64()),
                "total_ngrams": pa.array([], pa.int64()),
                "hot_ngrams": pa.array([], pa.int64()),
                "hot_frac": pa.array([], pa.float64()),
                "keep": pa.array([], pa.bool_()),
            })
            folded = (
                _fold_ngrams(terms, codes, doc_rel, n)
                if len(terms) else None
            )
            if folded is None:
                return empty
            ucomp, pinv, docs, grams = folded
            is_hot = pc.is_in(grams, value_set=self.hot).to_numpy(
                zero_copy_only=False
            )
            total = np.bincount(docs, minlength=ndocs).astype(np.int64)
            hot = np.bincount(
                docs[is_hot[pinv]], minlength=ndocs
            ).astype(np.int64)
            ids = batch.column(id_col).to_numpy()
            m = total > 0
            return pa.table({
                "doc_id": pa.array(ids[m].astype(np.int64)),
                "total_ngrams": pa.array(total[m]),
                "hot_ngrams": pa.array(hot[m]),
                "hot_frac": pa.array(hot[m] / total[m]),
                "keep": pa.array(
                    hot[m] * 1000 <= total[m] * int(keep_millis)
                ),
            })

    from .dedup import to_arrow

    # autoscaling (1, 4): a fixed pool of 4 would deadlock a
    # 4-cpu session against its own upstream read tasks
    return to_arrow(ds.map_batches(
        _HotFrac, concurrency=(1, 4), batch_format="pyarrow",
        zero_copy_batch=True,
    ))
