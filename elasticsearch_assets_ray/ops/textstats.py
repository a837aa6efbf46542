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
    """

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
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

    def predict(self, text: str) -> str:
        if _CJK_RE.search(text):
            return "zh"
        toks = simple_tokens(text)
        best_lang, best_hits = "en", 0
        for lang in sorted(LANG_STOPWORDS):
            hits = sum(1 for t in toks if t in LANG_STOPWORDS[lang])
            if hits > best_hits:
                best_lang, best_hits = lang, hits
        return best_lang

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        preds = [self.predict(t) for t in texts]
        cols = {"doc_id": batch.column(self.id_col)}
        if self.lang_col and self.lang_col in batch.column_names:
            cols["lang"] = batch.column(self.lang_col)
        cols["pred_lang"] = pa.array(preds, pa.string())
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
    """Cheap whitespace+regex token counting, appended as a column."""
    counts = np.fromiter(
        (len(clipped_tokens(t)) for t in batch.column(text_col).to_pylist()),
        dtype=np.int64,
        count=batch.num_rows,
    )
    return batch.append_column("token_count", pa.array(counts))
