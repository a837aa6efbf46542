"""PII scrubbing for training-data curation: regex redaction of
emails / IPv4 addresses / phone-like digit runs / generic numbers, as
a stateless ``map_batches`` stage (no shuffle — pure per-document).

All patterns are RE2-compatible (no lookaround): Arrow's
``replace_substring_regex`` / ``count_substring_regex`` and DuckDB's
``regexp_replace(…, 'g')`` / ``regexp_extract_all`` both run RE2, so
the DuckDB oracle in pipelines/contract.py reproduces the chain
bit-for-bit.  Categories apply IN ORDER, each counting matches in (and
replacing within) the output of the previous category — order matters
(an email's digits must not double-count as numbers), and the
sentinels contain no digits so later patterns never re-match earlier
redactions.

Reference scope note: the reference engine forwards documents to ES
verbatim (/root/reference/asset/elasticsearch_bulk/index.js); content
scrubbing is outside its scope — this operator belongs to the repo's
training-data-pipeline surface.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# (category, RE2 pattern, sentinel) — applied in order
DEFAULT_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
     "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d[\d()\-\s.]{6,}\d", "<PHONE>"),
    ("number", r"\d+", "<NUM>"),
]


class PIIRedactor:
    """``map_batches`` stage: (id, text) → (id, text redacted,
    n_<category> match counts).  Patterns compile once per actor in
    ``__init__`` (validated through a probe call); each batch is a
    chain of vectorized RE2 kernels — no per-row Python."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id",
                 patterns: list[tuple[str, str, str]] | None = None):
        self.text_col = text_col
        self.id_col = id_col
        self.patterns = list(patterns or DEFAULT_PATTERNS)
        probe = pa.array(["x"], pa.string())
        for _name, pat, _rep in self.patterns:
            pc.count_substring_regex(probe, pat)  # raises on bad RE2

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch.column(self.text_col)
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        cols: dict = {self.id_col: batch.column(self.id_col)}
        for name, pat, rep in self.patterns:
            cols[f"n_{name}"] = pc.count_substring_regex(text, pat).cast(
                pa.int64()
            )
            text = pc.replace_substring_regex(text, pat, rep)
        cols[self.text_col] = text
        return pa.table(cols)


def pii_redact(ds, text_col: str = "text", id_col: str = "doc_id",
               patterns: list[tuple[str, str, str]] | None = None):
    """Dataset → redacted text + per-category match counts (streaming,
    zero-copy Arrow batches, no shuffle)."""
    return ds.map_batches(
        PIIRedactor(text_col, id_col, patterns),
        batch_format="pyarrow", zero_copy_batch=True,
    )
