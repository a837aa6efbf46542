"""ES ``highlight`` rendering, shared by BOTH serving engines.

The engines differ only in where per-(doc, term) token positions come
from — the doc-partitioned engine asks each hit's owning shard actor
(``ShardData.term_positions_for_doc``); the term-partitioned engine
slices the position spans out of the term fetches it already gathers for
phrase serving — the rendering from (hit, text, positions) to tagged
text + ranked fragments is identical, so it lives here once and parity
is structural.

The reference serves highlight through the ES ``full_response`` envelope
its reader requests (``/root/reference/asset/elasticsearch_reader/reader.js:7-14``).
"""

from __future__ import annotations


def render_highlights(
    hits: list[tuple[int, float]],
    texts: list[str],
    tpos_list: list[dict[str, list[int]] | None],
    idf_of: dict[str, float],
    analyzer: str,
    min_token_len: int,
    max_token_len: int,
    pre_tag: str = "<em>",
    post_tag: str = "</em>",
    fragment_size: int = 100,
    number_of_fragments: int = 5,
) -> list[dict]:
    """Per hit: map matched INDEX positions through the analyzer's
    character-offset map, wrap matched spans (adjacent/overlapping spans
    merge, ES-style), and rank ~``fragment_size``-char windows by the
    Σ-idf fragment score (ES's fragment scorer shape; ties break document
    order).

    Returns [{doc_id, score, highlighted, fragments, n_matches,
    positions}] in ``hits`` order."""
    from ..analysis.tokenizer import tokens_with_offsets

    out = []
    for (doc, score), text, tpos in zip(hits, texts, tpos_list):
        toks = tokens_with_offsets(text, analyzer, min_token_len, max_token_len)
        matched = sorted({p for ps in (tpos or {}).values() for p in ps})
        spans = [(toks[p][1], toks[p][2]) for p in matched if p < len(toks)]
        merged: list[list[int]] = []
        for s, e in spans:
            if merged and s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        pieces, prev = [], 0
        for s, e in merged:
            pieces.extend((text[prev:s], pre_tag, text[s:e], post_tag))
            prev = e
        pieces.append(text[prev:])

        frags: list[str] = []
        if number_of_fragments and merged:
            # per-position idf weight (position → its term's idf)
            pos_w = {
                p: idf_of.get(t, 0.0)
                for t, ps in (tpos or {}).items() for p in ps
            }
            half = max(fragment_size // 2, 1)
            wins: list[list[int]] = []
            for s, e in merged:
                c = (s + e) // 2
                w = [max(0, c - half), min(len(text), c + half)]
                if wins and w[0] <= wins[-1][1]:
                    wins[-1][1] = max(wins[-1][1], w[1])
                else:
                    wins.append(w)
            wscore = []
            for wi, (ws, we) in enumerate(wins):
                sc = sum(
                    pos_w.get(p, 0.0)
                    for p in matched
                    if p < len(toks) and toks[p][1] >= ws and toks[p][2] <= we
                )
                wscore.append((-sc, wi))
            wscore.sort()
            for _, wi in wscore[:number_of_fragments]:
                ws, we = wins[wi]
                fp, fprev = [], ws
                for s, e in merged:
                    if e <= ws or s >= we:
                        continue
                    s2, e2 = max(s, ws), min(e, we)
                    fp.extend((text[fprev:s2], pre_tag, text[s2:e2], post_tag))
                    fprev = e2
                fp.append(text[fprev:we])
                frags.append("".join(fp))
        out.append(
            {
                "doc_id": doc,
                "score": score,
                "highlighted": "".join(pieces),
                "fragments": frags,
                "n_matches": len(matched),
                "positions": tpos or {},
            }
        )
    return out
