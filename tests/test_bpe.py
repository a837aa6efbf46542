"""BPE induction (ops/bpe.py): merge learning vs a naive recount-all
reference, deterministic ties, encoder parity, and the Ray stage."""
import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from elasticsearch_assets_ray.ops.bpe import (
    _word_symbols,
    bpe_token_counts,
    encode_word,
    learn_bpe,
)


def naive_learn_bpe(word_counts, num_merges):
    """Recount-every-round reference (the textbook formulation)."""
    vocab = {w: list(_word_symbols(w)) for w in word_counts}
    merges = []
    for _ in range(num_merges):
        pc = {}
        for w, syms in vocab.items():
            c = word_counts[w]
            for p in zip(syms, syms[1:]):
                pc[p] = pc.get(p, 0) + c
        cands = [(c, p) for p, c in pc.items() if c >= 2]
        if not cands:
            break
        best = min(cands, key=lambda cp: (-cp[0], cp[1]))[1]
        merges.append(best)
        j = best[0] + best[1]
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == best[0]
                        and syms[i + 1] == best[1]):
                    out.append(j)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges


WC = {
    "low": 5, "lower": 2, "lowest": 6, "newer": 6, "wider": 3,
    "new": 2, "widest": 1, "slow": 4, "slower": 2, "glow": 1,
}


def test_learn_matches_naive_reference():
    for k in (1, 3, 8, 20, 60):
        assert learn_bpe(dict(WC), k) == naive_learn_bpe(dict(WC), k), k


def test_learning_is_deterministic_and_stops():
    a = learn_bpe(dict(WC), 500)
    b = learn_bpe(dict(WC), 500)
    assert a == b
    # stops before 500: vocabulary is tiny
    assert len(a) < 500
    # tie-break is lexicographic at equal count: check one known tie
    m1 = learn_bpe({"ab": 2, "cb": 2}, 1)
    assert m1 == [("a", "b</w>")]  # ('a','b</w>') < ('c','b</w>')


def test_encode_word_walk():
    merges = learn_bpe(dict(WC), 60)
    ranks = {p: i for i, p in enumerate(merges)}
    # a trained word encodes to few symbols; an unseen word falls back
    # toward characters but reuses learned subunits
    assert len(encode_word("lowest", ranks)) <= 2
    assert encode_word("zzz", ranks) == ["z", "z", "z</w>"]
    # apply-parity: replaying merges in rank order equals the greedy walk
    for w in list(WC) + ["lowers", "newest", "q"]:
        syms = list(_word_symbols(w))
        for l, r in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        assert encode_word(w, ranks) == syms, w


def test_bpe_stage_counts():
    docs = ["low lower lowest", "newer new wider", "slow glow slower",
            ""]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array(docs, pa.string()),
    }))
    out = bpe_token_counts(ds, num_merges=40).to_pandas().set_index(
        "doc_id")
    from elasticsearch_assets_ray.ops.bpe import learn_bpe_from_dataset

    merges = learn_bpe_from_dataset(ds, 40)
    ranks = {p: i for i, p in enumerate(merges)}
    for i, d in enumerate(docs):
        words = d.split()
        assert out.loc[i, "word_count"] == len(words)
        assert out.loc[i, "bpe_tokens"] == sum(
            len(encode_word(w, ranks)) for w in words)
        assert out.loc[i, "char_symbols"] == sum(len(w) for w in words)
    # merges compress: fewer bpe tokens than characters on trained text
    assert (out["bpe_tokens"][:3] < out["char_symbols"][:3]).all()
