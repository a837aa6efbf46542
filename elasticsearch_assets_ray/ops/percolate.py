"""ES percolate: REVERSE search — standing queries registered up front,
incoming documents matched against them (the alerting / routing
primitive; ES stores queries in a percolator field and runs
``percolate`` per doc).

Ray-Data-first shape: a callable CLASS for ``map_batches`` — queries
parse ONCE per actor in ``__init__`` (the stateful-stage pattern), each
batch tokenizes with the Arrow kernel, builds a BATCH-local mini index
(postings + positions over the batch vocabulary), and every standing
query's clause tree evaluates over it with the engines' own sparse
algebra (``search.sqs.eval_tree``).  No shuffle, no state across
batches — a pure streaming stage whose output is (doc, query) match
pairs.

Queries take the full ``query_string`` grammar (search/qs.py):
AND/OR/NOT, phrases (exact + sloppy-ordered at slop 0 only — see
below), prefixes, wildcards, fuzzy (expanded against the BATCH
vocabulary — equivalent for matching: a doc matches iff IT contains a
qualifying term), boosts (ignored — percolation is filter-context),
and ``field:value`` clauses evaluated against the batch's OWN columns
(`lang:de AND urgent` percolates on metadata + text together).

Scale notes: like ES's percolator (which indexes term extractions of
the STANDING queries to skip non-candidates), ``__init__`` builds a
query index — for each query an exact NECESSARY-term set ("no doc can
match unless it contains ≥1 of these terms", None when no such set
exists, e.g. pure-metadata / NOT / wildcard queries) — and each batch
evaluates only queries whose requirement intersects the batch
vocabulary, plus the always-candidates.  Pruning is exact (never drops
a match; forced-off parity test in tests/test_percolate.py), so at
10⁴+ standing queries per-batch work is O(batch tokens × CANDIDATE
clause count).  The stage parallelizes over blocks; corpus size is the
streaming axis.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..analysis.tokenizer import clip_tokens, get_analyzer
from ..index.build import in_doc_positions, invert_codes_pos, tokenize_codes_arrow
from ..search.qs import meta_pred_mask, parse_query_string
from ..search.sqs import eval_tree, rewrite_fuzzy

_POS_BITS = 21


def required_atoms(node) -> frozenset | None:
    """Exact pruning extraction (the ES percolator's query-index idea,
    `extractQueryTerms` + its prefix handling): a frozenset of
    requirement ATOMS — ``("term", t)`` (doc must contain t) or
    ``("prefix", p)`` (doc must contain a term starting with p) — such
    that any matching doc MUST satisfy ≥1 atom; or None when no finite
    exact set exists (metadata / negation / unanchored-wildcard / fuzzy
    leaves can match without any anchorable term).

    For conjunctions the TIGHTEST child set is kept (fewest atoms,
    term atoms over prefix atoms on ties); for disjunctions sets union,
    and one un-extractable child poisons the whole disjunction.  A
    phrase needs every token, so its longest (likeliest-rarest) token
    is a valid single-atom requirement; a wildcard with a literal
    prefix anchors on it.  Exactness invariant: pruning with these
    atoms can never drop a true match."""
    kind = node[0]
    if kind == "term":
        return frozenset((("term", node[1]),))
    if kind == "phrase":
        return frozenset((("term", max(node[1], key=len)),))
    if kind == "prefix":
        return frozenset((("prefix", node[1]),)) if node[1] else None
    if kind == "wildcard":
        wi = min(
            (node[1].index(c) for c in "*?" if c in node[1]),
            default=len(node[1]),
        )
        lit = node[1][:wi]
        return frozenset((("prefix", lit),)) if lit else None
    if kind in ("and", "filter"):
        a, b = required_atoms(node[1]), required_atoms(node[2])
        if a is None:
            return b
        if b is None:
            return a

        def cost(s):
            return (len(s), sum(1 for k, _ in s if k == "prefix"))

        return a if cost(a) <= cost(b) else b
    if kind in ("andnot", "boosting"):
        # the negative side never adds matchable docs
        return required_atoms(node[1])
    if kind == "or":
        a, b = required_atoms(node[1]), required_atoms(node[2])
        if a is None or b is None:
            return None
        return a | b
    if kind in ("dismax", "msm"):
        # dismax matches iff ANY child matches; msm needs ≥ m ≥ 1
        # children, so any match still satisfies ≥1 child — the union
        # of the children's requirements stays a valid necessary set
        out: frozenset = frozenset()
        for c in node[2]:
            if c is None:
                continue
            r = required_atoms(c)
            if r is None:
                return None
            out |= r
        return out
    if kind in ("constscore", "boost"):
        return required_atoms(node[1])
    # fuzzy / fuzzyexp / metaterm / metarange / metaexists — no exact
    # anchorable requirement
    return None


def required_terms(node) -> frozenset | None:
    """Term-only view of :func:`required_atoms` (None when the
    requirement needs prefix atoms or doesn't exist)."""
    atoms = required_atoms(node)
    if atoms is None or any(k != "term" for k, _ in atoms):
        return None
    return frozenset(t for _, t in atoms)


class Percolator:
    """``map_batches`` stage: input batch (text + metadata columns) →
    (id, query) match pairs.  Construct once; Ray pickles it to each
    actor/task, where ``__init__``-compiled trees are reused across
    batches."""

    def __init__(
        self,
        queries: dict[str, str],
        analyzer: str = "simple",
        text_col: str = "text",
        id_col: str = "doc_id",
        min_token_len: int = 1,
        max_token_len: int = 64,
        default_operator: str = "or",
        prune: bool = True,
    ):
        if analyzer not in ("simple", "code"):
            raise ValueError(
                "percolator needs an Arrow-kernel analyzer (simple|code)"
            )
        self.analyzer = analyzer
        self.text_col = text_col
        self.id_col = id_col
        self.clip = (min_token_len, max_token_len)
        fn = get_analyzer(analyzer)

        def analyze(s: str) -> list[str]:
            return clip_tokens(fn(s), *self.clip)

        # a standing query is a Lucene query_string OR a JSON DSL
        # object (incl. the wrapper query) — both compile to the same
        # clause trees, so the mini-index evaluation and the pruning
        # extraction below are shared
        from ..search.dsl import dsl_to_tree

        self.trees = {
            name: (
                dsl_to_tree(q, analyze, text_col)
                if isinstance(q, dict)
                else parse_query_string(
                    q, analyze, default_operator, default_field=text_col
                )
            )
            for name, q in queries.items()
        }
        # standing-query index: term atom → queries, prefix atom →
        # queries, plus the always-candidates (no extractable
        # requirement)
        self.prune = prune
        self._term_to_q: dict[str, list[str]] = {}
        self._prefix_to_q: dict[str, list[str]] = {}
        self._always: list[str] = []
        for name in sorted(self.trees):
            tree = self.trees[name]
            if tree is None:
                continue
            req = required_atoms(tree)
            if req is None:
                self._always.append(name)
                continue
            for kind, v in sorted(req):
                if kind == "term":
                    self._term_to_q.setdefault(v, []).append(name)
                else:
                    self._prefix_to_q.setdefault(v, []).append(name)
        self._ident_cache: dict = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        terms, codes, rel, _dls = tokenize_codes_arrow(
            batch.column(self.text_col), self.analyzer,
            self.clip[0], self.clip[1], self._ident_cache,
        )
        n_docs = batch.num_rows
        pos = in_doc_positions(rel)
        docs_a, tfs_a, offs, posf = invert_codes_pos(
            codes, rel, len(terms), 0, pos
        )
        tidx = {t: i for i, t in enumerate(terms)}
        shift = np.int64(_POS_BITS)
        tfcum = np.concatenate([[0], np.cumsum(tfs_a.astype(np.int64))])

        def term_docs(t: str) -> np.ndarray:
            i = tidx.get(t)
            if i is None:
                return np.empty(0, np.int64)
            return docs_a[offs[i]: offs[i + 1]].astype(np.int64)

        def term_keys(t: str, seq: int) -> np.ndarray:
            i = tidx.get(t)
            if i is None:
                return np.empty(0, np.int64)
            d = docs_a[offs[i]: offs[i + 1]].astype(np.int64)
            tf = tfs_a[offs[i]: offs[i + 1]].astype(np.int64)
            p = posf[tfcum[offs[i]]: tfcum[offs[i + 1]]].astype(np.int64)
            df = np.repeat(d, tf)
            if seq:
                keep = p >= seq
                df, p = df[keep], p[keep]
                p = p - seq
            return (df << shift) | p

        def expand(pred) -> list[str]:
            # dictionary walks against the BATCH vocabulary — equivalent
            # for matching (a doc matches iff it contains a qualifying
            # term, and the batch vocab is exactly the docs' terms)
            return [t for t in terms if pred(t)]

        def ones(ids: np.ndarray):
            return ids, np.ones(len(ids), np.float64)

        def leaf(node):
            kind = node[0]
            if kind == "term":
                return ones(term_docs(node[1]))
            if kind == "phrase":
                toks, slop = node[1], node[2]
                if slop:
                    raise ValueError(
                        "percolator phrases support slop 0 only"
                    )
                cur = term_keys(toks[0], 0)
                for seq, t in enumerate(toks[1:], start=1):
                    if len(cur) == 0:
                        break
                    cur = np.intersect1d(cur, term_keys(t, seq),
                                         assume_unique=True)
                if len(cur) == 0:
                    return ones(np.empty(0, np.int64))
                return ones(np.unique(cur >> shift))
            if kind == "prefix":
                hits = [term_docs(t) for t in expand(
                    lambda t: t.startswith(node[1]))]
                return ones(
                    np.unique(np.concatenate(hits)) if hits
                    else np.empty(0, np.int64)
                )
            if kind == "wildcard":
                import re as _re

                rx = _re.compile("".join(
                    ".*" if c == "*" else "." if c == "?" else _re.escape(c)
                    for c in node[1]) + r"\Z")
                hits = [term_docs(t) for t in expand(rx.match)]
                return ones(
                    np.unique(np.concatenate(hits)) if hits
                    else np.empty(0, np.int64)
                )
            if kind == "fuzzyexp":
                hits = [term_docs(t) for t, _ in node[2]]
                return ones(
                    np.unique(np.concatenate(hits)) if hits
                    else np.empty(0, np.int64)
                )
            if kind in ("metaterm", "metarange", "metaexists"):
                if node[1] not in batch.column_names:
                    return ones(np.empty(0, np.int64))
                from ..search.datehist import _load_meta_values

                vals = _load_meta_values(batch.column(node[1]))
                if kind == "metaterm":
                    pred = ("term", node[2])
                elif kind == "metaexists":
                    pred = ("exists",)
                else:
                    pred = ("range",) + tuple(node[2:])
                return ones(
                    np.nonzero(meta_pred_mask(vals, pred))[0]
                    .astype(np.int64)
                )
            raise ValueError(f"unsupported percolator leaf {kind!r}")

        ids_col = batch.column(self.id_col).to_numpy()
        o_ids, o_q = [], []
        from ..search.engine import fuzzy_expand_sorted

        if self.prune:
            # candidate cut: walk whichever side is smaller — the query
            # index's term set or the batch vocabulary
            cand = set(self._always)
            idx = self._term_to_q
            if len(idx) <= len(tidx):
                for t, qs in idx.items():
                    if t in tidx:
                        cand.update(qs)
            else:
                for t in tidx:
                    qs = idx.get(t)
                    if qs:
                        cand.update(qs)
            if self._prefix_to_q:
                import bisect

                vocab = sorted(terms)
                for p, qs in self._prefix_to_q.items():
                    i = bisect.bisect_left(vocab, p)
                    if i < len(vocab) and vocab[i].startswith(p):
                        cand.update(qs)
            names = sorted(cand)
        else:
            names = sorted(self.trees)
        for name in names:
            tree = self.trees[name]
            if tree is None:
                continue
            tree = rewrite_fuzzy(
                tree,
                lambda base, fz: fuzzy_expand_sorted(terms, base, fz, 0),
            )
            matched, _ = eval_tree(tree, leaf)
            if len(matched):
                o_ids.append(ids_col[matched])
                o_q.extend([name] * len(matched))
        return pa.table({
            self.id_col: pa.array(
                np.concatenate(o_ids) if o_ids
                else np.empty(0, ids_col.dtype)
            ),
            "query": pa.array(o_q, pa.string()),
        })


def percolate(ds, queries: dict[str, str], **kwargs):
    """Dataset → (id, query) match pairs for every registered standing
    query — ``ds.map_batches(Percolator(queries), batch_format="pyarrow")``
    with zero-copy batches; streaming, no shuffle."""
    return ds.map_batches(
        Percolator(queries, **kwargs),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
