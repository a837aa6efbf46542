"""Duplicate-cluster resolution: distributed connected components over
near-duplicate PAIR output.

Every near-dup generator in :mod:`.dedup` / :mod:`.similarity` emits
*pairs* ``(doc_a, doc_b)``.  Deduplicating a corpus needs the
transitive closure of those pairs — the duplicate CLUSTERS — plus a
canonical representative per cluster (keep the min doc id, drop the
rest), because near-duplication is not transitive: A~B and B~C does
not imply the generator emitted A~C, yet keeping one of {A, B, C} is
the policy a training-data pipeline wants.

The algorithm is hash-to-min label propagation (the MapReduce
connected-components family, e.g. Rastogi et al., "Finding Connected
Components in Map-Reduce in Logarithmic Rounds"): every node starts
labeled with itself; each round every node sends its current label
along its edges and adopts the minimum label it hears.  Convergence
takes O(component diameter) rounds — duplicate clusters are shallow
(near-clique), so 2–4 rounds in practice, with ``max_rounds`` as the
adversarial-chain guard.

Scale shape: no per-node groupby ever happens.  Each round is two
fixed-``N_CC_BUCKETS`` exchanges (the repo's bucketed-reduction
pattern — see DEVNOTES: per-key groupbys are pathological at high key
cardinality): (1) co-partition half-edges with the label table by
SENDING node and attach labels vectorized (one argsort + searchsorted
per bucket), (2) co-partition the emitted messages by RECEIVING node
and take per-node minima with ``np.minimum.reduceat``.  Driver state
is O(1) — only the per-round changed-label count crosses to the
driver; labels and edges live in the object store as Datasets
throughout, so a billion-node pair graph streams like everything
else.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from . import to_arrow

N_CC_BUCKETS = 64

_SCHEMA = {
    "node": pa.int64(),
    "other": pa.int64(),
    "label": pa.int64(),
    "kind": pa.int8(),  # 0 = label row, 1 = half-edge row
}

_KIND_LABEL = 0
_KIND_EDGE = 1


def _tagged(node, other, label, kind) -> pa.Table:
    return pa.table(
        {
            "node": pa.array(node, pa.int64()),
            "other": pa.array(other, pa.int64()),
            "label": pa.array(label, pa.int64()),
            "kind": pa.array(kind, pa.int8()),
        }
    )


def _add_node_bucket(b: pa.Table) -> pa.Table:
    n = b.column("node").to_numpy()
    return b.append_column(
        "bucket", pa.array((n % N_CC_BUCKETS).astype(np.int32))
    )


def _half_edges(a_col: str, b_col: str):
    def halves(b: pa.Table) -> pa.Table:
        a = b.column(a_col).to_numpy().astype(np.int64)
        bb = b.column(b_col).to_numpy().astype(np.int64)
        n = np.concatenate([a, bb])
        o = np.concatenate([bb, a])
        z = np.zeros(len(n), np.int64)
        return _tagged(n, o, z, np.full(len(n), _KIND_EDGE, np.int8))

    return halves


def _init_labels(g: pa.Table) -> pa.Table:
    nodes = np.unique(g.column("node").to_numpy())
    return _tagged(nodes, np.zeros(len(nodes), np.int64), nodes,
                   np.full(len(nodes), _KIND_LABEL, np.int8))


def _send(g: pa.Table) -> pa.Table:
    """Exchange-A kernel: attach each half-edge's SENDING-node label,
    emit (receiver, candidate-label) messages + the identity rows."""
    kind = g.column("kind").to_numpy()
    node = g.column("node").to_numpy()
    other = g.column("other").to_numpy()
    label = g.column("label").to_numpy()
    lm = kind == _KIND_LABEL
    nl, ll = node[lm], label[lm]
    order = np.argsort(nl, kind="stable")
    nl, ll = nl[order], ll[order]
    ne, oe = node[~lm], other[~lm]
    # every edge endpoint has a label row in the SAME bucket (identical
    # bucketing function) — searchsorted is a total lookup
    lbl_e = ll[np.searchsorted(nl, ne)]
    out_node = np.concatenate([oe, nl])
    out_label = np.concatenate([lbl_e, ll])
    out_kind = np.concatenate(
        [np.full(len(oe), _KIND_EDGE, np.int8),
         np.full(len(nl), _KIND_LABEL, np.int8)]
    )
    return _tagged(out_node, np.zeros(len(out_node), np.int64),
                   out_label, out_kind)


def _reduce_min(g: pa.Table) -> pa.Table:
    """Exchange-B kernel: per receiving node, adopt the min of (own
    label, heard labels); carry a ``changed`` flag for the convergence
    aggregate."""
    node = g.column("node").to_numpy()
    label = g.column("label").to_numpy()
    kind = g.column("kind").to_numpy()
    order = np.lexsort((label, node))
    node, label, kind = node[order], label[order], kind[order]
    starts = np.flatnonzero(np.concatenate([[True], node[1:] != node[:-1]]))
    uniq = node[starts]
    newlab = np.minimum.reduceat(label, starts)
    # exactly one identity row per node (the label table is keyed by
    # node) — its label is the OLD value
    old = np.full(len(uniq), np.iinfo(np.int64).max, np.int64)
    lm = kind == _KIND_LABEL
    idx = np.searchsorted(uniq, node[lm])
    old[idx] = label[lm]
    return pa.table(
        {
            "node": pa.array(uniq, pa.int64()),
            "label": pa.array(newlab, pa.int64()),
            "changed": pa.array((newlab < old).astype(np.int64)),
        }
    )


def connected_components(
    pairs,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_rounds: int = 64,
):
    """Pairs → per-node component labels (min node id in the component).

    ``pairs`` is a :class:`pyarrow.Table` or Ray Dataset with two id
    columns.  Returns a Dataset of ``(node, label)`` covering every
    node that appears in a pair (untouched docs are trivially their own
    component — callers union with identity if they need total
    coverage).  Raises if ``max_rounds`` exchanges don't converge (a
    component with diameter > max_rounds — not a duplicate cluster)."""
    if isinstance(pairs, pa.Table):
        pairs = rd.from_arrow(pairs)
    half = pairs.map_batches(
        _half_edges(a_col, b_col), batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()
    labels = (
        half.map_batches(_add_node_bucket, batch_format="pyarrow",
                         zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(_init_labels, batch_format="pyarrow", zero_copy_batch=True)
        .materialize()
    )
    for _ in range(max_rounds):
        def relabel(b: pa.Table) -> pa.Table:
            return _tagged(
                b.column("node").to_numpy(),
                np.zeros(b.num_rows, np.int64),
                b.column("label").to_numpy(),
                np.full(b.num_rows, _KIND_LABEL, np.int8),
            )

        tagged_labels = labels.map_batches(
            relabel, batch_format="pyarrow", zero_copy_batch=True
        )
        nxt = (
            half.union(tagged_labels)
            .map_batches(_add_node_bucket, batch_format="pyarrow",
                         zero_copy_batch=True)
            .groupby("bucket")
            .map_groups(_send, batch_format="pyarrow", zero_copy_batch=True)
            .map_batches(_add_node_bucket, batch_format="pyarrow",
                         zero_copy_batch=True)
            .groupby("bucket")
            .map_groups(_reduce_min, batch_format="pyarrow",
                        zero_copy_batch=True)
            .materialize()
        )
        changed = nxt.sum("changed") or 0
        labels = nxt.drop_columns(["changed"]).materialize()
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_rounds} rounds "
        "(component diameter exceeds max_rounds)"
    )


def dedup_clusters(
    pairs,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_rounds: int = 64,
) -> pa.Table:
    """Pairs → ``(doc_id, component_id, cluster_size, keep)``: the
    duplicate clusters with the keep-the-min-id canonical policy.  One
    extra fixed-bucket exchange keyed by LABEL computes sizes co-located
    with members (no driver-side join).  Returns an arrow Table (output
    is pair-graph-sized, not corpus-sized); use
    :func:`connected_components` directly for a streaming Dataset."""
    labels = connected_components(pairs, a_col, b_col, max_rounds)
    if labels.count() == 0:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "component_id": pa.array([], pa.int64()),
                "cluster_size": pa.array([], pa.int64()),
                "keep": pa.array([], pa.bool_()),
            }
        )

    def add_label_bucket(b: pa.Table) -> pa.Table:
        lab = b.column("label").to_numpy()
        return b.append_column(
            "bucket", pa.array((lab % N_CC_BUCKETS).astype(np.int32))
        )

    def finish(g: pa.Table) -> pa.Table:
        node = g.column("node").to_numpy()
        lab = g.column("label").to_numpy()
        order = np.argsort(lab, kind="stable")
        node, lab = node[order], lab[order]
        starts = np.flatnonzero(np.concatenate([[True], lab[1:] != lab[:-1]]))
        counts = np.diff(np.concatenate([starts, [len(lab)]]))
        size = np.repeat(counts, counts)
        return pa.table(
            {
                "doc_id": pa.array(node, pa.int64()),
                "component_id": pa.array(lab, pa.int64()),
                "cluster_size": pa.array(size.astype(np.int64)),
                "keep": pa.array(node == lab),
            }
        )

    return to_arrow(
        labels.map_batches(add_label_bucket, batch_format="pyarrow",
                           zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(finish, batch_format="pyarrow", zero_copy_batch=True)
    )
