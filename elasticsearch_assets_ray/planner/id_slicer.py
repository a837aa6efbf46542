"""Id-prefix keyspace partitioning (adaptive radix descent).

Behavioral port of ``/root/reference/asset/id_reader/id_slicer.js``:

* P6 prefix-tree descent — count per prefix; ``> size`` → descend one char;
  ``== 0`` → prune the subtree  (id_slicer.js:83-99, 107-152)
* ``starting_key_depth`` — begin the walk at depth k  (id_slicer.js:118-132)
* P7 divideKeyArray — round-robin the alphabet among N planners; planner
  count capped at the alphabet size  (id_slicer.js:154-169,
  ``asset/id_reader/index.js:108-126``)
* resume — fast-forward the walk past the last completed prefix
  (id_slicer.js:178-199, 233-255)

In our engine this is how a hot partition re-splits by a secondary key
(the reference's subslice-by-key, and the doc-range salting ancestor —
SURVEY.md §2.3).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from dataclasses import dataclass

# reference alphabets (id_slicer.js:9-19)
BASE64URL = (
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789-_"
)
BASE64 = BASE64URL[:-2] + "+/"
HEXADECIMAL = "0123456789abcdef"
HEXADECIMAL_UPPER = "0123456789ABCDEF"

# planner-count caps per key type (id_reader/index.js:115-125)
MAX_SLICERS = {
    "hexadecimal": 16,
    "hexadecimal_upper": 16,
    "base64url": 64,
    "base64": 64,
}
ALPHABETS = {
    "hexadecimal": HEXADECIMAL,
    "hexadecimal_upper": HEXADECIMAL_UPPER,
    "base64url": BASE64URL,
    "base64": BASE64,
}


@dataclass(frozen=True)
class KeySlice:
    key: str  # prefix, e.g. "a3" — matches ids starting with it
    count: int
    # True → the slice covers ids EXACTLY equal to ``key`` (the residual
    # emitted when a subtree splits: children only cover LONGER ids, so
    # an id equal to the split prefix would otherwise be lost)
    exact: bool = False


def divide_key_array(keys: list[str], n: int) -> list[list[str]]:
    """P7: round-robin chunk the alphabet among n planners."""
    if n < 1:
        raise ValueError("n must be >= 1")
    out: list[list[str]] = [[] for _ in range(n)]
    for i, k in enumerate(keys):
        out[i % n].append(k)
    return [g for g in out if g]


def validate_slicer_count(key_type: str, slicers: int) -> None:
    cap = MAX_SLICERS.get(key_type)
    if cap is None:
        raise ValueError(f"unknown key_type {key_type!r}")
    if slicers > cap:
        raise ValueError(
            f"{slicers} slicers exceed the {key_type} cap of {cap} "
            "(one planner per alphabet character maximum)"
        )


class IdSlicer:
    """DFS over the id-prefix tree, emitting prefixes holding <= size ids.

    ``count_fn(prefix) -> int`` is the reference's wildcard count probe
    (``type#prefix*``, id_slicer.js:65,78).
    """

    def __init__(
        self,
        count_fn: Callable[[str], int],
        size: int,
        key_type: str = "base64url",
        key_range: list[str] | None = None,
        starting_key_depth: int = 0,
        max_depth: int = 16,
    ):
        alphabet = ALPHABETS[key_type]
        if key_range is not None:
            bad = [k for k in key_range if any(c not in alphabet for c in k)]
            if bad:
                raise ValueError(
                    f"key_range entries {bad} outside the {key_type} alphabet"
                )  # id_slicer.js:226-229
        self.count_fn = count_fn
        self.size = size
        self.alphabet = alphabet
        self.roots = list(key_range) if key_range is not None else list(alphabet)
        self.starting_key_depth = starting_key_depth
        self.max_depth = max_depth

    def _expand(self, prefix: str, depth: int,
                count: int | None = None,
                skip_target: tuple | None = None,
                order: dict | None = None) -> Iterator[KeySlice]:
        if skip_target is not None:
            # resume pruning: a subtree whose prefix sorts strictly before
            # the checkpoint's same-length head can only yield completed
            # leaves — skip it WITHOUT paying its count probes
            tp = tuple(order[c] for c in prefix)
            k = min(len(tp), len(skip_target))
            if tp[:k] < skip_target[:k]:
                return
        if count is None:
            count = self.count_fn(prefix)
        if count == 0:
            return  # prune subtree (closePath)
        if count <= self.size and depth >= self.starting_key_depth:
            yield KeySlice(prefix, count)
            return
        if depth >= self.max_depth:
            yield KeySlice(prefix, count)  # floor: emit oversized leaf
            return
        # probe the children first: ids EXACTLY equal to ``prefix`` match
        # no child, so the residual gets its own exact slice (otherwise a
        # variable-length id space silently loses rows on every split)
        child_counts = [(ch, self.count_fn(prefix + ch)) for ch in self.alphabet]
        residual = count - sum(c for _, c in child_counts)
        if residual > 0:
            yield KeySlice(prefix, residual, exact=True)
        for ch, c in child_counts:
            yield from self._expand(prefix + ch, depth + 1, c, skip_target, order)

    def slices(self, resume_after: str | None = None) -> Iterator[KeySlice]:
        """Yield key slices; ``resume_after`` skips every prefix that sorts
        at-or-before the last completed one (generator fast-forward,
        id_slicer.js:178-199) — completed subtrees are pruned without
        re-paying their count probes."""
        order = {c: i for i, c in enumerate(self.alphabet)}
        if resume_after is None:
            yield from (
                s for root in self.roots for s in self._expand(root, 1)
            )
            return
        bad = [c for c in resume_after if c not in order]
        if bad:
            raise ValueError(
                f"resume_after {resume_after!r} contains characters {bad} "
                "outside the alphabet — was the checkpoint written by a "
                "slicer with a different key_type?"
            )
        # deterministic replay yields the identical leaf sequence, so resume
        # = drop every leaf at-or-before the checkpoint in alphabet-rank
        # order (tuple compare handles differing depths)
        target = tuple(order[c] for c in resume_after)
        it = (
            s
            for root in self.roots
            for s in self._expand(root, 1, None, target, order)
        )
        for s in it:
            if tuple(order[c] for c in s.key) <= target:
                continue
            yield s


def prefix_count_fn_from_keys(keys: list[str]) -> Callable[[str], int]:
    """Exact prefix-count provider over an in-memory key list (test scale)."""
    srt = sorted(keys)
    import bisect

    def count(prefix: str) -> int:
        lo = bisect.bisect_left(srt, prefix)
        hi = bisect.bisect_left(srt, prefix + "￿")
        return hi - lo

    return count
