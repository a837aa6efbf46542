"""Lucene-exact sloppy-phrase matching (``match_phrase`` with ``slop``).

Semantics (Lucene's SloppyPhraseMatcher, implemented from the published
algorithm description — positions are compared as EFFECTIVE positions
``pos - slot_offset``):

* the matcher walks a priority queue of per-slot position iterators in
  effective-position order, repeatedly advancing the minimum; every time
  the minimum overtakes the queue head, the current alignment's
  ``matchLength = max(eff) - min(eff)`` is emitted as one match when
  ``matchLength <= slop``;
* each match contributes ``sloppyFreq = 1 / (1 + matchLength)`` to the
  phrase frequency — so tf is a FLOAT, exact matches weigh 1.0, and a
  maximally-slopped match weighs 1/(1+slop);
* terms may match in ANY order within the slop budget (a reordering of
  adjacent terms costs 2 moves, matching ES docs: "foo bar" with slop 2
  matches "bar foo").

This module is the single implementation both serving engines share (so
cross-engine parity is structural); :func:`sloppy_freq_reference` is an
intentionally naive, heap-free transcription used ONLY by tests as the
independent parity oracle — the semantics are not SQL-expressible, which
is why this surface is parity-tested instead of DuckDB-oracled
(SURVEY.md §8 documents the ordered/greedy form as the SQL-reproducible
sibling).

Phrases with REPEATED terms route to
:func:`lucene_sloppy_freq_repeats` — Lucene's collision machine (slots
of a repeat group must occupy distinct token positions; the lesser
phrase position advances on a collision).  Multi-term repeat SLOTS
(a repeated term among a slot's alternatives — the
match_phrase_prefix / MultiPhraseQuery shape) use Lucene's separate
multi-term machinery: repeat groups come from TERM-CONNECTIVITY
(slots whose repeating-term sets transitively intersect form one
group, Lucene's ``unionTermGroups``) and initialization resolves
collisions with the collide-loop of ``advanceRepeatGroups`` instead
of the fixed per-rank advance.  :func:`repeat_plan` computes both the
groups and which machinery applies.
"""

from __future__ import annotations

import heapq

import numpy as np


def check_no_repeats(terms_per_slot: list) -> None:
    """Reject phrases where one term occupies two slots (callers that
    can't route repeats; the engines now route single-term repeats to
    :func:`repeat_groups_of` + the repeats matcher instead)."""
    seen: set[str] = set()
    for alts in terms_per_slot:
        for t in [alts] if isinstance(alts, str) else alts:
            if t in seen:
                raise ValueError(
                    "lucene slop mode does not support repeated phrase "
                    f"terms ({t!r} occupies two slots); use the ordered "
                    "mode (slop_mode='ordered') for repeating phrases"
                )
            seen.add(t)


def repeat_plan(terms_per_slot: list) -> tuple[list[list[int]], bool]:
    """``(repeat_groups, multi_term)`` for Lucene sloppy matching.

    ``multi_term`` mirrors Lucene's ``hasMultiTermRpts`` (ANY slot has
    more than one alternative term) and selects BOTH the grouping rule
    and the matcher's init:

    * single-term (``multi_term=False``): slots sharing their term form
      one group (their matched token positions must be DISTINCT) —
      groups are disjoint by construction;
    * multi-term: Lucene's ``gatherRptGroups`` complex branch — a term
      repeats when it appears in ≥2 slots' alternative lists, and
      slots whose repeating-term sets TRANSITIVELY intersect form one
      group (``unionTermGroups``: keep or-ing overlapping sets until a
      fixpoint).  A slot with no repeating term joins no group.

    Groups list slot indices ascending (Lucene sorts each group by
    query offset to assign ``rptInd``)."""
    slots = [[a] if isinstance(a, str) else list(a) for a in terms_per_slot]
    multi = any(len(s) > 1 for s in slots)
    cnt: dict[str, int] = {}
    for s in slots:
        for t in set(s):
            cnt[t] = cnt.get(t, 0) + 1
    rpt_terms = {t for t, c in cnt.items() if c >= 2}
    if not rpt_terms:
        return [], multi
    if not multi:
        by_term: dict[str, list[int]] = {}
        for i, s in enumerate(slots):
            if s[0] in rpt_terms:
                by_term.setdefault(s[0], []).append(i)
        return [v for v in by_term.values() if len(v) > 1], False
    # multi-term machinery: union-find by term connectivity.  Each
    # entry is [repeating-term set, slot list]; or-merge entries whose
    # term sets intersect until no pair does (Lucene re-scans from the
    # merged entry exactly like this incr-loop).
    bb: list[list] = []
    for i, s in enumerate(slots):
        ts = {t for t in s if t in rpt_terms}
        if ts:
            bb.append([ts, [i]])
    i = 0
    while i < len(bb) - 1:
        incr = 1
        j = i + 1
        while j < len(bb):
            if bb[i][0] & bb[j][0]:
                bb[i][0] |= bb[j][0]
                bb[i][1] += bb[j][1]
                del bb[j]
                incr = 0
            else:
                j += 1
        i += incr
    return [sorted(e[1]) for e in bb if len(e[1]) > 1], True


def repeat_groups_of(terms_per_slot: list) -> list[list[int]]:
    """Back-compat accessor: the groups half of :func:`repeat_plan`
    (callers that also need the init mode use :func:`repeat_plan`)."""
    return repeat_plan(terms_per_slot)[0]


def lucene_sloppy_freq_repeats(
    slot_positions: list[np.ndarray],
    slop: int,
    repeat_groups: list[list[int]],
    multi_term: bool = False,
) -> float:
    """Sloppy phrase frequency of ONE document for phrases with REPEATED
    terms — Lucene's SloppyPhraseMatcher collision handling, transcribed
    from the published algorithm: slots of the same repeat group may
    never occupy the same TOKEN position (``tpPos = eff + offset``); on
    a collision the LESSER phrase position (by ``(eff, offset)``)
    advances, repeatedly, until the group is collision-free — at init
    and after every main-loop advance.  Emission and the
    ``1/(1+matchLength)`` weighting are the standard matcher's.

    The runner-up bound (``next``) deliberately stays STALE across
    collision advances — the published algorithm refreshes it only at
    emission boundaries, and that staleness is load-bearing: an advance
    whose collision pass pushed the runner-up forward still emits the
    pre-advance alignment against the OLD bound (e.g. "a a" over
    "a a a" yields two matches precisely because of it).

    ``multi_term``: Lucene's ``hasMultiTermRpts`` init
    (``advanceRepeatGroups``, complex branch) — per group, scan slots
    in rptInd order resolving collisions by advancing the LESSER of
    the colliding pair (restarting the scan position when an
    earlier-rank slot advanced), instead of the single-term per-slot
    resolution.  Slot positions are the slots' alternative-term
    position UNIONS (the callers union before calling); the main loop
    is shared by both modes, exactly as in Lucene.
    """
    nslots = len(slot_positions)
    if any(len(p) == 0 for p in slot_positions):
        return 0.0
    effs = [np.asarray(p, dtype=np.int64) - i
            for i, p in enumerate(slot_positions)]
    if nslots == 1:
        return float(len(effs[0]))
    group_of = {}
    for g in repeat_groups:
        for i in g:
            group_of[i] = g
    ii = [0] * nslots
    cur = [int(e[0]) for e in effs]
    end = max(cur)

    def tp(i: int) -> int:
        return cur[i] + i

    def collide(i: int) -> int | None:
        for j in group_of.get(i, ()):
            if j != i and tp(j) == tp(i):
                return j
        return None

    def advance(i: int) -> bool:
        nonlocal end
        ii[i] += 1
        if ii[i] >= len(effs[i]):
            return False
        cur[i] = int(effs[i][ii[i]])
        if cur[i] > end:
            end = cur[i]
        return True

    def advance_rpts(i: int) -> bool:
        """Resolve collisions of slot ``i``'s group by advancing the
        lesser of each colliding pair (False ⇔ a needed slot ran dry)."""
        if i not in group_of:
            return True
        while (j := collide(i)) is not None:
            a = i if (cur[i], i) < (cur[j], j) else j
            if not advance(a):
                return False
            i = a
        return True

    if multi_term:
        # init: Lucene advanceRepeatGroups, hasMultiTermRpts branch —
        # scan each group in rptInd order; on a collision advance the
        # lesser pp (NOT following the advanced one: the probe stays
        # g[i]); when the advanced pp ranks EARLIER in the group,
        # re-scan from the same rank (Lucene's incr=0)
        for g in repeat_groups:
            ind = {s: x for x, s in enumerate(g)}
            gi = 0
            while gi < len(g):
                incr = 1
                pp = g[gi]
                while (j := collide(pp)) is not None:
                    a = pp if (cur[pp], pp) < (cur[j], j) else j
                    if not advance(a):
                        return 0.0
                    if ind[a] < gi:
                        incr = 0
                        break
                gi += incr
    else:
        # init: place fronts, then fix collisions slot-ascending
        for i in range(nslots):
            if not advance_rpts(i):
                return 0.0

    def min_slot() -> int:
        m = 0
        for s in range(1, nslots):
            if (cur[s], s) < (cur[m], m):
                m = s
        return m

    freq = 0.0
    ms = min_slot()
    match_length = end - cur[ms]
    next_eff = min(cur[s] for s in range(nslots) if s != ms)
    while True:
        if not advance(ms):
            break
        if not advance_rpts(ms):
            break
        if cur[ms] > next_eff:
            if match_length <= slop:
                freq += 1.0 / (1 + match_length)
            ms = min_slot()
            next_eff = min(cur[s] for s in range(nslots) if s != ms)
            match_length = end - cur[ms]
        else:
            ml2 = end - cur[ms]
            if ml2 < match_length:
                match_length = ml2
    if match_length <= slop:
        freq += 1.0 / (1 + match_length)
    return freq


def lucene_sloppy_freq(slot_positions: list[np.ndarray], slop: int) -> float:
    """Phrase frequency of ONE document: Σ 1/(1+matchLength) over the
    matcher's alignments.  ``slot_positions[i]`` = sorted in-doc token
    positions of phrase slot ``i`` (alternatives already unioned);
    returns 0.0 when any slot is absent."""
    nslots = len(slot_positions)
    effs: list[np.ndarray] = []
    heap: list[tuple[int, int]] = []
    idx = [0] * nslots
    end = None
    for i, pos in enumerate(slot_positions):
        if len(pos) == 0:
            return 0.0
        e = np.asarray(pos, dtype=np.int64) - i
        effs.append(e)
        first = int(e[0])
        heapq.heappush(heap, (first, i))
        end = first if end is None else max(end, first)
    freq = 0.0
    cur_eff, cur_slot = heapq.heappop(heap)
    match_length = end - cur_eff
    # single-slot phrase: every position is one exact match
    if not heap:
        return float(len(effs[0]))
    next_eff = heap[0][0]
    while True:
        idx[cur_slot] += 1
        if idx[cur_slot] >= len(effs[cur_slot]):
            break
        new_eff = int(effs[cur_slot][idx[cur_slot]])
        if new_eff > end:
            end = new_eff
        if new_eff > next_eff:
            # the minimum overtook the queue head: the current alignment
            # is as tight as it gets — emit it
            if match_length <= slop:
                freq += 1.0 / (1 + match_length)
            heapq.heappush(heap, (new_eff, cur_slot))
            cur_eff, cur_slot = heapq.heappop(heap)
            next_eff = heap[0][0]
            match_length = end - cur_eff
        else:
            ml2 = end - new_eff
            if ml2 < match_length:
                match_length = ml2
    if match_length <= slop:
        freq += 1.0 / (1 + match_length)
    return freq


def sloppy_freq_reference(slot_positions: list[list[int]], slop: int) -> float:
    """Heap-free naive transcription of the same matcher (linear scans
    for min/max each round) — the test-only parity oracle."""
    nslots = len(slot_positions)
    if any(len(p) == 0 for p in slot_positions):
        return 0.0
    effs = [[int(p) - i for p in ps] for i, ps in enumerate(slot_positions)]
    if nslots == 1:
        return float(len(effs[0]))
    # current front: one position index per slot
    ii = [0] * nslots
    cur = [e[0] for e in effs]
    end = max(cur)
    live = list(range(nslots))

    def min_slot() -> int:
        m = live[0]
        for s in live[1:]:
            if (cur[s], s) < (cur[m], m):
                m = s
        return m

    freq = 0.0
    ms = min_slot()
    match_length = end - cur[ms]
    rest = [s for s in live if s != ms]
    next_eff = min(cur[s] for s in rest)
    while True:
        ii[ms] += 1
        if ii[ms] >= len(effs[ms]):
            break
        cur[ms] = effs[ms][ii[ms]]
        if cur[ms] > end:
            end = cur[ms]
        if cur[ms] > next_eff:
            if match_length <= slop:
                freq += 1.0 / (1 + match_length)
            ms = min_slot()
            rest = [s for s in live if s != ms]
            next_eff = min(cur[s] for s in rest)
            match_length = end - cur[ms]
        else:
            ml2 = end - cur[ms]
            if ml2 < match_length:
                match_length = ml2
    if match_length <= slop:
        freq += 1.0 / (1 + match_length)
    return freq


def lockstep_sloppy_freqs(
    slot_pos: list[np.ndarray],
    lo: np.ndarray,
    hi: np.ndarray,
    slop: int,
) -> np.ndarray:
    """Vectorized lockstep run of the sloppy matcher over MANY docs at
    once — semantically identical to calling :func:`lucene_sloppy_freq`
    per doc (parity-tested), but every docs' state machine advances in
    the same numpy step, so the per-position cost is a few vector ops
    instead of a Python heap iteration.

    ``slot_pos[s]``: the slot's flattened position column (sorted within
    each doc run); ``lo[d, s]`` / ``hi[d, s]``: that doc's half-open
    index range into it.  Returns the per-doc float phrase frequency.

    State per doc: current effective position per slot (``cur``), the
    advancing slot (``ms``), the runner-up effective position
    (``next_eff``), window ``end`` and current ``ml`` (matchLength).
    Between overtake events only ``ms`` advances (exactly the scalar
    algorithm), so the argmin/second-min reduce runs only on the docs
    that emitted a match this step.
    """
    n, nslots = lo.shape
    freq = np.zeros(n, dtype=np.float64)
    if n == 0:
        return freq
    if nslots == 1:
        return (hi[:, 0] - lo[:, 0]).astype(np.float64)
    ptr = lo.astype(np.int64).copy()
    hi = hi.astype(np.int64)
    # cur[d, s] = effective position (pos - s) at the slot's front
    cur = np.empty((n, nslots), dtype=np.int64)
    for s in range(nslots):
        cur[:, s] = slot_pos[s][ptr[:, s]] - s
    end = cur.max(axis=1)
    ms = cur.argmin(axis=1)  # first-min = lowest slot on ties (heap order)
    part = np.partition(cur, 1, axis=1)
    next_eff = part[:, 1]
    ml = end - part[:, 0]
    act = np.arange(n, dtype=np.int64)
    while len(act):
        msa = ms[act]
        ptr[act, msa] += 1
        exhausted = ptr[act, msa] >= hi[act, msa]
        done = act[exhausted]
        if len(done):
            mld = ml[done]
            ok = mld <= slop
            d_ok = done[ok]
            freq[d_ok] += 1.0 / (1.0 + mld[ok])
        act = act[~exhausted]
        if len(act) == 0:
            break
        msa = ms[act]
        new_eff = np.empty(len(act), dtype=np.int64)
        for s in range(nslots):
            m = msa == s
            if m.any():
                rows = act[m]
                new_eff[m] = slot_pos[s][ptr[rows, s]] - s
        cur[act, msa] = new_eff
        end[act] = np.maximum(end[act], new_eff)
        ov = new_eff > next_eff[act]
        nv = act[~ov]
        if len(nv):
            ml[nv] = np.minimum(ml[nv], end[nv] - new_eff[~ov])
        od = act[ov]
        if len(od):
            # the minimum overtook the runner-up: emit the alignment,
            # then re-reduce min / second-min from the updated fronts
            mlo = ml[od]
            ok = mlo <= slop
            o_ok = od[ok]
            freq[o_ok] += 1.0 / (1.0 + mlo[ok])
            c = cur[od]
            ms[od] = c.argmin(axis=1)
            p2 = np.partition(c, 1, axis=1)
            next_eff[od] = p2[:, 1]
            ml[od] = end[od] - p2[:, 0]
    return freq


def lockstep_sloppy_freqs_repeats(
    slot_pos: list[np.ndarray],
    lo: np.ndarray,
    hi: np.ndarray,
    slop: int,
    repeat_groups: list[list[int]],
    multi_term: bool = False,
) -> np.ndarray:
    """Vectorized lockstep run of the REPEATS collision machine over
    many docs — semantically identical to
    :func:`lucene_sloppy_freq_repeats` per doc (random-batch parity
    tested), with every doc's state advancing in the same numpy step.
    Hot repeated terms ("join join", a prefix expansion repeating its
    fixed term) previously walked a per-doc Python matcher over every
    candidate; this runs the same machine as vector ops whose total
    work stays ∝ Σ positions (each collision advance consumes one
    position, exactly like the scalar loop).

    Semantics carried over from the scalar machine, in lockstep form:

    * collisions resolve by advancing the LESSER of the pair by
      ``(eff, slot)``; the first colliding group member in rptInd
      order is the partner (Lucene's ``collide`` scan order);
    * the main loop's resolution FOLLOWS the advanced pp
      (``advanceRpts``); the multi-term INIT keeps the probe fixed per
      group rank (``advanceRepeatGroups``) while the single-term init
      follows, matching the scalar init;
    * ``next_eff`` stays STALE across collision advances (the
      published algorithm's load-bearing staleness) and the overtake
      check re-reads the advancing slot's position AFTER resolution;
    * exhaustion during INIT yields freq 0; exhaustion in the main
      loop emits the tail alignment.
    """
    n, nslots = lo.shape
    freq = np.zeros(n, dtype=np.float64)
    if n == 0:
        return freq
    if nslots == 1:
        return (hi[:, 0] - lo[:, 0]).astype(np.float64)
    members: dict[int, list[int]] = {}
    for g in repeat_groups:
        for s in g:
            members[s] = list(g)
    ptr = lo.astype(np.int64).copy()
    hi = hi.astype(np.int64)
    cur = np.empty((n, nslots), dtype=np.int64)
    for s in range(nslots):
        cur[:, s] = slot_pos[s][ptr[:, s]] - s
    end = cur.max(axis=1)

    def _advance(rows: np.ndarray, sl: np.ndarray) -> np.ndarray:
        """Advance per-row slot ``sl``; returns the exhausted mask."""
        ptr[rows, sl] += 1
        exh = ptr[rows, sl] >= hi[rows, sl]
        ok_r, ok_s = rows[~exh], sl[~exh]
        if len(ok_r):
            ne = np.empty(len(ok_r), dtype=np.int64)
            for s in range(nslots):
                m = ok_s == s
                if m.any():
                    r = ok_r[m]
                    ne[m] = slot_pos[s][ptr[r, s]] - s
            cur[ok_r, ok_s] = ne
            end[ok_r] = np.maximum(end[ok_r], ne)
        return exh

    def _collide(rows: np.ndarray, pr: np.ndarray) -> np.ndarray:
        """First colliding group member (rptInd order) per row, -1 if
        none — ``tp = eff + slot`` equality within the probe's group."""
        out = np.full(len(rows), -1, dtype=np.int64)
        for s, mem in members.items():
            base = pr == s
            if not base.any():
                continue
            for j in mem:
                if j == s:
                    continue
                m = base & (out < 0)
                if not m.any():
                    break
                r = rows[m]
                hit = (cur[r, s] + s) == (cur[r, j] + j)
                if hit.any():
                    out[np.where(m)[0][hit]] = j
        return out

    def _resolve(rows: np.ndarray, probe: np.ndarray,
                 follow: bool) -> np.ndarray:
        """Run the collision loop for every row; mutates ``probe`` when
        ``follow``; returns the exhausted mask."""
        pending = np.ones(len(rows), dtype=bool)
        exhausted = np.zeros(len(rows), dtype=bool)
        while pending.any():
            idx = np.where(pending)[0]
            j = _collide(rows[idx], probe[idx])
            none = j < 0
            pending[idx[none]] = False
            ii = idx[~none]
            if len(ii) == 0:
                break
            jj = j[~none]
            r, p = rows[ii], probe[ii]
            cp, cj = cur[r, p], cur[r, jj]
            take_p = (cp < cj) | ((cp == cj) & (p < jj))
            a = np.where(take_p, p, jj)
            exh = _advance(r, a)
            if follow:
                probe[ii] = a
            die = ii[exh]
            pending[die] = False
            exhausted[die] = True
        return exhausted

    act = np.arange(n, dtype=np.int64)
    # init collision resolution (scalar-parity per mode)
    if multi_term:
        for g in repeat_groups:
            for s in g:
                if len(act) == 0:
                    break
                exh = _resolve(act, np.full(len(act), s, np.int64),
                               follow=False)
                act = act[~exh]  # init exhaustion → freq stays 0
    else:
        for i in range(nslots):
            if len(act) == 0:
                break
            exh = _resolve(act, np.full(len(act), i, np.int64),
                           follow=True)
            act = act[~exh]
    if len(act) == 0:
        return freq
    ms = np.empty(n, dtype=np.int64)
    next_eff = np.empty(n, dtype=np.int64)
    ml = np.empty(n, dtype=np.int64)
    c = cur[act]
    ms[act] = c.argmin(axis=1)  # first-min = lowest slot on ties
    part = np.partition(c, 1, axis=1)
    next_eff[act] = part[:, 1]
    ml[act] = end[act] - part[:, 0]
    while len(act):
        msa = ms[act]
        exh = _advance(act, msa)
        done = act[exh]
        if len(done):
            mld = ml[done]
            ok = mld <= slop
            freq[done[ok]] += 1.0 / (1.0 + mld[ok])
        act = act[~exh]
        if len(act) == 0:
            break
        msa = ms[act]
        exh = _resolve(act, msa.copy(), follow=True)
        done = act[exh]
        if len(done):
            mld = ml[done]
            ok = mld <= slop
            freq[done[ok]] += 1.0 / (1.0 + mld[ok])
        act = act[~exh]
        if len(act) == 0:
            break
        msa = ms[act]
        # overtake check re-reads the advancing slot AFTER resolution
        new_eff = cur[act, msa]
        ov = new_eff > next_eff[act]
        nv = act[~ov]
        if len(nv):
            ml[nv] = np.minimum(ml[nv], end[nv] - new_eff[~ov])
        od = act[ov]
        if len(od):
            mlo = ml[od]
            ok = mlo <= slop
            freq[od[ok]] += 1.0 / (1.0 + mlo[ok])
            c = cur[od]
            ms[od] = c.argmin(axis=1)
            p2 = np.partition(c, 1, axis=1)
            next_eff[od] = p2[:, 1]
            ml[od] = end[od] - p2[:, 0]
    return freq


def sloppy_freqs_for_candidates(
    slot_docs: list[np.ndarray],
    slot_pos: list[np.ndarray],
    slop: int,
    repeat_groups: list[list[int]] | None = None,
    multi_term: bool = False,
) -> tuple[np.ndarray, np.ndarray]:
    """Per-candidate phrase frequencies.

    ``slot_docs[i]`` / ``slot_pos[i]``: the slot's postings flattened to
    parallel (doc, position) arrays sorted by (doc, position) —
    alternatives unioned.  Candidates are docs present in EVERY slot
    (Lucene's conjunction approximation; the matcher then decides).
    Returns (docs, float tfs) with zero-tf docs dropped.

    The matchers run in one vectorized lockstep pass over all candidate
    docs (:func:`lockstep_sloppy_freqs`); the candidate set is the
    all-terms conjunction, so work scales with docs that contain every
    phrase term, not posting mass.
    """
    cands = None
    for d in slot_docs:
        u = np.unique(d)
        cands = u if cands is None else cands[np.isin(cands, u, assume_unique=True)]
        if len(cands) == 0:
            return np.empty(0, np.int64), np.empty(0, np.float64)
    nslots = len(slot_docs)
    lo = np.empty((len(cands), nslots), dtype=np.int64)
    hi = np.empty((len(cands), nslots), dtype=np.int64)
    for s, docs in enumerate(slot_docs):
        lo[:, s] = np.searchsorted(docs, cands, side="left")
        hi[:, s] = np.searchsorted(docs, cands, side="right")
    if repeat_groups:
        # repeats: the collision machine in its lockstep form — all
        # candidate docs' state machines advance in the same numpy step
        # (scalar per-doc twin kept for the parity tests)
        freqs = lockstep_sloppy_freqs_repeats(
            slot_pos, lo, hi, slop, repeat_groups, multi_term=multi_term
        )
        keep = freqs > 0.0
        return cands[keep].astype(np.int64), freqs[keep]
    freqs = lockstep_sloppy_freqs(slot_pos, lo, hi, slop)
    keep = freqs > 0.0
    return cands[keep].astype(np.int64), freqs[keep]
