"""ES query rules — the 8.10+ ``rule`` query + ``_query_rules``
ruleset API: curated pin/exclude actions triggered when the search
request's ``match_criteria`` metadata satisfies a rule's criteria.

The reference forwards query DSL to Elasticsearch verbatim
(``/root/reference/asset/elasticsearch_reader/reader.js:6-31``); this
module is the serving-side implementation, engine-agnostic like
``pinned_search`` (anything with ``.search`` works — both engines).

A ruleset is a list of rules in priority order::

    {"rule_id": "promote-hash",
     "type": "pinned",                 # or "exclude" (ES 8.16)
     "criteria": [{"type": "exact", "metadata": "user_query",
                   "values": ["hash join"]}],
     "actions": {"ids": [12, 7]}}

Criterion types (the ES set for non-fuzzy matching): ``always``,
``exact``, ``prefix``, ``suffix``, ``contains``, ``gt``/``gte``/
``lt``/``lte`` (numeric).  A criterion matches when the request
metadata value satisfies ANY of ``values``; a rule fires when ALL its
criteria match (the ES contract).  Actions fold across fired rules in
ruleset order: pinned ids concatenate (first occurrence keeps its
position — the ES dedup), excluded ids union.  A doc both pinned and
excluded is EXCLUDED (exclusion is the stronger curation intent;
deterministic, documented).

Serving: pinned ids score ``PINNED_BASE − position`` (the ES
descending Float.MAX_VALUE-family promotion, exactly like
``pinned_search``), organic hits follow with pinned ∪ excluded ids
removed.
"""

from __future__ import annotations

from .engine import PINNED_BASE

_NUMERIC = {"gt", "gte", "lt", "lte"}


def criterion_matches(criterion: dict, match_criteria: dict) -> bool:
    """One criterion vs the request metadata (ANY of ``values``)."""
    ctype = criterion.get("type", "exact")
    if ctype == "always":
        return True
    value = match_criteria.get(criterion.get("metadata"))
    if value is None:
        return False
    values = criterion.get("values", [])
    if ctype in _NUMERIC:
        try:
            v = float(value)
        except (TypeError, ValueError):
            return False
        for ref in values:
            r = float(ref)
            if ((ctype == "gt" and v > r) or (ctype == "gte" and v >= r)
                    or (ctype == "lt" and v < r)
                    or (ctype == "lte" and v <= r)):
                return True
        return False
    sv = str(value)
    for ref in values:
        r = str(ref)
        if ((ctype == "exact" and sv == r)
                or (ctype == "prefix" and sv.startswith(r))
                or (ctype == "suffix" and sv.endswith(r))
                or (ctype == "contains" and r in sv)):
            return True
    return False


def apply_ruleset(
    ruleset: list[dict], match_criteria: dict
) -> tuple[list[int], set[int]]:
    """(pinned ids in promotion order, excluded id set) after folding
    every FIRED rule in ruleset order."""
    pinned: list[int] = []
    seen: set[int] = set()
    excluded: set[int] = set()
    for rule in ruleset:
        if not all(criterion_matches(c, match_criteria)
                   for c in rule.get("criteria", [])):
            continue
        ids = [int(d) for d in rule.get("actions", {}).get("ids", [])]
        if rule.get("type", "pinned") == "exclude":
            excluded.update(ids)
        else:
            for d in ids:
                if d not in seen:
                    seen.add(d)
                    pinned.append(d)
    pinned = [d for d in pinned if d not in excluded]
    return pinned, excluded


def rule_search(
    engine,
    organic_query: str,
    ruleset: list[dict],
    match_criteria: dict,
    k: int = 10,
) -> list[tuple[int, float]]:
    """The ``rule`` query: apply the ruleset's fired pin/exclude actions
    around the organic query's results (engine-agnostic)."""
    pinned, excluded = apply_ruleset(ruleset, match_criteria)
    if hasattr(engine, "search_ids") and pinned:
        live = {d for d, _ in engine.search_ids(pinned)}
        pinned = [d for d in pinned if d in live]
    out: list[tuple[int, float]] = [
        (d, PINNED_BASE - i) for i, d in enumerate(pinned[:k])
    ]
    if len(out) < k:
        drop = set(pinned) | excluded
        organic = engine.search(organic_query, k=k + len(drop))
        for d, s in organic:
            if d in drop:
                continue
            out.append((d, s))
            if len(out) >= k:
                break
    return out
