"""ES ``ip_prefix`` / ``ip_range`` aggregations as RUNTIME FIELDS over a
uint32 IPv4 doc value.

The reference validates query params and delegates aggregation execution
to Elasticsearch verbatim (/root/reference/asset/elasticsearch_reader/
reader.js:6-31); here both buckets reduce to the engines' existing
terms/range machinery over a ``script:`` runtime field, exactly like the
geo grid aggregations (``search.geo``):

* ``ip_prefix``  — bucket key = the network number ``floor(v / 2^(32-N))
  × 2^(32-N)``, one terms aggregation, buckets ascending by key (the ES
  order); keys render as dotted-quad + ``prefix_length``.
* ``ip_range``   — ES semantics: ``from`` inclusive, ``to`` EXCLUSIVE,
  CIDR ``mask`` sugar for ``[net, net + 2^(32-N))``; one range
  aggregation per declaration order, empty buckets included.

IPv6 is not modeled (``is_ipv6`` would always be false) — disclosed.
Doc values are plain numeric docmeta (e.g. the contract's derived
``ip_u32`` ingest field), so everything here is engine-agnostic: any
object exposing ``aggregate`` / ``range_agg`` (both serving engines)
works, and the SQL mirrors are exact integer arithmetic.
"""

from __future__ import annotations

U32 = 1 << 32


def ip_to_u32(ip: str) -> int:
    parts = ip.split(".")
    if len(parts) != 4:
        raise ValueError(f"not a dotted-quad IPv4 address: {ip!r}")
    v = 0
    for p in parts:
        o = int(p)
        if not (0 <= o <= 255):
            raise ValueError(f"octet {p!r} out of range in {ip!r}")
        v = (v << 8) | o
    return v


def u32_to_ip(v: int) -> str:
    v = int(v)
    if not (0 <= v < U32):
        raise ValueError(f"not a uint32: {v}")
    return f"{v >> 24}.{(v >> 16) & 255}.{(v >> 8) & 255}.{v & 255}"


def cidr_bounds(mask: str) -> tuple[int, int]:
    """``"a.b.c.d/N"`` → ``(net, net + 2^(32-N))`` — from inclusive,
    to exclusive (the ES ip_range ``mask`` expansion).  Host bits in the
    address are zeroed (ES accepts ``10.0.0.1/8``)."""
    addr, _, n_s = mask.partition("/")
    n = int(n_s)
    if not (0 <= n <= 32):
        raise ValueError(f"prefix length {n} outside [0, 32] in {mask!r}")
    span = 1 << (32 - n)
    net = (ip_to_u32(addr) // span) * span
    return net, net + span


def ip_bound(x: str | int | float | None) -> float | None:
    """An ip_range ``from``/``to`` bound → numeric doc-value units:
    dotted-quad strings parse, numbers pass through, None stays open."""
    if x is None:
        return None
    if isinstance(x, str):
        return float(ip_to_u32(x))
    return float(x)


def ip_prefix_script(field: str, prefix_length: int) -> str:
    """Runtime-field name computing each doc's network number at
    ``prefix_length`` — usable anywhere a docmeta field name is."""
    if not (0 <= prefix_length <= 32):
        raise ValueError(
            f"prefix_length {prefix_length} outside [0, 32]"
        )
    step = float(1 << (32 - prefix_length))
    return f"script:floor(doc['{field}'] / {step!r}) * {step!r}"


def ip_prefix_sql(col: str, prefix_length: int) -> str:
    """The same network-number expression in ANSI SQL."""
    step = float(1 << (32 - prefix_length))
    return f"floor({col} / {step!r}) * {step!r}"


def ip_key_sql(net: str) -> str:
    """Dotted-quad rendering of a numeric network expression in SQL —
    the oracle-side twin of :func:`u32_to_ip`."""
    return (
        f"concat(CAST(floor({net} / 16777216) % 256 AS BIGINT), '.', "
        f"CAST(floor({net} / 65536) % 256 AS BIGINT), '.', "
        f"CAST(floor({net} / 256) % 256 AS BIGINT), '.', "
        f"CAST(CAST({net} AS BIGINT) % 256 AS BIGINT))"
    )


def ip_prefix_agg(
    engine,
    query,
    field: str,
    prefix_length: int,
    size: int | None = None,
    stats_on: str | None = None,
) -> list[dict]:
    """ES ``ip_prefix`` aggregation: buckets of the matched docs'
    addresses grouped by their ``prefix_length``-bit network, ASCENDING
    by key (the ES order), optional ``size`` cut (exact — every bucket
    crossed the O(buckets) merge).  Each bucket: ``key`` (dotted-quad
    network address), ``prefix_length``, ``doc_count`` (+stats when
    ``stats_on``).  Engine-agnostic (both serving engines, parity via
    the shared terms machinery)."""
    buckets = engine.aggregate(
        query, ip_prefix_script(field, prefix_length),
        stats_on=stats_on, order=("_key", "asc"), size=size,
    )
    for b in buckets:
        b["net"] = float(b["key"])
        b["key"] = u32_to_ip(int(b["key"]))
        b["prefix_length"] = prefix_length
    return buckets


def ip_range_agg(
    engine,
    query,
    field: str,
    ranges: list[dict],
    stats_on: str | None = None,
) -> list[dict]:
    """ES ``ip_range`` aggregation: ``from`` inclusive / ``to``
    exclusive buckets (dotted-quad strings or numbers), ``mask`` CIDR
    sugar, declaration order, empty buckets included — the engines'
    range machinery end to end."""
    norm = []
    keys = []
    for r in ranges:
        if "mask" in r:
            lo, hi = cidr_bounds(r["mask"])
            norm.append({"from": float(lo),
                         "to": None if hi >= U32 else float(hi)})
            keys.append(r["mask"])
        else:
            lo_f, hi_f = ip_bound(r.get("from")), ip_bound(r.get("to"))
            norm.append({"from": lo_f, "to": hi_f})
            keys.append(
                ("*" if lo_f is None else u32_to_ip(int(lo_f)))
                + "-"
                + ("*" if hi_f is None else u32_to_ip(int(hi_f)))
            )
    buckets = engine.range_agg(query, field, norm, stats_on)
    for b, key in zip(buckets, keys):
        b["key"] = key
    return buckets
