"""simple_api_reader client shim: ES-DSL → API-query-param translation
with a pluggable transport.

Mirrors ``/root/reference/asset/simple_api_reader/index.js:16-222``: the
reference fakes an ES client over HTTP (teraserver), translating the
reader's DSL queries into ``{token, q: lucene, size, fields, sort,
geo_*}`` query params.  The sandbox has no network, so the transport is
an injected callable ``transport(uri, params) -> dict`` — exactly how
the reference tests it (nock-mocked HTTP,
``test/simple_api_reader-spec.js:43-209``).  ``TableTransport`` serves a
pyarrow table through the SAME lucene compiler the parquet reader uses,
so the full client → slicer path is exercisable end-to-end offline.

Translation rules (``index.js:49-150``):

* ``_source`` fields project via a ``fields`` csv param, with
  ``date_field_name`` force-included so the date reader keeps working;
* each ``bool.must`` entry maps ``query_string`` → ``(q)`` and ``range``
  → ``field:[gte_iso TO lt_iso}`` (inclusive→exclusive — a MIXED-bracket
  lucene range), AND-joined in order;
* one date sort allowed: ``sort=field:order``;
* geo params pass through from the op config;
* ``size`` falls back to the op config's; ``token`` always present.
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass, field


class APITimeoutError(Exception):
    """HTTP request timed out connecting to the API endpoint
    (``index.js:31-38``: TSError statusCode 408 with endpoint+query
    context)."""

    def __init__(self, endpoint: str, query: dict):
        super().__init__("HTTP request timed out connecting to API endpoint.")
        self.status_code = 408
        self.context = {"endpoint": endpoint, "query": query}


class TransportTimeout(Exception):
    """Raised by a transport to signal a timeout (got.TimeoutError stand-in)."""


@dataclass(frozen=True)
class SimpleAPIConfig:
    endpoint: str
    index: str
    token: str
    size: int = 100_000
    date_field_name: str = "date"
    timeout: float = 300.0
    query: str | None = None
    fields: tuple[str, ...] | None = None
    geo_box_top_left: str | None = None
    geo_box_bottom_right: str | None = None
    geo_point: str | None = None
    geo_distance: str | None = None
    geo_sort_point: str | None = None
    geo_sort_order: str | None = None
    geo_sort_unit: str | None = None


def _iso(v) -> str:
    """JS ``new Date(v).toISOString()`` equivalent (ms precision, Z)."""
    if isinstance(v, (int, float)):
        d = dt.datetime.fromtimestamp(v / 1000.0, dt.timezone.utc)
    elif isinstance(v, dt.datetime):
        d = v if v.tzinfo else v.replace(tzinfo=dt.timezone.utc)
    else:
        d = dt.datetime.fromisoformat(str(v).replace("Z", "+00:00"))
        if d.tzinfo is None:
            d = d.replace(tzinfo=dt.timezone.utc)
    d = d.astimezone(dt.timezone.utc)
    return d.strftime("%Y-%m-%dT%H:%M:%S.") + f"{d.microsecond // 1000:03d}Z"


class SimpleAPIClient:
    """The fake-ES-client surface: ``search`` / ``count`` /
    ``cluster.stats`` / ``cluster.get_settings``, DSL translated to query
    params and sent through the injected transport."""

    def __init__(self, config: SimpleAPIConfig, transport):
        self.cfg = config
        self.transport = transport

    # ------------------------------------------------- DSL translation

    def translate(self, query_config: dict) -> dict:
        cfg = self.cfg
        params: dict = {}
        # geo passthrough (index.js:111-129)
        for g in (
            "geo_box_top_left", "geo_box_bottom_right", "geo_point",
            "geo_distance", "geo_sort_point", "geo_sort_order", "geo_sort_unit",
        ):
            v = getattr(cfg, g)
            if v:
                params[g] = v
        # date sort (index.js:88-98) — only one, only on the date field
        body = query_config.get("body") or {}
        for s in body.get("sort") or []:
            if cfg.date_field_name in s:
                params["sort"] = (
                    f"{cfg.date_field_name}:{s[cfg.date_field_name]['order']}"
                )
        # fields projection, date field force-included (index.js:50-55)
        fields = query_config.get("_source")
        if fields is not None:
            fields = list(fields)
            if cfg.date_field_name not in fields:
                fields.append(cfg.date_field_name)
            params["fields"] = ",".join(fields)
        # lucene q from the bool.must entries (index.js:57-84)
        must = ((body.get("query") or {}).get("bool") or {}).get("must")
        parts: list[str] = []
        if must:
            for action in must:
                for key, op in action.items():
                    if key == "query_string":
                        parts.append(f"({op.get('query', '')})")
                    elif key == "range":
                        rng = op[cfg.date_field_name]
                        parts.append(
                            f"{cfg.date_field_name}:"
                            f"[{_iso(rng['gte'])} TO {_iso(rng['lt'])}}}"
                        )
            q = " AND ".join(parts)
        else:
            q = query_config.get("q", "")
        size = query_config.get("size")
        if size is None:
            size = cfg.size
        params.update({"token": cfg.token, "q": q, "size": size})
        return params

    # ---------------------------------------------------- client calls

    def _call(self, params: dict) -> dict:
        uri = f"{self.cfg.endpoint}/{self.cfg.index}"
        try:
            body = self.transport(uri, params)
        except TransportTimeout:
            raise APITimeoutError(uri, params) from None
        results = body.get("results") or []
        return {
            "hits": {
                "hits": [{"_source": r} for r in results],
                "total": body.get("total", len(results)),
            },
            "timed_out": False,
            "_shards": {"total": 1, "successful": 1, "failed": 0},
        }

    def search(self, query_config: dict) -> dict:
        return self._call(self.translate(query_config))

    def count(self, query_config: dict) -> dict:
        qc = dict(query_config)
        qc["size"] = 0
        return self._call(self.translate(qc))

    class _Cluster:
        def __init__(self, outer: "SimpleAPIClient"):
            self._o = outer

        def stats(self) -> dict:
            return {"nodes": {"versions": ["0.5"]}}

        def get_settings(self) -> dict:
            return {
                self._o.cfg.index: {
                    "settings": {"index": {"max_result_window": 100_000}}
                }
            }

    @property
    def cluster(self) -> "_Cluster":
        return SimpleAPIClient._Cluster(self)


class TableTransport:
    """Offline transport serving a pyarrow table: the ``q`` param compiles
    through the SAME lucene grammar the parquet reader pushes down
    (``sources.query.compile_query`` — mixed-bracket ranges included), so
    client-shim behavior is testable end-to-end without a network."""

    def __init__(self, table, date_field: str = "date", token: str | None = None,
                 fail_timeout: bool = False):
        self.table = table
        self.date_field = date_field
        self.token = token
        self.fail_timeout = fail_timeout
        self.calls: list[dict] = []

    def __call__(self, uri: str, params: dict) -> dict:
        if self.fail_timeout:
            raise TransportTimeout(uri)
        self.calls.append({"uri": uri, "params": dict(params)})
        if self.token is not None and params.get("token") != self.token:
            raise PermissionError("bad token")
        import pyarrow.dataset as pds

        from .query import compile_query

        tbl = self.table
        q = params.get("q", "")
        if q:
            tbl = pds.dataset(tbl).to_table(filter=compile_query(q))
        if "sort" in params:
            fld, order = params["sort"].split(":")
            tbl = tbl.sort_by([(fld, "ascending" if order == "asc" else "descending")])
        total = tbl.num_rows
        size = int(params.get("size", 100))
        tbl = tbl.slice(0, size)
        if "fields" in params:
            keep = [c for c in params["fields"].split(",") if c in tbl.column_names]
            tbl = tbl.select(keep)
        return {"results": tbl.to_pylist(), "total": total}


class APICountProvider:
    """Count provider for the date slicer backed by a SimpleAPIClient —
    the reference's slicer-over-HTTP path
    (``test/simple_api_reader-spec.js:263-329``): every planning probe is
    a ``count`` (size-0 search) against the API; bounds are discovered
    with sort-asc/desc size-1 searches (``slicer.js:75-132``)."""

    def __init__(self, client: SimpleAPIClient):
        self.client = client
        self.date_field = client.cfg.date_field_name

    def _range_config(self, start_ms: int, end_ms: int) -> dict:
        return {
            "body": {
                "query": {
                    "bool": {
                        "must": [
                            {"range": {self.date_field: {"gte": start_ms, "lt": end_ms}}}
                        ]
                    }
                }
            }
        }

    def __call__(self, start_ms: int, end_ms: int) -> int:
        return self.client.count(self._range_config(start_ms, end_ms))["hits"]["total"]

    def _edge(self, order: str):
        res = self.client.search(
            {"body": {"sort": [{self.date_field: {"order": order}}]}, "size": 1}
        )
        hits = res["hits"]["hits"]
        if not hits:
            raise ValueError("empty index — no date bounds")
        return hits[0]["_source"][self.date_field]

    @property
    def total(self) -> int:
        return self.client.count({})["hits"]["total"]

    @property
    def bounds(self) -> tuple[int, int]:
        lo = self._edge("asc")
        hi = self._edge("desc")

        def to_ms(v) -> int:
            if isinstance(v, (int, float)):
                return int(v)
            return int(
                dt.datetime.fromisoformat(str(v).replace("Z", "+00:00")).timestamp()
                * 1000
            )

        return to_ms(lo), to_ms(hi) + 1
