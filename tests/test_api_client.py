"""simple_api_reader client-shim tests — the reference's nock-mocked
spec cases restated against the injected transport
(``/root/reference/test/simple_api_reader-spec.js:43-329``)."""

import datetime as dt

import pyarrow as pa
import pytest

from elasticsearch_assets_ray.planner.date_slicer import DateSlicer
from elasticsearch_assets_ray.sources.api_client import (
    APICountProvider,
    APITimeoutError,
    SimpleAPIClient,
    SimpleAPIConfig,
    TableTransport,
)


def _cfg(**kw):
    base = dict(endpoint="http://test.dev/api/v1", index="test-index",
                token="test-token", size=100_000, date_field_name="date")
    base.update(kw)
    return SimpleAPIConfig(**base)


def _client(cfg=None, transport=None):
    return SimpleAPIClient(cfg or _cfg(), transport or (lambda uri, p: {"results": [], "total": 0}))


# ----------------------------------------- DSL → query-param translation
# (parameterized cases lifted from simple_api_reader-spec.js:43-209)


def test_translate_range_query():
    qc = {
        "body": {"query": {"bool": {"must": [
            {"range": {"date": {"gte": "2017-09-23T18:07:14.332Z",
                                 "lt": "2017-09-25T18:07:14.332Z"}}}
        ]}}},
        "size": 100,
    }
    assert _client().translate(qc) == {
        "token": "test-token",
        "q": "date:[2017-09-23T18:07:14.332Z TO 2017-09-25T18:07:14.332Z}",
        "size": 100,
    }


def test_translate_lucene_query_and_default_size():
    qc = {"body": {"query": {"bool": {"must": [
        {"query_string": {"query": "foo:bar"}}
    ]}}}, "size": 5000}
    assert _client().translate(qc) == {
        "token": "test-token", "q": "(foo:bar)", "size": 5000,
    }
    # url-ish characters pass through verbatim
    qc2 = {"body": {"query": {"bool": {"must": [
        {"query_string": {"query": 'foo:"bar+baz"'}}
    ]}}}, "size": 5000}
    assert _client().translate(qc2)["q"] == '(foo:"bar+baz")'
    # size falls back to opConfig
    assert _client().translate({})["size"] == 100_000


def test_translate_fields_appends_date_field():
    qc = {
        "body": {"query": {"bool": {"must": [
            {"query_string": {"query": "test:query OR other:thing AND bytes:>=2000"}}
        ]}}},
        "_source": ["foo", "bar"],
        "size": 100,
    }
    got = _client().translate(qc)
    assert got["fields"] == "foo,bar,date"
    assert got["q"] == "(test:query OR other:thing AND bytes:>=2000)"


def test_translate_range_and_lucene_combined_with_sort_and_geo():
    qc = {
        "body": {
            "query": {"bool": {"must": [
                {"range": {"date": {"gte": "2017-09-23T18:07:14.332Z",
                                     "lt": "2017-09-25T18:07:14.332Z"}}},
                {"query_string": {"query": "foo:bar"}},
            ]}},
            "sort": [{"date": {"order": "asc"}}],
        },
        "size": 200,
    }
    cfg = _cfg(geo_point="52.3456,79.6784", geo_distance="200km")
    got = SimpleAPIClient(cfg, lambda u, p: {}).translate(qc)
    assert got["q"] == (
        "date:[2017-09-23T18:07:14.332Z TO 2017-09-25T18:07:14.332Z} AND (foo:bar)"
    )
    assert got["sort"] == "date:asc"
    assert got["geo_point"] == "52.3456,79.6784"
    assert got["geo_distance"] == "200km"


def test_timeout_maps_to_408_error():
    tr = TableTransport(pa.table({"date": pa.array([], pa.string())}),
                        fail_timeout=True)
    client = SimpleAPIClient(_cfg(), tr)
    with pytest.raises(APITimeoutError) as ei:
        client.search({"q": "x:y"})
    assert ei.value.status_code == 408
    assert ei.value.context["endpoint"] == "http://test.dev/api/v1/test-index"


def test_search_count_and_cluster_surface():
    def iso(day, h=0):
        return f"2017-09-{day:02d}T{h:02d}:00:00.000Z"

    tbl = pa.table({
        "date": pa.array([iso(23, 5), iso(24, 5), iso(26, 5)], pa.string()),
        "foo": pa.array(["bar", "bar", "nope"], pa.string()),
    })
    client = SimpleAPIClient(_cfg(), TableTransport(tbl, token="test-token"))
    res = client.search({
        "body": {"query": {"bool": {"must": [
            {"range": {"date": {"gte": iso(23), "lt": iso(25)}}}
        ]}}},
        "size": 100,
    })
    assert res["hits"]["total"] == 2
    assert [h["_source"]["foo"] for h in res["hits"]["hits"]] == ["bar", "bar"]
    assert res["_shards"] == {"total": 1, "successful": 1, "failed": 0}
    # count() forces size 0: total present, no hits payload
    cnt = client.count({"body": {"query": {"bool": {"must": [
        {"query_string": {"query": "foo:bar"}}
    ]}}}})
    assert cnt["hits"]["total"] == 2 and cnt["hits"]["hits"] == []
    assert client.cluster.stats() == {"nodes": {"versions": ["0.5"]}}
    assert client.cluster.get_settings()["test-index"]["settings"]["index"][
        "max_result_window"] == 100_000


def test_slicer_over_api_counts(ray_session):
    """The reference's slicer-over-HTTP path: date slicing driven entirely
    by API count probes (spec :263-329 scaled up)."""
    base = dt.datetime(2017, 9, 23, tzinfo=dt.timezone.utc)
    rows = []
    for i in range(300):
        d = base + dt.timedelta(minutes=7 * i)
        rows.append(d.strftime("%Y-%m-%dT%H:%M:%S.") + f"{0:03d}Z")
    tbl = pa.table({"date": pa.array(rows, pa.string())})
    client = SimpleAPIClient(_cfg(), TableTransport(tbl, token="test-token"))
    cp = APICountProvider(client)
    assert cp.total == 300
    lo, hi = cp.bounds
    slices = list(DateSlicer(cp, lo, hi, size=100).slices())
    assert sum(s.count for s in slices) == 300
    assert all(s.count <= 100 for s in slices)
    # every probe went through the translated param surface
    tr = client.transport
    assert all(c["params"]["token"] == "test-token" for c in tr.calls)
    assert any("date:[" in c["params"]["q"] for c in tr.calls if c["params"]["q"])
