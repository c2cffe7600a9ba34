"""HTTP serve layer e2e (reference `serve` command:
server/REServerRoutes.java:40-67 + api/SearchAPIAdapter.java:63-137).

Drives the reference's es_queries scenario families through the HTTP
adapter: prefix, city-street, city-street-hn, street-match,
terms-filter — each issued as a real GET against a live server over a
small gazetteer-analyzer index, responses compared to the in-process
Searcher."""

import json
import shutil
import urllib.error
import urllib.parse
import urllib.request

import pytest

from gazetteer_search_ray.functions.analyzer import AnalyzerConfig
from gazetteer_search_ray.pipelines.build_index import BuildOptions, build_index
from gazetteer_search_ray.pipelines.search import Searcher

BASE = "/tmp/gsr_server"

DOCS = [
    {"doc_id": 0, "content": "улица Ленина 12a Москва", "lang": "ru"},
    {"doc_id": 1, "content": "проспект Мира 5к2 Москва", "lang": "ru"},
    {"doc_id": 2, "content": "main street 42 springfield", "lang": "en"},
    {"doc_id": 3, "content": "oak avenue 7 portland", "lang": "en"},
    {"doc_id": 4, "content": "main street springfield cafe", "lang": "en"},
    {"doc_id": 5, "content": "springfield city hall", "lang": "en"},
]


@pytest.fixture(scope="module")
def server(ray_session):
    import ray.data as rd

    from gazetteer_search_ray.server import SearchHTTPServer

    shutil.rmtree(BASE, ignore_errors=True)
    build_index(
        rd.from_items(DOCS),
        BASE,
        BuildOptions(analyzer_config=AnalyzerConfig.gazetteer()),
    )
    s = SearchHTTPServer(BASE, port=0, pool_size=1).start()
    yield s
    s.shutdown()


def _get(server, path: str, **params) -> dict:
    qs = urllib.parse.urlencode(params)
    url = f"http://127.0.0.1:{server.port}{path}" + (f"?{qs}" if qs else "")
    with urllib.request.urlopen(url, timeout=30) as r:
        return json.loads(r.read())


def test_healthcheck_and_stats(server):
    assert _get(server, "/healthcheck")["result"] == "ok"
    st = _get(server, "/index/stats")
    assert st["n_docs"] == len(DOCS)
    assert st["avgdl"] > 0


def test_scenario_city_street(server):
    # es_queries/city-street.json analog: locality + street terms
    r = _get(server, "/location/_search", q="springfield main street")
    assert r["result"] == "success"
    ids = [row["doc_id"] for row in r["rows"]]
    assert ids[0] in (2, 4)
    assert "answer_time" in r


def test_scenario_city_street_hn(server):
    # es_queries/city-street-hn.json analog: street + housenumber
    r = _get(server, "/location/_search", q="main street 42")
    assert [row["doc_id"] for row in r["rows"]][0] == 2


def test_scenario_prefix(server):
    # es_queries/prefix.json analog: last token is a prefix
    r = _get(server, "/location/_search", q="portland oa", prefix="true")
    assert 3 in [row["doc_id"] for row in r["rows"]]


def test_scenario_terms_filter(server):
    # es_queries/admin-boundaries-terms.json analog: structured filter
    r = _get(server, "/location/_search", q="москва", lang="ru")
    ids = {row["doc_id"] for row in r["rows"]}
    assert ids and ids <= {0, 1}
    r2 = _get(server, "/location/_search", q="москва", lang="en")
    assert r2["total_hits"] == 0


def test_paging_matches_searcher(server):
    s = Searcher(BASE)
    want = s.search("springfield street main", k=4, use_prior=False)
    r0 = _get(server, "/location/_search", q="springfield street main",
              page=0, size=2)
    r1 = _get(server, "/location/_search", q="springfield street main",
              page=1, size=2)
    got = [row["doc_id"] for row in r0["rows"] + r1["rows"]]
    assert got == [h["doc_id"] for h in want]


def test_verbose_projection(server):
    r = _get(server, "/location/_search", q="portland", verbose="true")
    row = r["rows"][0]
    assert "dl" in row and "sha256" in row


def test_matched_queries_over_http(server):
    r = _get(server, "/location/_search", q="portland oak", matched="true")
    assert all("matched_queries" in row for row in r["rows"])
    assert "required" in r["rows"][0]["matched_queries"]


def test_missing_q_is_400(server):
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(server, "/location/_search", page=0)
    assert ei.value.code == 400


def test_unknown_route_404(server):
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(server, "/nope")
    assert ei.value.code == 404


def test_pool_backend_matches_local(server, ray_session):
    from gazetteer_search_ray.server import SearchHTTPServer

    pooled = SearchHTTPServer(BASE, port=0, pool_size=2).start()
    try:
        a = _get(server, "/location/_search", q="main street 42")
        b = _get(pooled, "/location/_search", q="main street 42")
        assert [r["doc_id"] for r in a["rows"]] == [r["doc_id"] for r in b["rows"]]
    finally:
        pooled.shutdown()


def test_bad_numeric_params_400(server):
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(server, "/location/_search", q="main", page="xx")
    assert ei.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as ei:
        _get(server, "/location/_search", q="main", size="-3.5")
    assert ei.value.code == 400
