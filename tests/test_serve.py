"""REST serving analogue (reference api/api.py routes) over the
SparkHunter facade: GET scenes/entity routes + POST query route,
exercised over real HTTP against a linked corpus."""

import json
import urllib.parse
import urllib.request

import pytest

from face_hunter_spark import synth
from face_hunter_spark.hunter import SparkHunter
from face_hunter_spark.serve import serve

N_ENT = 10


@pytest.fixture(scope="module")
def api(spark, tmp_path_factory):
    h = SparkHunter(
        spark, str(tmp_path_factory.mktemp("kg")), n_entities=N_ENT,
        gallery_pdf=synth.make_gallery_pdf(
            n_entities=N_ENT, thumbs_per_entity=5, distractors=2),
        entity_catalog=synth.entity_catalog_df(
            spark, n_entities=N_ENT, distractors=2),
    )
    h.link(synth.documents_df(spark, 15, N_ENT))
    attrs = spark.createDataFrame(
        synth.make_entity_attributes_pdf(n_entities=N_ENT, distractors=2)
    )
    server = serve(h, attributes=attrs, allow_raw_sql=True)
    locked = serve(h)  # default posture: no raw sql, scene columns only
    base = f"http://127.0.0.1:{server.server_address[1]}"
    lbase = f"http://127.0.0.1:{locked.server_address[1]}"
    yield base, lbase, h
    server.shutdown()
    locked.shutdown()


def _get(url):
    try:
        with urllib.request.urlopen(url) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_youtube_route(api):
    base, _, h = api
    code, body = _get(f"{base}/api/youtube/vid_00000")
    assert code == 200 and body["success"]
    assert body["scenes"] == [
        r.asDict() for r in h.scenes_of("vid_00000").collect()
    ]
    code, body = _get(f"{base}/api/youtube/vid_99999")
    assert code == 404 and not body["success"]


def test_entity_route(api):
    base, _, h = api
    label = urllib.parse.quote("Entity 001")
    code, body = _get(f"{base}/api/entity/{label}")
    assert code == 200 and body["scenes"]
    assert {s["link"] for s in body["scenes"]} == {
        r.link for r in h.search("Entity 001").collect()
    }
    code, body = _get(f"{base}/api/entity/Nobody%20Here")
    assert code == 404


def test_query_route(api):
    base, _, _ = api
    code, body = _post(f"{base}/api/query",
                       {"where": "entity LIKE '%Entity_001'"})
    assert code == 200 and body["rows"]
    code, body = _post(
        f"{base}/api/query",
        {"sql": "SELECT count(*) AS n FROM {triples}"},
    )
    assert code == 200 and body["rows"][0]["n"] > 0
    code, body = _post(f"{base}/api/query", {})
    assert code == 400


def test_query_where_allowlist(api):
    """VERDICT r3 #6: the WHERE fragment is validated before splicing —
    non-allowlisted expressions are rejected with 400, the reference's
    documented example still passes (attribute columns included)."""
    base, _, _ = api
    # the reference's flagship filter (graph.py:194-244 docstring)
    code, body = _post(f"{base}/api/query", {
        "where": "wikidata_entity LIKE '%www.wikidata.org%' "
                 "AND gender = 'male' AND birth_date < '1970-01-01'"
    })
    assert code == 200, body
    for bad in (
        "entity = 'x'; DROP TABLE triples",       # statement smuggling
        "java_method('java.lang.Runtime') = 'x'",  # function call
        "entity IN (SELECT subj FROM triples)",    # subquery
        "secret_col = 1",                          # unknown column
        "entity = 'x' -- comment",                 # comment syntax
    ):
        code, body = _post(f"{base}/api/query", {"where": bad})
        assert code == 400, (bad, body)
        assert not body["success"]


def test_query_structured_filters(api):
    """{'filters': [{column, op, value}]} builds the predicate
    server-side — values are literals, never raw SQL."""
    base, _, _ = api
    code, body = _post(f"{base}/api/query", {
        "filters": [
            {"column": "gender", "op": "=", "value": "male"},
            {"column": "birth_date", "op": "<", "value": "1970-01-01"},
        ]
    })
    assert code == 200, body
    code, body = _post(f"{base}/api/query", {
        "filters": [{"column": "entity", "op": "like",
                     "value": "%'; DROP TABLE x; --%"}]
    })
    assert code == 200, body  # hostile VALUE is just a literal
    assert body["rows"] == []
    code, _ = _post(f"{base}/api/query", {
        "filters": [{"column": "entity", "op": "rlike", "value": "x"}]
    })
    assert code == 400
    code, _ = _post(f"{base}/api/query", {
        "filters": [{"column": "nope", "op": "=", "value": "x"}]
    })
    assert code == 400


def test_locked_server_posture(api):
    """Default serve(): raw sql 403s; attribute columns are NOT
    filterable (no attributes joined); scene columns still work."""
    _, lbase, _ = api
    code, body = _post(f"{lbase}/api/query",
                       {"sql": "SELECT 1 AS x"})
    assert code == 403 and not body["success"]
    code, _ = _post(f"{lbase}/api/query", {"where": "gender = 'male'"})
    assert code == 400
    code, body = _post(f"{lbase}/api/query",
                       {"where": "entity LIKE '%Entity_001'"})
    assert code == 200 and body["rows"]


def test_query_sparql_text(api):
    # the reference's POST /api/query body carries a full SPARQL query
    # string (api.py:81-97 get_videos_by_sparql); here the engine's
    # text front-end parses it — a language surface, never spliced —
    # and ASK strings return {"ask": bool}
    base, lbase, _ = api
    q = ("PREFIX fh: <http://face-hunter.org/ontology/> "
         "SELECT DISTINCT ?v WHERE { ?v fh:hasScene ?s } "
         "ORDER BY ?v LIMIT 5")
    code, body = _post(f"{base}/api/query", {"sparql": q})
    assert code == 200 and len(body["rows"]) == 5
    assert set(body["rows"][0]) == {"v"}
    # available on the locked server too: parsed, not spliced, so it
    # needs no raw-sql opt-in
    code, body = _post(f"{lbase}/api/query", {"sparql": q})
    assert code == 200 and len(body["rows"]) == 5
    # ASK form
    code, body = _post(
        f"{lbase}/api/query",
        {"sparql": "PREFIX fh: <http://face-hunter.org/ontology/> "
                   "ASK { ?v fh:hasScene ?s }"},
    )
    assert code == 200 and body["ask"] is True
    # parse errors and loud seams surface as 400, not 500
    code, body = _post(f"{lbase}/api/query", {"sparql": "SELECT WHERE"})
    assert code == 400 and not body["success"]
    code, body = _post(
        f"{lbase}/api/query",
        {"sparql": "SELECT ?s WHERE { SERVICE <http://nope> "
                   "{ ?s ?p ?o } }"},
    )
    assert code == 400
