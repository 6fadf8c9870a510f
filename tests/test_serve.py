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
    server = serve(h)
    base = f"http://127.0.0.1:{server.server_address[1]}"
    yield base, h
    server.shutdown()


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
    base, h = api
    code, body = _get(f"{base}/api/youtube/vid_00000")
    assert code == 200 and body["success"]
    assert body["scenes"] == [
        r.asDict() for r in h.scenes_of("vid_00000").collect()
    ]
    code, body = _get(f"{base}/api/youtube/vid_99999")
    assert code == 404 and not body["success"]


def test_entity_route(api):
    base, h = api
    label = urllib.parse.quote("Entity 001")
    code, body = _get(f"{base}/api/entity/{label}")
    assert code == 200 and body["scenes"]
    assert {s["link"] for s in body["scenes"]} == {
        r.link for r in h.search("Entity 001").collect()
    }
    code, body = _get(f"{base}/api/entity/Nobody%20Here")
    assert code == 404


def test_query_route(api):
    base, _ = api
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
