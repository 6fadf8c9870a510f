"""End-to-end reference parity at the QUERY-TEXT level: the
reference's own SPARQL query (graph.py:180-192, the
get_scenes_with_entity template) executed verbatim-in-shape against
the reference's own committed artifact
(/root/reference/models/example_graph), parsed by our n3 reader and
answered by our SPARQL front-end — the full "switch engines, keep your
queries AND your data" story in one test.

The reference registers its namespaces on the store instead of
shipping a PREFIX block with this query (graph.py:24-28);
operators/sparql.py's DEFAULT_PREFIXES play exactly that role, so the
query text runs unmodified.  The oracle is an independent pure-Python
walk of the parsed triple set.
"""

import pytest

from face_hunter_spark.operators import sparql
from face_hunter_spark.operators.rdf import parse_n3
from face_hunter_spark.operators.shacl import RDF_TYPE
from tests.conftest import requires_reference

pytestmark = [requires_reference]

REF = "/root/reference/models/example_graph"
OBAMA = "http://dbpedia.org/resource/Barack_Obama"
DEPICTS = "http://xmlns.com/foaf/0.1/depicts"
SCENE_FROM = "http://purl.org/ontology/video/sceneFrom"
T_START = (
    "http://swrl.stanford.edu/ontologies/builtins/3.3/"
    "temporal.owlhasStartTime"
)
T_FINISH = (
    "http://swrl.stanford.edu/ontologies/builtins/3.3/"
    "temporal.owlhasFinishTime"
)
DC_ID = "http://purl.org/dc/elements/1.1/identifier"
DC_TITLE = "http://purl.org/dc/elements/1.1/title"
CLS_SCENE = "http://purl.org/ontology/video/Scene"

# the reference's query string (graph.py:180-192) with only the
# anchor entity spliced in — exactly what its code does
REF_QUERY = f"""
SELECT distinct ?title ?link ?dbpedia_entity ?start ?end
 WHERE {{
 ?scene a video:Scene ;
 foaf:depicts <{OBAMA}> ;
 foaf:depicts ?dbpedia_entity ;
 temporal:hasStartTime ?start ;
 temporal:hasFinishTime ?end ;
 video:sceneFrom ?video .
 ?video a mpeg7:Video ;
 dc:identifier ?link ;
 dc:title ?title .
 }}
"""


@pytest.fixture(scope="module")
def ref_triples():
    return parse_n3(open(REF).read())


@pytest.fixture(scope="module")
def triples_df(spark, ref_triples):
    return spark.createDataFrame(
        sorted(ref_triples), "subj string, pred string, obj string"
    )


def _mirror(trip):
    """Pure-Python evaluation of REF_QUERY over the parsed triple set."""
    by_sp = {}
    for s, p, o in trip:
        by_sp.setdefault((s, p), set()).add(o)
    rows = set()
    for s, p, o in trip:
        if p != RDF_TYPE or o != CLS_SCENE:
            continue
        scene = s
        ents = by_sp.get((scene, DEPICTS), set())
        if OBAMA not in ents:
            continue
        for video in by_sp.get((scene, SCENE_FROM), set()):
            for link in by_sp.get((video, DC_ID), set()):
                for title in by_sp.get((video, DC_TITLE), set()):
                    for start in by_sp.get((scene, T_START), set()):
                        for end in by_sp.get((scene, T_FINISH), set()):
                            for e in ents:
                                rows.add((title, link, e, start, end))
    return rows


def test_reference_query_on_reference_artifact(triples_df, ref_triples):
    got = {
        tuple(r)
        for r in sparql.execute(triples_df, REF_QUERY).collect()
    }
    want = _mirror(ref_triples)
    assert want, "oracle found no Obama scenes — artifact parse broke"
    assert got == want
    # the artifact is known content: Obama appears in the Afghanistan
    # videos; sanity-pin a couple of invariants so a silently-empty
    # join can't pass
    titles = {t for t, *_ in got}
    assert any("Obama" in t for t in titles)
    assert all(link.startswith("http://www.youtube.com/watch?v=")
               for _, link, *_ in got)


def test_ask_against_reference_artifact(triples_df):
    assert sparql.execute(
        triples_df,
        f'ASK {{ ?s foaf:depicts <{OBAMA}> }}',
    ) is True
    assert sparql.execute(
        triples_df,
        'ASK { ?s foaf:depicts <http://dbpedia.org/resource/Nobody> }',
    ) is False


def test_filtered_variant_matches_mirror(triples_df, ref_triples):
    # the get_videos_with_filters shape (graph.py:194-244): same BGP
    # plus a FILTER over a bound variable, here a regex on the title
    q = REF_QUERY.rstrip().rstrip("}") + (
        ' FILTER ( regex(str(?title), "Afghanistan") ) }'
    )
    got = {
        tuple(r) for r in sparql.execute(triples_df, q).collect()
    }
    want = {r for r in _mirror(ref_triples) if "Afghanistan" in r[0]}
    assert want and got == want
