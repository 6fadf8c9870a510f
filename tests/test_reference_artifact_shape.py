"""Shape parity against the reference's own committed output artifact
(`/root/reference/models/example_graph`, an rdflib-serialized n3 graph
of real Obama/DiCaprio scene links — SURVEY.md §5 'example golden
artifact').

The reference's eval videos can't be re-processed offline (no models,
no network), so the P/R gate runs against the reference-semantics
oracle on synthetic data (test_pipeline_parity).  THIS test closes the
remaining gap at the artifact level: every structural property of the
real output — the exact expanded predicate URIs, the scene-URI
`#t=H:MM:SS,H:MM:SS` format, the temporal literal shapes, and the
per-scene predicate bundle — must hold for our pipeline's triples too,
so a reader of both graphs sees the same schema.

Parsing is textual (prefixed turtle, no rdflib in this container);
the reference file is read-only input.
"""

import re

import pytest

from tests.conftest import requires_reference, requires_testdata

# needs the reference checkout (artifact) AND the driver parquet
# fixtures (our pipeline input)
pytestmark = [requires_reference, requires_testdata]

REF = "/root/reference/models/example_graph"
SCENE_T = re.compile(r"#t=\d+:\d{2}:\d{2},\d+:\d{2}:\d{2}$")
HMS = re.compile(r"^\d+:\d{2}:\d{2}$")


def _parse_reference():
    """-> (prefix map, set of expanded predicates, scene subjects,
    per-scene predicate bundles, temporal literals)."""
    prefixes, preds, scenes, literals = {}, set(), {}, []
    subj = None
    for raw in open(REF):
        line = raw.strip()
        m = re.match(r"@prefix (\w+): <([^>]+)> \.", line)
        if m:
            prefixes[m.group(1)] = m.group(2)
            continue
        m = re.match(r"<([^>]+)> a (\w+):(\w+) ;?", line)
        if m:
            subj = m.group(1)
            preds.add("http://www.w3.org/1999/02/22-rdf-syntax-ns#type")
            if (m.group(2), m.group(3)) == ("video", "Scene"):
                scenes.setdefault(subj, set()).add("rdf:type")
            continue
        m = re.match(r"(\w+):(\w+) (.+?) [;.]$", line)
        if m and subj:
            pfx, local, obj = m.groups()
            preds.add(prefixes[pfx] + local)
            if subj in scenes:
                scenes[subj].add(f"{pfx}:{local}")
            lm = re.match(r'"([^"]+)"\^\^xsd:(dateTime|duration)', obj)
            if lm:
                literals.append(lm.group(1))
    return prefixes, preds, scenes, literals


@pytest.fixture(scope="module")
def ref():
    return _parse_reference()


@pytest.fixture(scope="module")
def our_triples(spark):
    import __spark_entry__ as em

    return em._kg_pipeline(spark, "/root/testdata/sf0.001").collect()


def test_reference_predicates_all_emitted(ref, our_triples):
    """Every predicate URI in the reference artifact appears in our
    output (we additionally emit the sdo:/hunter: aliases)."""
    _, ref_preds, _, _ = ref
    ours = {r.pred for r in our_triples}
    missing = ref_preds - ours
    assert not missing, missing


def test_scene_uri_format_matches_artifact(ref, our_triples):
    _, _, ref_scenes, _ = ref
    assert all(SCENE_T.search(s) for s in ref_scenes)  # artifact sanity
    from face_hunter_spark.schemas import NS

    ours = {r.subj for r in our_triples
            if r.pred == NS["video_scene_from"]}
    assert ours
    bad = [s for s in ours if not SCENE_T.search(s)]
    assert not bad, bad[:3]


def test_temporal_literal_semantics_match(ref, our_triples):
    """Temporal literals use the same H:MM:SS (str(timedelta),
    sub-seconds stripped) shape as the artifact."""
    _, _, _, ref_literals = ref
    assert ref_literals and all(HMS.match(x) for x in ref_literals)
    from face_hunter_spark.schemas import NS

    t_preds = {NS["temporal_has_start"], NS["temporal_has_finish"],
               NS["temporal_duration"]}
    ours = [r.obj for r in our_triples if r.pred in t_preds]
    assert ours
    bad = [x for x in ours if not HMS.match(x)]
    assert not bad, bad[:3]


def test_per_scene_predicate_bundle_matches(ref, our_triples):
    """Each scene subject carries the same predicate bundle as in the
    artifact: type, sceneFrom, temporalSegmentOf, start/finish/
    duration, >=1 depicts (ours adds the alias predicates on top)."""
    _, _, ref_scenes, _ = ref
    ref_bundle = set().union(*ref_scenes.values())
    assert ref_bundle == {
        "rdf:type", "video:sceneFrom", "video:temporalSegmentOf",
        "temporal:hasStartTime", "temporal:hasFinishTime",
        "temporal:duration", "foaf:depicts",
    }
    from face_hunter_spark.schemas import NS

    expected = {NS["rdf_type"], NS["video_scene_from"],
                NS["video_temporal_segment_of"], NS["temporal_has_start"],
                NS["temporal_has_finish"], NS["temporal_duration"],
                NS["foaf_depicts"], NS["sdo_depicts"]}
    by_scene = {}
    for r in our_triples:
        if "#t=" in r.subj:
            by_scene.setdefault(r.subj, set()).add(r.pred)
    assert by_scene
    for subj, bundle in by_scene.items():
        assert bundle == expected, (subj, bundle ^ expected)
