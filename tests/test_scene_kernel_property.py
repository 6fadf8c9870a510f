"""Property-based parity: the distributed engine's scene kernel
(`operators/scenes.extract_scenes_kernel`) against the independently
re-derived reference state machine
(`reference_oracle.scenes_reference_style`) on random prediction
sequences — every quirk path (length-only match, backdated ends,
empty-frame sentinels, open-scene final-frame close) gets fuzzed, not
just the goldens.  Pure Python, no Spark session needed."""

from hypothesis import given, settings
from hypothesis import strategies as st

from face_hunter_spark.operators.scenes import extract_scenes_kernel
from face_hunter_spark.reference_oracle import scenes_reference_style

ENTITIES = ["A", "B", "C", "unknown"]

frame = st.lists(st.sampled_from(ENTITIES), min_size=0, max_size=3)
sequences = st.lists(frame, min_size=0, max_size=24)
thresholds = st.integers(min_value=1, max_value=5)


def norm(scenes):
    return [(list(names), float(s), float(e)) for names, s, e in scenes]


@settings(max_examples=300, deadline=None)
@given(seq=sequences, thr=thresholds)
def test_kernel_matches_independent_state_machine(seq, thr):
    ts = [i * 1000.0 for i in range(len(seq))]
    assert norm(extract_scenes_kernel(seq, ts, thr)) == norm(
        scenes_reference_style(seq, ts, thr)
    )


@settings(max_examples=100, deadline=None)
@given(seq=sequences)
def test_kernel_scene_invariants(seq):
    """Structural invariants at the default threshold: scene bounds lie
    on frame timestamps, start <= end, names sorted and non-empty."""
    ts = [i * 1000.0 for i in range(len(seq))]
    for names, s, e in extract_scenes_kernel(seq, ts, 3):
        assert list(names) == sorted(names) and len(names) > 0
        assert s in ts and e in ts and s <= e
