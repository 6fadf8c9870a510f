from face_hunter_spark import synth
from face_hunter_spark.evalharness import evaluate_linking
from face_hunter_spark.schemas import DOCUMENTS


def test_linker_scores_near_perfect_on_clean_gallery(spark):
    docs = spark.createDataFrame(synth.make_documents_pdf(40, 12), DOCUMENTS)
    gallery = synth.make_gallery_pdf(n_entities=12, thumbs_per_entity=6,
                                     distractors=3)
    report = evaluate_linking(docs, gallery, n_entities=12)
    m = report["frame_metrics"]
    # entities are well-separated in 512-d; the end-to-end linker must
    # be near-perfect (errors would mean pipeline plumbing bugs)
    assert m["accuracy"] > 0.97, m
    assert m["precision"] > 0.97 and m["recall"] > 0.97 and m["f1"] > 0.97
    assert report["video_accuracy"] == 1.0
    assert report["n_videos"] == 40


def test_tight_threshold_hurts_recall_not_precision(spark):
    docs = spark.createDataFrame(synth.make_documents_pdf(25, 12), DOCUMENTS)
    gallery = synth.make_gallery_pdf(n_entities=12, thumbs_per_entity=6,
                                     distractors=3)
    strict = evaluate_linking(docs, gallery, n_entities=12,
                              distance_threshold=0.0001)
    # with an impossibly tight threshold everything is 'unknown':
    # recall collapses, precision is 0/0-free because empty preds give
    # zero-size y -> division yields null which avg skips
    assert strict["frame_metrics"]["recall"] < 0.05
