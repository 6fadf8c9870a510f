"""File-format sources (SURVEY.md §2.1): binaryFile gallery scan,
entity-catalog CSV, eval-manifest CSV."""

import os

from face_hunter_spark import sources


def _touch(path: str, payload: bytes) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        f.write(payload)


def test_gallery_binary_scan_labels_and_filters(spark, tmp_path):
    root = str(tmp_path / "thumbs")
    _touch(f"{root}/Barack_Obama/img0.jpg", b"\xff\xd8obama0")
    _touch(f"{root}/Barack_Obama/img1.png", b"\x89PNGobama1")
    _touch(f"{root}/Leonardo_DiCaprio/img0.jpeg", b"\xff\xd8leo0")
    _touch(f"{root}/Leonardo_DiCaprio/notes.txt", b"not an image")
    _touch(f"{root}/Leonardo_DiCaprio/index.bin", b"\x00\x01")

    rows = sources.read_gallery_binaries(spark, root).collect()
    by_label = {}
    for r in rows:
        by_label.setdefault(r.entity_name, []).append(r)
    # non-images pruned at the source by pathGlobFilter
    assert sorted(by_label) == ["Barack Obama", "Leonardo DiCaprio"]
    assert len(by_label["Barack Obama"]) == 2
    assert len(by_label["Leonardo DiCaprio"]) == 1
    leo = by_label["Leonardo DiCaprio"][0]
    assert bytes(leo.content) == b"\xff\xd8leo0"
    assert leo.length == len(b"\xff\xd8leo0")


def test_gallery_from_binaries_builds_embeddings(spark, tmp_path):
    root = str(tmp_path / "thumbs")
    _touch(f"{root}/Ent_A/a0.jpg", b"payload-a0")
    _touch(f"{root}/Ent_A/a1.jpg", b"payload-a1")
    _touch(f"{root}/Ent_B/b0.png", b"payload-b0")
    gal = sources.gallery_from_binaries(spark, root).collect()
    assert sorted(r.label for r in gal) == ["Ent A", "Ent A", "Ent B"]
    dims = {len(r.embedding) for r in gal}
    assert dims == {32}  # FEATURE_DIM of the fake codec
    # deterministic: same bytes -> same features
    again = sources.gallery_from_binaries(spark, root).collect()
    assert sorted(map(repr, gal)) == sorted(map(repr, again))


def test_entity_catalog_csv_classification(spark, tmp_path):
    p_db = str(tmp_path / "db.csv")
    p_wd = str(tmp_path / "wd.csv")
    with open(p_db, "w") as f:
        f.write("index,entity,img,name,norm_name,folder_name\n")
        f.write("0,http://dbpedia.org/resource/Barack_Obama,i0.jpg,"
                "Barack Obama,Barack Obama,Barack_Obama\n")
        f.write("1,http://dbpedia.org/resource/Barack_Obama,i1.jpg,"
                "Barack Obama,Barack Obama,Barack_Obama\n")
    with open(p_wd, "w") as f:
        f.write("index,entity,img,name,norm_name,folder_name\n")
        f.write("0,http://www.wikidata.org/entity/Q76,q0.jpg,"
                "Barack Obama,Barack Obama,Barack_Obama\n")
    cat = sources.read_entity_catalog_csv(spark, [p_db, p_wd])
    rows = {r.entity: r for r in cat.collect()}
    # thumbnail-level duplicates collapse to one row per URI
    assert len(rows) == 2
    assert rows["http://dbpedia.org/resource/Barack_Obama"].source_kg == "dbpedia"
    assert rows["http://www.wikidata.org/entity/Q76"].source_kg == "wikidata"
    assert cat.schema["norm_name"].dataType.typeName() == "string"


def test_eval_manifest_csv_entity_split(spark, tmp_path):
    p = str(tmp_path / "information.csv")
    with open(p, "w") as f:
        f.write("file,entities\n")
        f.write("vid_a.mp4,Barack Obama; Angela Merkel\n")
        f.write("vid_b.mp4,Leonardo DiCaprio\n")
    rows = {r.file: list(r.entities)
            for r in sources.read_eval_manifest_csv(spark, p).collect()}
    assert rows["vid_a.mp4"] == ["Barack Obama", "Angela Merkel"]
    assert rows["vid_b.mp4"] == ["Leonardo DiCaprio"]


def test_interleaved_jsonl_roundtrip(spark, tmp_path):
    """JSONL write → explicit-schema read: schema equals DOCUMENTS,
    every span survives bit-exact (incl. the escaping-hostile text),
    and a malformed line lands as PERMISSIVE nulls, not a crash."""
    from face_hunter_spark import synth
    from face_hunter_spark.schemas import DOCUMENTS

    path = str(tmp_path / "docs.jsonl")
    synth.write_interleaved_jsonl(path, 11)
    df = sources.read_interleaved_jsonl(spark, path)
    assert df.schema.fieldNames() == DOCUMENTS.fieldNames()
    got = {
        r.doc_id: [
            (s.kind, s.text, s.media_ref, s.offset) for s in r.spans
        ]
        for r in df.collect()
    }
    want = {
        r["doc_id"]: [
            (s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in r["spans"]
        ]
        for r in synth.make_interleaved_jsonl_rows(11)
    }
    assert got == want

    # malformed line: PERMISSIVE mode nulls the row instead of failing
    with open(path, "a") as f:
        f.write("{not json at all\n")
    bad = sources.read_interleaved_jsonl(spark, path)
    assert bad.count() == 12
    assert bad.where("doc_id IS NULL").count() == 1
