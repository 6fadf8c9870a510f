"""Unified CLI (face_hunter_spark/cli.py — the reference cli.py:149-212
action surface): every subcommand end-to-end on the synthetic corpus,
asserting on the JSON-line outputs."""

import json

import pytest

from face_hunter_spark import synth
from face_hunter_spark.cli import main

N_ENT = 8


def _out_lines(capsys):
    return [
        json.loads(line)
        for line in capsys.readouterr().out.strip().splitlines()
        if line.strip()
    ]


@pytest.fixture(scope="module")
def corpus_paths(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    docs_path = str(root / "docs.parquet")
    synth.documents_df(spark, 16, N_ENT).write.parquet(docs_path)
    return {"docs": docs_path, "kg": str(root / "kg")}


def test_link_then_search_and_export(spark, corpus_paths, capsys, tmp_path):
    rc = main([
        "link", "--documents", corpus_paths["docs"],
        "--catalog-root", corpus_paths["kg"],
        "--n-entities", str(N_ENT),
    ])
    assert rc == 0
    stats = _out_lines(capsys)[-1]
    assert stats["n_docs"] == 16 and stats["n_triples"] > 0

    # idempotent via the CLI too
    assert main([
        "link", "--documents", corpus_paths["docs"],
        "--catalog-root", corpus_paths["kg"],
        "--n-entities", str(N_ENT),
    ]) == 0
    assert _out_lines(capsys)[-1]["n_triples"] == 0

    rc = main([
        "search", "--entity", "Entity 001",
        "--catalog-root", corpus_paths["kg"],
        "--n-entities", str(N_ENT),
    ])
    assert rc == 0
    lines = _out_lines(capsys)
    assert lines[-1]["entity"] == "Entity 001"
    assert lines[-1]["n_scenes"] == len(lines) - 1 > 0

    out = str(tmp_path / "graph.n3")
    assert main([
        "export-n3", "--catalog-root", corpus_paths["kg"],
        "--n-entities", str(N_ENT), "--out", out,
    ]) == 0
    rep = _out_lines(capsys)[-1]
    assert rep["n_blocks"] > 0
    with open(out) as f:
        assert "@prefix" in f.read()


def test_search_without_state_exits_2(spark, tmp_path, capsys):
    assert main([
        "search", "--entity", "X",
        "--catalog-root", str(tmp_path / "nope"),
    ]) == 2


def test_find_threshold_sweep(spark, capsys):
    rc = main(["find-threshold", "--n-entities", str(N_ENT),
               "--samples", "3"])
    assert rc == 0
    lines = _out_lines(capsys)
    summary = lines[-1]
    grid = lines[:-1]
    assert len(grid) == 19  # 0.05 .. 0.95
    assert summary["samples_per_entity"] == 3
    # the synthetic gallery separates same/cross label pairs, so the
    # best threshold exists and recall is monotone non-decreasing
    assert summary["best_threshold"] is not None
    recalls = [g["recall"] for g in grid]
    assert recalls == sorted(recalls)
    assert all(0 <= g["recall"] <= 1 for g in grid)


def test_evaluate_reports_metrics(spark, corpus_paths, capsys):
    rc = main([
        "evaluate", "--documents", corpus_paths["docs"],
        "--catalog-root", corpus_paths["kg"],
        "--n-entities", str(N_ENT),
    ])
    assert rc == 0
    rep = _out_lines(capsys)[-1]
    assert rep["frame_metrics"]["f1"] > 0.9
    assert rep["n_videos"] == 16


def test_sparql_query_and_update(spark, corpus_paths, capsys):
    rc = main([
        "sparql", "--catalog-root", corpus_paths["kg"],
        "--query",
        "SELECT ?v ?s WHERE { ?v hunter:hasScene ?s } LIMIT 5",
    ])
    assert rc == 0
    lines = _out_lines(capsys)
    assert lines[-1]["n_rows"] == len(lines) - 1 == 5

    rc = main([
        "sparql", "--catalog-root", corpus_paths["kg"],
        "--update",
        'INSERT DATA { <http://example.org/d> <http://example.org/p> "v" . }',
    ])
    assert rc == 0
    assert _out_lines(capsys)[-1]["inserted"] == 1
    # exactly one of query/update
    assert main(["sparql", "--catalog-root", corpus_paths["kg"]]) == 2


def test_serve_subcommand(spark, corpus_paths, capsys):
    import urllib.request

    rc = main([
        "serve", "--catalog-root", corpus_paths["kg"],
        "--n-entities", str(N_ENT),
    ])
    assert rc == 0
    rep = _out_lines(capsys)[-1]
    assert rep["serving"] is True
    url = f"http://{rep['host']}:{rep['port']}/api/youtube/vid_00001"
    with urllib.request.urlopen(url, timeout=30) as r:
        body = json.loads(r.read())
    assert body["success"] is True and len(body["scenes"]) > 0
