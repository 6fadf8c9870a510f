"""Corpus-construction operators (operators/corpus.py)."""

import hashlib

import pytest

from face_hunter_spark.operators import corpus


def _split_of(key, weights, salt="split"):
    h = hashlib.md5(f"{salt}:{key}".encode()).hexdigest()[:8]
    total = sum(weights.values())
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        if h < corpus.hex_cutoff(acc):
            return name
    return names[-1]


def test_hash_split_deterministic_and_stable(spark):
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    big = spark.range(2000).withColumnRenamed("id", "doc_id")
    out = {r.doc_id: r.split for r in corpus.hash_split(big, w).collect()}
    # matches the sequential mirror exactly
    assert out == {i: _split_of(i, w) for i in range(2000)}
    # proportions in the right ballpark
    n_train = sum(1 for v in out.values() if v == "train")
    assert 0.75 * 2000 < n_train < 0.85 * 2000
    # stability: dropping half the corpus must not move anyone
    small = spark.range(0, 2000, 2).withColumnRenamed("id", "doc_id")
    out_small = {
        r.doc_id: r.split for r in corpus.hash_split(small, w).collect()
    }
    assert out_small == {i: out[i] for i in range(0, 2000, 2)}


def test_mixture_sample_rates_and_determinism(spark):
    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b") for i in range(2000)],
        "doc_id bigint, source string",
    )
    kept = corpus.mixture_sample(
        df, {"a": 1.0, "b": 0.25}, source_col="source", key_col="doc_id"
    )
    rows = kept.collect()
    n_a = sum(1 for r in rows if r.source == "a")
    n_b = sum(1 for r in rows if r.source == "b")
    assert n_a == 1000  # rate 1.0 keeps everything
    assert 150 < n_b < 350  # ~250
    # rerun bit-identical
    again = corpus.mixture_sample(
        df, {"a": 1.0, "b": 0.25}, source_col="source", key_col="doc_id"
    ).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    # unlisted source with default_rate=0.0 disappears
    df2 = df.withColumn("source", df.source.substr(1, 1))
    none = corpus.mixture_sample(df2, {"zzz": 1.0}, source_col="source",
                                 key_col="doc_id")
    assert none.count() == 0


def test_quality_filter_semantics(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog and then "
            "the dog naps in the warm sun for a while today"),
        (2, "!!! ### $$$ %%% ^^^ &&& *** ((( ))) @@@"),  # punct soup
        (3, "ok"),  # too short
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    kept = [r.doc_id for r in corpus.quality_filter(
        df, min_tokens=5, min_quality=0.5).collect()]
    assert kept == [1]
    # language allowlist: doc 1 is English
    kept_en = [r.doc_id for r in corpus.quality_filter(
        df, min_tokens=5, min_quality=0.5, langs=("en",)).collect()]
    assert kept_en == [1]
    kept_de = [r.doc_id for r in corpus.quality_filter(
        df, min_tokens=5, min_quality=0.5, langs=("de",)).collect()]
    assert kept_de == []


def py_pack(items, budget):
    seq, fill, out = 0, 0, []
    for doc_id, n in sorted(items):
        if fill > 0 and fill + n > budget:
            seq, fill = seq + 1, 0
        fill += n
        out.append((doc_id, n, seq, fill))
    return out


def test_pack_sequences_greedy(spark):
    items = [("d%02d" % i, 30 + (i * 37) % 90) for i in range(40)]
    df = spark.createDataFrame(
        [("b0", d, n) for d, n in items],
        "bucket string, doc_id string, n_tokens int",
    )
    got = sorted(
        (r.doc_id, r.n_tokens, r.seq_id, r.seq_fill)
        for r in corpus.pack_sequences(df, budget=128).collect()
    )
    assert got == sorted(py_pack(items, 128))
    # every sequence except possibly each bucket-tail fits the budget
    assert all(fill <= 128 for _, n, _, fill in got if n <= 128)


def test_pack_sequences_oversized_and_buckets(spark):
    df = spark.createDataFrame(
        [("b0", "a", 500), ("b0", "b", 10), ("b0", "c", 10),
         ("b1", "a", 10)],
        "bucket string, doc_id string, n_tokens int",
    )
    rows = {(r.bucket, r.doc_id): (r.seq_id, r.seq_fill)
            for r in corpus.pack_sequences(df, budget=100).collect()}
    # oversized doc owns seq 0; next doc starts seq 1
    assert rows[("b0", "a")] == (0, 500)
    assert rows[("b0", "b")] == (1, 10)
    assert rows[("b0", "c")] == (1, 20)
    # buckets pack independently
    assert rows[("b1", "a")] == (0, 10)
    with pytest.raises(ValueError):
        corpus.pack_sequences(df, budget=0)


def test_hash_split_validates(spark):
    df = spark.range(3).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError):
        corpus.hash_split(df, {"a": 0.0})
    with pytest.raises(ValueError):
        corpus.hex_cutoff(1.5)


def test_hex_cutoff_rate_one_is_inclusive():
    """fraction >= 1.0 must keep EVERY key, including those whose
    32-bit md5 prefix is all ones (~2^-32 per row — unsampleable in
    test data, so assert on the cutoff directly: ADVICE r3)."""
    c = corpus.hex_cutoff(1.0)
    assert "ffffffff" < c  # the old clamp lost exactly this prefix
    assert "00000000" < c
    # monotone with real fractions
    assert corpus.hex_cutoff(0.999999) < c
