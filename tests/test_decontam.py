"""Semantic tests for decontamination and repetition signals on
constructed corpora (the oracle-parity test covers the registered
queries; these pin the *behavioral* contract on known inputs)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from formula_1_spark.queries.decontam import (
    DECONTAM_N,
    decontaminate,
    ngrams_all,
    repetition_signals,
)


def _bucket(doc_id: int) -> int:
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) % 10


def _ids_by_split(n_train: int, n_eval: int) -> tuple[list[int], list[int]]:
    train, ev = [], []
    i = 0
    while len(train) < n_train or len(ev) < n_eval:
        (train if _bucket(i) < 8 else ev).append(i)
        i += 1
    return train[:n_train], ev[:n_eval]


def test_ngrams_all_keeps_duplicates(spark):
    df = spark.createDataFrame([(["a", "b", "a", "b"],)], "toks array<string>")
    [row] = df.select(ngrams_all(F.col("toks"), 2).alias("g")).collect()
    assert row.g == ["a b", "b a", "a b"]  # duplicate kept, order preserved


def test_ngrams_all_short_doc_empty(spark):
    df = spark.createDataFrame([(["a"],)], "toks array<string>")
    [row] = df.select(ngrams_all(F.col("toks"), 2).alias("g")).collect()
    assert row.g == []


def test_decontaminate_flags_cross_split_copy(spark):
    (a, b), (e,) = _ids_by_split(2, 1)
    leaked = " ".join(f"tok{i}" for i in range(20))  # 20 tokens -> 8 13-grams
    clean = " ".join(f"other{i}" for i in range(20))
    docs = spark.createDataFrame(
        [(a, leaked), (b, clean), (e, leaked)], "doc_id bigint, text string"
    )
    rows = {r.doc_id: r for r in decontaminate(docs).collect()}
    assert set(rows) == {a}  # only the train copy of the eval doc is hit
    assert rows[a].n_shared_13grams == 20 - DECONTAM_N + 1
    assert rows[a].contam_frac == 1.0


def test_decontaminate_partial_overlap(spark):
    (a,), (e,) = _ids_by_split(1, 1)
    shared = " ".join(f"s{i}" for i in range(DECONTAM_N))  # exactly one 13-gram
    docs = spark.createDataFrame(
        [
            (a, shared + " " + " ".join(f"t{i}" for i in range(10))),
            (e, shared),
        ],
        "doc_id bigint, text string",
    )
    rows = {r.doc_id: r for r in decontaminate(docs).collect()}
    assert rows[a].n_shared_13grams == 1
    assert 0.0 < rows[a].contam_frac < 1.0


def test_repetition_flags_degenerate_doc(spark):
    docs = spark.createDataFrame(
        [
            (1, " ".join(["spam"] * 30)),  # one token repeated
            (2, " ".join(f"w{i}" for i in range(30))),  # all distinct
        ],
        "doc_id bigint, text string",
    )
    rows = {r.doc_id: r for r in repetition_signals(docs).collect()}
    assert rows[1].rep_flag and rows[1].dup5_frac > 0.9
    assert not rows[2].rep_flag and rows[2].dup5_frac == 0.0
    assert rows[2].top2_frac == 2.0 / 30
