"""Parity + invariance gates for the mapInPandas tagger (BASELINE.md:
"Viterbi tag sequences: exact match vs NumPy oracle ... batch sizes
{1,7,64}, partitions {1,8,32}")."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from zh_ner_tf_spark.operators.tagger import broadcast_model, tag_sentences
from zh_ner_tf_spark.oracle import get_entities, tag_sentence


def _corpus_df(spark, corpus):
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(corpus)),
            "chars": [chars for chars, _ in corpus],
        }
    )
    return spark.createDataFrame(pdf)


def _oracle_tags(corpus, word2id, weights):
    return {
        i: tag_sentence(chars, word2id, weights)
        for i, (chars, _) in enumerate(corpus)
    }


def _collect_tags(df):
    return {r["doc_id"]: list(r["tags"]) for r in df.collect()}


def test_tagger_matches_oracle_tag_for_tag(spark, tiny_model):
    corpus, word2id, weights = tiny_model
    wb, vb = broadcast_model(spark, weights, word2id)
    df = _corpus_df(spark, corpus)
    got = _collect_tags(tag_sentences(df, wb, vb, ["doc_id"]))
    want = _oracle_tags(corpus, word2id, weights)
    assert got == want


@pytest.mark.parametrize("batch_size", [1, 7, 64])
def test_tagger_invariant_to_arrow_batch_size(spark, tiny_model, batch_size):
    corpus, word2id, weights = tiny_model
    corpus = corpus[:40]
    wb, vb = broadcast_model(spark, weights, word2id)
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key)
    try:
        spark.conf.set(key, str(batch_size))
        got = _collect_tags(tag_sentences(_corpus_df(spark, corpus), wb, vb, ["doc_id"]))
    finally:
        spark.conf.set(key, old)
    assert got == _oracle_tags(corpus, word2id, weights)


@pytest.mark.parametrize("parts", [1, 8, 32])
def test_tagger_invariant_to_partitioning_and_order(spark, tiny_model, parts):
    corpus, word2id, weights = tiny_model
    corpus = corpus[:60]
    wb, vb = broadcast_model(spark, weights, word2id)
    df = _corpus_df(spark, corpus).repartition(parts).orderBy(F.rand(7))
    got = _collect_tags(tag_sentences(df, wb, vb, ["doc_id"]))
    assert got == _oracle_tags(corpus, word2id, weights)


def test_tagger_mention_emission_matches_oracle_spans(spark, tiny_model):
    corpus, word2id, weights = tiny_model
    wb, vb = broadcast_model(spark, weights, word2id)
    df = _corpus_df(spark, corpus)
    rows = tag_sentences(df, wb, vb, ["doc_id"], emit="mentions").collect()
    got = {
        (r["doc_id"], r["mention"], r["etype"], r["begin"], r["end"])
        for r in rows
    }
    want = set()
    for i, (chars, _) in enumerate(corpus):
        tags = tag_sentence(chars, word2id, weights)
        for mention, etype, b, e in get_entities(tags, chars):
            want.add((i, mention, etype, b, e))
    assert got == want


def test_tagger_accepts_sentence_strings(spark, tiny_model):
    corpus, word2id, weights = tiny_model
    sents = ["".join(chars) for chars, _ in corpus[:20]]
    wb, vb = broadcast_model(spark, weights, word2id)
    df = spark.createDataFrame(pd.DataFrame({"doc_id": range(len(sents)), "sentence": sents}))
    got = _collect_tags(
        tag_sentences(df, wb, vb, ["doc_id"], chars_col="sentence")
    )
    want = {i: tag_sentence(list(s), word2id, weights) for i, s in enumerate(sents)}
    assert got == want


def test_tagger_argmax_decode_matches_oracle(spark, tiny_model):
    # operator #15: the reference's CRF=False branch (per-timestep argmax)
    corpus, word2id, weights = tiny_model
    corpus = corpus[:40]
    wb, vb = broadcast_model(spark, weights, word2id)
    got = _collect_tags(
        tag_sentences(_corpus_df(spark, corpus), wb, vb, ["doc_id"], use_crf=False)
    )
    want = {
        i: tag_sentence(chars, word2id, weights, use_crf=False)
        for i, (chars, _) in enumerate(corpus)
    }
    assert got == want
