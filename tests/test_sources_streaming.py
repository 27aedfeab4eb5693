"""CoNLL corpus scan (format parity with the reference on-disk layout)
and the streaming variant's batch-equivalence smoke."""

from __future__ import annotations

import pandas as pd

from zh_ner_tf_spark.fixtures.corpus import gen_ner_corpus, write_conll
from zh_ner_tf_spark.sources.conll import read_corpus


def test_read_corpus_round_trip(spark, tmp_path):
    corpus = gen_ner_corpus(80, seed=42)
    path = str(tmp_path / "train_data")
    write_conll(path, corpus)
    df = read_corpus(spark, path)
    rows = {r["sent_id"]: (list(r["chars"]), list(r["tags"])) for r in df.collect()}
    assert len(rows) == len(corpus)
    for i, (chars, tags) in enumerate(corpus):
        assert rows[i] == (chars, tags), i


def test_read_corpus_multi_file(spark, tmp_path):
    c1 = gen_ner_corpus(10, seed=1)
    c2 = gen_ner_corpus(12, seed=2)
    write_conll(str(tmp_path / "a.txt"), c1)
    write_conll(str(tmp_path / "b.txt"), c2)
    df = read_corpus(spark, str(tmp_path))
    got = df.groupBy("file").count().collect()
    counts = {r["file"].rsplit("/", 1)[-1]: r["count"] for r in got}
    assert counts == {"a.txt": 10, "b.txt": 12}


def test_stream_tagger_matches_batch(spark, tiny_model, tmp_path):
    """Structured Streaming variant: same operator over a file stream
    must produce exactly the batch output (stateless, per-row determinism)."""
    corpus, word2id, weights = tiny_model
    corpus = corpus[:30]
    from zh_ner_tf_spark.operators.tagger import broadcast_model, tag_sentences
    from zh_ner_tf_spark.streaming import tag_stream

    src = str(tmp_path / "src")
    sents = pd.DataFrame(
        {"doc_id": range(len(corpus)), "sentence": ["".join(c) for c, _ in corpus]}
    )
    spark.createDataFrame(sents).write.parquet(src)

    wb, vb = broadcast_model(spark, weights, word2id)
    batch_out = {
        r["doc_id"]: list(r["tags"])
        for r in tag_sentences(
            spark.read.parquet(src), wb, vb, ["doc_id"], "sentence"
        ).collect()
    }

    stream = spark.readStream.schema("doc_id long, sentence string").parquet(src)
    out_dir = str(tmp_path / "out")
    q = (
        tag_stream(stream, wb, vb, ["doc_id"], "sentence")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["doc_id"]: list(r["tags"]) for r in spark.read.parquet(out_dir).collect()
    }
    assert got == batch_out
