from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Keep per-worker BLAS single-threaded: the engine parallelizes across
# Spark tasks, and nested BLAS threading both oversubscribes and poisons
# the local[8]-vs-local[32] scaling evidence (BASELINE.md).
for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
SF_DIR_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from zh_ner_tf_spark.session import get_spark

    s = get_spark(app_name="zh_ner_tf_spark_tests", master="local[4]",
                  shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tiny_model():
    """Seeded tiny model + vocab + fixture corpus (FIXTURES.md P2-P4)."""
    from zh_ner_tf_spark.config import (
        ENG_TOKEN, NUM_TOKEN, PAD_TOKEN, TEST_EMBEDDING_DIM,
        TEST_HIDDEN_DIM, UNK_TOKEN,
    )
    from zh_ner_tf_spark.fixtures.corpus import gen_ner_corpus
    from zh_ner_tf_spark.model.weights import init_weights
    from zh_ner_tf_spark.oracle import normalize_token

    corpus = gen_ner_corpus(120, seed=42)
    # first-seen-order vocab (reference data.py:≈38-70 semantics, min_count=1)
    word2id = {PAD_TOKEN: 0}
    for chars, _ in corpus:
        for ch in chars:
            tok = normalize_token(ch)
            if tok not in word2id:
                word2id[tok] = len(word2id)
    for tok in (NUM_TOKEN, ENG_TOKEN, UNK_TOKEN):
        word2id.setdefault(tok, len(word2id))
    weights = init_weights(len(word2id), TEST_EMBEDDING_DIM, TEST_HIDDEN_DIM)
    return corpus, word2id, weights
