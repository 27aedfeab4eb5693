"""Unit tests for the sequential NumPy oracle itself — hand-computed
recurrence examples (SURVEY.md §7 watch-list item 1) plus BIO/conlleval
rule checks. The oracle is the reference stand-in; these tests pin ITS
semantics before anything distributed is trusted against it."""

from __future__ import annotations

import numpy as np

from zh_ner_tf_spark.oracle import (
    conlleval_metrics,
    get_entities,
    lstm_forward,
    normalize_token,
    sentence2id,
    viterbi_decode,
)


def _sig(x):
    return 1.0 / (1.0 + np.exp(-x))


def test_lstm_matches_hand_computed_two_steps():
    # D=1, H=1: kernel [2,4] (i, j, f, o), bias [4]
    k = np.array([[0.5, -0.3, 0.2, 0.1],
                  [0.4, 0.6, -0.5, 0.3]])
    b = np.array([0.01, -0.02, 0.03, 0.04])
    x = np.array([[1.0], [-2.0]])
    out = lstm_forward(x, k, b)

    # manual step 1 (h=c=0)
    z = x[0, 0] * k[0] + b
    i, j, f, o = z
    c1 = 0.0 * _sig(f + 1.0) + _sig(i) * np.tanh(j)
    h1 = np.tanh(c1) * _sig(o)
    # manual step 2
    z = x[1, 0] * k[0] + h1 * k[1] + b
    i, j, f, o = z
    c2 = c1 * _sig(f + 1.0) + _sig(i) * np.tanh(j)
    h2 = np.tanh(c2) * _sig(o)
    assert np.allclose(out[:, 0], [h1, h2], atol=1e-12)


def test_lstm_forget_bias_is_applied():
    # With f-gate weights zero, forget_bias=1.0 makes σ(1.0)≈0.731 the
    # carry coefficient — distinguishable from σ(0)=0.5.
    k = np.zeros((2, 4))
    k[0, 0] = 10.0   # i-gate saturates -> σ≈1
    k[0, 1] = 10.0   # j saturates -> tanh≈1
    b = np.zeros(4)
    x = np.array([[1.0], [0.0]])
    out = lstm_forward(x, k, b)
    # step1: c1 ≈ 1.0; step2: x=0 -> i=j=0 -> c2 = c1*σ(1.0) + σ(0)*tanh(0)
    c1 = _sig(10.0) * np.tanh(10.0)
    c2 = c1 * _sig(1.0)
    h2 = np.tanh(c2) * _sig(0.0)
    assert abs(out[1, 0] - h2) < 1e-12


def test_viterbi_hand_example_and_tie_break():
    # 2 tags, 3 steps; transitions chosen so path flips.
    score = np.array([[1.0, 0.0], [0.0, 0.0], [0.0, 1.0]])
    trans = np.array([[0.5, -1.0], [-1.0, 0.5]])
    # stay-paths rewarded: best = [0,0,?]: t2: from 0: 0->1 = -1 +1; 0->0=0.5
    path = viterbi_decode(score, trans)
    assert path[0] == 0
    # exact tie everywhere -> np.argmax first-occurrence -> all tag 0
    tie = viterbi_decode(np.zeros((3, 2)), np.zeros((2, 2)))
    assert tie == [0, 0, 0]


def test_normalize_unicode_digits():
    # Python str.isdigit is Unicode-wide — the reference semantics.
    assert normalize_token("5") == "<NUM>"
    assert normalize_token("１") == "<NUM>"   # full-width
    assert normalize_token("²") == "<NUM>"   # superscript
    assert normalize_token("Q") == "<ENG>"
    assert normalize_token("z") == "<ENG>"
    assert normalize_token("中") == "中"
    assert normalize_token("。") == "。"


def test_sentence2id_unk_fallback():
    vocab = {"<PAD>": 0, "中": 1, "<NUM>": 2, "<ENG>": 3, "<UNK>": 4}
    assert sentence2id(list("中9x!"), vocab) == [1, 2, 3, 4]


def test_bio_span_extraction_rules():
    tags = ["B-PER", "I-PER", "O", "B-ORG", "B-ORG", "I-LOC", "I-LOC"]
    chars = list("abcdefg")
    spans = get_entities(tags, chars)
    # B-ORG B-ORG: adjacency flushes; dangling I-LOC opens (pinned rule).
    assert spans == [
        ("ab", "PER", 0, 1),
        ("d", "ORG", 3, 3),
        ("e", "ORG", 4, 4),
        ("fg", "LOC", 5, 6),
    ]
    # entity at last position flushes at end-of-seq
    assert get_entities(["O", "B-LOC"], list("xy")) == [("y", "LOC", 1, 1)]
    # length-1
    assert get_entities(["B-PER"], ["x"]) == [("x", "PER", 0, 0)]
    assert get_entities(["O"], ["x"]) == []


def test_conlleval_metrics_hand_example():
    gold = [["B-PER", "I-PER", "O", "B-LOC"]]
    pred = [["B-PER", "I-PER", "B-LOC", "O"]]
    m = conlleval_metrics(gold, pred)
    assert m["PER"]["correct"] == 1 and m["PER"]["precision"] == 1.0
    assert m["LOC"]["correct"] == 0
    assert m["__overall__"]["guessed"] == 2
    assert m["__overall__"]["gold"] == 2
    assert m["__overall__"]["precision"] == 0.5
    assert abs(m["__overall__"]["accuracy"] - 0.5) < 1e-12
