"""Training-surface gates (SURVEY §2 #13/#14/#17): finite-difference
gradient checks for the CRF and softmax-CE losses through the full
BiLSTM model, optimizer behavior, convergence on a separable toy corpus,
and exactness of the Spark data-parallel gradient."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from zh_ner_tf_spark.config import TAG2LABEL
from zh_ner_tf_spark.model.train import (
    AdamState,
    batch_loss_and_grads,
    clip_by_global_norm,
    crf_loss_and_grad,
    distributed_loss_and_grads,
    sgd_step,
    softmax_ce_loss_and_grad,
)
from zh_ner_tf_spark.model.weights import WEIGHT_KEYS


def _tiny_weights(V=6, D=3, H=3, K=7, seed=7):
    rng = np.random.RandomState(seed)
    u = lambda *s: rng.uniform(-0.3, 0.3, s)  # noqa: E731
    return {
        "embeddings": u(V, D),
        "lstm_fw_kernel": u(D + H, 4 * H), "lstm_fw_bias": u(4 * H),
        "lstm_bw_kernel": u(D + H, 4 * H), "lstm_bw_bias": u(4 * H),
        "proj_W": u(2 * H, K), "proj_b": u(K),
        "transitions": u(K, K),
    }


def test_crf_loss_gradient_finite_difference():
    rng = np.random.RandomState(0)
    T, K = 5, 4
    logits = rng.randn(T, K)
    trans = rng.randn(K, K)
    labels = rng.randint(0, K, T)
    loss, dlogits, dtrans = crf_loss_and_grad(logits, labels, trans)
    assert loss > 0  # -log p of one path among K^T
    eps = 1e-6
    for _ in range(10):
        t, k = rng.randint(T), rng.randint(K)
        lp = logits.copy(); lp[t, k] += eps
        lm = logits.copy(); lm[t, k] -= eps
        num = (crf_loss_and_grad(lp, labels, trans)[0]
               - crf_loss_and_grad(lm, labels, trans)[0]) / (2 * eps)
        assert abs(num - dlogits[t, k]) < 1e-6
    for _ in range(10):
        i, j = rng.randint(K), rng.randint(K)
        tp = trans.copy(); tp[i, j] += eps
        tm = trans.copy(); tm[i, j] -= eps
        num = (crf_loss_and_grad(logits, labels, tp)[0]
               - crf_loss_and_grad(logits, labels, tm)[0]) / (2 * eps)
        assert abs(num - dtrans[i, j]) < 1e-6


def test_softmax_ce_gradient_finite_difference():
    rng = np.random.RandomState(1)
    logits = rng.randn(4, 5)
    labels = rng.randint(0, 5, 4)
    _, d = softmax_ce_loss_and_grad(logits, labels)
    eps = 1e-6
    for _ in range(10):
        t, k = rng.randint(4), rng.randint(5)
        lp = logits.copy(); lp[t, k] += eps
        lm = logits.copy(); lm[t, k] -= eps
        num = (softmax_ce_loss_and_grad(lp, labels)[0]
               - softmax_ce_loss_and_grad(lm, labels)[0]) / (2 * eps)
        assert abs(num - d[t, k]) < 1e-6


@pytest.mark.parametrize("use_crf", [True, False])
def test_full_model_gradient_finite_difference(use_crf):
    """BPTT through embeddings -> BiLSTM -> projection (-> CRF): every
    weight array's analytic gradient matches central differences."""
    rng = np.random.RandomState(2)
    W = _tiny_weights()
    batch = [
        ([1, 2, 3, 4], [0, 1, 6, 6]),
        ([5, 0, 2], [2, 3, 6]),
    ]
    _, _, _, g = batch_loss_and_grads(batch, W, use_crf=use_crf)
    eps = 1e-6
    for key in WEIGHT_KEYS:
        if key == "transitions" and not use_crf:
            assert np.allclose(g[key], 0.0)
            continue
        flat_idx = rng.choice(W[key].size, size=min(4, W[key].size), replace=False)
        for fi in flat_idx:
            idx = np.unravel_index(fi, W[key].shape)
            Wp = {k: v.copy() for k, v in W.items()}; Wp[key][idx] += eps
            Wm = {k: v.copy() for k, v in W.items()}; Wm[key][idx] -= eps
            lp = batch_loss_and_grads(batch, Wp, use_crf=use_crf)[0]
            lm = batch_loss_and_grads(batch, Wm, use_crf=use_crf)[0]
            num = (lp - lm) / (2 * eps)
            assert abs(num - g[key][idx]) < 2e-5, (key, idx, num, g[key][idx])


def test_clip_and_optimizers():
    from zh_ner_tf_spark.model.train import clip_by_value

    g = {k: np.full((2, 2), 3.0) for k in WEIGHT_KEYS}
    # reference rule: per-element value clip
    cv = clip_by_value({"a": np.array([-9.0, 2.0, 9.0])}, clip=5.0)
    assert cv["a"].tolist() == [-5.0, 2.0, 5.0]
    clipped = clip_by_global_norm(g, clip_norm=1.0)
    gn = np.sqrt(sum((v * v).sum() for v in clipped.values()))
    assert abs(gn - 1.0) < 1e-12
    W = {k: np.zeros((2, 2), dtype=np.float32) for k in WEIGHT_KEYS}
    W2 = sgd_step(W, clipped, lr=0.1)
    assert all((W2[k] < 0).all() for k in WEIGHT_KEYS)
    adam = AdamState(lr=0.1)
    W3 = adam.step(W, clipped)
    # first Adam step moves every coordinate ~lr in -sign(g)
    assert all(np.allclose(W3[k], -0.1, atol=1e-3) for k in WEIGHT_KEYS)


def test_training_converges_on_separable_corpus():
    """Sequential loop (the Spark path computes the identical gradient —
    next test): a tiny class-separable corpus becomes decodable after a
    few Adam steps and the loss drops monotonically-ish."""
    from zh_ner_tf_spark.oracle import viterbi_decode
    from zh_ner_tf_spark.oracle.numpy_ref import bilstm_logits

    rng = np.random.RandomState(3)
    V, K = 8, 7
    # chars 1-3 -> PER span, char 4 -> O: B-PER=TAG2LABEL['B-PER'] etc.
    B, I, O = TAG2LABEL["B-PER"], TAG2LABEL["I-PER"], TAG2LABEL["O"]
    corpus = []
    for _ in range(12):
        n_ent = rng.randint(1, 3)
        ids, labels = [], []
        for _ in range(n_ent):
            span = rng.randint(1, 4)
            ids += list(rng.randint(1, 4, span)) + [4]
            labels += [B] + [I] * (span - 1) + [O]
        corpus.append((ids, labels))
    W = _tiny_weights(V=V)
    adam = AdamState(lr=0.05)
    losses = []
    for _ in range(40):
        total, n, _, g = batch_loss_and_grads(corpus, W, use_crf=True)
        losses.append(total / n)
        mg = clip_by_global_norm({k: g[k] / n for k in WEIGHT_KEYS}, 5.0)
        W = adam.step(W, mg)
    assert losses[-1] < 0.3 * losses[0]
    # decoded train sentences match gold
    correct = total_tok = 0
    for ids, labels in corpus:
        logits = bilstm_logits(ids, W)
        got = viterbi_decode(logits, np.asarray(W["transitions"], dtype=np.float64))
        correct += sum(int(a == b) for a, b in zip(got, labels))
        total_tok += len(labels)
    assert correct / total_tok > 0.95


def test_distributed_gradient_equals_sequential(spark):
    """mapInPandas partition partials '+'-combine to EXACTLY the
    sequential batch gradient (sums are associative)."""
    from zh_ner_tf_spark.config import LABEL2TAG
    from zh_ner_tf_spark.operators.tagger import broadcast_model, encode_chars

    rng = np.random.RandomState(4)
    word2id = {"<PAD>": 0, "a": 1, "b": 2, "c": 3, " ": 4,
               "<NUM>": 5, "<ENG>": 6, "<UNK>": 7}
    W = {k: v.astype(np.float32) for k, v in _tiny_weights(V=8).items()}
    sents = []
    for _ in range(17):
        n = rng.randint(1, 6)
        chars = "".join(rng.choice(["a", "b", "c", " "], n))
        tags = [LABEL2TAG[int(t)] for t in rng.randint(0, 7, n)]
        sents.append((chars, tags))
    df = spark.createDataFrame(
        pd.DataFrame(sents, columns=["sentence", "tags"])
    ).repartition(5)
    wb, vb = broadcast_model(spark, W, word2id)
    d_loss, d_n, d_ntok, d_g = distributed_loss_and_grads(df, wb, vb)

    pairs = []
    for chars, tags in sents:
        ids = encode_chars(pd.Series(list(chars), dtype=object), word2id)
        pairs.append((ids.tolist(), [TAG2LABEL[t] for t in tags]))
    s_loss, s_n, s_ntok, s_g = batch_loss_and_grads(pairs, W)
    assert d_n == s_n
    assert d_ntok == s_ntok
    assert abs(d_loss - s_loss) < 1e-8
    for k in WEIGHT_KEYS:
        assert np.allclose(d_g[k], s_g[k], atol=1e-9), k
