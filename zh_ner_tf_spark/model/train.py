"""Training surface — SURVEY.md §2 operators #13 (CRF log-likelihood
loss), #14 (masked softmax cross-entropy), #17 (optimizer step with
global-norm clipping).

The reference trains with ``tf.contrib.crf.crf_log_likelihood`` +
``AdamOptimizer`` + per-element ``clip_by_value(±clip)`` (model.py:≈102-135
[R], clip=5.0 / lr=0.001 from main.py argparse [R]). Here the exact same math
is implemented in NumPy over the engine's weight dict (float64
internally; finite-difference-tested), with a Spark data-parallel
gradient operator for scale:

  * per-sentence forward caches gates/states; BPTT through the TF-1.x
    LSTM cell (i, j, f, o gate order, forget_bias added pre-sigmoid —
    the same frozen semantics as oracle/numpy_ref.lstm_forward).
  * CRF loss: gold path score vs log-partition (forward algorithm);
    gradients from forward-backward posteriors (marginal - one-hot for
    emissions, expected - observed transition counts).
  * softmax CE: the reference's CRF=False branch — mean over tokens of
    sparse CE (sequence mask = true lengths; we never pad here).
  * distributed gradients: mapInPandas computes per-partition (sum-of-
    gradient, sum-of-loss, n-sentences) against broadcast weights; the
    driver sums partials and applies one optimizer step — synchronous
    data-parallel SGD/Adam, the standard parameter-server-less shape for
    a model this size (~7 MB: broadcast per step is cheap; at larger
    sizes the same operator feeds a torrent broadcast).

Training runs OFFLINE relative to the serving engine: the product of
``train`` is the frozen ``.npz`` the tagger broadcasts.
"""

from __future__ import annotations

from collections.abc import Iterable

import numpy as np

from zh_ner_tf_spark.config import FORGET_BIAS
from zh_ner_tf_spark.model.weights import WEIGHT_KEYS


def _sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-x))


def _lse(x: np.ndarray, axis: int) -> np.ndarray:
    m = np.max(x, axis=axis, keepdims=True)
    return (m + np.log(np.sum(np.exp(x - m), axis=axis, keepdims=True))).squeeze(axis)


# --------------------------------------------------------------------------
# forward with cache + BPTT through one LSTM direction
# --------------------------------------------------------------------------
def _lstm_forward_cached(x: np.ndarray, kernel: np.ndarray, bias: np.ndarray):
    """Forward identical to oracle/numpy_ref.lstm_forward, caching the
    per-step tensors BPTT needs. Returns (out [T,H], cache)."""
    T, _ = x.shape
    H = kernel.shape[1] // 4
    h = np.zeros(H)
    c = np.zeros(H)
    out = np.zeros((T, H))
    cache = []
    for t in range(T):
        zcat = np.concatenate([x[t], h])
        z = zcat @ kernel + bias
        i, j, f, o = np.split(z, 4)
        si, tj, sf, so = _sigmoid(i), np.tanh(j), _sigmoid(f + FORGET_BIAS), _sigmoid(o)
        c_prev = c
        c = c_prev * sf + si * tj
        tc = np.tanh(c)
        h = tc * so
        out[t] = h
        cache.append((zcat, si, tj, sf, so, c_prev, tc))
    return out, cache


def _lstm_backward(
    dout: np.ndarray, cache: list, kernel: np.ndarray, D: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """BPTT: dout [T,H] -> (dx [T,D], dkernel, dbias)."""
    T = dout.shape[0]
    H = dout.shape[1]
    dK = np.zeros_like(kernel)
    db = np.zeros(4 * H)
    dx = np.zeros((T, D))
    dh_next = np.zeros(H)
    dc_next = np.zeros(H)
    for t in range(T - 1, -1, -1):
        zcat, si, tj, sf, so, c_prev, tc = cache[t]
        dh = dout[t] + dh_next
        dso = dh * tc
        dc = dc_next + dh * so * (1.0 - tc * tc)
        dsf = dc * c_prev
        dc_next = dc * sf
        dsi = dc * tj
        dtj = dc * si
        dz = np.concatenate([
            dsi * si * (1.0 - si),
            dtj * (1.0 - tj * tj),
            dsf * sf * (1.0 - sf),
            dso * so * (1.0 - so),
        ])
        dK += np.outer(zcat, dz)
        db += dz
        dzcat = dz @ kernel.T
        dx[t] = dzcat[:D]
        dh_next = dzcat[D:]
    return dx, dK, db


# --------------------------------------------------------------------------
# losses: CRF negative log-likelihood (#13) and masked softmax CE (#14)
# --------------------------------------------------------------------------
def crf_loss_and_grad(
    logits: np.ndarray, labels: np.ndarray, trans: np.ndarray
) -> tuple[float, np.ndarray, np.ndarray]:
    """-log p(labels | logits, trans) for ONE sentence, with analytic
    gradients wrt logits and transitions (forward-backward posteriors).
    Matches tf.contrib.crf.crf_log_likelihood semantics at true length."""
    T, K = logits.shape
    alpha = np.zeros((T, K))
    alpha[0] = logits[0]
    for t in range(1, T):
        alpha[t] = logits[t] + _lse(alpha[t - 1][:, None] + trans, axis=0)
    logZ = float(_lse(alpha[T - 1], axis=0))
    beta = np.zeros((T, K))
    for t in range(T - 2, -1, -1):
        beta[t] = _lse(trans + (logits[t + 1] + beta[t + 1])[None, :], axis=1)
    gold = float(logits[np.arange(T), labels].sum())
    gold += float(trans[labels[:-1], labels[1:]].sum())
    loss = logZ - gold

    dlogits = np.exp(alpha + beta - logZ)
    dlogits[np.arange(T), labels] -= 1.0
    dtrans = np.zeros_like(trans)
    for t in range(1, T):
        pair = np.exp(
            alpha[t - 1][:, None] + trans + (logits[t] + beta[t])[None, :] - logZ
        )
        dtrans += pair
    np.subtract.at(dtrans, (labels[:-1], labels[1:]), 1.0)
    return loss, dlogits, dtrans


def softmax_ce_loss_and_grad(
    logits: np.ndarray, labels: np.ndarray
) -> tuple[float, np.ndarray]:
    """Per-token sparse softmax CE summed over the sentence (the caller
    divides by token count for the reference's masked reduce_mean)."""
    T = logits.shape[0]
    m = logits.max(axis=1, keepdims=True)
    e = np.exp(logits - m)
    p = e / e.sum(axis=1, keepdims=True)
    loss = float(-np.log(p[np.arange(T), labels] + 1e-300).sum())
    dlogits = p.copy()
    dlogits[np.arange(T), labels] -= 1.0
    return loss, dlogits


# --------------------------------------------------------------------------
# full-model gradient for a batch of sentences
# --------------------------------------------------------------------------
def _zero_grads(W: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    return {k: np.zeros(W[k].shape, dtype=np.float64) for k in WEIGHT_KEYS}


def batch_loss_and_grads(
    batch: Iterable[tuple[list[int], list[int]]],
    W: dict[str, np.ndarray],
    use_crf: bool = True,
) -> tuple[float, int, int, dict[str, np.ndarray]]:
    """(sum-loss, n-sentences, n-tokens, sum-gradients) over
    [(ids, labels), ...].

    Gradients and losses are raw SUMS (CRF: per-sentence NLL summed;
    softmax CE: per-TOKEN CE summed) — exactly additive, so partials
    from different partitions/workers combine by '+' (the distributed
    contract). The optimizer divides by the matching global count:
    sentences for CRF (reference: -reduce_mean(log_likelihood)), TOKENS
    for softmax CE (reference: masked reduce_mean over all tokens in
    the batch, model.py:≈109-114 [R]) — normalizing per sentence first
    would weight short sentences' tokens more than the reference does.
    """
    Wd = {k: W[k].astype(np.float64) for k in WEIGHT_KEYS}
    g = _zero_grads(W)
    total = 0.0
    n = 0
    ntok = 0
    D = Wd["embeddings"].shape[1]
    for ids, labels in batch:
        if len(ids) == 0:
            continue
        ids_a = np.asarray(ids, dtype=np.int64)
        y = np.asarray(labels, dtype=np.int64)
        x = Wd["embeddings"][ids_a]
        fw, cf = _lstm_forward_cached(x, Wd["lstm_fw_kernel"], Wd["lstm_fw_bias"])
        bw_r, cb = _lstm_forward_cached(
            x[::-1], Wd["lstm_bw_kernel"], Wd["lstm_bw_bias"]
        )
        bw = bw_r[::-1]
        hcat = np.concatenate([fw, bw], axis=1)
        logits = hcat @ Wd["proj_W"] + Wd["proj_b"]
        if use_crf:
            loss, dlogits, dtrans = crf_loss_and_grad(logits, y, Wd["transitions"])
            g["transitions"] += dtrans
        else:
            loss, dlogits = softmax_ce_loss_and_grad(logits, y)
        total += loss
        n += 1
        ntok += len(ids)
        g["proj_W"] += hcat.T @ dlogits
        g["proj_b"] += dlogits.sum(axis=0)
        dhcat = dlogits @ Wd["proj_W"].T
        H = fw.shape[1]
        dxf, dKf, dbf = _lstm_backward(dhcat[:, :H], cf, Wd["lstm_fw_kernel"], D)
        dxb_r, dKb, dbb = _lstm_backward(
            dhcat[:, H:][::-1], cb, Wd["lstm_bw_kernel"], D
        )
        g["lstm_fw_kernel"] += dKf
        g["lstm_fw_bias"] += dbf
        g["lstm_bw_kernel"] += dKb
        g["lstm_bw_bias"] += dbb
        dx = dxf + dxb_r[::-1]
        np.add.at(g["embeddings"], ids_a, dx)
    return total, n, ntok, g


# --------------------------------------------------------------------------
# optimizer (#17): global-norm clip + SGD / Adam (reference defaults)
# --------------------------------------------------------------------------
def clip_by_value(
    grads: dict[str, np.ndarray], clip: float = 5.0
) -> dict[str, np.ndarray]:
    """The reference's clip rule: per-element clip_by_value(±clip)
    (model.py:≈117-135 trainstep_op [R], clip_grad=5.0 main.py argparse)."""
    return {k: np.clip(v, -clip, clip) for k, v in grads.items()}


def clip_by_global_norm(
    grads: dict[str, np.ndarray], clip_norm: float = 5.0
) -> dict[str, np.ndarray]:
    """Global-norm clipping (the more common modern rule; offered beside
    the reference's per-element clip_by_value)."""
    gn = float(np.sqrt(sum(float((v * v).sum()) for v in grads.values())))
    if gn <= clip_norm or gn == 0.0:
        return grads
    scale = clip_norm / gn
    return {k: v * scale for k, v in grads.items()}


def sgd_step(
    W: dict[str, np.ndarray], grads: dict[str, np.ndarray], lr: float = 0.001
) -> dict[str, np.ndarray]:
    return {
        k: (W[k].astype(np.float64) - lr * grads[k]).astype(W[k].dtype)
        for k in WEIGHT_KEYS
    }


class AdamState:
    """Adam (reference default optimizer, lr=0.001 [R] main.py argparse)."""

    def __init__(self, lr: float = 0.001, b1: float = 0.9, b2: float = 0.999,
                 eps: float = 1e-8):
        self.lr, self.b1, self.b2, self.eps = lr, b1, b2, eps
        self.t = 0
        self.m: dict[str, np.ndarray] = {}
        self.v: dict[str, np.ndarray] = {}

    def step(
        self, W: dict[str, np.ndarray], grads: dict[str, np.ndarray]
    ) -> dict[str, np.ndarray]:
        self.t += 1
        out = {}
        for k in WEIGHT_KEYS:
            g = grads[k]
            self.m[k] = self.b1 * self.m.get(k, 0.0) + (1 - self.b1) * g
            self.v[k] = self.b2 * self.v.get(k, 0.0) + (1 - self.b2) * g * g
            mh = self.m[k] / (1 - self.b1 ** self.t)
            vh = self.v[k] / (1 - self.b2 ** self.t)
            out[k] = (
                W[k].astype(np.float64) - self.lr * mh / (np.sqrt(vh) + self.eps)
            ).astype(W[k].dtype)
        return out


# --------------------------------------------------------------------------
# Spark data-parallel gradients
# --------------------------------------------------------------------------
def distributed_loss_and_grads(
    df, weights_bc, vocab_bc, chars_col: str = "sentence",
    tags_col: str = "tags", use_crf: bool = True,
) -> tuple[float, int, int, dict[str, np.ndarray]]:
    """One synchronous gradient over a DataFrame of (chars_col: string,
    tags_col: array<string>) rows: every partition computes its summed
    (loss, n, ntok, grads) against the broadcast weights in one Arrow
    pass; a second tree-combine stage '+'-sums the per-partition blobs
    in ~sqrt(P) groups so the driver collects ≤ ceil(sqrt(P)) blobs
    instead of P (gradients are sums, so this is EXACTLY the sequential
    batch gradient — tested). That bounds driver ingest at reference-size
    weights × many partitions; the same treeAggregate shape extends to
    more levels if P grows further."""
    import io
    import math as _math

    import pandas as pd

    from zh_ner_tf_spark.config import TAG2LABEL
    from zh_ner_tf_spark.operators.tagger import encode_chars

    def _dumps(acc: dict[str, np.ndarray]) -> bytes:
        buf = io.BytesIO()
        np.savez(buf, **acc)
        return buf.getvalue()

    def _loads(blob: bytes) -> dict[str, np.ndarray]:
        with np.load(io.BytesIO(blob)) as z:
            return {k: z[k] for k in WEIGHT_KEYS}

    def part(batches):
        W = weights_bc.value
        vocab = vocab_bc.value
        acc = None
        total, n, ntok = 0.0, 0, 0
        for pdf in batches:
            pairs = []
            for sent, tags in zip(pdf[chars_col], pdf[tags_col]):
                chars = list(sent)
                if not chars:
                    continue
                ids = encode_chars(pd.Series(chars, dtype=object), vocab)
                labels = [TAG2LABEL[t] for t in tags]
                pairs.append((ids.tolist(), labels))
            if not pairs:
                continue
            loss, k, tk, g = batch_loss_and_grads(pairs, W, use_crf)
            total += loss
            n += k
            ntok += tk
            if acc is None:
                acc = g
            else:
                for key in WEIGHT_KEYS:
                    acc[key] += g[key]
        if n == 0:
            return
        yield pd.DataFrame(
            {"loss": [total], "n": [n], "ntok": [ntok], "grads": [_dumps(acc)]}
        )

    _SCHEMA = "loss double, n long, ntok long, grads binary"

    def combine(batches):
        acc = None
        total, n, ntok = 0.0, 0, 0
        for pdf in batches:
            for loss, k, tk, blob in zip(
                pdf["loss"], pdf["n"], pdf["ntok"], pdf["grads"]
            ):
                total += float(loss)
                n += int(k)
                ntok += int(tk)
                g = _loads(bytes(blob))
                if acc is None:
                    acc = g
                else:
                    for key in WEIGHT_KEYS:
                        acc[key] += g[key]
        if n == 0:
            return
        yield pd.DataFrame(
            {"loss": [total], "n": [n], "ntok": [ntok], "grads": [_dumps(acc)]}
        )

    parts = df.select(chars_col, tags_col).mapInPandas(part, schema=_SCHEMA)
    n_input_parts = df.rdd.getNumPartitions()
    fanin = max(1, int(_math.ceil(_math.sqrt(max(1, n_input_parts)))))
    if n_input_parts > fanin:
        parts = parts.repartition(fanin).mapInPandas(combine, schema=_SCHEMA)
    rows = parts.collect()
    total, n, ntok = 0.0, 0, 0
    grads: dict[str, np.ndarray] | None = None
    for r in rows:
        total += r["loss"]
        n += r["n"]
        ntok += r["ntok"]
        g = _loads(bytes(r["grads"]))
        if grads is None:
            grads = g
        else:
            for k in WEIGHT_KEYS:
                grads[k] += g[k]
    if grads is None:
        grads = {k: np.zeros_like(weights_bc.value[k], dtype=np.float64)
                 for k in WEIGHT_KEYS}
    return total, n, ntok, grads


def train(
    spark,
    df,
    weights: dict[str, np.ndarray],
    word2id: dict[str, int],
    epochs: int = 3,
    lr: float = 0.001,
    clip: float = 5.0,
    use_crf: bool = True,
    optimizer: str = "adam",
) -> tuple[dict[str, np.ndarray], list[float]]:
    """Synchronous data-parallel training loop (reference defaults:
    Adam, lr=0.001, per-element clip_by_value(±5.0) [R] main.py
    argparse + model.py trainstep_op). Re-broadcasts the updated weights
    each epoch; returns (weights, per-epoch mean loss)."""
    adam = AdamState(lr=lr)
    losses = []
    for _ in range(epochs):
        wb = spark.sparkContext.broadcast(weights)
        vb = spark.sparkContext.broadcast(word2id)
        total, n, ntok, grads = distributed_loss_and_grads(
            df, wb, vb, use_crf=use_crf
        )
        wb.unpersist()
        vb.unpersist()
        if n == 0:
            break
        # CRF: -reduce_mean over sentences; softmax CE: masked
        # reduce_mean over ALL tokens in the batch (reference semantics).
        denom = n if use_crf else ntok
        mean_grads = {k: grads[k] / denom for k in WEIGHT_KEYS}
        mean_grads = clip_by_value(mean_grads, clip)
        if optimizer == "adam":
            weights = adam.step(weights, mean_grads)
        else:
            weights = sgd_step(weights, mean_grads, lr)
        losses.append(total / denom)
    return weights, losses
