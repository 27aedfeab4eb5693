"""Sequential NumPy reference implementation (the oracle).

Each function reproduces one reference operator with its exact public
semantics; citations are to the canonical zh-NER-TF layout [R] per
SURVEY.md §2. Everything here is deliberately *unvectorized across rows*
(one sentence at a time) so it is an independent implementation from the
batched Spark UDF in ``zh_ner_tf_spark/operators/tagger.py`` — agreement
between the two is the parity gate.
"""

from __future__ import annotations

import numpy as np

from zh_ner_tf_spark.config import (
    ENG_TOKEN,
    FORGET_BIAS,
    LABEL2TAG,
    NUM_TOKEN,
    TAG2LABEL,
    UNK_TOKEN,
)


# --------------------------------------------------------------------------
# Operator #2: token normalize (reference data.py:≈42-47, ≈75-80 [R])
# --------------------------------------------------------------------------
def normalize_token(ch: str) -> str:
    """digit -> <NUM>; ASCII letter -> <ENG>; else unchanged.

    ⚠ Python ``str.isdigit()`` is Unicode-wide (accepts '²', '１', '٣') —
    this is the reference behavior and must NOT be replaced by an ASCII
    regex (SURVEY.md §2 #2 semantics gap).
    """
    if ch.isdigit():
        return NUM_TOKEN
    if ("A" <= ch <= "Z") or ("a" <= ch <= "z"):
        return ENG_TOKEN
    return ch


# --------------------------------------------------------------------------
# Operator #5: dictionary encode (reference data.py:≈73-85 sentence2id [R])
# --------------------------------------------------------------------------
def sentence2id(sent: list[str], word2id: dict[str, int]) -> list[int]:
    unk = word2id[UNK_TOKEN]
    return [word2id.get(normalize_token(ch), unk) for ch in sent]


# --------------------------------------------------------------------------
# Operator #11: BiLSTM (reference model.py:≈66-85 biLSTM_layer_op [R])
# TF-1.x LSTMCell semantics: fused kernel [D+H, 4H], gate order (i, j, f, o),
# c' = c*σ(f + forget_bias) + σ(i)*tanh(j); h' = tanh(c')*σ(o).
# --------------------------------------------------------------------------
def _sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-x))


def lstm_forward(
    x: np.ndarray, kernel: np.ndarray, bias: np.ndarray
) -> np.ndarray:
    """Run a single-direction LSTM over one sentence.

    x: [T, D]. kernel: [D+H, 4H]. bias: [4H]. Returns [T, H].

    Numeric contract: computed in float64 (both oracle and engine promote
    from the float32 artifact) so BLAS summation-order noise (~1e-16) can
    never flip a Viterbi decision — see operators/tagger.py.
    """
    x = x.astype(np.float64)
    kernel = kernel.astype(np.float64)
    bias = bias.astype(np.float64)
    hidden = kernel.shape[1] // 4
    T = x.shape[0]
    h = np.zeros(hidden)
    c = np.zeros(hidden)
    out = np.zeros((T, hidden))
    for t in range(T):
        z = np.concatenate([x[t], h]) @ kernel + bias
        i, j, f, o = np.split(z, 4)
        c = c * _sigmoid(f + FORGET_BIAS) + _sigmoid(i) * np.tanh(j)
        h = np.tanh(c) * _sigmoid(o)
        out[t] = h
    return out


def bilstm_logits(ids: list[int], weights: dict[str, np.ndarray]) -> np.ndarray:
    """Operators #10-#12 fused for one sentence: embedding lookup ->
    BiLSTM (fw + reverse-sequence bw, model.py:≈66-85 [R]) -> linear
    projection (model.py:≈86-95 [R]). Returns logits [T, num_tags].

    Inference path only: dropout is identity (keep_prob=1.0 fed at predict
    time, model.py:≈241 [R]).
    """
    emb = weights["embeddings"][np.asarray(ids, dtype=np.int64)]  # [T, D]
    fw = lstm_forward(emb, weights["lstm_fw_kernel"], weights["lstm_fw_bias"])
    # tf.nn.bidirectional_dynamic_rnn backward pass = reverse_sequence ->
    # forward recurrence -> reverse back. For a single sentence (no padding)
    # that is a plain full reversal.
    bw = lstm_forward(
        emb[::-1], weights["lstm_bw_kernel"], weights["lstm_bw_bias"]
    )[::-1]
    out = np.concatenate([fw, bw], axis=1)  # [T, 2H]
    return out @ weights["proj_W"].astype(np.float64) + weights[
        "proj_b"
    ].astype(np.float64)


# --------------------------------------------------------------------------
# Operator #16: Viterbi decode (tf.contrib.crf.viterbi_decode NumPy source,
# invoked per sentence in model.py:≈239-255 predict_one_batch [R])
# --------------------------------------------------------------------------
def viterbi_decode(score: np.ndarray, transition_params: np.ndarray) -> list[int]:
    """Max-sum DP with first-occurrence argmax tie-breaking (np.argmax)."""
    trellis = np.zeros_like(score)
    backpointers = np.zeros_like(score, dtype=np.int32)
    trellis[0] = score[0]
    for t in range(1, score.shape[0]):
        v = np.expand_dims(trellis[t - 1], 1) + transition_params
        trellis[t] = score[t] + np.max(v, 0)
        backpointers[t] = np.argmax(v, 0)
    viterbi = [int(np.argmax(trellis[-1]))]
    for bp in reversed(backpointers[1:]):
        viterbi.append(int(bp[viterbi[-1]]))
    viterbi.reverse()
    return viterbi


# --------------------------------------------------------------------------
# Operator #15: argmax decode, the reference's CRF=False branch
# (model.py:≈97-100 softmax_pred_op [R])
# --------------------------------------------------------------------------
def argmax_decode(score: np.ndarray) -> list[int]:
    return [int(i) for i in np.argmax(score, axis=-1)]


def tag_sentence(
    sent: list[str],
    word2id: dict[str, int],
    weights: dict[str, np.ndarray],
    use_crf: bool = True,
) -> list[str]:
    """Full per-sentence inference: encode -> logits -> decode -> tags.

    use_crf=True: Viterbi over CRF transitions (reference default);
    use_crf=False: per-timestep argmax (reference --CRF=False branch).
    Normalizes the reference's 0-for-'O' quirk (model.py:≈257-262 [R]
    emits integer 0 instead of the string 'O') to the string 'O'; the
    quirk itself is reproduced only in the conlleval parity layer.
    """
    if not sent:
        return []
    ids = sentence2id(sent, word2id)
    logits = bilstm_logits(ids, weights)
    if use_crf:
        labels = viterbi_decode(logits, weights["transitions"])
    else:
        labels = argmax_decode(logits)
    return [LABEL2TAG[l] for l in labels]


# --------------------------------------------------------------------------
# Operator #22: BIO span extraction (reference utils.py:≈10-82 get_entity*,
# three copy-pasted per-type variants [R])
# --------------------------------------------------------------------------
def get_entities(
    tag_seq: list[str], char_seq: list[str]
) -> list[tuple[str, str, int, int]]:
    """Scan a BIO tag sequence; return (mention, etype, begin, end) spans
    with end inclusive.

    Reference semantics: ``B-X`` opens (flushing any open span), ``I-X``
    extends a same-type open span, anything else closes. End-of-sequence
    flushes. ⚠ Pinned semantics for the reference's crash quirk
    (utils.py:≈30 [R], dangling ``I-X`` with no open span raises
    UnboundLocalError): a dangling or type-mismatched ``I-X`` OPENS a new
    span (SURVEY.md §2 #22).
    """
    spans: list[tuple[str, str, int, int]] = []
    cur_type: str | None = None
    cur_begin = 0
    cur_chars: list[str] = []

    def flush(end: int) -> None:
        nonlocal cur_type, cur_chars
        if cur_type is not None:
            spans.append(("".join(cur_chars), cur_type, cur_begin, end))
        cur_type = None
        cur_chars = []

    for pos, (tag, ch) in enumerate(zip(tag_seq, char_seq)):
        if tag.startswith("B-"):
            flush(pos - 1)
            cur_type = tag[2:]
            cur_begin = pos
            cur_chars = [ch]
        elif tag.startswith("I-"):
            if cur_type == tag[2:]:
                cur_chars.append(ch)
            else:  # dangling I-X: pinned to open a new span
                flush(pos - 1)
                cur_type = tag[2:]
                cur_begin = pos
                cur_chars = [ch]
        else:
            flush(pos - 1)
    flush(len(tag_seq) - 1)
    return spans


# --------------------------------------------------------------------------
# Reference eval-file quirks (parity layer ONLY — SURVEY.md §2 #20):
#   * eval.py:≈14 [R] rewrites gold 'O' to the STRING '0' when dumping
#     the char/gold/pred file;
#   * model.py:≈257-262 [R] emits predicted label 0 as the INTEGER 0
#     instead of the tag string 'O' (label2tag[label] quirk).
# conlleval treats any tag that is not B-/I- prefixed as outside, so both
# encodings are outside-equivalent; this normalizer maps them back before
# scoring, and the quirk fixtures assert score-equivalence.
# --------------------------------------------------------------------------
def normalize_eval_quirks(tags: list) -> list[str]:
    return ["O" if t in (0, "0", "O") else str(t) for t in tags]


# --------------------------------------------------------------------------
# Operator #21: conlleval-equivalent scoring (reference conlleval_rev.pl,
# invoked by eval.py:≈23-27 [R]) — pure-Python port of the chunk rules.
# --------------------------------------------------------------------------
def conlleval_metrics(
    gold_seqs: list[list[str]], pred_seqs: list[list[str]]
) -> dict[str, dict[str, float]]:
    """Span-level P/R/F1 per entity type plus overall, and token accuracy.

    Chunks are derived with the same BIO rules as ``get_entities``; a
    predicted chunk counts as correct iff (begin, end, type) all match a
    gold chunk of the same sentence — exactly the conlleval notion of
    "found correct" chunks.
    """
    assert len(gold_seqs) == len(pred_seqs)
    found_correct: dict[str, int] = {}
    found_guessed: dict[str, int] = {}
    found_gold: dict[str, int] = {}
    tok_total = 0
    tok_correct = 0
    for gold, pred in zip(gold_seqs, pred_seqs):
        assert len(gold) == len(pred)
        tok_total += len(gold)
        tok_correct += sum(g == p for g, p in zip(gold, pred))
        dummy = [""] * len(gold)
        gspans = {(t, b, e) for _, t, b, e in get_entities(gold, dummy)}
        pspans = {(t, b, e) for _, t, b, e in get_entities(pred, dummy)}
        for t, _, _ in gspans:
            found_gold[t] = found_gold.get(t, 0) + 1
        for t, _, _ in pspans:
            found_guessed[t] = found_guessed.get(t, 0) + 1
        for t, _, _ in gspans & pspans:
            found_correct[t] = found_correct.get(t, 0) + 1

    out: dict[str, dict[str, float]] = {}
    types = sorted(set(found_gold) | set(found_guessed))
    tot_c = sum(found_correct.values())
    tot_g = sum(found_guessed.values())
    tot_t = sum(found_gold.values())
    for etype in types:
        c = found_correct.get(etype, 0)
        g = found_guessed.get(etype, 0)
        t = found_gold.get(etype, 0)
        p = c / g if g else 0.0
        r = c / t if t else 0.0
        f1 = 2 * p * r / (p + r) if p + r else 0.0
        out[etype] = {
            "precision": p, "recall": r, "f1": f1,
            "guessed": g, "gold": t, "correct": c,
        }
    p = tot_c / tot_g if tot_g else 0.0
    r = tot_c / tot_t if tot_t else 0.0
    f1 = 2 * p * r / (p + r) if p + r else 0.0
    out["__overall__"] = {
        "precision": p, "recall": r, "f1": f1,
        "guessed": tot_g, "gold": tot_t, "correct": tot_c,
        "accuracy": tok_correct / tok_total if tok_total else 0.0,
    }
    return out


__all__ = [
    "normalize_token",
    "sentence2id",
    "lstm_forward",
    "bilstm_logits",
    "viterbi_decode",
    "argmax_decode",
    "normalize_eval_quirks",
    "tag_sentence",
    "get_entities",
    "conlleval_metrics",
]
assert set(TAG2LABEL) == set(LABEL2TAG.values())
