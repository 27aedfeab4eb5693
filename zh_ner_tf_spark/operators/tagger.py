"""BiLSTM-CRF NER tagger as a vectorized ``mapInPandas`` operator.

Fuses reference operators #5 (dictionary encode, data.py:≈73-85), #9 (pad,
data.py:≈110-122), #10 (embedding lookup, model.py:≈54-64), #11 (BiLSTM,
model.py:≈66-85), #12 (projection, model.py:≈86-95), #16 (Viterbi,
model.py:≈239-255) and optionally #22 (BIO span extraction,
utils.py:≈10-82) into ONE Arrow-batched UDF stage — the pipeline's only
Python hot path (BASELINE.json input_hint: "vectorized pandas/Arrow UDFs,
no per-row Python").

Scale notes (the 100 TB story):
  * Model weights + vocab ride a ``SparkContext.broadcast`` — one copy per
    executor, fetched once, never shuffled.
  * Padding is per-Arrow-batch (the reference's dynamic per-batch padding,
    data.py:≈110-122): no materialized padded column ever hits a shuffle.
  * Per-row output is provably independent of batch composition: the
    recurrence freezes h/c at each row's own length and zeroes outputs
    past it (the ``dynamic_rnn``/``reverse_sequence`` contract), so
    Spark's arbitrary partitioning/batching is safe — verified by the
    invariance tests (tests/test_tagger_parity.py).
  * The recurrence is a GEMM per timestep over the whole batch (BLAS),
    never a per-row Python loop; throughput scales with cores because the
    stage is embarrassingly parallel over partitions.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from zh_ner_tf_spark.config import FORGET_BIAS, LABEL2TAG, NUM_TOKEN, UNK_TOKEN

# Entity label ids: 2k-1 = B-type(k), 2k = I-type(k), k in {1:PER,2:LOC,3:ORG}.
_TYPE_NAME = {1: "PER", 2: "LOC", 3: "ORG"}


# --------------------------------------------------------------------------
# batched numeric kernels (float64 internally: engine and oracle both
# promote, so BLAS summation-order noise stays ~1e-16, far below any
# Viterbi decision margin)
# --------------------------------------------------------------------------
def _sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-x))


def _lstm_batch(
    x: np.ndarray, lens: np.ndarray, kernel: np.ndarray, bias: np.ndarray
) -> np.ndarray:
    """Length-masked batched LSTM: x [B,T,D] -> [B,T,H]; rows freeze state
    at their own length and emit zeros past it (TF dynamic_rnn contract).

    Perf shape: z = x_t @ K[:D] + h @ K[D:] + b — two small per-step GEMMs
    whose kernel matrices stay cache-resident (measured 2-3x faster on
    this class of hardware than either the fused-concat formulation or a
    hoisted [B*T, D] GEMM, which streams a huge activation buffer).
    Mathematically identical to TF's fused [x,h] @ kernel (the fused
    kernel is row-partitioned); float summation order differs by ~1e-16
    in f64 — far below any Viterbi decision margin (agreement with the
    sequential oracle is parity-tested)."""
    B, T, D = x.shape
    H = kernel.shape[1] // 4
    k_x, k_h = kernel[:D], kernel[D:]
    dtype = x.dtype
    h = np.zeros((B, H), dtype=dtype)
    c = np.zeros((B, H), dtype=dtype)
    out = np.zeros((B, T, H), dtype=dtype)
    if B > 1 and np.all(lens[:-1] >= lens[1:]):
        # Packed-sequence fast path: rows sorted by length descending, so
        # the active rows at step t are the prefix [0:k]. Slicing replaces
        # masking — compute is exactly sum(lens) steps, zero pad waste.
        neg = -lens
        for t in range(T):
            # k = number of rows with len >= t+1 (still active at step t)
            k = int(np.searchsorted(neg, -(t + 1), side="right"))
            if k == 0:
                break
            z = x[:k, t, :] @ k_x + h[:k] @ k_h + bias
            i, j, f, o = np.split(z, 4, axis=1)
            c[:k] = c[:k] * _sigmoid(f + FORGET_BIAS) + _sigmoid(i) * np.tanh(j)
            h[:k] = np.tanh(c[:k]) * _sigmoid(o)
            out[:k, t, :] = h[:k]
        return out
    for t in range(T):
        z = x[:, t, :] @ k_x + h @ k_h + bias
        i, j, f, o = np.split(z, 4, axis=1)
        c_new = c * _sigmoid(f + FORGET_BIAS) + _sigmoid(i) * np.tanh(j)
        h_new = np.tanh(c_new) * _sigmoid(o)
        active = (t < lens)[:, None]
        c = np.where(active, c_new, c)
        h = np.where(active, h_new, h)
        out[:, t, :] = np.where(active, h_new, 0.0)
    return out


def _reverse_sequence(x: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """tf.reverse_sequence: reverse each row's first len elements, keep
    padding in place. Per-row contiguous slice-reversals (memcpy speed)
    beat a broadcast fancy-index gather ~5x on [B, T, D] inputs."""
    out = x.copy()
    for b in range(x.shape[0]):
        n = int(lens[b])
        if n > 0:
            out[b, :n] = x[b, n - 1::-1]
    return out


def _fused_logits_packed(
    ids: np.ndarray, lens: np.ndarray, W: dict[str, np.ndarray], dtype
) -> np.ndarray:
    """Fused fw+bw recurrence with in-loop embedding gather and in-loop
    projection, for length-DESCENDING-sorted batches.

    The whole point is the per-worker working set: instead of
    materializing emb/fw/bw/bw_in [B,T,H] activation buffers (~5 KB per
    char — which collapses to DRAM-bandwidth contention when 32 workers
    run side by side), only ids [B,T] and logits [B,T,K=7] persist
    (~40 B per char); everything else is per-step [k,H]-sized and stays
    cache-resident. Identical math: logits[t] = fw_t @ P[:H] +
    bw_t @ P[H:] + b, with the bw pass walking original positions
    len-1-s per row (the reverse_sequence contract)."""
    B, T = ids.shape
    E = W["embeddings"].astype(dtype)
    kf, bf = W["lstm_fw_kernel"].astype(dtype), W["lstm_fw_bias"].astype(dtype)
    kb, bb = W["lstm_bw_kernel"].astype(dtype), W["lstm_bw_bias"].astype(dtype)
    D = E.shape[1]
    H = kf.shape[1] // 4
    proj = W["proj_W"].astype(dtype)
    pf, pb_half = proj[:H], proj[H:]
    proj_b = W["proj_b"].astype(dtype)
    K = proj.shape[1]
    logits = np.zeros((B, T, K), dtype=dtype)
    neg = -lens

    # Preallocated step buffers, mutated in place: the per-step working
    # set is z [B,4H] + zh [B,4H] + tmp [B,H] (~a few MB, cache-hot) —
    # fresh-array churn per step is what kills aggregate scaling when 32
    # workers contend for memory bandwidth.
    z_buf = np.empty((B, 4 * H), dtype=dtype)
    zh_buf = np.empty((B, 4 * H), dtype=dtype)
    tmp = np.empty((B, H), dtype=dtype)

    def sigmoid_(a: np.ndarray) -> np.ndarray:  # in-place σ
        np.negative(a, out=a)
        np.exp(a, out=a)
        a += 1.0
        np.reciprocal(a, out=a)
        return a

    def run(kernel, bias, backward: bool) -> None:
        k_x, k_h = kernel[:D], kernel[D:]
        h = np.zeros((B, H), dtype=dtype)
        c = np.zeros((B, H), dtype=dtype)
        for s in range(T):
            k = int(np.searchsorted(neg, -(s + 1), side="right"))
            if k == 0:
                break
            if backward:
                pos = lens[:k] - 1 - s
                x = E[ids[np.arange(k), pos]]
            else:
                x = E[ids[:k, s]]
            z = z_buf[:k]
            np.matmul(x, k_x, out=z)
            np.matmul(h[:k], k_h, out=zh_buf[:k])
            z += zh_buf[:k]
            z += bias
            i = z[:, :H]
            j = z[:, H: 2 * H]
            f = z[:, 2 * H: 3 * H]
            o = z[:, 3 * H:]
            f += FORGET_BIAS
            sigmoid_(f)                     # σ(f + forget_bias)
            c[:k] *= f
            sigmoid_(i)
            np.tanh(j, out=j)
            np.multiply(i, j, out=tmp[:k])
            c[:k] += tmp[:k]                # c' = c·σf + σ(i)·tanh(j)
            np.tanh(c[:k], out=h[:k])
            sigmoid_(o)
            h[:k] *= o                      # h' = tanh(c')·σ(o)
            if backward:
                logits[np.arange(k), pos, :] += h[:k] @ pb_half
            else:
                logits[:k, s, :] = h[:k] @ pf + proj_b

    run(kf, bf, backward=False)
    run(kb, bb, backward=True)
    return logits


def batch_logits(
    ids: np.ndarray,
    lens: np.ndarray,
    W: dict[str, np.ndarray],
    dtype=np.float64,
) -> np.ndarray:
    """ids [B,Tmax] int64 (0-padded), lens [B] -> logits [B,Tmax,K].

    dtype=float64 is the parity default (oracle agreement immune to
    summation-order noise); float32 is the throughput option — 2x BLAS
    rate and half the memory traffic — safe when decision margins are
    comfortably above 1e-5 (e.g. trained/planted models).

    Length-descending batches (what _run_batch always produces) take the
    fused low-memory path; arbitrary batches fall back to the buffered
    formulation (same math, parity-tested against each other via the
    oracle)."""
    if ids.shape[0] > 1 and np.all(lens[:-1] >= lens[1:]):
        return _fused_logits_packed(ids, lens, W, dtype)
    emb = W["embeddings"].astype(dtype)[ids]
    fw = _lstm_batch(emb, lens, W["lstm_fw_kernel"].astype(dtype),
                     W["lstm_fw_bias"].astype(dtype))
    bw_in = _reverse_sequence(emb, lens)
    bw = _lstm_batch(bw_in, lens, W["lstm_bw_kernel"].astype(dtype),
                     W["lstm_bw_bias"].astype(dtype))
    bw = _reverse_sequence(bw, lens)
    B, T, H = fw.shape
    # Projection as two 2-D GEMMs (proj_W is row-partitioned over the
    # fw/bw halves) — avoids both the [B,T,2H] concat buffer and the slow
    # strided-gufunc 3-D matmul path.
    proj = W["proj_W"].astype(dtype)
    flat = fw.reshape(B * T, H) @ proj[:H]
    flat += bw.reshape(B * T, H) @ proj[H:]
    flat += W["proj_b"].astype(dtype)
    return flat.reshape(B, T, -1)


def viterbi_batch(
    logits: np.ndarray, lens: np.ndarray, trans: np.ndarray
) -> np.ndarray:
    """Batched max-sum Viterbi, first-occurrence argmax tie-break, one DP
    over Tmax vectorized across rows; each row decodes over its own
    length. Returns labels [B,Tmax] int32 (valid up to len per row)."""
    B, T, K = logits.shape
    trellis = logits[:, 0, :].copy()
    bp = np.zeros((B, T, K), dtype=np.int32)
    for t in range(1, T):
        v = trellis[:, :, None] + trans[None, :, :]     # [B, K_prev, K_cur]
        bp[:, t, :] = v.argmax(axis=1)
        new_trellis = logits[:, t, :] + v.max(axis=1)
        active = (t < lens)[:, None]
        trellis = np.where(active, new_trellis, trellis)
    labels = np.zeros((B, T), dtype=np.int32)
    cur = trellis.argmax(axis=1).astype(np.int32)
    labels[np.arange(B), lens - 1] = cur
    for t in range(T - 2, -1, -1):
        sel = t < (lens - 1)
        prev = bp[np.arange(B), t + 1, cur]
        cur = np.where(sel, prev, cur).astype(np.int32)
        labels[:, t] = np.where(sel, cur, labels[:, t])
    return labels


# --------------------------------------------------------------------------
# vectorized encode (operator #2 + #5): normalize + vocab lookup
# --------------------------------------------------------------------------
def encode_chars(flat: pd.Series, vocab: dict[str, int]) -> np.ndarray:
    """Normalize a flat char Series and map to ids, all vectorized.

    Uses pandas ``.str.isdigit`` (element-wise Python ``str.isdigit``) —
    NOT an ASCII regex — to reproduce the reference's Unicode-wide digit
    rule (SURVEY.md §2 #2: '１', '²' must map to <NUM>)."""
    flat = flat.astype(object)
    is_digit = flat.str.isdigit().fillna(False).to_numpy(dtype=bool)
    arr = flat.to_numpy()
    is_eng = ((arr >= "A") & (arr <= "Z")) | ((arr >= "a") & (arr <= "z"))
    norm = flat.copy()
    norm[is_digit] = NUM_TOKEN
    norm[np.asarray(is_eng) & ~is_digit] = "<ENG>"
    ids = norm.map(vocab)
    unk = vocab[UNK_TOKEN]
    return ids.fillna(unk).to_numpy(dtype=np.int64)


# --------------------------------------------------------------------------
# vectorized BIO span extraction over a decoded batch (operator #22b)
# --------------------------------------------------------------------------
def spans_from_labels(
    labels: np.ndarray, lens: np.ndarray, chars_flat: np.ndarray
) -> pd.DataFrame:
    """labels [B,Tmax], lens [B], chars_flat = concatenated valid chars
    (row-major). Returns DataFrame(row, mention, etype, begin, end), end
    inclusive. Pinned dangling-I-X semantics: opens a new span."""
    B, T = labels.shape
    valid = np.arange(T)[None, :] < lens[:, None]
    lab = labels[valid]                                  # [N] row-major
    row_idx = np.repeat(np.arange(B), lens)
    pos_idx = np.concatenate([np.arange(n) for n in lens]) if B else np.array([], int)
    is_ent = lab > 0
    type_id = (lab + 1) // 2                             # 0 for O
    is_b = (lab % 2) == 1
    prev_type = np.concatenate([[0], type_id[:-1]])
    prev_ent = np.concatenate([[False], is_ent[:-1]])
    row_start = np.concatenate([[True], row_idx[1:] != row_idx[:-1]]) if len(lab) else np.array([], bool)
    boundary = is_ent & (
        is_b | row_start | ~prev_ent | (prev_type != type_id)
    )
    span_id = np.cumsum(boundary)
    if not is_ent.any():
        return pd.DataFrame(columns=["row", "mention", "etype", "begin", "end"])
    ent = pd.DataFrame({
        "span": span_id[is_ent],
        "row": row_idx[is_ent],
        "pos": pos_idx[is_ent],
        "ch": chars_flat[is_ent],
        "tid": type_id[is_ent],
    })
    g = ent.groupby("span", sort=True)
    out = g.agg(
        row=("row", "first"),
        begin=("pos", "min"),
        end=("pos", "max"),
        tid=("tid", "first"),
        mention=("ch", "sum"),  # string concatenation in row order
    ).reset_index(drop=True)
    out["etype"] = out["tid"].map(_TYPE_NAME)
    return out[["row", "mention", "etype", "begin", "end"]]


# --------------------------------------------------------------------------
# the mapInPandas operator
# --------------------------------------------------------------------------
# Rows per numeric sub-batch. Within an Arrow batch, rows are processed
# in length-sorted chunks of this size: each chunk pads only to its OWN
# max length (the reference's dynamic per-batch padding, data.py:≈110-122,
# made skew-proof), and the GEMM batch dimension stays large enough to be
# efficient. Output is scattered back to original row order — per-row
# results are padding/batching-invariant, so this is a pure optimization.
CHUNK_ROWS = 256


def _run_batch(
    pdf: pd.DataFrame, chars_col: str, W: dict, vocab: dict, dtype=np.float64,
    use_crf: bool = True,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, list]:
    """Shared per-batch path: encode -> length-sorted chunked pad ->
    logits -> viterbi, results in original row order."""
    def _to_list(a):
        # NULL sentences (None from Arrow, float NaN from pandas) get
        # the empty-sentence treatment — dropped via the keep mask
        # below. A crawl emits NULL text rows; list(None) would crash
        # the whole Arrow batch (found by the adversarial-corpus gate
        # when a NULL doc first reached the tagger rows, r8).
        if a is None or isinstance(a, float):
            return []
        return list(a)

    seqs = pdf[chars_col].map(_to_list)
    lens = seqs.map(len).to_numpy(dtype=np.int64)
    keep = lens > 0
    seqs, lens = seqs[keep], lens[keep]
    if len(seqs) == 0:
        return np.zeros((0, 0), np.int32), lens, np.array([], object), keep
    flat = pd.Series([c for s in seqs for c in s], dtype=object)
    ids_flat = encode_chars(flat, vocab)
    B, Tmax = len(seqs), int(lens.max())
    offs = np.concatenate([[0], np.cumsum(lens)])
    labels = np.zeros((B, Tmax), dtype=np.int32)
    order = np.argsort(-lens, kind="stable")  # descending: packed fast path
    for s in range(0, B, CHUNK_ROWS):
        rows = order[s: s + CHUNK_ROWS]
        c_lens = lens[rows]
        c_T = int(c_lens.max())
        ids = np.zeros((len(rows), c_T), dtype=np.int64)  # <PAD>=0
        for i, b in enumerate(rows):
            ids[i, : lens[b]] = ids_flat[offs[b]: offs[b + 1]]
        logits = batch_logits(ids, c_lens, W, dtype=dtype)
        if use_crf:
            c_labels = viterbi_batch(logits, c_lens, W["transitions"])
        else:
            # operator #15: per-timestep argmax (reference CRF=False
            # branch, model.py:≈97-100 softmax_pred_op [R])
            c_labels = logits.argmax(axis=-1).astype(np.int32)
        labels[rows, :c_T] = c_labels
    return labels, lens, flat.to_numpy(), keep


def make_tag_udf(
    weights_bc, vocab_bc, id_cols: list[str], chars_col: str, dtype=np.float64,
    use_crf: bool = True,
) -> Callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]]:
    """UDF emitting per-sentence tag sequences: id_cols..., tags array."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        W, vocab = weights_bc.value, vocab_bc.value
        for pdf in batches:
            labels, lens, _, keep = _run_batch(pdf, chars_col, W, vocab, dtype, use_crf)
            kept = pdf.loc[keep.tolist() if hasattr(keep, "tolist") else keep]
            tags = [
                [LABEL2TAG[int(l)] for l in labels[b, : lens[b]]]
                for b in range(len(lens))
            ]
            out = kept[id_cols].copy().reset_index(drop=True)
            out["tags"] = pd.Series(tags, dtype=object)
            yield out

    return fn


def make_mention_udf(
    weights_bc, vocab_bc, id_cols: list[str], chars_col: str, dtype=np.float64,
    use_crf: bool = True,
) -> Callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]]:
    """UDF emitting mention rows (fused #22b): id_cols..., mention, etype,
    begin, end — saves materializing + shuffling tag arrays."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        W, vocab = weights_bc.value, vocab_bc.value
        for pdf in batches:
            labels, lens, chars_flat, keep = _run_batch(pdf, chars_col, W, vocab, dtype, use_crf)
            kept = pdf.loc[keep.tolist() if hasattr(keep, "tolist") else keep]
            kept = kept.reset_index(drop=True)
            if labels.size == 0:
                yield pd.DataFrame(
                    columns=[*id_cols, "mention", "etype", "begin", "end"]
                )
                continue
            spans = spans_from_labels(labels, lens, chars_flat)
            merged = spans.merge(
                kept[id_cols].reset_index(names="row"), on="row", how="left"
            )
            merged["begin"] = merged["begin"].astype("int32")
            merged["end"] = merged["end"].astype("int32")
            yield merged[[*id_cols, "mention", "etype", "begin", "end"]]

    return fn


def make_tagged_udf(
    weights_bc, vocab_bc, id_cols: list[str], chars_col: str, dtype=np.float64,
    use_crf: bool = True,
) -> Callable[[Iterator[pd.DataFrame]], Iterator[pd.DataFrame]]:
    """UDF emitting ONE row per sentence carrying the sentence text plus
    its mention array: id_cols..., <chars_col>, mentions array<struct>.

    This is the zero-shuffle handoff to per-sentence consumers (triple
    extraction): downstream pairing/gap logic stays narrow instead of
    re-joining mentions against sentences on the sentence key."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        W, vocab = weights_bc.value, vocab_bc.value
        for pdf in batches:
            labels, lens, chars_flat, keep = _run_batch(pdf, chars_col, W, vocab, dtype, use_crf)
            kept = pdf.loc[keep.tolist() if hasattr(keep, "tolist") else keep]
            kept = kept.reset_index(drop=True)
            if labels.size == 0:
                yield pd.DataFrame(columns=[*id_cols, chars_col, "mentions"])
                continue
            spans = spans_from_labels(labels, lens, chars_flat)
            per_row: list[list[dict]] = [[] for _ in range(len(kept))]
            for r in spans.itertuples(index=False):
                per_row[int(r.row)].append({
                    "mention": r.mention, "etype": r.etype,
                    "begin": int(r.begin), "end": int(r.end),
                })
            out = kept[[*id_cols, chars_col]].copy()
            out["mentions"] = pd.Series(per_row, dtype=object)
            yield out

    return fn


MENTION_STRUCT = "array<struct<mention:string,etype:string,begin:int,end:int>>"


def tag_sentences(
    df: DataFrame,
    weights_bc,
    vocab_bc,
    id_cols: list[str],
    chars_col: str = "chars",
    emit: str = "tags",
    dtype=np.float64,
    use_crf: bool = True,
) -> DataFrame:
    """Attach the tagger stage to a sentence DataFrame.

    emit='tags'     -> id_cols..., tags array<string>
    emit='mentions' -> id_cols..., mention string, etype string,
                       begin int, end int
    emit='tagged'   -> id_cols..., <chars_col> string, mentions
                       array<struct<mention,etype,begin,end>> (one row
                       per sentence — the narrow handoff for fused
                       per-sentence consumers like triple extraction)
    """
    id_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.schema if f.name in id_cols
    )
    if emit == "tags":
        fn = make_tag_udf(weights_bc, vocab_bc, id_cols, chars_col, dtype, use_crf)
        schema = f"{id_schema}, tags array<string>"
    elif emit == "mentions":
        fn = make_mention_udf(weights_bc, vocab_bc, id_cols, chars_col, dtype, use_crf)
        schema = f"{id_schema}, mention string, etype string, begin int, end int"
    elif emit == "tagged":
        fn = make_tagged_udf(weights_bc, vocab_bc, id_cols, chars_col, dtype, use_crf)
        schema = f"{id_schema}, {chars_col} string, mentions {MENTION_STRUCT}"
    else:
        raise ValueError(f"emit={emit!r}")
    from zh_ner_tf_spark.plans.parallel import ensure_parallelism

    # The tagger is GEMM-bound — by far the most CPU per input byte in
    # the engine — so an under-partitioned input (e.g. a single-row-
    # group parquet shard scanning as ONE task) serializes it while the
    # session idles. ensure_parallelism round-robins the narrow
    # (ids, chars) projection up to the session parallelism ONLY in
    # that case; production-sized inputs pass through untouched.
    return ensure_parallelism(
        df.select(*id_cols, chars_col)
    ).mapInPandas(fn, schema=schema)


def broadcast_model(spark, weights: dict[str, np.ndarray], word2id: dict[str, int]):
    sc = spark.sparkContext
    return sc.broadcast(weights), sc.broadcast(word2id)
