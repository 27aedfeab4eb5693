"""Frozen model weights: seeded init, .npz persistence, broadcast helper.

The reference persists model state as TF checkpoints
(``model.py:≈200 tf.train.Saver`` [R]) and initializes embeddings with
``np.random.uniform(-0.25, 0.25)`` (``data.py:≈100-107 random_embedding``
[R]). Here the whole frozen model is one seeded ``.npz`` artifact, loaded
once per executor via ``SparkContext.broadcast`` (BASELINE.json
north_star: "char-embedding lookup tables broadcast to executors").

Shapes (FIXTURES.md P4):
  embeddings      [V, D]
  lstm_fw_kernel  [D+H, 4H]   lstm_fw_bias [4H]
  lstm_bw_kernel  [D+H, 4H]   lstm_bw_bias [4H]
  proj_W          [2H, T]     proj_b       [T]
  transitions     [T, T]      (CRF transition params, T = 7 tags)

At the reference's full size (V≈3.9k, D=H=300) this is ≈7 MB — trivially
broadcastable; even a 1M-char vocab is ≈1.2 GB, within torrent-broadcast
range on a real cluster (SURVEY.md §4.1).
"""

from __future__ import annotations

import numpy as np

from zh_ner_tf_spark.config import NUM_TAGS, SEED

WEIGHT_KEYS = (
    "embeddings",
    "lstm_fw_kernel", "lstm_fw_bias",
    "lstm_bw_kernel", "lstm_bw_bias",
    "proj_W", "proj_b",
    "transitions",
)


def init_weights(
    vocab_size: int,
    embedding_dim: int,
    hidden_dim: int,
    num_tags: int = NUM_TAGS,
    seed: int = SEED,
) -> dict[str, np.ndarray]:
    """Seeded uniform(-0.25, 0.25) init for every parameter (reference
    embedding init rule applied uniformly; the reference's xavier/LSTM
    inits are training-time details — our engine only ever consumes a
    frozen artifact, so the *init distribution* is not a parity surface,
    only determinism is)."""
    rng = np.random.RandomState(seed)

    def u(*shape: int) -> np.ndarray:
        return rng.uniform(-0.25, 0.25, shape).astype(np.float32)

    d, h = embedding_dim, hidden_dim
    return {
        "embeddings": u(vocab_size, d),
        "lstm_fw_kernel": u(d + h, 4 * h),
        "lstm_fw_bias": u(4 * h),
        "lstm_bw_kernel": u(d + h, 4 * h),
        "lstm_bw_bias": u(4 * h),
        "proj_W": u(2 * h, num_tags),
        "proj_b": u(num_tags),
        "transitions": u(num_tags, num_tags),
    }


def build_class_weights(
    word2id: dict[str, int],
    class_of_token: dict[str, int],
    default_class: int = 3,
) -> dict[str, np.ndarray]:
    """Hand-constructed weights realizing a per-char class detector
    THROUGH the exact TF-1.x LSTM cell semantics (forget gate biased hard
    off so state carries nothing; i/j gates route a one-hot char class;
    output gate hard on), projected to equal B-X/I-X logits with CRF
    transitions imposing BIO structure (O→I-X forbidden).

    class ids: 0=PER, 1=LOC, 2=ORG, 3=O. Produces a deterministic WORKING
    tagger for tokens the caller classifies — used by E2E gates and the
    driver-oracle-checkable tagger query (letter-run semantics).
    """
    from zh_ner_tf_spark.config import NUM_TAGS, TAG2LABEL

    D, H = 8, 8
    V = max(word2id.values()) + 1
    emb = np.zeros((V, D), dtype=np.float32)
    for tok, idx in word2id.items():
        emb[idx, class_of_token.get(tok, default_class)] = 1.0

    def kernel_bias():
        k = np.zeros((D + H, 4 * H), dtype=np.float32)
        b = np.zeros(4 * H, dtype=np.float32)
        for cls in range(4):
            k[cls, cls] = 10.0          # x -> i gate
            k[cls, H + cls] = 10.0      # x -> j gate
        b[2 * H: 3 * H] = -20.0         # forget gate off (plus forget_bias)
        b[3 * H: 4 * H] = 20.0          # output gate on
        return k, b

    kf, bf = kernel_bias()
    kb, bb = kernel_bias()
    proj = np.zeros((2 * H, NUM_TAGS), dtype=np.float32)
    amp = 8.0
    for cls, etype in enumerate(("PER", "LOC", "ORG")):
        for prefix in ("B-", "I-"):
            t = TAG2LABEL[f"{prefix}{etype}"]
            proj[cls, t] = amp
            proj[H + cls, t] = amp
    proj[3, TAG2LABEL["O"]] = amp
    proj[H + 3, TAG2LABEL["O"]] = amp

    trans = np.full((NUM_TAGS, NUM_TAGS), -1.0, dtype=np.float32)
    trans[:, TAG2LABEL["O"]] = 1.0
    for etype in ("PER", "LOC", "ORG"):
        b_t, i_t = TAG2LABEL[f"B-{etype}"], TAG2LABEL[f"I-{etype}"]
        trans[:, b_t] = 0.5              # B-X reachable from anything
        trans[:, i_t] = -8.0             # I-X forbidden by default...
        trans[b_t, i_t] = 2.0            # ...except continuing a span
        trans[i_t, i_t] = 2.0
    return {
        "embeddings": emb,
        "lstm_fw_kernel": kf, "lstm_fw_bias": bf,
        "lstm_bw_kernel": kb, "lstm_bw_bias": bb,
        "proj_W": proj, "proj_b": np.zeros(NUM_TAGS, dtype=np.float32),
        "transitions": trans,
    }


def save_weights(path: str, weights: dict[str, np.ndarray]) -> None:
    missing = set(WEIGHT_KEYS) - set(weights)
    if missing:
        raise ValueError(f"missing weight arrays: {sorted(missing)}")
    np.savez(path, **weights)


def load_weights(path: str) -> dict[str, np.ndarray]:
    with np.load(path) as z:
        return {k: z[k] for k in WEIGHT_KEYS}
