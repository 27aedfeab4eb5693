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


def save_weights(path: str, weights: dict[str, np.ndarray]) -> None:
    missing = set(WEIGHT_KEYS) - set(weights)
    if missing:
        raise ValueError(f"missing weight arrays: {sorted(missing)}")
    np.savez(path, **weights)


def load_weights(path: str) -> dict[str, np.ndarray]:
    with np.load(path) as z:
        return {k: z[k] for k in WEIGHT_KEYS}
