"""Deterministic NER-corpus fixture generator (FIXTURES.md P2).

Produces sentences over a ~120-symbol closed vocabulary (CJK block chars
plus ASCII letters/digits and the full-width digit '１' for the Unicode
``isdigit`` edge case) with planted PER/LOC/ORG spans, so golden mentions
are computable in closed form. Includes the edge sentences the reference's
BIO scanner (utils.py:≈10-82 [R]) is sensitive to: length-1, all-O,
entity at position 0, entity at the last position, adjacent B-X B-X.
"""

from __future__ import annotations

import random

# Closed char inventory: 100 CJK chars + ASCII + full-width digit.
CJK = [chr(0x4E00 + i) for i in range(100)]
FILLER = CJK[:60]
ASCII_BITS = list("AbZz059") + ["１"]  # exercises <ENG>/<NUM> normalization

# Planted entity surface inventories (drawn from a disjoint CJK slice so
# entity chars and filler chars overlap only partially).
ENTITY_POOL = {
    "PER": [CJK[60:63], CJK[63:65], CJK[65:68]],
    "LOC": [CJK[68:71], CJK[71:73], CJK[73:76]],
    "ORG": [CJK[76:80], CJK[80:83], CJK[83:87]],
}


def _entity(rng: random.Random, etype: str) -> tuple[list[str], list[str]]:
    chars = rng.choice(ENTITY_POOL[etype])
    tags = [f"B-{etype}"] + [f"I-{etype}"] * (len(chars) - 1)
    return list(chars), tags


def _filler(rng: random.Random, n: int) -> tuple[list[str], list[str]]:
    chars = [
        rng.choice(ASCII_BITS) if rng.random() < 0.08 else rng.choice(FILLER)
        for _ in range(n)
    ]
    return chars, ["O"] * n


def gen_ner_corpus(
    n_sentences: int = 500, seed: int = 42
) -> list[tuple[list[str], list[str]]]:
    """Returns [(chars, tags)] with planted spans; deterministic."""
    rng = random.Random(seed)
    out: list[tuple[list[str], list[str]]] = []
    # Edge sentences first (stable positions for debugging).
    out.append(([CJK[0]], ["O"]))                                  # length-1
    c, t = _filler(rng, 12)
    out.append((c, t))                                             # all-O
    ec, et = _entity(rng, "PER")
    fc, ft = _filler(rng, 5)
    out.append((ec + fc, et + ft))                                 # entity @0
    out.append((fc + ec, ft + et))                                 # entity @end
    e1c, e1t = _entity(rng, "ORG")
    e2c, e2t = _entity(rng, "ORG")
    out.append((e1c + e2c, e1t + e2t))                             # B-X B-X adjacency
    while len(out) < n_sentences:
        chars: list[str] = []
        tags: list[str] = []
        for _ in range(rng.randint(1, 5)):
            fc, ft = _filler(rng, rng.randint(1, 10))
            chars += fc
            tags += ft
            if rng.random() < 0.7:
                et = rng.choice(("PER", "LOC", "ORG"))
                ec, ett = _entity(rng, et)
                chars += ec
                tags += ett
        out.append((chars[:60], tags[:60]))
    return out


def write_conll(path: str, corpus: list[tuple[list[str], list[str]]]) -> None:
    """Reference on-disk format (data.py:≈16-35 read_corpus [R]):
    ``char<SP>tag`` per line, blank line between sentences."""
    with open(path, "w", encoding="utf-8") as f:
        for chars, tags in corpus:
            for ch, tag in zip(chars, tags):
                f.write(f"{ch} {tag}\n")
            f.write("\n")


def planted_weights(word2id: dict[str, int]) -> dict:
    """Hand-constructed weights that make the BiLSTM-CRF a WORKING tagger
    over the fixture char pools (PER/LOC/ORG inventories above).

    Construction: embeddings one-hot a 4-way char class; the LSTM kernel
    routes class k to i/j gate k with the forget gate biased hard off and
    the output gate hard on, so h_t ≈ tanh(1)·onehot(class(x_t)) — a
    per-position class detector realized THROUGH the exact TF-1.x cell
    semantics (forget_bias, gate order and all). The projection maps class
    k to equal B-X/I-X logits and the CRF transitions impose BIO
    structure (O→I-X forbidden), so Viterbi emits well-formed spans over
    planted entities. Used by the E2E triple-recall gate; parity tests
    use random seeded weights instead (harder case: near-tie margins).
    """
    import numpy as np

    from zh_ner_tf_spark.config import NUM_TAGS, TAG2LABEL

    D, H = 8, 8
    V = max(word2id.values()) + 1
    class_of_char: dict[str, int] = {}
    for k, etype in enumerate(("PER", "LOC", "ORG")):
        for surface in ENTITY_POOL[etype]:
            for ch in surface:
                class_of_char[ch] = k
    emb = np.zeros((V, D), dtype=np.float32)
    for tok, idx in word2id.items():
        cls = class_of_char.get(tok, 3)
        emb[idx, cls] = 1.0

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
    O = TAG2LABEL["O"]
    trans[:, O] = 1.0
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
