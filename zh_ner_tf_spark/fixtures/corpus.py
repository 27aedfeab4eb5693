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

    Delegates to ``model.weights.build_class_weights`` with the fixture
    entity pools as the char-class map. Used by the E2E triple-recall
    gate; parity tests use random seeded weights instead (the harder
    case: near-tie margins).
    """
    from zh_ner_tf_spark.model.weights import build_class_weights

    class_of_char: dict[str, int] = {}
    for k, etype in enumerate(("PER", "LOC", "ORG")):
        for surface in ENTITY_POOL[etype]:
            for ch in surface:
                class_of_char[ch] = k
    return build_class_weights(word2id, class_of_char)
