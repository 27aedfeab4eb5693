"""Deterministic hash family shared by MinHash/LSH, SimHash, dedup and
fingerprinting.

Everything here is a JVM-side Column expression (whole-stage codegen, no
Python) built from a polynomial rolling hash over code points:

    h(s) = fold(c in s) (h*31 + codepoint(c)) mod P,   P = 2^31 - 1

and a seeded universal family  h_j(x) = (a_j * x + b_j) mod P  with a_j,
b_j drawn from a seeded RNG (engine config, frozen). The same arithmetic
is expressible verbatim in DuckDB (``list_reduce``), which is what makes
the LSH/dedup operators oracle-checkable — no reliance on engine-native
hash functions that differ across systems.

The reference repo has no hashing at all; this is graft-extension
infrastructure (BASELINE.json: MinHash-LSH blocking).
"""

from __future__ import annotations

import random

from pyspark.sql import Column
from pyspark.sql import functions as F

from zh_ner_tf_spark.config import MINHASH_NUM_HASHES, MINHASH_PRIME, SEED


def poly_hash(col: Column | str) -> Column:
    """Polynomial rolling hash of a string column -> bigint in [0, P)."""
    c = F.col(col) if isinstance(col, str) else col
    chars = F.split(c, "")
    codes = F.transform(chars, lambda ch: F.ascii(ch).cast("bigint"))
    return F.aggregate(
        codes,
        F.lit(0).cast("bigint"),
        lambda acc, x: (acc * 31 + x) % MINHASH_PRIME,
    )


def poly_hash_sql(expr: str) -> str:
    """DuckDB-dialect twin of ``poly_hash`` (for oracle SQL strings)."""
    return (
        "list_reduce(list_prepend(0::BIGINT, "
        f"list_transform(string_split({expr}, ''), c -> ascii(c)::BIGINT)), "
        f"(a, c) -> (a * 31 + c) % {MINHASH_PRIME})"
    )


def token_hashes(tokens_col: Column) -> Column:
    """array<string> tokens -> array<bigint> polynomial char hashes.
    One small fold per token; word n-gram hashes then COMBINE these
    (h = fold (acc*31 + th_i) mod P) instead of re-folding the gram
    string char by char — ~10x less higher-order-function churn."""
    return F.transform(
        tokens_col,
        lambda tok: F.aggregate(
            F.transform(F.split(tok, ""), lambda c: F.ascii(c).cast("bigint")),
            F.lit(0).cast("bigint"),
            lambda acc, x: (acc * 31 + x) % MINHASH_PRIME,
        ),
    )


def combine_hashes(*hs: Column) -> Column:
    """Fold token hashes into a gram hash: (((0*31+h1)%P)*31+h2)%P ..."""
    acc = F.lit(0).cast("bigint")
    for h in hs:
        acc = (acc * 31 + h) % MINHASH_PRIME
    return acc


def hash_family(n: int = MINHASH_NUM_HASHES, seed: int = SEED) -> list[tuple[int, int]]:
    """n seeded (a, b) pairs, a in [1, P), b in [0, P)."""
    rng = random.Random(seed)
    return [
        (rng.randrange(1, MINHASH_PRIME), rng.randrange(0, MINHASH_PRIME))
        for _ in range(n)
    ]


def universal_hash(col: Column, a: int, b: int) -> Column:
    return (F.lit(a).cast("bigint") * col + F.lit(b)) % MINHASH_PRIME


def universal_hash_sql(expr: str, a: int, b: int) -> str:
    return f"(({a}::BIGINT * {expr} + {b}) % {MINHASH_PRIME})"
