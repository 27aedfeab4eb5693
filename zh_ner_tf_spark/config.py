"""Frozen engine constants.

Everything the reference hard-codes by convention is declared here once:
the 7-tag BIO label space (reference ``data.py:≈7-13`` [R]), token
normalization rules (``data.py:≈42-47, 75-80`` [R]), reserved vocab
tokens (``data.py:≈38-70`` [R]), sentence delimiters, the dependency
pattern table (graft extension, BASELINE.json north_star), and all seeds.

Citations use the SURVEY.md convention: [R] = reconstructed public
zh-NER-TF layout (the /root/reference mount was empty at survey time).
"""

from __future__ import annotations

SEED = 42

# --- tag space (reference data.py:≈7-13 [R]) --------------------------------
TAG2LABEL: dict[str, int] = {
    "O": 0,
    "B-PER": 1,
    "I-PER": 2,
    "B-LOC": 3,
    "I-LOC": 4,
    "B-ORG": 5,
    "I-ORG": 6,
}
LABEL2TAG: dict[int, str] = {v: k for k, v in TAG2LABEL.items()}
NUM_TAGS = len(TAG2LABEL)
ENTITY_TYPES = ("PER", "LOC", "ORG")

# --- reserved vocabulary tokens (reference data.py:≈38-70 [R]) --------------
PAD_TOKEN = "<PAD>"   # id 0, also the pad id in pad_sequences (pad_mark=0)
UNK_TOKEN = "<UNK>"
NUM_TOKEN = "<NUM>"   # any char where Python str.isdigit() is True
ENG_TOKEN = "<ENG>"   # any char in [A-Za-z]
PAD_ID = 0

# --- model hyperparameters (reference main.py:≈16-37 argparse [R]) ----------
EMBEDDING_DIM = 300
HIDDEN_DIM = 300
FORGET_BIAS = 1.0     # TF-1.x LSTMCell default; load-bearing for parity

# Tiny test-size model (FIXTURES.md P4): fast pytest parity runs.
TEST_EMBEDDING_DIM = 8
TEST_HIDDEN_DIM = 16

# --- sentence splitting (graft extension; frozen delimiter set) -------------
# CJK terminators + ASCII terminators. Kept as an explicit char class so the
# Spark `split()` regex and any oracle SQL agree exactly.
SENTENCE_DELIMS = "。！？!?."
SENTENCE_SPLIT_REGEX = "[。！？!?.]"

# --- dependency-pattern triple table (graft extension, frozen) --------------
# The reference has no parser; BASELINE.json mandates "dependency-pattern
# triple extraction". The pattern table is part of engine config and frozen
# so the oracle extractor is exact: a (subject, object) mention pair in one
# sentence yields (subj, pred, obj) when the connective text between them
# contains the keyword. First matching row wins (list order = priority).
TRIPLE_PATTERNS: list[tuple[str, str]] = [
    ("works_for", "任职|就职|工作|供职|works for|employed"),
    ("located_in", "位于|地处|坐落|located in|based in"),
    ("member_of", "隶属|属于|member of|part of"),
    ("founded", "创立|创办|成立|founded|established"),
    ("visited", "访问|到访|考察|visited"),
    ("met_with", "会见|会晤|met"),
]
# Max chars of connective text between two mentions for a pattern to apply.
TRIPLE_MAX_GAP = 30

# --- MinHash-LSH blocking (graft extension, frozen hash family) -------------
MINHASH_NUM_HASHES = 16
MINHASH_BANDS = 8                 # rows-per-band = NUM_HASHES // BANDS = 2
MINHASH_PRIME = 2147483647        # 2^31 - 1 (Mersenne)
MINHASH_SHINGLE_K = 2             # char bigrams over mention surface forms
JACCARD_THRESHOLD = 0.5           # candidate pair similarity cutoff

# --- skew handling -----------------------------------------------------------
HOT_KEY_FACTOR = 16               # keys with > factor * avg rows are "hot"
DEFAULT_SALT_BUCKETS = 8

# --- Spark session defaults --------------------------------------------------
SPARK_CONF: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    # AQE's coalesce floor defaults to 1 MB per partition, which
    # squeezes CPU-dense small exchanges (token windows, vector
    # rescores: kilobytes of compact rows carrying interpreted-
    # expression work) onto 1-3 tasks while the session idles —
    # measured r9: the 270k-token window stage ran on 3 tasks at 0.65s
    # each, and the 132k-pair cosine rescore in ONE task. A 3-point A/B
    # (64k / 256k / 1m, interleaved same-session) showed 64k
    # over-splits long chains of tiny shuffles (incremental_link
    # 6.0s vs 3.8s at 1m) while 1m serializes the CPU-dense stages
    # (embedding_near_dup 2.76 vs 2.02 at 64k); 256 KB is the measured
    # balance point (near-best on every probe). On production-sized
    # shuffles (partitions >> 1 MB) the floor never binds, so this is
    # scale-neutral, not a local[32] constant.
    "spark.sql.adaptive.coalescePartitions.minPartitionSize": "256k",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Arrow batch size ≙ reference batch_size (main.py:≈18 [R]); tuned larger
    # because the tagger UDF is GEMM-bound and amortizes per-batch overhead.
    "spark.sql.execution.arrow.maxRecordsPerBatch": "1024",
    "spark.sql.session.timeZone": "UTC",
    "spark.ui.enabled": "false",
}

TESTDATA_TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
)
