"""CoNLL corpus scan — operator #1 (reference data.py:≈16-35 read_corpus [R]).

Reference semantics: UTF-8 text file, one ``char<SP>tag`` pair per line,
blank line = sentence boundary.

Spark-first shape (SURVEY.md §2 #1): ``spark.read.text`` preserves no
global line order across splits, so we anchor order on a per-file basis:
read with ``wholetext=false`` is wrong at scale for this format (sentence
groups would straddle split boundaries). Instead each FILE is one record
(``wholetext=true``) and a ``mapInPandas`` shreds it into sentences —
CoNLL corpora are many small files at web scale, so file-level
parallelism is the natural partitioning; a single giant file is a data
layout bug, not an engine case. Output: one row per sentence with
``array<string>`` chars/tags (the engine's columnar corpus shape).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORPUS_SCHEMA = (
    "file string, sent_id int, chars array<string>, tags array<string>"
)


def _shred(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for fname, blob in zip(pdf["file"], pdf["value"]):
            sent_id = 0
            chars: list[str] = []
            tags: list[str] = []
            for line in blob.split("\n"):
                line = line.rstrip("\r")
                if line.strip() == "":
                    if chars:
                        rows.append((fname, sent_id, chars, tags))
                        sent_id += 1
                        chars, tags = [], []
                    continue
                ch, _, tag = line.partition(" ")
                chars.append(ch)
                tags.append(tag.strip())
            if chars:
                rows.append((fname, sent_id, chars, tags))
        yield pd.DataFrame(rows, columns=["file", "sent_id", "chars", "tags"])


def read_corpus(spark: SparkSession, path: str) -> DataFrame:
    raw = (
        spark.read.text(path, wholetext=True)
        .withColumn("file", F.input_file_name())
    )
    return raw.mapInPandas(_shred, schema=CORPUS_SCHEMA)
