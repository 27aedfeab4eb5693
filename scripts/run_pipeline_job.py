"""spark-submit entrypoint (BASELINE.json north_rule: "run via
spark-submit --py-files on a multi-executor cluster").

Usage:
  spark-submit --py-files engine.zip scripts/run_pipeline_job.py \
      <n_pages> <out_dir>

Builds the fixture pages table, runs the full KG pipeline, writes
triples/nodes/edges parquet under <out_dir>. The engine arrives ONLY via
--py-files (no repo on the executors' path) — this script must import
everything from the shipped zip.
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/kg_out"

    spark = SparkSession.builder.appName("kg_pipeline_job").getOrCreate()

    from zh_ner_tf_spark.fixtures.corpus import planted_weights
    from zh_ner_tf_spark.fixtures.pages import (
        gen_pages,
        oracle_extract_text,
        pages_schema,
    )
    from zh_ner_tf_spark.oracle import normalize_token
    from zh_ner_tf_spark.pipeline import materialize_graph, run_pipeline

    rows = gen_pages(n_pages, seed=42)
    word2id = {"<PAD>": 0}
    for r in rows:
        text = r["text"] if r["text"] is not None else oracle_extract_text(r["html"])
        for ch in text:
            word2id.setdefault(normalize_token(ch), len(word2id))
    for t in ("<NUM>", "<ENG>", "<UNK>"):
        word2id.setdefault(t, len(word2id))
    weights = planted_weights(word2id)

    pages = spark.createDataFrame(
        [(r["url"], r["warc_ts"], r["html"], r["text"], r["lang"]) for r in rows],
        schema=pages_schema(),
    )
    out = run_pipeline(spark, pages, weights, word2id, lang="zh")
    out["triples"].write.mode("overwrite").parquet(f"{out_dir}/triples")
    # nodes/edges go through the unified snapshot+lineage sink: killed
    # runs resume per bucket, readers only ever see committed snapshots.
    # The stage is keyed on the job's input (n_pages) and committed with
    # replace semantics: a re-run with the SAME input resumes/no-ops,
    # while a re-run with a DIFFERENT input publishes a snapshot that
    # references only its own graph — never a union with a previous
    # run's stale nodes/edges (which would silently disagree with the
    # freshly overwritten triples table)
    sids = materialize_graph(spark, out, out_dir, stage=f"job-{n_pages}",
                             replace=True)
    n = spark.read.parquet(f"{out_dir}/triples").count()
    print(f"TRIPLES_WRITTEN={n}")
    print(f"GRAPH_SNAPSHOTS={sids}")
    spark.stop()


if __name__ == "__main__":
    main()
