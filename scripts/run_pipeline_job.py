"""spark-submit entrypoint (BASELINE.json north_rule: "run via
spark-submit --py-files on a multi-executor cluster").

Usage:
  spark-submit --py-files engine.zip scripts/run_pipeline_job.py \
      <n_pages> <out_dir>                          # full batch build
  spark-submit --py-files engine.zip scripts/run_pipeline_job.py \
      incremental <pages_table> <graph_root> [batch_pages] [--links]
                                                   # crawl-consumption loop

Batch mode builds the fixture pages table, runs the full KG pipeline,
and writes triples/nodes/edges under <out_dir>. Incremental mode
simulates one crawl arrival (appends a deterministic batch of pages as
a new snapshot to <pages_table>) and consumes it with
pipeline.run_incremental — each invocation tags ONLY the new batch and
republishes the graph; re-running keeps advancing the cursor. With
``--links`` the corpus alias table is maintained too (incremental
relink of KB-churn-touched surfaces only; state under
<graph_root>/state/links). The
engine arrives ONLY via --py-files (no repo on the executors' path) —
this script must import everything from the shipped zip.
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession


def _vocab_and_weights(rows):
    from zh_ner_tf_spark.fixtures.corpus import planted_weights
    from zh_ner_tf_spark.fixtures.pages import oracle_extract_text
    from zh_ner_tf_spark.oracle import normalize_token

    word2id = {"<PAD>": 0}
    for r in rows:
        text = r["text"] if r["text"] is not None else oracle_extract_text(r["html"])
        for ch in text:
            word2id.setdefault(normalize_token(ch), len(word2id))
    for t in ("<NUM>", "<ENG>", "<UNK>"):
        word2id.setdefault(t, len(word2id))
    return word2id, planted_weights(word2id)


def main_incremental() -> None:
    from zh_ner_tf_spark.fixtures.pages import gen_pages, pages_schema
    from zh_ner_tf_spark.pipeline import run_incremental
    from zh_ner_tf_spark.sources.sinks import committed_snapshots, snapshot_append

    args = [a for a in sys.argv[2:] if a != "--links"]
    maintain_links = {"min_score_ppm": 600_000} if "--links" in sys.argv else None
    pages_table = args[0]
    graph_root = args[1]
    batch_pages = int(args[2]) if len(args) > 2 else 60
    max_batches = 8

    spark = SparkSession.builder.appName("kg_incremental_job").getOrCreate()
    arrived = len(committed_snapshots(pages_table))
    if arrived:
        # the table pins the batch size: slicing and the model artifact
        # must be identical across invocations, so a changed CLI arg
        # must not silently skip/re-consume pages or retag later batches
        # with a different planted model
        from zh_ner_tf_spark.sources.sinks import snapshot_row_count

        first_batch = snapshot_row_count(pages_table, 1)
        if first_batch != batch_pages:
            print(f"BATCH_PAGES_PINNED={first_batch}", file=sys.stderr)
            batch_pages = first_batch
    # deterministic page universe shared by every invocation: vocab and
    # weights stay IDENTICAL across batches (a real deployment ships a
    # frozen model artifact; the fixture derives it from the universe)
    universe = gen_pages(batch_pages * max_batches, seed=42)
    word2id, weights = _vocab_and_weights(universe)

    if arrived < max_batches:
        batch = universe[arrived * batch_pages:(arrived + 1) * batch_pages]
        df = spark.createDataFrame(
            [(r["url"], r["warc_ts"], r["html"], r["text"], r["lang"])
             for r in batch],
            schema=pages_schema(),
        )
        snapshot_append(df, pages_table)
    res = run_incremental(spark, pages_table, graph_root, weights, word2id,
                          maintain_links=maintain_links)
    print(f"PROCESSED_PAGES={res['processed_pages']}")
    print(f"UP_TO_DATE={res['up_to_date']}")
    print(f"PAGES_SNAPSHOT={res['pages_snapshot']}")
    print(f"GRAPH_SNAPSHOTS={res['graph_sids']}")
    if res.get("link_stats") is not None:
        print(f"LINK_MODE={res['link_stats'].get('link_mode')}")
    spark.stop()


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/kg_out"

    spark = SparkSession.builder.appName("kg_pipeline_job").getOrCreate()

    from zh_ner_tf_spark.fixtures.pages import gen_pages, pages_schema
    from zh_ner_tf_spark.pipeline import materialize_graph, run_pipeline

    rows = gen_pages(n_pages, seed=42)
    word2id, weights = _vocab_and_weights(rows)

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
    if len(sys.argv) > 1 and sys.argv[1] == "incremental":
        main_incremental()
    else:
        main()
