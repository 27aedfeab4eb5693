"""Round-9 optimization instrumentation (bench.py is FROZEN; this file
carries the extra measurements OPTIMIZATION_r09.md cites).

Per named query it separates where wall time goes:

  * build_s  — driver-side DataFrame construction (py4j expression
               building; pure Python, no Spark jobs)
  * plan_s   — analysis + optimization + physical planning
               (explain("formatted") on a fresh frame)
  * exec_s   — noop-sink execution reps on fresh frames (guide §1.4),
               best + all samples

Usage:
  python bench_extra.py                      # all headline queries
  python bench_extra.py ann_topk cc_full     # a subset
  python bench_extra.py --plans before       # also write
                                             # plans/r09/<q>_before.txt
Env: SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as bench.py.
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import sys
import time

for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS",
           "VECLIB_MAXIMUM_THREADS", "NUMEXPR_NUM_THREADS"):
    os.environ[_v] = "1"

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPS = int(os.environ.get("BENCH_EXTRA_REPS", "3"))

HEADLINE = [
    "ner_tagger_mentions", "tpch_pricing_summary", "broadcast_join_dims",
    "topk_orders_per_customer", "vocab_build", "bio_spans", "eval_prf1",
    "triples_pattern", "minhash_bands", "lsh_doc_pairs", "entity_blocking",
    "simhash", "dedup_exact", "embedding_topk", "quality_features",
    "cc_full", "ann_topk", "embedding_near_dup", "winnow_fingerprint",
]
TEXT_OPS = ["containment_pairs", "bm25_topk", "token_surprisal",
            "incremental_link"]


def _capture_plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _gemm_probe(reps: int = 60) -> float:
    """Single-process f32 GEMM rate (matmuls/s) — the same job-matched
    load probe bench.py's scaling loop uses. A clean window on this
    host measures ~250-450; under heavy external load it drops below
    50, and wall-clock numbers taken then are not comparable."""
    import numpy as np

    rng = np.random.RandomState(0)
    a = rng.rand(256, 300).astype(np.float32)
    b = rng.rand(300, 1200).astype(np.float32)
    t0 = time.time()
    for _ in range(reps):
        a @ b
    return round(reps / (time.time() - t0), 1)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    plans_tag = None
    for a in sys.argv[1:]:
        if a.startswith("--plans"):
            plans_tag = a.split("=", 1)[1] if "=" in a else "before"
    names = args or (HEADLINE + TEXT_OPS)

    import __spark_entry__ as entry

    from zh_ner_tf_spark.session import get_spark

    spark = get_spark(app_name="bench_extra", master=f"local[{CPUS}]")
    # same warmup as bench.py: cold Python-worker start is a constant,
    # not a throughput property
    from pyspark.sql import functions as F
    n = spark.sparkContext.defaultParallelism * 2
    wdf = spark.range(n * 10).repartition(n)
    wdf.mapInPandas(lambda it: it, schema="id long").count()
    wdf.select(F.sum("id")).count()

    qs = entry.queries()
    out: dict = {"_load_probe_matmuls_per_sec": [_gemm_probe()]}
    for name in names:
        rec: dict = {}
        t0 = time.time()
        df = qs[name](spark, SF_DIR)
        rec["build_s"] = round(time.time() - t0, 3)
        t0 = time.time()
        plan = _capture_plan(df)
        rec["plan_s"] = round(time.time() - t0, 3)
        if plans_tag:
            os.makedirs("plans/r09", exist_ok=True)
            with open(f"plans/r09/{name}_{plans_tag}.txt", "w") as f:
                f.write(plan)
        execs = []
        for _ in range(REPS):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            qs[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite").save()
            execs.append(round(time.time() - t0, 3))
        rec["exec_best_s"] = min(execs)
        rec["exec_s"] = execs
        out[name] = rec
        print(f"# {name}: build={rec['build_s']} plan={rec['plan_s']} "
              f"exec={execs}", file=sys.stderr)
    out["_load_probe_matmuls_per_sec"].append(_gemm_probe())
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
