"""Interactive demo REPL (SURVEY §2 #24 — reference main.py:≈93-120 [R]
``--mode demo``: read a sentence from stdin, print PER/LOC/ORG mentions,
until an empty line / EOF).

Usage:
  python scripts/demo_repl.py --planted            # deterministic demo model
  python scripts/demo_repl.py --weights model.npz --vocab vocab.json

One SparkSession serves the whole loop; each input line runs the real
mapInPandas tagger on a one-row DataFrame (the reference's demo_one
shape). Reads stdin, writes stdout — pipeable and testable.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# runnable as `python scripts/demo_repl.py` from a repo checkout
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", help=".npz weight artifact")
    ap.add_argument("--vocab", help="vocab json ({char: id})")
    ap.add_argument(
        "--planted", action="store_true",
        help="use the deterministic letter-run demo model (no artifacts)",
    )
    ap.add_argument("--master", default="local[2]")
    args = ap.parse_args()

    from zh_ner_tf_spark.model.weights import build_class_weights, load_weights
    from zh_ner_tf_spark.operators.tagger import broadcast_model, tag_sentences
    from zh_ner_tf_spark.session import get_spark

    if args.planted:
        from zh_ner_tf_spark.config import (
            ENG_TOKEN, NUM_TOKEN, PAD_TOKEN, UNK_TOKEN,
        )

        word2id = {PAD_TOKEN: 0, ENG_TOKEN: 1, NUM_TOKEN: 2, UNK_TOKEN: 3}
        weights = build_class_weights(word2id, {ENG_TOKEN: 0}, default_class=3)
    else:
        if not (args.weights and args.vocab):
            print("need --weights and --vocab (or --planted)", file=sys.stderr)
            return 2
        weights = load_weights(args.weights)
        with open(args.vocab) as f:
            word2id = json.load(f)

    spark = get_spark(app_name="zh_ner_demo", master=args.master,
                      shuffle_partitions=2)
    wb, vb = broadcast_model(spark, weights, word2id)
    print("ready", flush=True)  # handshake for pipes/tests
    for line in sys.stdin:
        sent = line.rstrip("\n")
        if not sent.strip():
            break
        df = spark.createDataFrame([(0, sent)], "sid int, sentence string")
        mentions = tag_sentences(
            df, wb, vb, id_cols=["sid"], chars_col="sentence", emit="mentions"
        ).collect()
        by_type: dict[str, list[str]] = {"PER": [], "LOC": [], "ORG": []}
        for r in sorted(mentions, key=lambda r: r["begin"]):
            by_type[r["etype"]].append(r["mention"])
        print(
            f"PER: {by_type['PER']}\nLOC: {by_type['LOC']}\nORG: {by_type['ORG']}",
            flush=True,
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
