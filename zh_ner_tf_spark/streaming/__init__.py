"""Streaming — documented non-goal (SURVEY.md §2.B).

The reference is pure batch: its only interactive surface is the demo
REPL (main.py:≈93-120 [R]), a stdin loop, not a stream. The graft's
north_rule is batch-with-exact-resume (plans/lineage.py), so no
Structured Streaming operator is part of the correctness surface.

``tag_stream`` below is the one-liner that would attach the tagger to a
stream if a deployment wanted it: the tagger UDF is stateless per row
(padding-invariant, broadcast weights), so it drops into ``foreachBatch``
unchanged. Provided for API completeness; exercised by a smoke test only.
"""

from __future__ import annotations

from zh_ner_tf_spark.operators.tagger import tag_sentences


def tag_stream(stream_df, weights_bc, vocab_bc, id_cols, chars_col="sentence"):
    """Structured Streaming variant: same operator, streaming input.
    Batch-mode semantics are identical because the tagger is stateless
    and per-row deterministic."""
    return tag_sentences(
        stream_df, weights_bc, vocab_bc, id_cols, chars_col, emit="tags"
    )
