"""Streaming surface.

The reference is pure batch (its only interactive surface is the demo
REPL, main.py:≈93-120 [R]) and the graft's north_rule is batch-with-
exact-resume, so streaming is NOT a correctness gate. Provided, with
batch-equivalence tests, because the brief's execution-model bullet
asks for it:

  * ``tag_stream`` — the stateless tagger attached to a stream (the
    UDF is padding-invariant with broadcast weights, so it drops in
    unchanged).
  * ``stateful.windowed_event_counts`` — watermarked tumbling-window
    aggregation for late data.
  * ``stateful.running_user_totals_stream`` — custom stateful operator
    via ``applyInPandasWithState`` (state carries across micro-batches;
    tested under multi-batch availableNow).
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
