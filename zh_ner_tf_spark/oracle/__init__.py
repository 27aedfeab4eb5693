"""Sequential NumPy oracle — the reference stand-in.

``/root/reference`` was an empty mount at survey time (SURVEY.md caveat),
so the correctness contract for the tagger is this module: a sequential,
single-process NumPy implementation of the public zh-NER-TF semantics
(TF-1.x ``LSTMCell`` / ``bidirectional_dynamic_rnn`` / contrib-CRF
``viterbi_decode`` math, ``data.py`` normalization/encoding, ``utils.py``
BIO span extraction). The distributed Spark engine must match it
tag-for-tag.
"""

from zh_ner_tf_spark.oracle.numpy_ref import (  # noqa: F401
    argmax_decode,
    bilstm_logits,
    conlleval_metrics,
    get_entities,
    lstm_forward,
    normalize_eval_quirks,
    normalize_token,
    sentence2id,
    tag_sentence,
    viterbi_decode,
)
