from zh_ner_tf_spark.model.weights import (  # noqa: F401
    init_weights,
    load_weights,
    save_weights,
)
