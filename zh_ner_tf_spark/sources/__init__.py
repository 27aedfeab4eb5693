from zh_ner_tf_spark.sources.conll import read_corpus  # noqa: F401
from zh_ner_tf_spark.sources.tables import load_table  # noqa: F401
