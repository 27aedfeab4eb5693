from zh_ner_tf_spark.fixtures.corpus import (  # noqa: F401
    gen_ner_corpus,
    write_conll,
)
from zh_ner_tf_spark.fixtures.pages import gen_pages, oracle_extract_text  # noqa: F401
