"""zh_ner_tf_spark — a from-scratch PySpark-native knowledge-graph
construction engine with the query/data-processing capabilities of the
reference ``LiXianyao/zh-NER-TF`` (a char-level BiLSTM-CRF NER tagger),
generalized into a web-scale extract stage:

    pages -> extract_text -> sentences -> BiLSTM-CRF tagger (mapInPandas)
          -> mentions -> dependency-pattern triples -> MinHash-LSH blocking
          -> connected-components canonicalization -> node/edge tables

Design stance (see SURVEY.md §7): pure PySpark DataFrame API + Arrow
(pandas) UDFs; zero JVM code; zero custom Catalyst rules; deployable via
``spark-submit --py-files``. Training stays offline — the engine consumes
frozen weights (seeded ``.npz``) broadcast to executors.
"""

__version__ = "0.1.0"
