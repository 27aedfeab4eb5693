"""Physical-plan assertions (SURVEY.md §4.2): predicate pushdown into the
parquet scan, column pruning, broadcast joins for dims, whole-stage
codegen on relational stages, and no shuffle in the narrow fan-out path."""

from __future__ import annotations

import pyspark.sql.functions as F

from zh_ner_tf_spark.operators.sentences import split_sentences, tokenize
from zh_ner_tf_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_filter_pushdown_reaches_scan(spark):
    li = load_table(spark, SF, "lineitem")
    q = li.filter(F.col("l_returnflag") == "R").select("l_orderkey", "l_quantity")
    plan = _plan(q)
    assert "PushedFilters: [IsNotNull(l_returnflag), EqualTo(l_returnflag,R)" in plan


def test_column_pruning_reaches_scan(spark):
    li = load_table(spark, SF, "lineitem")
    q = li.select("l_orderkey", "l_quantity")
    plan = _plan(q)
    # ReadSchema carries only the projected columns
    assert "ReadSchema: struct<l_orderkey:bigint,l_quantity:double>" in plan


def test_dim_join_is_broadcast(spark):
    cust = load_table(spark, SF, "customer")
    nat = load_table(spark, SF, "nation")
    q = cust.join(F.broadcast(nat), cust["c_nationkey"] == nat["n_nationkey"])
    plan = _plan(q)
    assert "BroadcastHashJoin" in plan


def test_small_dim_auto_broadcast(spark):
    # nation is 25 rows — Catalyst must pick broadcast WITHOUT a hint
    cust = load_table(spark, SF, "customer")
    nat = load_table(spark, SF, "nation")
    plan = _plan(cust.join(nat, cust["c_nationkey"] == nat["n_nationkey"]))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_agg_is_whole_stage_codegen_with_partial(spark):
    li = load_table(spark, SF, "lineitem")
    q = li.groupBy("l_returnflag").agg(F.sum("l_quantity"))
    q.collect()  # AQE finalizes the plan on execution
    plan = _plan(q)
    # codegen shows as WholeStageCodegen nodes or "*(n)" stage markers
    assert "WholeStageCodegen" in plan or "*(" in plan, plan
    # partial + final hash aggregate pair (map-side combine)
    assert plan.count("HashAggregate") >= 2


def test_sentence_fanout_has_no_shuffle(spark):
    docs = load_table(spark, SF, "documents")
    q = tokenize(split_sentences(docs, "text", ["doc_id"]), "sentence",
                 ["doc_id", "sent_id"])
    plan = _plan(q)
    assert "Exchange" not in plan, "narrow fan-out must not shuffle"


def test_html_column_pruned_when_unused(spark, tmp_path):
    # write a pages-shaped parquet; a text-only pipeline must not read html
    from zh_ner_tf_spark.fixtures.pages import gen_pages, pages_schema

    rows = gen_pages(50, seed=42)
    p = str(tmp_path / "pages")
    spark.createDataFrame(
        [(r["url"], r["warc_ts"], r["html"], r["text"], r["lang"]) for r in rows],
        schema=pages_schema(),
    ).write.parquet(p)
    pages = spark.read.parquet(p)
    q = pages.filter(F.col("lang") == "zh").select("url", "text")
    plan = _plan(q)
    assert "html" not in plan.split("ReadSchema:")[1].split("\n")[0]
    assert "PushedFilters: [IsNotNull(lang), EqualTo(lang,zh)" in plan


def test_triples_pattern_match_is_codegen_case(spark):
    """The 6 frozen patterns live in the plan as a priority CASE chain:
    no pattern join of any kind, and only the mention/sentence joins
    remain in the relational path."""
    import pandas as pd

    from zh_ner_tf_spark.operators.triples import extract_triples

    mentions = spark.createDataFrame(
        pd.DataFrame({
            "url": ["u", "u"], "sent_id": [0, 0], "mention": ["x", "y"],
            "etype": ["PER", "ORG"], "begin": [0, 3], "end": [0, 3],
        })
    )
    sentences = spark.createDataFrame(
        pd.DataFrame({"url": ["u"], "sent_id": [0], "sentence": ["x任职y"]})
    )
    q = extract_triples(mentions, sentences, ["url", "sent_id"])
    plan = _plan(q)
    assert "NestedLoopJoin" not in plan
    assert "CASE WHEN" in plan
    rows = q.collect()
    assert [(r["subj"], r["pred"], r["obj"]) for r in rows] == [("x", "works_for", "y")]


def test_fused_triples_plan_has_no_shuffle(spark):
    """triples_from_tagged over the tagger's emit='tagged' rows is fully
    narrow — no Exchange anywhere in the plan."""
    import pandas as pd

    from zh_ner_tf_spark.operators.triples import triples_from_tagged

    tagged = spark.createDataFrame(
        pd.DataFrame(
            {
                "url": ["u"], "sent_id": [0], "sentence": ["x任职y"],
                "mentions": [[
                    {"mention": "x", "etype": "PER", "begin": 0, "end": 0},
                    {"mention": "y", "etype": "ORG", "begin": 3, "end": 3},
                ]],
            }
        ),
        schema="url string, sent_id int, sentence string, "
        "mentions array<struct<mention:string,etype:string,begin:int,end:int>>",
    )
    q = triples_from_tagged(tagged, ["url", "sent_id"])
    plan = _plan(q)
    assert "Exchange" not in plan
    rows = q.collect()
    assert [(r["subj"], r["pred"], r["obj"]) for r in rows] == [("x", "works_for", "y")]


def test_day_partitioned_sink_prunes_partitions(spark, tmp_path):
    from zh_ner_tf_spark.fixtures.pages import gen_pages, pages_schema
    from zh_ner_tf_spark.sources.sinks import read_day, write_partitioned_by_day

    rows = gen_pages(800, seed=42)   # warc_ts spreads across days
    df = spark.createDataFrame(
        [(r["url"], r["warc_ts"], r["html"], r["text"], r["lang"]) for r in rows],
        schema=pages_schema(),
    )
    path = str(tmp_path / "pages_by_day")
    write_partitioned_by_day(df, path)
    one_day = read_day(spark, path, "2025-01-01")
    plan = _plan(one_day)
    assert "PartitionFilters" in plan and "warc_date" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0], plan
    n = one_day.count()
    assert 0 < n < 800  # pruned to a strict subset

    # dynamic partition overwrite: rewriting one day leaves others intact
    first_day = df.filter(F.to_date("warc_ts") == "2025-01-01")
    write_partitioned_by_day(first_day, path)
    total = spark.read.parquet(path).count()
    assert total == 800


def test_bucketed_tables_join_without_shuffle(spark, tmp_path):
    """Bucketing = the pre-partitioned co-located join story: two tables
    bucketed on the join key must hash-join with NO Exchange on either
    side (at 100 TB this is the difference between a shuffle of the fact
    table and none)."""
    import uuid

    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, SF, "orders").select("o_orderkey", "o_totalprice")
    from zh_ner_tf_spark.sources.sinks import write_bucketed

    suffix = uuid.uuid4().hex[:8]  # default warehouse dir; tables dropped below
    t1, t2 = f"li_b_{suffix}", f"o_b_{suffix}"
    write_bucketed(li, t1, "l_orderkey", buckets=8)
    write_bucketed(o, t2, "o_orderkey", buckets=8)
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = spark.table(t1).join(
            spark.table(t2),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = _plan(j)
        assert "Exchange" not in plan, plan
        assert j.count() > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql(f"DROP TABLE IF EXISTS {t1}")
        spark.sql(f"DROP TABLE IF EXISTS {t2}")


def test_range_join_is_equi_join_not_nested_loop(spark):
    """The bucketed composition must plan as a hash/sort-merge EQUI join
    on the bucket id; the bare inequality join Catalyst would otherwise
    produce is a BroadcastNestedLoopJoin."""
    import pandas as pd
    from pyspark.sql import functions as F

    from zh_ner_tf_spark.operators.rangejoin import point_in_interval_join

    pts = spark.createDataFrame(pd.DataFrame({"pid": [1, 2, 3], "x": [5, 12, 40]}))
    ivs = spark.createDataFrame(
        pd.DataFrame({"iid": [10, 20], "lo": [4, 11], "hi": [8, 13]})
    )
    naive = pts.join(ivs, (F.col("x") >= F.col("lo")) & (F.col("x") < F.col("hi")))
    assert "BroadcastNestedLoopJoin" in _plan(naive)
    q = point_in_interval_join(pts, ivs, "x", "lo", "hi", width=5)
    plan = _plan(q)
    assert "BroadcastNestedLoopJoin" not in plan
    got = sorted((r["pid"], r["iid"]) for r in q.collect())
    assert got == [(1, 10), (2, 20)]


def test_full_pages_to_triples_prefix_has_no_shuffle(spark):
    """The flagship pipeline prefix — lang filter, html->text, sentence
    split, tagger (emit='tagged'), fused triple extraction — is narrow
    END TO END: zero Exchange before the graph stage."""
    from zh_ner_tf_spark.fixtures.corpus import planted_weights
    from zh_ner_tf_spark.operators.tagger import broadcast_model
    from zh_ner_tf_spark.operators.triples import triples_from_tagged
    from zh_ner_tf_spark.oracle import normalize_token
    from zh_ner_tf_spark.pipeline import pages_to_tagged

    from zh_ner_tf_spark.fixtures.pages import (
        gen_pages, oracle_extract_text, pages_schema,
    )

    rows = gen_pages(20, seed=42)
    word2id = {"<PAD>": 0}
    for r in rows:
        text = r["text"] if r["text"] is not None else oracle_extract_text(r["html"])
        for ch in text:
            word2id.setdefault(normalize_token(ch), len(word2id))
    for t in ("<NUM>", "<ENG>", "<UNK>"):
        word2id.setdefault(t, len(word2id))
    wb, vb = broadcast_model(spark, planted_weights(word2id), word2id)
    pages = spark.createDataFrame(
        [(r["url"], r["warc_ts"], r["html"], r["text"], r["lang"]) for r in rows],
        schema=pages_schema(),
    )
    tagged = pages_to_tagged(pages, wb, vb, lang="zh")
    q = triples_from_tagged(tagged, ["url", "sent_id"])
    assert "Exchange" not in _plan(q)
    assert q.count() > 0


def test_similarity_queries_have_no_nested_loop_join(spark):
    """The SRP-LSH paths (ann_topk, embedding_near_dup) and winnowing
    must plan as hash joins on band/key columns — a NestedLoop or
    Cartesian anywhere means the bucketing rewrite silently degraded to
    all-pairs, the exact failure mode the operators exist to avoid."""
    import __spark_entry__ as e

    for name in ("ann_topk", "embedding_near_dup", "winnow_fingerprint"):
        plan = _plan(e.queries()[name](spark, SF))
        assert "CartesianProduct" not in plan, name
        # the ONLY permitted nested-loop join is the lazy hot-key
        # census's 1-row mean scalar attach (its filter references the
        # _mean_n scalar — see skew.hot_key_census); any other
        # BroadcastNestedLoopJoin means a bucketing rewrite degraded
        # to all-pairs
        for ln in plan.splitlines():
            if "NestedLoop" in ln:
                assert "_mean_n" in ln, f"{name}: {ln.strip()}"


def test_winnow_has_no_shuffle(spark):
    """Winnowing is a pure per-document function computed inside one
    Arrow pass (r9) — the plan must contain no Window and no
    KEYED Exchange: a hashpartitioning shuffle would mean the
    sliding-window min or the fingerprint dedup degraded back to a
    corpus-wide wide operation (the r8 shape paid one window shuffle on
    the doc key). A ROUND-ROBIN Exchange is permitted: that is
    ensure_parallelism repairing an under-partitioned scan (the
    testdata table is a single-row-group parquet file that scans as one
    task), and it disappears on production-partitioned inputs."""
    from zh_ner_tf_spark.operators.dedup import winnow_fingerprints

    docs = load_table(spark, SF, "documents")
    plan = _plan(winnow_fingerprints(docs, "doc_id", "text"))
    assert "Exchange hashpartitioning" not in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan
    assert "Window" not in plan


def test_aqe_splits_skewed_join_at_runtime(spark):
    """AQE skew-join handling (the runtime backstop behind the explicit
    census salting): with skew thresholds lowered to test scale, a join
    against a 99%-one-key table must show a skew-handled AQEShuffleRead
    in the final adaptive plan."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "24KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "12KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        skewed = spark.range(60_000).select(
            F.when(F.col("id") % 100 < 99, F.lit(7)).otherwise(F.col("id"))
            .alias("k"),
            F.concat(F.lit("payload-"), F.col("id").cast("string")).alias("v"),
        )
        dim = spark.range(2_000).select(
            F.col("id").alias("k"), F.col("id").alias("w")
        )
        j = skewed.join(dim, "k")
        # execute THIS DataFrame's QueryExecution (count() would spawn a
        # different one and AQE finalizes plans per execution)
        assert len(j.collect()) > 0
        final = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in final
        assert "SortMergeJoin(skew=true)" in final, final
        assert "AQEShuffleRead skewed" in final, final
    finally:
        for k, v in old.items():
            if v is not None:
                spark.conf.set(k, v)
            else:
                spark.conf.unset(k)


def test_delta_surface_pairs_plan_shape(spark):
    """Incremental blocking's physical plan: the new-side band join is a
    real equi join on (band_id, band_value) — never a cartesian/nested-
    loop product — and the banding itself is a narrow projection (no
    shuffle between the string scans and the join's own exchange), so
    at crawl scale the only wide ops are the join and the pair dedup."""
    from zh_ner_tf_spark.operators.blocking import delta_surface_pairs

    all_s = spark.createDataFrame(
        [(f"surface string {i}",) for i in range(50)], "surface string"
    )
    new = all_s.limit(5)
    pairs = delta_surface_pairs(all_s, new)
    plan = _plan(pairs)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # equi-join on the band keys (hash or sort-merge, either is fine;
    # AQE may also elect a broadcast hash join for the tiny new side)
    assert "band_id" in plan and "band_value" in plan
    assert "Join" in plan


def test_link_mentions_gram_joins_are_broadcast(spark):
    """Entity linking with a broadcastable KB: every GRAM-keyed join
    (the posting join and the banned-gram anti-joins) must be a
    BroadcastHashJoin — the corpus side never shuffles for candidate
    generation. The per-mention count join may legitimately shuffle
    (both sides are corpus-keyed at scale), but nothing may degrade to
    a nested-loop join."""
    from zh_ner_tf_spark.operators.linking import link_mentions

    men = spark.createDataFrame([("newyork",), ("bigdata",)], "surface string")
    ents = spark.createDataFrame(
        [(1, "new york"), (2, "big data")], "entity_id long, name string"
    )
    plan = _plan(link_mentions(men, ents, max_gram_df=10))
    gram_joins = [
        ln for ln in plan.splitlines()
        if "Join [_gram" in ln or ("Join" in ln and "[_gram#" in ln)
    ]
    assert gram_joins, plan  # the posting/anti joins are really there
    assert all("BroadcastHashJoin" in ln for ln in gram_joins), gram_joins
    assert "BroadcastNestedLoopJoin" not in plan
    # the shuffle-KB variant keeps the gram equi-join hash-based too
    plan2 = _plan(link_mentions(men, ents, broadcast_entities=False))
    assert "BroadcastNestedLoopJoin" not in plan2


def test_containment_pairs_plan_shape(spark):
    """Containment's physical plan: the gram-keyed self-join is a real
    equi join (never cartesian/nested-loop), the df-ban anti-joins are
    BROADCAST (the census is gram-space-sized), and the shared/size
    aggregates are partial (map-side combinable)."""
    from zh_ner_tf_spark.operators.dedup import containment_pairs

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma doc {i} words here") for i in range(20)],
        "doc_id long, text string",
    )
    plan = _plan(containment_pairs(docs, n=2, max_gram_df=5))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Join" in plan
    anti = [ln for ln in plan.splitlines() if "LeftAnti" in ln]
    assert anti and all("Broadcast" in ln for ln in anti), anti
    assert "partial_count" in plan  # map-side combine on the aggregates


def test_bm25_plan_broadcasts_census_and_scalars(spark):
    """BM25's physical plan: the df census and the corpus-scalar row
    join as BROADCASTS (never a shuffle of the corpus against |query|
    rows), the term filter is applied below the tf aggregate, and no
    nested-loop join appears except the sanctioned 1-row scalar
    attach."""
    from zh_ner_tf_spark.operators.search import bm25_scores

    docs = spark.createDataFrame(
        [(i, f"spark query engine doc {i}") for i in range(20)],
        "doc_id long, text string",
    )
    plan = _plan(bm25_scores(docs, ["spark", "query"]))
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan
    assert "partial_count" in plan
    # the query-term IN filter really exists as a Filter over the
    # exploded term column (removing the pushdown from bm25_scores —
    # censusing the whole vocabulary — must fail here; the previous
    # `"term#" in plan` form matched ANY plan referencing the column,
    # review finding r8)
    assert " IN (query,spark)" in plan, plan
