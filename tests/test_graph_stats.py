"""Unit tests for operators/graph_stats.py (co-occurrence edges,
degrees, compact-forward triangle counting), operators/sampling.py
(deterministic stratified sampling), and dedup.near_dup_keep_best
(quality-aware near-dup representative) — hand-computable fixtures
with closed-form expectations; the driver-shaped oracle compare lives
in test_entry_contract.py."""

import pytest
from pyspark.sql import functions as F

from zh_ner_tf_spark.operators.graph_stats import (
    cooccurrence_edges,
    degree_table,
    triangle_counts,
)
from zh_ner_tf_spark.operators.sampling import (
    hash_stratified_sample,
    stratified_keep_expr,
)


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string")


# ---------------------------------------------------------------------------
# cooccurrence_edges
# ---------------------------------------------------------------------------
def test_cooccurrence_edges_counts_groups_not_multiplicity(spark):
    # doc 1: a,b,c (b twice — still one membership); doc 2: a,b; doc 3: c
    rows = [(1, "a"), (1, "b"), (1, "b"), (1, "c"), (2, "a"), (2, "b"),
            (3, "c")]
    df = spark.createDataFrame(rows, "doc_id long, node string")
    got = {
        (r["node_a"], r["node_b"]): r["n_groups"]
        for r in cooccurrence_edges(df, "doc_id", "node").collect()
    }
    assert got == {("a", "b"): 2, ("a", "c"): 1, ("b", "c"): 1}


def test_cooccurrence_edges_singleton_group_emits_nothing(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, node string")
    assert cooccurrence_edges(df, "doc_id", "node").count() == 0


# ---------------------------------------------------------------------------
# degree_table
# ---------------------------------------------------------------------------
def test_degree_table_symmetrizes_and_dedups(spark):
    # (a,b) listed both ways + repeated, (b,c) once, self-loop (d,d)
    pairs = _pairs(
        spark, [("a", "b"), ("b", "a"), ("a", "b"), ("b", "c"), ("d", "d")]
    )
    got = {r["node"]: r["degree"] for r in degree_table(pairs).collect()}
    assert got == {"a": 1, "b": 2, "c": 1}


def test_degree_table_with_node_universe_fills_zero(spark):
    pairs = _pairs(spark, [("a", "b")])
    nodes = spark.createDataFrame(
        [("a",), ("b",), ("z",)], "node string"
    )
    got = {
        r["node"]: r["degree"]
        for r in degree_table(pairs, nodes=nodes).collect()
    }
    assert got == {"a": 1, "b": 1, "z": 0}


# ---------------------------------------------------------------------------
# triangle_counts
# ---------------------------------------------------------------------------
def test_triangle_counts_k4_clique(spark):
    # K4: every vertex is in C(3,2) = 3 triangles; 4 triangles total
    vs = ["a", "b", "c", "d"]
    edges = [(u, v) for i, u in enumerate(vs) for v in vs[i + 1:]]
    got = {
        r["node"]: r["n_triangles"]
        for r in triangle_counts(_pairs(spark, edges)).collect()
    }
    assert got == {v: 3 for v in vs}


def test_triangle_counts_triangle_plus_pendant(spark):
    # triangle a-b-c plus pendant edge c-d: d participates in none but
    # IS in the output (incident to an edge); orientation ties (equal
    # degrees within the triangle) resolve by node id
    edges = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")]
    got = {
        r["node"]: r["n_triangles"]
        for r in triangle_counts(_pairs(spark, edges)).collect()
    }
    assert got == {"a": 1, "b": 1, "c": 1, "d": 0}


def test_triangle_counts_edge_order_and_dups_invariant(spark):
    # reversed/duplicated edge listings must not change the counts
    edges = [("b", "a"), ("a", "b"), ("c", "b"), ("a", "c"), ("c", "a")]
    got = {
        r["node"]: r["n_triangles"]
        for r in triangle_counts(_pairs(spark, edges)).collect()
    }
    assert got == {"a": 1, "b": 1, "c": 1}


def test_triangle_counts_star_has_none(spark):
    # hub star: max degree, zero triangles — the shape the degree
    # orientation exists for (hub generates no wedges: it is always the
    # highest-ranked endpoint)
    edges = [("hub", f"leaf{i}") for i in range(5)]
    got = triangle_counts(_pairs(spark, edges))
    assert got.count() == 6
    assert got.agg(F.sum("n_triangles")).first()[0] == 0


# ---------------------------------------------------------------------------
# hash_stratified_sample
# ---------------------------------------------------------------------------
@pytest.fixture(scope="module")
def strata_docs(spark):
    rows = [(i, ["zh", "en", "xx"][i % 3]) for i in range(300)]
    rows.append((300, None))  # NULL stratum
    return spark.createDataFrame(rows, "doc_id long, lang string")


def test_stratified_sample_deterministic_and_rate_shaped(strata_docs):
    rates = {"zh": 100, "en": 50, "xx": 0}
    out1 = sorted(
        r["doc_id"]
        for r in hash_stratified_sample(
            strata_docs, "doc_id", "lang", rates
        ).collect()
    )
    out2 = sorted(
        r["doc_id"]
        for r in hash_stratified_sample(
            strata_docs, "doc_id", "lang", rates
        ).collect()
    )
    assert out1 == out2  # same rows every run
    by_lang = {
        r["lang"]: r["n"]
        for r in hash_stratified_sample(strata_docs, "doc_id", "lang", rates)
        .groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert by_lang.get("zh") == 100          # rate 100/100 keeps all
    assert "xx" not in by_lang               # rate 0 keeps none
    assert 20 <= by_lang.get("en", 0) <= 80  # ~50% of 100, loose band
    assert None not in by_lang               # NULL -> default_rate 0


def test_stratified_sample_null_stratum_uses_default_rate(strata_docs):
    kept = hash_stratified_sample(
        strata_docs, "doc_id", "lang", {"zh": 0}, default_rate=100
    )
    ids = {r["doc_id"] for r in kept.collect()}
    assert 300 in ids                        # NULL lang kept (default 100)
    assert not any(i % 3 == 0 for i in ids if i < 300)  # zh dropped


def test_stratified_sample_null_id_always_dropped(spark):
    # NULL id -> NULL hash -> NULL predicate -> dropped at EVERY rate
    # (documented: membership of an identity-less row is undefined)
    df = spark.createDataFrame(
        [(None, "zh"), (1, "zh")], "doc_id long, lang string"
    )
    kept = hash_stratified_sample(df, "doc_id", "lang", {"zh": 100})
    assert [r["doc_id"] for r in kept.collect()] == [1]


def test_stratified_keep_expr_validates_rates(strata_docs):
    with pytest.raises(ValueError):
        stratified_keep_expr("doc_id", "lang", {"zh": 101})
    with pytest.raises(ValueError):
        stratified_keep_expr("doc_id", "lang", {}, denom=0)


# ---------------------------------------------------------------------------
# near_dup_keep_best
# ---------------------------------------------------------------------------
def test_near_dup_keep_best_prefers_quality_then_min_id(spark):
    from zh_ner_tf_spark.operators.dedup import near_dup_keep_best

    # docs 1,2,3 near-identical (one cluster; 3 is the longest);
    # docs 10,11 identical text AND equal length (tie -> min id);
    # doc 20 unique (own cluster, keep itself); doc 21 NULL text
    base = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (1, base, len(base)),
        (2, base + " iota", len(base) + 5),
        (3, base + " iota kappa", len(base) + 11),
        (10, "the quick brown fox jumps", 25),
        (11, "the quick brown fox jumps", 25),
        (20, "completely unrelated text here", 30),
        (21, None, None),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, n_chars long"
    )
    out = near_dup_keep_best(docs, "doc_id", "text", "n_chars").collect()
    by_id = {r["doc_id"]: r for r in out}
    assert len(by_id) == 7
    # cluster ids stay min-member
    assert by_id[1]["cluster_id"] == by_id[2]["cluster_id"] == 1
    assert by_id[3]["cluster_id"] == 1
    assert by_id[10]["cluster_id"] == by_id[11]["cluster_id"] == 10
    # representative = longest, NOT min id
    keeps = {r["doc_id"] for r in out if r["keep"] == 1}
    assert 3 in keeps and 1 not in keeps and 2 not in keeps
    # equal quality -> min id wins
    assert 10 in keeps and 11 not in keeps
    # singletons keep themselves; NULL text doc is its own cluster
    assert 20 in keeps and 21 in keeps
    assert by_id[21]["quality"] == -1
    # exactly one keep per cluster
    import collections
    per_cluster = collections.Counter(
        r["cluster_id"] for r in out if r["keep"] == 1
    )
    assert all(v == 1 for v in per_cluster.values())
    assert set(per_cluster) == {r["cluster_id"] for r in out}


# ---------------------------------------------------------------------------
# pagerank_integer
# ---------------------------------------------------------------------------
def _pr_int_replica(edges, iters=3, scale=10**12, num=85, den=100):
    """Row-sequential integer-lattice PageRank — the exact arithmetic
    contract (truncating integer division everywhere)."""
    from collections import defaultdict

    nbrs = defaultdict(set)
    for u, v in edges:
        if u != v:
            nbrs[u].add(v)
            nbrs[v].add(u)
    n = len(nbrs)
    pr = {u: scale // n for u in nbrs}
    base = ((den - num) * scale) // (den * n)
    for _ in range(iters):
        pr = {
            v: base
            + (num * sum(pr[u] // len(nbrs[u]) for u in nbrs[v])) // den
            for v in nbrs
        }
    return pr


def test_pagerank_integer_matches_sequential_replica_exactly(spark):
    from zh_ner_tf_spark.operators.graph_stats import pagerank_integer

    # path + triangle + a duplicate/reversed listing and a self-loop
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "b"), ("b", "d"),
             ("d", "c"), ("e", "e"), ("d", "a")]
    pairs = _pairs(spark, edges)
    got = {
        r["node"]: (r["degree"], r["pr_scaled"])
        for r in pagerank_integer(pairs).collect()
    }
    want = _pr_int_replica(edges)
    assert set(got) == set(want)          # e (self-loop only) excluded
    for node, pr in want.items():
        assert got[node][1] == pr, node   # BIT-exact, no tolerance


def test_pagerank_integer_partition_invariant_and_hub_ranked(spark):
    from zh_ner_tf_spark.operators.graph_stats import pagerank_integer

    # star: hub h with 6 leaves + one leaf-leaf edge
    edges = [("h", f"l{i}") for i in range(6)] + [("l0", "l1")]
    pairs = _pairs(spark, edges)
    one = {
        r["node"]: r["pr_scaled"]
        for r in pagerank_integer(pairs.coalesce(1)).collect()
    }
    many = {
        r["node"]: r["pr_scaled"]
        for r in pagerank_integer(pairs.repartition(7)).collect()
    }
    assert one == many                     # exact at any parallelism
    assert max(one, key=one.get) == "h"    # hub dominates
    # total mass stays within iterations*n truncation loss of scale
    assert abs(sum(one.values()) - 10**12) < 4 * len(one) * 110


def test_pagerank_integer_close_to_float_pagerank(spark):
    from zh_ner_tf_spark.operators.graph_stats import pagerank_integer

    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")]
    pairs = _pairs(spark, edges)
    got = {
        r["node"]: r["pr_scaled"] / 1e12
        for r in pagerank_integer(pairs).collect()
    }
    # float replica of the same 3 unrolled steps
    from collections import defaultdict

    nbrs = defaultdict(set)
    for u, v in edges:
        nbrs[u].add(v)
        nbrs[v].add(u)
    n = len(nbrs)
    pr = {u: 1.0 / n for u in nbrs}
    for _ in range(3):
        pr = {
            v: 0.15 / n
            + 0.85 * sum(pr[u] / len(nbrs[u]) for u in nbrs[v])
            for v in nbrs
        }
    for node in pr:
        assert abs(got[node] - pr[node]) < 1e-9   # lattice quantization only


# ---------------------------------------------------------------------------
# khop_neighborhood
# ---------------------------------------------------------------------------
def test_khop_min_hop_labels(spark):
    from zh_ner_tf_spark.operators.graph_stats import khop_neighborhood

    # a-b-c-d path plus shortcut a-c: c is hop 1, not 2; d enters at 2
    pairs = _pairs(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("a", "c")])
    seeds = spark.createDataFrame([("a",)], "node string")
    got = {
        r["node"]: r["hop"]
        for r in khop_neighborhood(pairs, seeds, k=2).collect()
    }
    assert got == {"a": 0, "b": 1, "c": 1, "d": 2}


def test_khop_seed_stays_hop_zero_and_k1_bounds(spark):
    from zh_ner_tf_spark.operators.graph_stats import khop_neighborhood

    # seed b is also a's neighbor — must stay hop 0; k=1 excludes d
    pairs = _pairs(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    seeds = spark.createDataFrame([("a",), ("b",)], "node string")
    got = {
        r["node"]: r["hop"]
        for r in khop_neighborhood(pairs, seeds, k=1).collect()
    }
    assert got == {"a": 0, "b": 0, "c": 1}


# ---------------------------------------------------------------------------
# triple_confidence
# ---------------------------------------------------------------------------
def test_triple_confidence_support_and_rank(spark):
    from zh_ner_tf_spark.operators.triples import triple_confidence

    rows = (
        [("s1", "p", "o1")] * 3
        + [("s1", "p", "o2")]
        + [("s2", "q", "o3")]
    )
    df = spark.createDataFrame(rows, "subj string, pred string, obj string")
    got = {
        (r["subj"], r["pred"], r["obj"]): (
            r["n"], r["sp_total"], r["conf_ppm"], r["rnk"]
        )
        for r in triple_confidence(df).collect()
    }
    assert got[("s1", "p", "o1")] == (3, 4, 750000, 1)
    assert got[("s1", "p", "o2")] == (1, 4, 250000, 2)
    assert got[("s2", "q", "o3")] == (1, 1, 1000000, 1)


def test_triple_confidence_rank_ties_break_on_obj(spark):
    from zh_ner_tf_spark.operators.triples import triple_confidence

    rows = [("s", "p", "ob"), ("s", "p", "oa")]
    df = spark.createDataFrame(rows, "subj string, pred string, obj string")
    got = {r["obj"]: r["rnk"] for r in triple_confidence(df).collect()}
    assert got == {"oa": 1, "ob": 2}


def test_triple_confidence_ppm_exact_on_rounding_adversarial_quotient(spark):
    """41/640 = 0.0640625 is a near-halfway quotient where Spark's
    HALF_UP decimal round(x, 6) and DuckDB's float round() genuinely
    diverge (0.064063 vs 0.064062) — the case that forced conf off
    round(n/sp_total, 6) onto the ppm integer lattice. Pin that both
    engines agree bit-for-bit on exactly this quotient."""
    import duckdb
    from zh_ner_tf_spark.operators.triples import triple_confidence

    rows = [("s", "p", "hot")] * 41 + [("s", "p", "rest")] * 599
    df = spark.createDataFrame(rows, "subj string, pred string, obj string")
    got = {
        r["obj"]: (r["n"], r["sp_total"], r["conf_ppm"])
        for r in triple_confidence(df).collect()
    }
    assert got["hot"] == (41, 640, 64062)  # trunc(0.0640625 * 1e6)
    want = duckdb.connect().execute(
        "SELECT ((1000000::BIGINT * 41) // 640)::BIGINT"
    ).fetchone()[0]
    assert got["hot"][2] == want
