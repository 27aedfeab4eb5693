"""E2E gates (SURVEY.md §5.2 layers 5): byte-identical extracted text per
url (sha256 equality), and full pages->triples pipeline with triple P/R
>= 0.95 vs the sequential oracle extractor (target 1.0 — patterns are
frozen and shared)."""

from __future__ import annotations

import re

import pytest

from zh_ner_tf_spark.config import (
    SENTENCE_SPLIT_REGEX,
    TRIPLE_MAX_GAP,
    TRIPLE_PATTERNS,
)
from zh_ner_tf_spark.fixtures.pages import gen_pages, oracle_extract_text, pages_schema
from zh_ner_tf_spark.operators.extract_text import with_extracted_text
from zh_ner_tf_spark.operators.triples import triple_prf
from zh_ner_tf_spark.oracle import get_entities, tag_sentence
from zh_ner_tf_spark.pipeline import run_pipeline


@pytest.fixture(scope="module")
def pages_rows():
    return gen_pages(300, seed=42)


@pytest.fixture(scope="module")
def pages_df(spark, pages_rows):
    return spark.createDataFrame(
        [(r["url"], r["warc_ts"], r["html"], r["text"], r["lang"]) for r in pages_rows],
        schema=pages_schema(),
    )


def test_extract_text_byte_identical(spark, pages_df, pages_rows):
    got = {
        r["url"]: r["text"]
        for r in with_extracted_text(pages_df).select("url", "text").collect()
    }
    for row in pages_rows:
        want = row["text"] if row["text"] is not None else oracle_extract_text(row["html"])
        assert got[row["url"]] == want, row["url"]


def test_extract_text_edge_cases(spark):
    from pyspark.sql import Row

    cases = [
        b"<html><body><p>a &amp; b &lt;tag&gt;</p></body></html>",
        b"<p>x<!-- hidden <script>s</script> -->y</p>",
        b"<SCRIPT>alert(1)</SCRIPT>visible<style a=b>.x{}</style>",
        b"unterminated <!-- comment",
        b"unterminated <script>var x",
        b"bare < not a tag? <b>bold</b",
        b"  lots   of \t whitespace \n here  ",
        b"",
    ]
    df = spark.createDataFrame(
        [Row(url=str(i), warc_ts=None, html=h, text=None, lang="zh") for i, h in enumerate(cases)],
        schema=pages_schema(),
    )
    got = {r["url"]: r["text"] for r in with_extracted_text(df).collect()}
    for i, h in enumerate(cases):
        assert got[str(i)] == oracle_extract_text(h), (i, h)


def _oracle_triples(pages_rows, word2id, weights):
    """Sequential reference pipeline: oracle extract -> split -> tag ->
    spans -> pattern match."""
    compiled = [(pred, re.compile(rx)) for pred, rx in TRIPLE_PATTERNS]
    out = set()
    for row in pages_rows:
        if row["lang"] != "zh":
            continue
        text = row["text"] if row["text"] is not None else oracle_extract_text(row["html"])
        sents = [s.strip() for s in re.split(SENTENCE_SPLIT_REGEX, text)]
        sents = [s for s in sents if s]
        for sent_id, sent in enumerate(sents):
            chars = list(sent)
            tags = tag_sentence(chars, word2id, weights)
            spans = get_entities(tags, chars)
            subs = [s for s in spans if s[1] == "PER"]
            objs = [s for s in spans if s[1] in ("ORG", "LOC")]
            for sm, _, _, se in subs:
                for om, _, ob, _ in objs:
                    if ob <= se or (ob - se - 1) > TRIPLE_MAX_GAP:
                        continue
                    gap = sent[se + 1: ob]
                    for pred, rx in compiled:
                        if rx.search(gap):
                            out.add((sm, pred, om, row["url"], sent_id))
                            break
    return out


def test_pipeline_triples_pr_gate(spark, pages_df, pages_rows, tiny_model):
    _, base_word2id, _ = tiny_model
    # extend vocab to cover page chars (deterministic first-seen order)
    from zh_ner_tf_spark.fixtures.corpus import planted_weights
    from zh_ner_tf_spark.oracle import normalize_token

    word2id = dict(base_word2id)
    for row in pages_rows:
        text = row["text"] if row["text"] is not None else oracle_extract_text(row["html"])
        for ch in text:
            t = normalize_token(ch)
            if t not in word2id:
                word2id[t] = len(word2id)
    # planted weights = a WORKING tagger over the fixture char classes,
    # so the gate measures real triple recovery, not tie-break noise
    weights = planted_weights(word2id)

    result = run_pipeline(spark, pages_df, weights, word2id, lang="zh")
    got_rows = result["triples"].collect()
    got = spark.createDataFrame(
        [(r["subj"], r["pred"], r["obj"], r["url"], r["sent_id"]) for r in got_rows]
        or [("", "", "", "", 0)],
        "subj string, pred string, obj string, url string, sent_id int",
    )
    want_set = _oracle_triples(pages_rows, word2id, weights)
    golden = spark.createDataFrame(
        list(want_set) or [("", "", "", "", 0)],
        "subj string, pred string, obj string, url string, sent_id int",
    )
    m = triple_prf(got, golden, ["subj", "pred", "obj", "url", "sent_id"])
    assert m["gold"] > 50, m   # fixture actually planted triples
    assert m["precision"] >= 0.95, m
    assert m["recall"] >= 0.95, m

    # graph stage smoke: nodes cover every mention surface; edges weighted
    assert result["nodes"].count() > 0
    assert result["edges"].count() >= 0


def test_edge_canon_resolution_is_deterministic(spark):
    """A surface string appearing under TWO etypes (LOC and ORG) yields two
    node rows with different canon ids; edge src/dst must resolve to the
    role-restricted min canon_id — stable across runs — not an arbitrary
    dropDuplicates pick (ADVICE r1)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from zh_ner_tf_spark.pipeline import mentions_to_graph

    sent = "张三任职阿里很好"
    mentions = spark.createDataFrame(
        pd.DataFrame(
            [
                ("u1", 0, "张三", "PER", 0, 1),
                ("u1", 0, "阿里", "ORG", 4, 5),
                ("u2", 0, "阿里", "LOC", 4, 5),   # same surface, other etype
                ("u2", 0, "张三", "PER", 0, 1),
            ],
            columns=["url", "sent_id", "mention", "etype", "begin", "end"],
        )
    )
    sentences = spark.createDataFrame(
        pd.DataFrame(
            [("u1", 0, sent), ("u2", 0, sent)],
            columns=["url", "sent_id", "sentence"],
        )
    )
    runs = []
    for _ in range(2):
        triples, nodes, edges = mentions_to_graph(mentions, sentences)
        node_rows = nodes.collect()
        canon_by_role = [
            r["canon_id"] for r in node_rows
            if r["surface"] == "阿里" and r["etype"] in ("ORG", "LOC")
        ]
        assert len(canon_by_role) == 2          # two node rows survive
        e = sorted(
            (r["src"], r["dst"], r["pred"], r["weight"]) for r in edges.collect()
        )
        assert e, "expected a works_for edge"
        assert all(dst == min(canon_by_role) for _, dst, _, _ in e)
        runs.append(e)
    assert runs[0] == runs[1]


def test_fused_triples_match_relational_path(spark, pages_df, pages_rows, tiny_model):
    """The zero-shuffle emit='tagged' + triples_from_tagged path emits
    exactly the relational extract_triples output (pair-level
    multiplicity) on the fixture corpus."""
    from pyspark.sql import functions as F

    from zh_ner_tf_spark.fixtures.corpus import planted_weights
    from zh_ner_tf_spark.operators.tagger import broadcast_model
    from zh_ner_tf_spark.operators.triples import extract_triples, triples_from_tagged
    from zh_ner_tf_spark.oracle import normalize_token
    from zh_ner_tf_spark.pipeline import pages_to_mentions, pages_to_tagged

    _, base_word2id, _ = tiny_model
    word2id = dict(base_word2id)
    for row in pages_rows:
        text = row["text"] if row["text"] is not None else oracle_extract_text(row["html"])
        for ch in text:
            t = normalize_token(ch)
            if t not in word2id:
                word2id[t] = len(word2id)
    weights = planted_weights(word2id)
    wb, vb = broadcast_model(spark, weights, word2id)

    tagged = pages_to_tagged(pages_df, wb, vb, lang="zh").localCheckpoint()
    fused = triples_from_tagged(tagged, ["url", "sent_id"])

    sentences, mentions = pages_to_mentions(pages_df, wb, vb, lang="zh")
    relational = extract_triples(mentions, sentences, ["url", "sent_id"])

    key = ["subj", "pred", "obj", "url", "sent_id"]
    got = sorted(tuple(r[k] for k in key) for r in fused.collect())
    want = sorted(tuple(r[k] for k in key) for r in relational.collect())
    assert got == want and len(got) > 0

    # flattened mentions from the tagged rows equal the emit='mentions' path
    m_fused = sorted(
        tuple(r[k] for k in ["url", "sent_id", "mention", "etype", "begin", "end"])
        for r in tagged.select("url", "sent_id", F.inline("mentions")).collect()
    )
    m_rel = sorted(
        tuple(r[k] for k in ["url", "sent_id", "mention", "etype", "begin", "end"])
        for r in mentions.collect()
    )
    assert m_fused == m_rel


def test_pipeline_on_zero_matching_pages_returns_empty_frames(spark, tmp_path):
    """A crawl slice with no pages in the target language must flow
    through the whole DAG to empty (not crash) outputs — the common
    production partition-of-nothing case."""
    from zh_ner_tf_spark.fixtures.corpus import planted_weights
    from zh_ner_tf_spark.fixtures.pages import gen_pages, pages_schema
    from zh_ner_tf_spark.pipeline import run_pipeline

    rows = [r for r in gen_pages(20, seed=42)]
    pages = spark.createDataFrame(
        [(r["url"], r["warc_ts"], r["html"], r["text"], "xx") for r in rows],
        schema=pages_schema(),
    )
    word2id = {"<PAD>": 0, "<NUM>": 1, "<ENG>": 2, "<UNK>": 3}
    out = run_pipeline(spark, pages, planted_weights(word2id), word2id,
                       lang="zh")
    for name in ("sentences", "mentions", "triples", "nodes", "edges"):
        assert out[name].count() == 0, name


def test_tagger_and_winnow_on_empty_input(spark):
    """Empty DataFrames through the tagger and winnowing produce empty
    outputs with the right schema (no UDF crash on zero Arrow batches)."""
    import numpy as np

    from zh_ner_tf_spark.operators.dedup import winnow_fingerprints
    from zh_ner_tf_spark.operators.tagger import broadcast_model, tag_sentences

    empty_docs = spark.createDataFrame([], "doc_id bigint, text string")
    wf = winnow_fingerprints(empty_docs, "doc_id", "text")
    assert wf.count() == 0
    assert [f.name for f in wf.schema] == ["doc_id", "fp_pos", "fp_hash"]

    word2id = {"<PAD>": 0, "a": 1, "<NUM>": 2, "<ENG>": 3, "<UNK>": 4}
    rng = np.random.RandomState(0)
    u = lambda *s: rng.uniform(-0.1, 0.1, s).astype(np.float32)  # noqa: E731
    W = {
        "embeddings": u(5, 4),
        "lstm_fw_kernel": u(8, 16), "lstm_fw_bias": u(16),
        "lstm_bw_kernel": u(8, 16), "lstm_bw_bias": u(16),
        "proj_W": u(8, 7), "proj_b": u(7), "transitions": u(7, 7),
    }
    wb, vb = broadcast_model(spark, W, word2id)
    empty_sents = spark.createDataFrame([], "doc_id bigint, sentence string")
    tagged = tag_sentences(empty_sents, wb, vb, ["doc_id"],
                           chars_col="sentence", emit="mentions")
    assert tagged.count() == 0


def test_incremental_pipeline_matches_full_rebuild(spark, tmp_path):
    """The crawl-consumption loop: pages arrive as snapshot appends, each
    run_incremental call tags ONLY the diff (O(new pages) on the
    expensive stage), appends mention/triple deltas through the lineage
    sink, re-canonicalizes the graph tail from the accumulated compact
    tables, and advances a crash-safe cursor. Gates: (1) per-call
    processed counts are exactly the increment sizes; (2) an up-to-date
    call is a no-op; (3) after two increments the published nodes/edges
    EQUAL a full rebuild over all pages (deterministic ids/canon
    resolution make this exact, not approximate)."""
    from zh_ner_tf_spark.fixtures.corpus import planted_weights
    from zh_ner_tf_spark.oracle import normalize_token
    from zh_ner_tf_spark.pipeline import run_incremental, run_pipeline
    from zh_ner_tf_spark.sources.sinks import read_snapshot, snapshot_append

    rows = gen_pages(120, seed=42)
    word2id = {"<PAD>": 0}
    for row in rows:
        text = row["text"] if row["text"] is not None else oracle_extract_text(row["html"])
        for ch in text:
            word2id.setdefault(normalize_token(ch), len(word2id))
    for t in ("<NUM>", "<ENG>", "<UNK>"):
        word2id.setdefault(t, len(word2id))
    weights = planted_weights(word2id)

    def df_of(rs):
        return spark.createDataFrame(
            [(r["url"], r["warc_ts"], r["html"], r["text"], r["lang"])
             for r in rs],
            schema=pages_schema(),
        )

    ptable = str(tmp_path / "pages")
    groot = str(tmp_path / "graph")
    snapshot_append(df_of(rows[:70]), ptable)
    r1 = run_incremental(spark, ptable, groot, weights, word2id)
    assert r1["processed_pages"] == 70 and not r1["up_to_date"]
    # no new pages snapshot: the consumer is a no-op
    r1b = run_incremental(spark, ptable, groot, weights, word2id)
    assert r1b["up_to_date"] and r1b["processed_pages"] == 0

    snapshot_append(df_of(rows[70:]), ptable)
    r2 = run_incremental(spark, ptable, groot, weights, word2id,
                         keep_graph_snapshots=1)
    assert r2["processed_pages"] == 50 and not r2["up_to_date"]
    assert r2["graph_sids"]["nodes"] >= 1
    # in-loop maintenance: only the newest graph snapshot is retained
    # (the first increment's replaced snapshot + its stage dir are gone)
    from zh_ner_tf_spark.sources.sinks import committed_snapshots

    import os

    assert committed_snapshots(os.path.join(groot, "nodes")) == [
        r2["graph_sids"]["nodes"]
    ]

    full = run_pipeline(spark, df_of(rows), weights, word2id, lang="zh")

    def frozen(df, cols):
        return sorted(
            tuple(r[c] for c in cols) for r in df.select(*cols).collect()
        )

    ncols = ["canon_id", "surface", "etype", "freq"]
    ecols = ["src", "dst", "pred", "weight"]
    import os

    assert frozen(read_snapshot(spark, os.path.join(groot, "nodes")), ncols) \
        == frozen(full["nodes"], ncols)
    assert frozen(read_snapshot(spark, os.path.join(groot, "edges")), ecols) \
        == frozen(full["edges"], ecols)


def test_incremental_crash_replay_pins_interrupted_range(spark, tmp_path):
    """The double-consume hazard: an increment publishes its deltas,
    crashes before the cursor commit, and NEW pages snapshots arrive
    before the replay. The intent file pins the replay to the
    interrupted range (head stays at the crashed increment's target, the
    newer snapshot waits for the next call), the published deltas resume
    idempotently (no doubled freqs/weights), and delta compaction after
    the cursor keeps the tables bounded without changing the result."""
    import json
    import os

    from zh_ner_tf_spark.fixtures.corpus import planted_weights
    from zh_ner_tf_spark.oracle import normalize_token
    from zh_ner_tf_spark.pipeline import run_incremental, run_pipeline
    from zh_ner_tf_spark.sources.sinks import (
        committed_snapshots,
        read_snapshot,
        snapshot_append,
    )

    rows = gen_pages(120, seed=42)
    word2id = {"<PAD>": 0}
    for row in rows:
        text = row["text"] if row["text"] is not None else oracle_extract_text(row["html"])
        for ch in text:
            word2id.setdefault(normalize_token(ch), len(word2id))
    for t in ("<NUM>", "<ENG>", "<UNK>"):
        word2id.setdefault(t, len(word2id))
    weights = planted_weights(word2id)

    def df_of(rs):
        return spark.createDataFrame(
            [(r["url"], r["warc_ts"], r["html"], r["text"], r["lang"])
             for r in rs],
            schema=pages_schema(),
        )

    ptable = str(tmp_path / "pages")
    groot = str(tmp_path / "graph")
    snapshot_append(df_of(rows[:40]), ptable)            # snap 1
    run_incremental(spark, ptable, groot, weights, word2id)
    snapshot_append(df_of(rows[40:80]), ptable)          # snap 2
    run_incremental(spark, ptable, groot, weights, word2id)

    # simulate: increment 1->2 published its deltas and graph but died
    # BEFORE the cursor commit; meanwhile snap 3 arrived
    with open(os.path.join(groot, "_consumer_state.json"), "w") as f:
        json.dump({"pages_snapshot": 1}, f)
    with open(os.path.join(groot, "_inflight.json"), "w") as f:
        json.dump({"from": 1, "to": 2}, f)
    snapshot_append(df_of(rows[80:]), ptable)            # snap 3

    mrows_before = read_snapshot(spark, os.path.join(groot, "mentions")).count()
    replay = run_incremental(spark, ptable, groot, weights, word2id)
    # pinned to the interrupted range, NOT the new head
    assert replay["pages_snapshot"] == 2 and replay["processed_pages"] == 40
    # published deltas resumed idempotently: row count unchanged
    assert read_snapshot(spark, os.path.join(groot, "mentions")).count() \
        == mrows_before

    # next call consumes snap 3; compaction bounds the delta tables
    r3 = run_incremental(spark, ptable, groot, weights, word2id,
                         compact_deltas_every=2)
    assert r3["pages_snapshot"] == 3 and r3["processed_pages"] == 40
    assert not os.path.exists(os.path.join(groot, "_inflight.json"))
    for t in ("mentions", "triples"):
        p = os.path.join(groot, t)
        assert committed_snapshots(p) == [committed_snapshots(p)[-1]]  # 1 left
        snap_file = os.path.join(p, "snapshots",
                                 f"{committed_snapshots(p)[-1]}.json")
        with open(snap_file) as f:
            assert len(json.load(f)["data_dirs"]) == 1  # compacted

    full = run_pipeline(spark, df_of(rows), weights, word2id, lang="zh")

    def frozen(df, cols):
        return sorted(
            tuple(r[c] for c in cols) for r in df.select(*cols).collect()
        )

    assert frozen(read_snapshot(spark, os.path.join(groot, "nodes")),
                  ["canon_id", "surface", "etype", "freq"]) \
        == frozen(full["nodes"], ["canon_id", "surface", "etype", "freq"])
    assert frozen(read_snapshot(spark, os.path.join(groot, "edges")),
                  ["src", "dst", "pred", "weight"]) \
        == frozen(full["edges"], ["src", "dst", "pred", "weight"])


def test_delta_graph_tail_matches_full_on_merging_clusters(spark, tmp_path):
    """Adversarial delta-canonicalization gates the planted-page corpus
    cannot exercise (its 9 distinct surfaces share zero similar pairs):

      * increment 2 introduces a CHAIN of bridge surfaces whose
        similarity links reach members of two DIFFERENT increment-1
        clusters — the delta CC (prior component edges ∪ new pairs)
        must merge the old components;
      * a new (mention, etype) row lands on an EXISTING surface and
        (via a forced id function) takes over as the surface's min-id
        rep — cluster labels must follow the new rep even though no new
        pair was discovered for that surface;
      * repeated old mentions and a repeated old triple — freq and edge
        weights must merge by summation.

    Gates: nodes/edges equal graph_from_mentions over the accumulated
    input after EACH increment, and the increment-2 stats prove the
    O(new + touched) shape: CC input = prior components + new pairs
    only, and verified pairs computed = full pair set minus the two
    frozen old-old pairs."""
    import os

    from pyspark.sql import functions as F

    from zh_ner_tf_spark.operators.blocking import block_entities
    from zh_ner_tf_spark.pipeline import _delta_graph_tail, graph_from_mentions

    A1 = "acme corporation international group x1"
    A2 = "acme corporation international group x2"
    B1 = "zeta industries holdings limited y1"
    B2 = "zeta industries holdings limited y2"
    words = "acme corporation international group zeta industries holdings limited".split()
    bridges = [" ".join(words[i:i + 6]) for i in range(3)]

    # forced id order: LOC ids sort below everything else, so the
    # (A1, LOC) row added in increment 2 becomes A1's rep
    def id_expr(m, e):
        return F.abs(F.xxhash64(m, e)).cast("bigint") % F.lit(10**12) + F.when(
            e == F.lit("LOC"), F.lit(0)
        ).otherwise(F.lit(10**13))

    def mdf(rows):
        return spark.createDataFrame(rows, "mention string, etype string")

    def tdf(rows):
        return spark.createDataFrame(rows, "subj string, obj string, pred string")

    m1 = [(A1, "ORG")] * 3 + [(A2, "ORG")] * 2 + [(B1, "ORG")] * 2 + [
        (B2, "ORG"),
        ("john smith", "PER"),
        ("john smith", "PER"),
        ("mary jones", "PER"),
        ("paris", "LOC"),
    ]
    t1 = [
        ("john smith", A1, "employment"),
        ("john smith", A1, "employment"),
        ("john smith", B1, "employment"),
        ("mary jones", "paris", "located_in"),
    ]
    m2 = (
        [(b, "ORG") for b in bridges]
        + [(A1, "ORG")] * 2          # freq merge on an old surface
        + [(A1, "LOC")]              # rep takeover for surface A1
        + [("new person", "PER")]    # new singleton
    )
    t2 = [
        ("john smith", A1, "employment"),   # weight merge with t1
        ("new person", bridges[0], "employment"),
    ]

    groot = str(tmp_path / "graph")
    subj, obj = ("PER",), ("ORG", "LOC")

    def frozen(df, cols):
        return sorted(
            tuple(r[c] for c in cols) for r in df.select(*cols).collect()
        )

    ncols = ["canon_id", "surface", "etype", "freq"]
    ecols = ["src", "dst", "pred", "weight"]

    none_sids = {t: None for t in ("surfaces", "string_components", "triple_aggs")}
    nodes1, edges1, s1 = _delta_graph_tail(
        spark, groot, mdf(m1), tdf(t1), "inc-0-1", 8, subj, obj,
        none_sids, id_expr=id_expr, collect_stats=True,
    )
    fn1, fe1 = graph_from_mentions(mdf(m1), tdf(t1), subj_types=subj,
                                   obj_types=obj, id_expr=id_expr)
    assert frozen(nodes1, ncols) == frozen(fn1, ncols)
    assert frozen(edges1, ecols) == frozen(fe1, ecols)
    # increment 1: A and B are SEPARATE clusters (plus singletons)
    canon1 = {r["surface"]: r["canon_id"] for r in nodes1.collect()
              if r["etype"] == "ORG"}
    assert canon1[A1] == canon1[A2] and canon1[B1] == canon1[B2]
    assert canon1[A1] != canon1[B1]
    assert s1["new_pairs"] == 2 and s1["prior_comp_edges"] == 0

    from zh_ner_tf_spark.sources.sinks import committed_snapshots

    sids = {
        t: committed_snapshots(os.path.join(groot, "state", t))[-1]
        for t in none_sids
    }
    nodes2, edges2, s2 = _delta_graph_tail(
        spark, groot, mdf(m2), tdf(t2), "inc-1-2", 8, subj, obj,
        sids, id_expr=id_expr, collect_stats=True,
    )
    fn2, fe2 = graph_from_mentions(mdf(m1 + m2), tdf(t1 + t2),
                                   subj_types=subj, obj_types=obj,
                                   id_expr=id_expr)
    assert frozen(nodes2, ncols) == frozen(fn2, ncols)
    assert frozen(edges2, ecols) == frozen(fe2, ecols)

    # the bridge chain merged A and B into one cluster, labeled by the
    # LOC takeover row (forced smallest id on surface A1); A1's ORG row
    # is no longer its surface's rep, so — per the pinned full-rebuild
    # semantics — it stays un-canonicalized under its own id
    rows2 = nodes2.collect()
    canon2 = {(r["surface"], r["etype"]): r["canon_id"] for r in rows2}
    merged = {canon2[(s, "ORG")] for s in (A2, B1, B2, *bridges)}
    merged.add(canon2[(A1, "LOC")])
    assert merged == {canon2[(A1, "LOC")]}
    assert canon2[(A1, "ORG")] not in merged

    # O(new + touched) cost shape: CC ran over prior components + new
    # pairs only, and the verified-pair work equals the full pair set
    # minus the two frozen old-old pairs ((A1,A2) and (B1,B2))
    assert s2["cc_edge_rows"] == s2["new_pairs"] + s2["prior_comp_edges"]
    assert s2["prior_comp_edges"] == 4  # A1 A2 B1 B2 were clustered
    assert s2["new_surfaces"] == 4     # 3 bridges + "new person"
    all_surfaces = mdf(m1 + m2).select("mention", "etype").distinct()
    full_pairs = block_entities(
        all_surfaces.select(
            id_expr(F.col("mention"), F.col("etype")).alias("entity_id"),
            F.col("mention").alias("surface"),
        )
    ).count()
    assert s2["new_pairs"] == full_pairs - 2


def test_delta_tail_bootstraps_after_full_tail(spark, tmp_path):
    """Migration path: increments consumed with tail="full" leave no
    delta state tables. The first tail="delta" call detects the stale
    state (state_snapshot cursor field ≠ last), BOOTSTRAPS the state
    tables from the accumulated mentions/triples in one O(total) pass,
    and produces the same graph as a full rebuild; the NEXT delta call
    runs the O(new + touched) path (no bootstrap flag); and a CHANGED
    blocking family (recorded per-increment in the cursor's
    state_params) forces another rebuild instead of silently merging
    into clusters computed under the old family."""
    import os

    from zh_ner_tf_spark.fixtures.corpus import planted_weights
    from zh_ner_tf_spark.oracle import normalize_token
    from zh_ner_tf_spark.pipeline import run_incremental, run_pipeline
    from zh_ner_tf_spark.sources.sinks import read_snapshot, snapshot_append

    rows = gen_pages(120, seed=7)
    word2id = {"<PAD>": 0}
    for row in rows:
        text = row["text"] if row["text"] is not None else oracle_extract_text(row["html"])
        for ch in text:
            word2id.setdefault(normalize_token(ch), len(word2id))
    for t in ("<NUM>", "<ENG>", "<UNK>"):
        word2id.setdefault(t, len(word2id))
    weights = planted_weights(word2id)

    def df_of(rs):
        return spark.createDataFrame(
            [(r["url"], r["warc_ts"], r["html"], r["text"], r["lang"])
             for r in rs],
            schema=pages_schema(),
        )

    ptable = str(tmp_path / "pages")
    groot = str(tmp_path / "graph")
    snapshot_append(df_of(rows[:30]), ptable)
    r1 = run_incremental(spark, ptable, groot, weights, word2id, tail="full")
    assert r1["tail_stats"]["tail_mode"] == "full"
    assert not os.path.exists(os.path.join(groot, "state", "surfaces"))

    snapshot_append(df_of(rows[30:60]), ptable)
    r2 = run_incremental(spark, ptable, groot, weights, word2id,
                         collect_tail_stats=True)
    assert r2["tail_stats"]["tail_mode"] == "delta"
    assert r2["tail_stats"].get("bootstrap") is True
    # bootstrap consumed the ACCUMULATED tables: every surface was new
    assert r2["tail_stats"]["new_surfaces"] \
        == r2["tail_stats"]["distinct_surfaces"]

    snapshot_append(df_of(rows[60:90]), ptable)
    r3 = run_incremental(spark, ptable, groot, weights, word2id,
                         collect_tail_stats=True)
    assert "bootstrap" not in r3["tail_stats"]
    # steady state: the tail saw only genuinely-new strings
    assert r3["tail_stats"]["new_surfaces"] \
        < r3["tail_stats"]["distinct_surfaces"]

    # a blocking-family change invalidates the frozen old-old pair set:
    # simulate by tampering the recorded params — the next delta call
    # must REBUILD the state (bootstrap), not merge into stale clusters
    import json

    cpath = os.path.join(groot, "_consumer_state.json")
    with open(cpath) as f:
        cur = json.load(f)
    assert cur["state_params"]["threshold"] > 0  # params are recorded
    cur["state_params"]["threshold"] = 0.999
    with open(cpath, "w") as f:
        json.dump(cur, f)
    snapshot_append(df_of(rows[90:]), ptable)
    r4 = run_incremental(spark, ptable, groot, weights, word2id,
                         collect_tail_stats=True)
    assert r4["tail_stats"].get("bootstrap") is True

    full = run_pipeline(spark, df_of(rows), weights, word2id, lang="zh")

    def frozen(df, cols):
        return sorted(
            tuple(r[c] for c in cols) for r in df.select(*cols).collect()
        )

    ncols = ["canon_id", "surface", "etype", "freq"]
    ecols = ["src", "dst", "pred", "weight"]
    assert frozen(read_snapshot(spark, os.path.join(groot, "nodes")), ncols) \
        == frozen(full["nodes"], ncols)
    assert frozen(read_snapshot(spark, os.path.join(groot, "edges")), ecols) \
        == frozen(full["edges"], ecols)


def test_delta_graph_tail_replay_is_idempotent(spark, tmp_path):
    """Crash-replay property of the delta tail in isolation: re-running
    the SAME stage against the SAME pinned prior state sids (what a
    replay does after the intent pinned them) returns identical
    nodes/edges and does not grow the state tables — lineage resume
    skips the committed buckets and the CAS publish recognizes the
    unchanged stage dirs."""
    import os

    from zh_ner_tf_spark.pipeline import _delta_graph_tail
    from zh_ner_tf_spark.sources.sinks import committed_snapshots

    m = spark.createDataFrame(
        [("acme corporation x1", "ORG"), ("acme corporation x2", "ORG"),
         ("john smith", "PER"), ("john smith", "PER")],
        "mention string, etype string",
    )
    t = spark.createDataFrame(
        [("john smith", "acme corporation x1", "employment")],
        "subj string, obj string, pred string",
    )
    groot = str(tmp_path / "graph")
    sids0 = {k: None for k in ("surfaces", "string_components", "triple_aggs")}

    def frozen(df):
        return sorted(tuple(r) for r in df.collect())

    n1, e1, _ = _delta_graph_tail(
        spark, groot, m, t, "inc-0-1", 4, ("PER",), ("ORG", "LOC"), sids0
    )
    fn1, fe1 = frozen(n1), frozen(e1)
    snaps_after = {
        k: committed_snapshots(os.path.join(groot, "state", k))
        for k in sids0
    }
    # replay: same stage, same pinned priors (None — the intent recorded
    # them BEFORE the first attempt published anything)
    n2, e2, _ = _delta_graph_tail(
        spark, groot, m, t, "inc-0-1", 4, ("PER",), ("ORG", "LOC"), sids0
    )
    assert frozen(n2) == fn1 and frozen(e2) == fe1
    for k in sids0:
        assert committed_snapshots(os.path.join(groot, "state", k)) \
            == snaps_after[k], k


def test_replay_with_changed_blocking_family_bootstraps(spark, tmp_path):
    """The crash-replay hole the second self-review pass found: an
    interrupted increment pins its prior state sids in the intent; if
    the blocking family changes between the crash and the replay, the
    pinned priors' frozen pair set no longer matches the family the
    replay bands with. The replay must detect the intent's recorded
    state_params mismatch and REBUILD from the accumulated tables
    instead of merging families — and still equal the full rebuild."""
    import json
    import os

    from zh_ner_tf_spark.fixtures.corpus import planted_weights
    from zh_ner_tf_spark.oracle import normalize_token
    from zh_ner_tf_spark.pipeline import run_incremental, run_pipeline
    from zh_ner_tf_spark.sources.sinks import (
        committed_snapshots,
        read_snapshot,
        snapshot_append,
    )

    rows = gen_pages(60, seed=9)
    word2id = {"<PAD>": 0}
    for row in rows:
        text = row["text"] if row["text"] is not None else oracle_extract_text(row["html"])
        for ch in text:
            word2id.setdefault(normalize_token(ch), len(word2id))
    for t in ("<NUM>", "<ENG>", "<UNK>"):
        word2id.setdefault(t, len(word2id))
    weights = planted_weights(word2id)

    def df_of(rs):
        return spark.createDataFrame(
            [(r["url"], r["warc_ts"], r["html"], r["text"], r["lang"])
             for r in rs],
            schema=pages_schema(),
        )

    ptable = str(tmp_path / "pages")
    groot = str(tmp_path / "graph")
    snapshot_append(df_of(rows[:30]), ptable)                   # snap 1
    run_incremental(spark, ptable, groot, weights, word2id)
    snapshot_append(df_of(rows[30:]), ptable)                   # snap 2

    # simulate: increment 1->2 wrote its intent (pinning the live state
    # sids under the OLD family) then crashed; the family "changed"
    # before the replay (recorded params differ from current config)
    heads = {
        t: committed_snapshots(os.path.join(groot, "state", t))[-1]
        for t in ("surfaces", "string_components", "triple_aggs")
    }
    with open(os.path.join(groot, "_inflight.json"), "w") as f:
        json.dump({"from": 1, "to": 2, "state_sids": heads,
                   "bootstrap": False,
                   "state_params": {"shingle_k": 99}}, f)
    replay = run_incremental(spark, ptable, groot, weights, word2id,
                             collect_tail_stats=True)
    assert replay["pages_snapshot"] == 2
    assert replay["tail_stats"].get("bootstrap") is True

    full = run_pipeline(spark, df_of(rows), weights, word2id, lang="zh")

    def frozen(df, cols):
        return sorted(
            tuple(r[c] for c in cols) for r in df.select(*cols).collect()
        )

    ncols = ["canon_id", "surface", "etype", "freq"]
    assert frozen(read_snapshot(spark, os.path.join(groot, "nodes")), ncols) \
        == frozen(full["nodes"], ncols)


def test_gen_pages_variant_slice_contract():
    """The bench incremental probe's second increment relies on three
    fixture properties (VERDICT r6 item 4): (1) variant_frac=0 (the
    default) emits NO novel surfaces — the historical fixture stream is
    untouched; (2) a variant slice emits the three planted novel
    surfaces (pool surface + its first char — every char keeps its
    entity class, so the planted tagger still spans it); (3) ``start``
    offsets urls so a second slice appends without colliding."""
    from zh_ner_tf_spark.fixtures.corpus import ENTITY_POOL
    from zh_ner_tf_spark.fixtures.pages import gen_pages, oracle_extract_text

    novel = ["".join(p[0]) + p[0][0] for p in ENTITY_POOL.values()]

    def all_text(rows):
        return " ".join(
            r["text"] if r["text"] is not None
            else oracle_extract_text(r["html"])
            for r in rows
        )

    base = gen_pages(300, seed=42)
    assert not any(s in all_text(base) for s in novel)

    var = gen_pages(300, seed=43, variant_frac=0.25, start=4500)
    vt = all_text(var)
    assert all(s in vt for s in novel)
    base_urls = {r["url"] for r in base}
    assert not base_urls & {r["url"] for r in var}
    # deterministic: same args -> same rows
    again = gen_pages(300, seed=43, variant_frac=0.25, start=4500)
    assert [r["html"] for r in again] == [r["html"] for r in var]


def test_incremental_link_matches_full_relink(spark, tmp_path):
    """Incremental alias maintenance (VERDICT r7 item 3): with
    ``maintain_links``, every increment publishes a links state table —
    each distinct corpus surface resolved against the just-published
    canonical space. Gates: (1) the first increment bootstraps (full
    relink), the second runs the DELTA refresh; (2) after EACH
    increment the state table equals the read-only
    link_surfaces_to_graph full relink over all surfaces — the
    incremental == full identity, end to end through the real publish
    path; (3) the delta refresh's posting join saw fewer surfaces than
    the corpus has (the O(touched) cost evidence); (4) the existing
    delta-tail equality gates are untouched (run in the same call)."""
    import os

    from zh_ner_tf_spark.fixtures.corpus import planted_weights
    from zh_ner_tf_spark.oracle import normalize_token
    from zh_ner_tf_spark.pipeline import (
        link_surfaces_to_graph,
        run_incremental,
        run_pipeline,
    )
    from zh_ner_tf_spark.sources.sinks import read_snapshot, snapshot_append
    from pyspark.sql import functions as F

    # the second slice carries variant surfaces (novel strings the first
    # 70 pages never produced) so the delta refresh has real new
    # surfaces AND real KB churn to chew on — a no-change increment
    # would make the O(touched) assertion below vacuous
    rows = gen_pages(70, seed=11) + gen_pages(
        50, seed=23, variant_frac=0.3, start=70
    )
    word2id = {"<PAD>": 0}
    for row in rows:
        text = row["text"] if row["text"] is not None else oracle_extract_text(row["html"])
        for ch in text:
            word2id.setdefault(normalize_token(ch), len(word2id))
    for t in ("<NUM>", "<ENG>", "<UNK>"):
        word2id.setdefault(t, len(word2id))
    weights = planted_weights(word2id)

    def df_of(rs):
        return spark.createDataFrame(
            [(r["url"], r["warc_ts"], r["html"], r["text"], r["lang"])
             for r in rs],
            schema=pages_schema(),
        )

    ptable = str(tmp_path / "pages")
    groot = str(tmp_path / "graph")
    ml = {"min_score_ppm": 300_000, "max_gram_df": 50}
    lcols = ["surface", "canon_id", "canon_name", "score_ppm", "shared"]

    def frozen(df):
        return sorted(tuple(r[c] for c in lcols) for r in df.select(*lcols).collect())

    def full_relink():
        surfs = (
            read_snapshot(spark, os.path.join(groot, "state", "surfaces"))
            .select(F.col("mention").alias("surface"))
            .distinct()
        )
        return link_surfaces_to_graph(
            spark, groot, surfs,
            min_score_ppm=ml["min_score_ppm"],
            max_gram_df=ml["max_gram_df"],
        )

    snapshot_append(df_of(rows[:70]), ptable)
    r1 = run_incremental(spark, ptable, groot, weights, word2id,
                         maintain_links=ml, collect_tail_stats=True)
    assert r1["link_stats"]["link_mode"] == "bootstrap"
    links1 = read_snapshot(spark, os.path.join(groot, "state", "links"))
    assert frozen(links1) == frozen(full_relink())
    n1 = len(frozen(links1))
    assert n1 > 0  # non-vacuous: the fixture corpus actually links

    snapshot_append(df_of(rows[70:]), ptable)
    r2 = run_incremental(spark, ptable, groot, weights, word2id,
                         maintain_links=ml, collect_tail_stats=True)
    assert r2["link_stats"]["link_mode"] == "delta"
    links2 = read_snapshot(spark, os.path.join(groot, "state", "links"))
    assert frozen(links2) == frozen(full_relink())
    # cost evidence: the posting join ran over touched surfaces only
    n_surfaces = r2["tail_stats"]["distinct_surfaces"]
    assert 0 < r2["link_stats"]["n_touched"] < n_surfaces

    # the graph gates this feature must not disturb: published
    # nodes/edges still equal the full rebuild
    full = run_pipeline(spark, df_of(rows), weights, word2id, lang="zh")

    def gfrozen(df, cols):
        return sorted(tuple(r[c] for c in cols) for r in df.select(*cols).collect())

    ncols = ["canon_id", "surface", "etype", "freq"]
    assert gfrozen(read_snapshot(spark, os.path.join(groot, "nodes")), ncols) \
        == gfrozen(full["nodes"], ncols)


def test_incremental_link_bootstraps_on_stale_or_changed_params(spark, tmp_path):
    """Link-state trust rules: an increment run WITHOUT maintain_links
    leaves the link state stale (link_snapshot cursor ≠ last), so the
    next maintained increment must BOOTSTRAP, not delta-merge into
    stale links; likewise a changed link param set. Equality with the
    full relink holds either way."""
    import os

    from zh_ner_tf_spark.fixtures.corpus import planted_weights
    from zh_ner_tf_spark.oracle import normalize_token
    from zh_ner_tf_spark.pipeline import link_surfaces_to_graph, run_incremental
    from zh_ner_tf_spark.sources.sinks import read_snapshot, snapshot_append
    from pyspark.sql import functions as F

    rows = gen_pages(90, seed=13)
    word2id = {"<PAD>": 0}
    for row in rows:
        text = row["text"] if row["text"] is not None else oracle_extract_text(row["html"])
        for ch in text:
            word2id.setdefault(normalize_token(ch), len(word2id))
    for t in ("<NUM>", "<ENG>", "<UNK>"):
        word2id.setdefault(t, len(word2id))
    weights = planted_weights(word2id)

    def df_of(rs):
        return spark.createDataFrame(
            [(r["url"], r["warc_ts"], r["html"], r["text"], r["lang"])
             for r in rs],
            schema=pages_schema(),
        )

    ptable = str(tmp_path / "pages")
    groot = str(tmp_path / "graph")
    ml = {"min_score_ppm": 300_000}

    snapshot_append(df_of(rows[:30]), ptable)
    r1 = run_incremental(spark, ptable, groot, weights, word2id,
                         maintain_links=ml)
    assert r1["link_stats"]["link_mode"] == "bootstrap"

    # an unmaintained increment makes the link state stale
    snapshot_append(df_of(rows[30:60]), ptable)
    r2 = run_incremental(spark, ptable, groot, weights, word2id)
    assert r2["link_stats"] is None

    snapshot_append(df_of(rows[60:]), ptable)
    r3 = run_incremental(spark, ptable, groot, weights, word2id,
                         maintain_links=ml)
    assert r3["link_stats"]["link_mode"] == "bootstrap"  # stale -> rebuild

    # param change on the NEXT head also forces a bootstrap; with an
    # unchanged head the call is a no-op
    r4 = run_incremental(spark, ptable, groot, weights, word2id,
                         maintain_links={"min_score_ppm": 500_000})
    assert r4["up_to_date"]

    links = read_snapshot(spark, os.path.join(groot, "state", "links"))
    surfs = (
        read_snapshot(spark, os.path.join(groot, "state", "surfaces"))
        .select(F.col("mention").alias("surface"))
        .distinct()
    )
    want = link_surfaces_to_graph(spark, groot, surfs, min_score_ppm=300_000)
    lcols = ["surface", "canon_id", "canon_name", "score_ppm", "shared"]

    def frozen(df):
        return sorted(tuple(r[c] for c in lcols) for r in df.select(*lcols).collect())

    assert frozen(links) == frozen(want)


def test_replay_with_graph_bootstrap_also_bootstraps_links(spark, tmp_path):
    """Review finding r8: an interrupted MAINTAINED increment whose
    replay triggers a graph-state rebuild (changed blocking family)
    must bootstrap the LINK state too — the pinned intent's
    link_bootstrap=False predates the replay-time decision, and a delta
    refresh would diff new_strings against the wrong (just-republished)
    surfaces snapshot, silently never relinking the increment's new
    surfaces. Gate: after the tampered replay, the links state equals
    the full relink."""
    import json
    import os

    from zh_ner_tf_spark.fixtures.corpus import planted_weights
    from zh_ner_tf_spark.oracle import normalize_token
    from zh_ner_tf_spark.pipeline import link_surfaces_to_graph, run_incremental
    from zh_ner_tf_spark.sources.sinks import (
        committed_snapshots,
        read_snapshot,
        snapshot_append,
    )
    from pyspark.sql import functions as F

    rows = gen_pages(40, seed=5) + gen_pages(
        30, seed=6, variant_frac=0.4, start=40
    )
    word2id = {"<PAD>": 0}
    for row in rows:
        text = row["text"] if row["text"] is not None else oracle_extract_text(row["html"])
        for ch in text:
            word2id.setdefault(normalize_token(ch), len(word2id))
    for t in ("<NUM>", "<ENG>", "<UNK>"):
        word2id.setdefault(t, len(word2id))
    weights = planted_weights(word2id)

    def df_of(rs):
        return spark.createDataFrame(
            [(r["url"], r["warc_ts"], r["html"], r["text"], r["lang"])
             for r in rs],
            schema=pages_schema(),
        )

    ptable = str(tmp_path / "pages")
    groot = str(tmp_path / "graph")
    ml = {"min_score_ppm": 300_000}
    snapshot_append(df_of(rows[:40]), ptable)                   # snap 1
    run_incremental(spark, ptable, groot, weights, word2id,
                    maintain_links=ml)
    snapshot_append(df_of(rows[40:]), ptable)                   # snap 2

    # simulate: the 1->2 increment wrote its intent (link_bootstrap
    # False, live sids pinned) then crashed; the blocking family
    # changed before the replay -> the replay rebuilds the graph state
    state_heads = {
        t: committed_snapshots(os.path.join(groot, "state", t))[-1]
        for t in ("surfaces", "string_components", "triple_aggs")
    }
    link_heads = {
        t: committed_snapshots(os.path.join(groot, "state", t))[-1]
        for t in ("links", "link_reps")
    }
    with open(os.path.join(groot, "_inflight.json"), "w") as f:
        json.dump({"from": 1, "to": 2, "state_sids": state_heads,
                   "bootstrap": False,
                   "state_params": {"shingle_k": 99},
                   "link_sids": link_heads,
                   "link_bootstrap": False,
                   "link_params": {"etypes": None,
                                   "min_score_ppm": 300_000,
                                   "max_gram_df": None}}, f)
    replay = run_incremental(spark, ptable, groot, weights, word2id,
                             maintain_links=ml, collect_tail_stats=True)
    assert replay["tail_stats"].get("bootstrap") is True
    # the fix: the link tail must NOT trust the pre-crash pin
    assert replay["link_stats"]["link_mode"] == "bootstrap"

    links = read_snapshot(spark, os.path.join(groot, "state", "links"))
    surfs = (
        read_snapshot(spark, os.path.join(groot, "state", "surfaces"))
        .select(F.col("mention").alias("surface"))
        .distinct()
    )
    want = link_surfaces_to_graph(spark, groot, surfs, min_score_ppm=300_000)
    lcols = ["surface", "canon_id", "canon_name", "score_ppm", "shared"]

    def frozen(df):
        return sorted(tuple(r[c] for c in lcols) for r in df.select(*lcols).collect())

    assert frozen(links) == frozen(want)
