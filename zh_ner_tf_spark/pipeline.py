"""The flagship KG-construction pipeline (BASELINE.json north_star):

  pages(url, warc_ts, html, text, lang)
    -> lang filter                      (predicate pushdown into scan)
    -> html->text extraction            (Arrow pandas UDF, NULL rows only)
    -> sentence split                   (JVM-side, narrow)
    -> BiLSTM-CRF tagger                (mapInPandas, broadcast weights;
                                         emits sentence + mention array)
    -> dependency-pattern triples       (narrow explodes over the tagged
                                         rows + priority CASE — zero
                                         shuffle)
    -> MinHash-LSH blocking             (band self-join)
    -> connected components             (iterative joins)
    -> nodes / edges tables             (parquet; Iceberg writeTo behind
                                         the same call sites on a real
                                         catalog)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zh_ner_tf_spark.operators.blocking import block_entities
from zh_ner_tf_spark.operators.components import connected_components
from zh_ner_tf_spark.operators.extract_text import with_extracted_text
from zh_ner_tf_spark.operators.sentences import split_sentences
from zh_ner_tf_spark.operators.tagger import broadcast_model, tag_sentences
from zh_ner_tf_spark.operators.triples import extract_triples, triples_from_tagged


def pages_to_tagged(
    pages: DataFrame,
    weights_bc,
    vocab_bc,
    lang: str | None = "zh",
    dtype=None,
) -> DataFrame:
    """pages -> tagged sentences: (url, sent_id, sentence, mentions
    array<struct<mention,etype,begin,end>>), one row per non-empty
    sentence. The whole prefix — lang filter (pushed into the scan),
    html->text, sentence split, tagger — is NARROW: no shuffle between
    the pages scan and the tagged rows, at any scale."""
    df = pages
    if lang is not None:
        df = df.filter(F.col("lang") == lang)
    df = with_extracted_text(df).select("url", "text")
    sentences = split_sentences(df, "text", ["url"]).select(
        "url", "sent_id", "sentence"
    )
    # Length clustering happens INSIDE the tagger UDF (length-sorted
    # chunks per Arrow batch, operators/tagger.py CHUNK_ROWS) — no
    # pre-sort stage needed, and it works under any partitioning.
    import numpy as np

    return tag_sentences(
        sentences,
        weights_bc,
        vocab_bc,
        id_cols=["url", "sent_id"],
        chars_col="sentence",
        emit="tagged",
        dtype=dtype or np.float64,
    )


def pages_to_mentions(
    pages: DataFrame,
    weights_bc,
    vocab_bc,
    lang: str | None = "zh",
    dtype=None,
) -> tuple[DataFrame, DataFrame]:
    """pages -> (sentences, mentions) as two independent lineages (the
    tagger runs only in the mentions branch). Kept for consumers that
    store mentions and sentences as separate tables; the fused pipeline
    uses pages_to_tagged + triples_from_tagged and never shuffles."""
    df = pages
    if lang is not None:
        df = df.filter(F.col("lang") == lang)
    df = with_extracted_text(df).select("url", "text")
    sentences = split_sentences(df, "text", ["url"]).select(
        "url", "sent_id", "sentence"
    )
    import numpy as np

    mentions = tag_sentences(
        sentences, weights_bc, vocab_bc, id_cols=["url", "sent_id"],
        chars_col="sentence", emit="mentions", dtype=dtype or np.float64,
    )
    return sentences, mentions


def mentions_to_graph(
    mentions: DataFrame,
    sentences: DataFrame,
    subj_types: tuple[str, ...] = ("PER",),
    obj_types: tuple[str, ...] = ("ORG", "LOC"),
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """mentions + sentences -> (triples, nodes, edges) via the relational
    triple extractor (for independently stored mention/sentence tables).
    subj_types/obj_types thread through to both the triple extractor and
    the edge-resolution maps so an override never silently drops edges."""
    triples = extract_triples(
        mentions, sentences, ["url", "sent_id"],
        subj_types=subj_types, obj_types=obj_types,
    )
    nodes, edges = graph_from_mentions(
        mentions, triples, subj_types=subj_types, obj_types=obj_types
    )
    return triples, nodes, edges


def graph_from_mentions(
    mentions: DataFrame,
    triples: DataFrame,
    subj_types: tuple[str, ...] = ("PER",),
    obj_types: tuple[str, ...] = ("ORG", "LOC"),
    id_expr=None,
) -> tuple[DataFrame, DataFrame]:
    """mentions + triples -> (nodes, edges).

    nodes: canon_id, surface, etype, freq — canonicalized via
    MinHash-LSH blocking + connected components over surface similarity.
    edges: src/dst canon ids + pred + weight.
    """
    # Hot-entity skew handling (BASELINE.json north_rule): the surface-
    # frequency aggregation is the skewed groupBy at crawl scale (one
    # surface can appear 10^9 times), so it runs as the salted two-phase
    # aggregation — provably equal to the direct groupBy (tested).
    from zh_ner_tf_spark.operators.skew import salted_agg

    # entity ids: 63-bit xxhash64 by default (collision-safe at 10^9+
    # surfaces); ``id_expr(mention_col, etype_col) -> Column`` overrides
    # it — the driver's oracle gate injects a poly-hash id it can
    # replicate sequentially (id ORDER feeds min-id tie-breaks below, so
    # an exact external oracle needs a reproducible id function)
    if id_expr is None:
        id_expr = lambda m, e: F.abs(F.xxhash64(m, e)).cast("bigint")  # noqa: E731
    surfaces = salted_agg(
        mentions.select("mention", "etype"),
        ["mention", "etype"],
        {"freq": ("count", "")},
    ).withColumn(
        "entity_id", id_expr(F.col("mention"), F.col("etype"))
    )
    sim_edges = block_entities(
        surfaces.select("entity_id", F.col("mention").alias("surface"))
    )
    comp = connected_components(sim_edges)
    nodes = (
        surfaces.join(comp.withColumnRenamed("node", "entity_id"), "entity_id", "left")
        .withColumn("canon_id", F.coalesce("component", "entity_id"))
        .select("canon_id", F.col("mention").alias("surface"), "etype", "freq")
    )
    # Deterministic surface -> canon resolution: a surface string can
    # exist under several etypes (several node rows); dropDuplicates would
    # pick one arbitrarily per run, breaking the resume/determinism
    # contract. Resolve per triple ROLE (subject types vs object types)
    # and take the min canon_id within the role — stable across runs and
    # partitionings.
    def _surf_map(etypes: tuple[str, ...], out: str) -> DataFrame:
        return (
            nodes.filter(F.col("etype").isin(*etypes))
            .groupBy("surface")
            .agg(F.min("canon_id").alias(out))
        )

    subj_map = _surf_map(subj_types, "src")
    obj_map = _surf_map(obj_types, "dst")
    edges = (
        triples.join(subj_map, triples["subj"] == subj_map["surface"])
        .drop("surface")
        .join(obj_map, F.col("obj") == obj_map["surface"])
        .drop("surface")
        .groupBy("src", "dst", "pred")
        .agg(F.count(F.lit(1)).alias("weight"))
    )
    return nodes, edges


def run_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    weights,
    word2id,
    lang: str | None = "zh",
    dtype=None,
    subj_types: tuple[str, ...] = ("PER",),
    obj_types: tuple[str, ...] = ("ORG", "LOC"),
) -> dict[str, DataFrame]:
    """The fused flagship pipeline: ONE tagger pass emits sentence +
    mention-array rows (localCheckpoint'd — every downstream consumer
    reads the materialized tagged rows instead of re-running the UDF),
    triples extract with zero shuffles, and only the graph stage
    (frequencies, blocking, components, edge resolution) shuffles — on
    entity keys, where the skew handling lives."""
    wb, vb = broadcast_model(spark, weights, word2id)
    tagged = pages_to_tagged(pages, wb, vb, lang, dtype).localCheckpoint()
    sentences = tagged.select("url", "sent_id", "sentence")
    mentions = tagged.select("url", "sent_id", F.inline("mentions"))
    triples = triples_from_tagged(
        tagged, ["url", "sent_id"],
        subj_types=subj_types, obj_types=obj_types,
    )
    nodes, edges = graph_from_mentions(
        mentions, triples, subj_types=subj_types, obj_types=obj_types
    )
    return {
        "sentences": sentences,
        "mentions": mentions,
        "triples": triples,
        "nodes": nodes,
        "edges": edges,
    }


def _delta_graph_tail(
    spark: SparkSession,
    graph_root: str,
    mentions_delta: DataFrame,
    triples_delta: DataFrame,
    stage: str,
    n_buckets: int,
    subj_types: tuple[str, ...],
    obj_types: tuple[str, ...],
    state_sids: dict,
    id_expr=None,
    collect_stats: bool = False,
) -> tuple[DataFrame, DataFrame, dict]:
    """Incremental canonicalization: the graph tail in O(new + touched)
    instead of O(all accumulated mentions) (VERDICT r5 #1 asymptotic
    gap — at daily-crawl cadence the full tail dominates the increment).

    Three compact state tables under ``<graph_root>/state`` (published
    through the same snapshot+lineage sink as everything else, so they
    are resumable, fingerprinted, and time-travelable):

      surfaces(mention, etype, freq, entity_id)  — merged counts
      string_components(surface, component)      — string-level CC
      triple_aggs(subj, obj, pred, n)            — surface-level triples

    Per increment:
      1. merge O(new) mention counts into ``surfaces`` (freq sums are
         associative; entity ids are pure hashes — no drift);
      2. find NEW surface strings (left-anti vs the prior snapshot) and
         compute verified similar pairs touching them
         (blocking.delta_surface_pairs — band values are pure functions
         of the string, so old-old pairs are frozen);
      3. run connected components over (prior component edges ∪ new
         pairs). CC of that union equals CC of the full pair set: prior
         component edges carry exactly the prior pairs' connectivity,
         and step 2 contributes every pair involving a new string;
      4. label each string cluster min(rep entity id) and resolve nodes
         exactly as graph_from_mentions does (a (mention, etype) row
         canonicalizes iff its id IS the surface's min id and the
         surface is clustered);
      5. merge O(new) triple counts into ``triple_aggs`` and resolve
         edges through the per-role surface maps — join + sum over the
         SURFACE-level aggregate equals the full groupBy over all
         accumulated triple occurrences.

    The only O(total-distinct-surfaces) work left is the counts merge
    and the band projection of the full string set — both output-sized,
    shuffle-light, and orders of magnitude below O(accumulated mention
    occurrences). Equality with the full rebuild is pinned by
    tests/test_pipeline_e2e.py.

    ``state_sids`` pins the PRIOR snapshot id per state table (None =
    table absent). run_incremental records them in the in-flight intent
    before any publish, so a crash replay merges the same delta into
    the same priors instead of double-merging into its own output."""
    import os

    from zh_ner_tf_spark.operators.blocking import delta_surface_pairs
    from zh_ner_tf_spark.operators.skew import salted_agg
    from zh_ner_tf_spark.sources.sinks import (
        read_snapshot,
        snapshot_stage_with_lineage,
    )

    if id_expr is None:
        id_expr = lambda m, e: F.abs(F.xxhash64(m, e)).cast("bigint")  # noqa: E731
    surf_path = os.path.join(graph_root, "state", "surfaces")
    comp_path = os.path.join(graph_root, "state", "string_components")
    aggs_path = os.path.join(graph_root, "state", "triple_aggs")
    stats: dict = {"tail_mode": "delta"}

    # -- 1. surface counts: O(new) aggregate + output-sized merge -----
    delta_surf = salted_agg(
        mentions_delta.select("mention", "etype"),
        ["mention", "etype"],
        {"freq": ("count", "")},
    )
    prior_surf = (
        read_snapshot(spark, surf_path, state_sids.get("surfaces"))
        if state_sids.get("surfaces")
        else None
    )
    merged_surf = (
        prior_surf.select("mention", "etype", "freq")
        .unionByName(delta_surf)
        .groupBy("mention", "etype")
        .agg(F.sum("freq").alias("freq"))
        if prior_surf is not None
        else delta_surf
    ).withColumn("entity_id", id_expr(F.col("mention"), F.col("etype")))
    _, surfaces = snapshot_stage_with_lineage(
        merged_surf, spark, surf_path, stage, "mention", n_buckets,
        replace=True,
    )
    surfaces = surfaces.drop("_bucket")

    # -- 2. new strings -> new verified pairs -------------------------
    all_strings = surfaces.select(F.col("mention").alias("surface")).distinct()
    new_strings = (
        all_strings.join(
            prior_surf.select(F.col("mention").alias("surface")).distinct(),
            "surface",
            "left_anti",
        )
        if prior_surf is not None
        else all_strings
    )
    new_pairs = delta_surface_pairs(all_strings, new_strings).localCheckpoint()

    # -- 3. CC over prior component edges ∪ new pairs -----------------
    prior_comp = (
        read_snapshot(spark, comp_path, state_sids.get("string_components"))
        if state_sids.get("string_components")
        else None
    )
    cc_edges = new_pairs.select(
        F.col("sa").alias("src"), F.col("sb").alias("dst")
    )
    if prior_comp is not None:
        cc_edges = cc_edges.unionByName(
            prior_comp.select(
                F.col("surface").alias("src"), F.col("component").alias("dst")
            )
        )
    comp = connected_components(cc_edges)  # (node=string, component=min str)
    _, comp_out = snapshot_stage_with_lineage(
        comp.select(F.col("node").alias("surface"), "component"),
        spark, comp_path, stage, "surface", n_buckets, replace=True,
    )
    comp_out = comp_out.drop("_bucket")

    # -- 4. nodes: label clusters by min rep id, resolve per row ------
    repmap = surfaces.groupBy("mention").agg(
        F.min("entity_id").alias("rep_id")
    )
    labels = (
        comp_out.join(repmap, comp_out["surface"] == repmap["mention"])
        .groupBy("component")
        .agg(F.min("rep_id").alias("canon"))
    )
    membership = comp_out.join(labels, "component").select(
        F.col("surface").alias("_m_surface"), "canon"
    )
    nodes = (
        surfaces.join(repmap, "mention")
        .join(membership, F.col("mention") == F.col("_m_surface"), "left")
        .withColumn(
            "canon_id",
            F.when(
                (F.col("entity_id") == F.col("rep_id"))
                & F.col("canon").isNotNull(),
                F.col("canon"),
            ).otherwise(F.col("entity_id")),
        )
        .select("canon_id", F.col("mention").alias("surface"), "etype", "freq")
    )

    # -- 5. triple aggs merge + edge resolution -----------------------
    delta_aggs = triples_delta.groupBy("subj", "obj", "pred").agg(
        F.count(F.lit(1)).alias("n")
    )
    prior_aggs = (
        read_snapshot(spark, aggs_path, state_sids.get("triple_aggs"))
        if state_sids.get("triple_aggs")
        else None
    )
    merged_aggs = (
        prior_aggs.select("subj", "obj", "pred", "n")
        .unionByName(delta_aggs)
        .groupBy("subj", "obj", "pred")
        .agg(F.sum("n").alias("n"))
        if prior_aggs is not None
        else delta_aggs
    )
    _, aggs = snapshot_stage_with_lineage(
        merged_aggs, spark, aggs_path, stage, "subj", n_buckets, replace=True,
    )
    aggs = aggs.drop("_bucket")

    def _surf_map(etypes: tuple[str, ...], out: str) -> DataFrame:
        return (
            nodes.filter(F.col("etype").isin(*etypes))
            .groupBy("surface")
            .agg(F.min("canon_id").alias(out))
        )

    subj_map = _surf_map(subj_types, "src")
    obj_map = _surf_map(obj_types, "dst")
    edges = (
        aggs.join(subj_map, aggs["subj"] == subj_map["surface"])
        .drop("surface")
        .join(obj_map, F.col("obj") == obj_map["surface"])
        .drop("surface")
        .groupBy("src", "dst", "pred")
        .agg(F.sum("n").alias("weight"))
    )

    if collect_stats:
        stats.update(
            new_surfaces=new_strings.count(),
            new_pairs=new_pairs.count(),
            prior_comp_edges=prior_comp.count() if prior_comp is not None else 0,
            distinct_surfaces=all_strings.count(),
            # measured from the ACTUAL CC input frame, not derived from
            # the other stats — so the e2e cost assertion would catch a
            # refactor that accidentally fed extra edges into CC
            cc_edge_rows=cc_edges.count(),
        )
    return nodes, edges, stats


def run_incremental(
    spark: SparkSession,
    pages_table: str,
    graph_root: str,
    weights,
    word2id,
    lang: str | None = "zh",
    dtype=None,
    n_buckets: int = 32,
    subj_types: tuple[str, ...] = ("PER",),
    obj_types: tuple[str, ...] = ("ORG", "LOC"),
    keep_graph_snapshots: int | None = None,
    compact_deltas_every: int | None = None,
    tail: str = "delta",
    collect_tail_stats: bool = False,
    maintain_links: dict | None = None,
) -> dict:
    """Incremental KG construction over a snapshot table of pages — the
    crawl-consumption loop at 100 TB, where re-tagging the whole corpus
    per crawl batch is the cost that matters.

    Each call advances a consumer cursor (``_consumer_state.json`` under
    ``graph_root``) from the last processed pages snapshot to the
    current head:

      * the EXPENSIVE stage (html->text -> sentences -> BiLSTM-CRF
        tagger -> triples) runs ONLY over ``snapshot_diff(last, head)``
        — O(new pages), never a rescan;
      * mention/triple deltas append to compact snapshot tables through
        the per-bucket lineage sink (kill mid-append -> rerun resumes
        only uncommitted buckets; re-publish is CAS + fingerprinted);
      * the graph tail (surface aggregation -> blocking -> connected
        components -> edge resolution) is GLOBAL by nature — a new
        mention can merge two old entity clusters — but with
        ``tail="delta"`` (the default) it runs INCREMENTALLY
        (_delta_graph_tail): merged per-surface counts, similar pairs
        computed only for NEW surface strings, connected components
        over (prior component edges ∪ new pairs), and edges resolved
        from a merged surface-level triple aggregate — O(new + touched)
        work per increment, provably equal to the full recomputation
        (tested). ``tail="full"`` keeps the O(total mentions) rebuild
        from the accumulated tables; switching full->delta later
        bootstraps the state tables from the accumulated tables in one
        O(total) pass (detected via the ``state_snapshot`` cursor
        field);
      * crash safety is a two-phase cursor: an INTENT file recording the
        (from, to) range is written BEFORE any delta publish, and the
        cursor commits LAST via atomic rename. A replay with the head
        unchanged hits the lineage-resume / fingerprint-idempotent
        paths; a replay where NEW pages snapshots arrived meanwhile is
        pinned to the interrupted range by the intent file — without it
        the rerun would re-derive ``snapshot_diff(last, newer_head)``,
        re-append the already-published delta under a fresh stage name,
        and permanently double every surface freq and edge weight.
        Stale intents (their range already committed) are discarded.

    ``compact_deltas_every=N`` compacts + expires the mentions/triples
    delta tables every N appended snapshots — otherwise each increment
    adds a data dir and every graph rebuild pays an ever-growing
    union-of-scans (nodes/edges get the same treatment via
    ``keep_graph_snapshots``).

    ``maintain_links`` (optional, r8): also maintain the corpus ALIAS
    TABLE — every distinct surface linked against the just-published
    canonical space (link_surfaces_to_graph semantics) — as two extra
    state tables, refreshed INCREMENTALLY per increment
    (_delta_link_tail / operators.linking.refresh_links: only new
    surfaces and surfaces a KB change can affect go through the
    posting join; provably equal to a full relink, e2e-tested). Dict
    keys: ``etypes`` (KB node filter, default None = all),
    ``min_score_ppm`` (default 600000), ``max_gram_df`` (default
    None). Changing these between increments, switching them on over
    stale state, or a tail="full" run triggers a one-off full relink
    (the graph-state bootstrap pattern). Default None: no link state
    is read, written, or pinned — existing deployments are untouched.

    Returns {"pages_snapshot", "processed_pages", "up_to_date",
    "graph_sids", "tail_stats", "link_stats"} (``tail_stats`` carries
    per-stage input sizes when ``collect_tail_stats=True`` — the cost
    evidence that the delta tail is O(new + touched), pinned by the
    e2e test; ``link_stats`` is None unless ``maintain_links``)."""
    import json
    import os

    from zh_ner_tf_spark.sources.sinks import (
        committed_snapshots,
        read_snapshot,
        snapshot_diff,
        snapshot_row_count,
        snapshot_stage_with_lineage,
    )

    if tail not in ("delta", "full"):
        # validate BEFORE any side effect: a typo'd tail after the
        # intent write + delta publishes would strand an in-flight
        # intent and a full tagger pass behind a static argument error
        raise ValueError(f"tail must be 'delta' or 'full', got {tail!r}")
    snaps = committed_snapshots(pages_table)
    if not snaps:
        raise FileNotFoundError(f"no committed snapshots under {pages_table}")
    head = snaps[-1]
    state_path = os.path.join(graph_root, "_consumer_state.json")
    intent_path = os.path.join(graph_root, "_inflight.json")
    # normalize link params to their JSON round-trip form up front —
    # the cursor/intent comparison must be stable across tuple/list
    link_params = None
    if maintain_links is not None:
        et = maintain_links.get("etypes")
        link_params = {
            "etypes": list(et) if et else None,
            "min_score_ppm": int(maintain_links.get("min_score_ppm", 600_000)),
            "max_gram_df": maintain_links.get("max_gram_df"),
        }
    last = None
    state_reflects = None  # pages snapshot the delta state tables mirror
    state_params_stored = None  # blocking family the state was built under
    link_reflects = None  # pages snapshot the link state mirrors
    link_params_stored = None
    if os.path.exists(state_path):
        with open(state_path) as f:
            cursor = json.load(f)
        last = cursor["pages_snapshot"]
        state_reflects = cursor.get("state_snapshot")
        state_params_stored = cursor.get("state_params")
        link_reflects = cursor.get("link_snapshot")
        link_params_stored = cursor.get("link_params")
    pinned = None
    if os.path.exists(intent_path):
        with open(intent_path) as f:
            intent = json.load(f)
        if intent.get("from") == last and intent.get("to") in snaps:
            # interrupted increment: replay EXACTLY its range even if
            # newer pages snapshots have arrived (they are picked up by
            # the next call, after the cursor advances)
            head = intent["to"]
            pinned = intent
        else:
            os.remove(intent_path)  # stale: its range already committed
    if last == head:
        return {"pages_snapshot": head, "processed_pages": 0,
                "up_to_date": True, "graph_sids": None,
                "tail_stats": {"tail_mode": "none"}, "link_stats": None}

    new_pages = (
        read_snapshot(spark, pages_table, head)
        if last is None
        else snapshot_diff(spark, pages_table, last, head)
    )
    wb, vb = broadcast_model(spark, weights, word2id)
    tagged = pages_to_tagged(new_pages, wb, vb, lang, dtype).localCheckpoint()
    mentions = tagged.select("url", "sent_id", F.inline("mentions"))
    triples = triples_from_tagged(
        tagged, ["url", "sent_id"], subj_types=subj_types, obj_types=obj_types
    )
    # increment size from manifest metadata (O(1) driver lookup) — a
    # count() here would re-scan the whole head snapshot on first run
    n_new = snapshot_row_count(pages_table, head) - (
        snapshot_row_count(pages_table, last) if last is not None else 0
    )
    stage = f"inc-{0 if last is None else last}-{head}"
    os.makedirs(graph_root, exist_ok=True)

    # Delta-tail state pinning: the intent records WHICH state-table
    # snapshots this increment merges into, so a crash replay merges the
    # same delta into the same priors instead of into its own partially
    # committed output (the state-table analog of the range pinning
    # above). ``bootstrap`` = state tables absent or stale (previous
    # increments ran tail="full", or a pre-delta deployment): rebuild
    # them once from the accumulated tables, O(total) — every later
    # increment is O(new + touched).
    state_tables = ("surfaces", "string_components", "triple_aggs")

    def _state_head(t: str):
        s = committed_snapshots(os.path.join(graph_root, "state", t))
        return s[-1] if s else None

    # the blocking family the delta state's frozen pair set was computed
    # under: if ANY of these change between increments, old-old pairs
    # are no longer frozen and the delta identity breaks — detect the
    # mismatch and rebuild the state from the accumulated tables
    from zh_ner_tf_spark.config import (
        JACCARD_THRESHOLD,
        MINHASH_BANDS,
        MINHASH_NUM_HASHES,
        MINHASH_SHINGLE_K,
        SEED,
    )

    state_params = {
        "shingle_k": MINHASH_SHINGLE_K,
        "n_hashes": MINHASH_NUM_HASHES,
        "n_bands": MINHASH_BANDS,
        "threshold": JACCARD_THRESHOLD,
        "seed": SEED,
    }

    if pinned is not None and "state_sids" in pinned:
        if pinned.get("state_params") != state_params:
            # the blocking family changed between the crash and the
            # replay (or the intent predates params recording): the
            # pinned priors' frozen pair set no longer matches the
            # family this replay would band with — rebuild from the
            # accumulated tables (safe on replay: they are published
            # and lineage-idempotent) instead of mixing families
            state_sids = {t: None for t in state_tables}
            bootstrap = True
        else:
            state_sids = pinned["state_sids"]
            bootstrap = pinned.get("bootstrap", False)
    else:
        state_sids = {t: _state_head(t) for t in state_tables}
        bootstrap = last is not None and (
            state_sids["surfaces"] is None
            or state_reflects != last
            or state_params_stored != state_params
        )
        if last is None or bootstrap:
            state_sids = {t: None for t in state_tables}

    # Link-state pinning mirrors the graph-state pinning above: prior
    # link sids go into the intent BEFORE any publish so a crash replay
    # refreshes against the same priors. link_bootstrap (full relink)
    # whenever the priors can't be trusted to mirror `last` under the
    # same params — absent state, stale cursor, changed params, a
    # graph-state bootstrap (new_strings needs the pinned prior
    # surfaces), or tail="full".
    link_tables = ("links", "link_reps")
    link_sids: dict = {t: None for t in link_tables}
    link_bootstrap = True
    if maintain_links is not None and tail == "delta":
        if pinned is not None:
            # `not bootstrap`: the REPLAY-time graph-state decision —
            # a replay that rebuilds the graph state (e.g. the blocking
            # family changed between crash and replay) invalidates the
            # pinned surfaces sid new_strings is diffed against, so the
            # link tail must bootstrap too even if the intent recorded
            # link_bootstrap=False (review finding r8).
            if (
                "link_sids" in pinned
                and pinned.get("link_params") == link_params
                and not pinned.get("link_bootstrap", True)
                and not bootstrap
            ):
                link_sids = pinned["link_sids"]
                link_bootstrap = False
        else:
            link_sids = {t: _state_head(t) for t in link_tables}
            link_bootstrap = (
                last is None
                or bootstrap
                or link_sids["links"] is None
                or link_sids["link_reps"] is None
                or link_reflects != last
                or link_params_stored != link_params
            )
            if link_bootstrap:
                link_sids = {t: None for t in link_tables}

    tmp_intent = f"{intent_path}.tmp"
    with open(tmp_intent, "w") as f:
        json.dump({"from": last, "to": head,
                   "state_sids": state_sids, "bootstrap": bootstrap,
                   "state_params": state_params,
                   "link_sids": link_sids,
                   "link_bootstrap": link_bootstrap,
                   "link_params": link_params}, f)
    os.replace(tmp_intent, intent_path)
    _, mdelta = snapshot_stage_with_lineage(
        mentions, spark, os.path.join(graph_root, "mentions"), stage,
        "url", n_buckets,
    )
    _, tdelta = snapshot_stage_with_lineage(
        triples, spark, os.path.join(graph_root, "triples"), stage,
        "url", n_buckets,
    )
    if tail == "delta":
        if bootstrap:
            m_in = read_snapshot(spark, os.path.join(graph_root, "mentions"))
            t_in = read_snapshot(spark, os.path.join(graph_root, "triples"))
        else:
            # this increment's published delta rows, read back from the
            # stage dir (replay-stable: a resumed increment sees the
            # same rows it committed, not a re-run of the tagger)
            m_in, t_in = mdelta.drop("_bucket"), tdelta.drop("_bucket")
        nodes, edges, tail_stats = _delta_graph_tail(
            spark, graph_root, m_in, t_in, stage, n_buckets,
            subj_types, obj_types, state_sids,
            collect_stats=collect_tail_stats,
        )
        if bootstrap:
            tail_stats["bootstrap"] = True
    else:  # tail == "full" (validated at function entry)
        all_mentions = read_snapshot(
            spark, os.path.join(graph_root, "mentions")
        )
        all_triples = read_snapshot(spark, os.path.join(graph_root, "triples"))
        nodes, edges = graph_from_mentions(
            all_mentions, all_triples,
            subj_types=subj_types, obj_types=obj_types,
        )
        tail_stats = {"tail_mode": "full"}
    sids = materialize_graph(
        spark, {"nodes": nodes, "edges": edges}, graph_root,
        stage=f"graph-{head}", n_buckets=n_buckets, replace=True,
    )
    link_stats = None
    if maintain_links is not None:
        # link against the JUST-PUBLISHED nodes snapshot (a parquet
        # read — not a re-execution of the nodes lineage) so the alias
        # table and the graph a consumer reads are the same bytes
        pub_nodes = read_snapshot(
            spark, os.path.join(graph_root, "nodes"), sids["nodes"]
        )
        if tail == "delta":
            surf_state_path = os.path.join(graph_root, "state", "surfaces")
            cur_surf = read_snapshot(spark, surf_state_path)
            all_strings = cur_surf.select(
                F.col("mention").alias("surface")
            ).distinct()
            if link_bootstrap:
                new_strings = None
            else:
                prior_surf_l = read_snapshot(
                    spark, surf_state_path, state_sids["surfaces"]
                )
                new_strings = all_strings.join(
                    prior_surf_l.select(
                        F.col("mention").alias("surface")
                    ).distinct(),
                    "surface",
                    "left_anti",
                )
        else:  # tail == "full": always a full relink over all mentions
            all_strings = (
                read_snapshot(spark, os.path.join(graph_root, "mentions"))
                .select(F.col("mention").alias("surface"))
                .distinct()
            )
            new_strings = None
        _, link_stats = _delta_link_tail(
            spark, graph_root, pub_nodes, all_strings, new_strings,
            stage, n_buckets, link_params, link_sids,
            collect_stats=collect_tail_stats,
        )
    if keep_graph_snapshots is not None:
        # in-loop table maintenance: every increment REPLACES the
        # nodes/edges snapshot, so without expiry each superseded
        # graph-<sid> stage dir lives forever. keep_graph_snapshots
        # bounds retained history (time travel keeps working that far
        # back); expired stage dirs take their lineage manifests with
        # them (sinks.snapshot_expire), so a reused stage name would
        # recompute instead of publishing empty.
        from zh_ner_tf_spark.sources.sinks import snapshot_expire

        for t in ("nodes", "edges"):
            snapshot_expire(
                os.path.join(graph_root, t), keep_last=keep_graph_snapshots
            )
    tmp = f"{state_path}.tmp"
    with open(tmp, "w") as f:
        json.dump({"pages_snapshot": head,
                   "state_snapshot":
                       head if tail == "delta" else state_reflects,
                   "state_params":
                       state_params if tail == "delta"
                       else state_params_stored,
                   # links reflect head whenever maintained this call
                   # (full mode relinks from scratch); otherwise the
                   # stored fields carry forward untouched
                   "link_snapshot":
                       head if maintain_links is not None
                       else link_reflects,
                   "link_params":
                       link_params if maintain_links is not None
                       else link_params_stored}, f)
    os.replace(tmp, state_path)
    # intent retired AFTER the cursor: a crash between the two leaves a
    # stale intent (from != new cursor) that the next call discards
    try:
        os.remove(intent_path)
    except FileNotFoundError:
        pass
    if keep_graph_snapshots is not None and tail == "delta":
        # state-table retention runs strictly AFTER the cursor commit,
        # unlike nodes/edges above: an interrupted increment replays
        # against the state sids pinned in its intent, and expiring
        # those prior snapshots before the cursor commits would leave
        # the replay nothing to merge into. Once the cursor is in and
        # the intent retired, the range can never replay and the old
        # state snapshots are dead weight.
        from zh_ner_tf_spark.sources.sinks import snapshot_expire

        for t in state_tables + link_tables:
            p = os.path.join(graph_root, "state", t)
            if committed_snapshots(p):
                snapshot_expire(p, keep_last=keep_graph_snapshots)
    if compact_deltas_every is not None:
        # delta-table maintenance LAST, after the cursor committed: a
        # compaction inside the increment would fold this range's rows
        # into the compacted dir and then delete the inc stage's lineage
        # — a crash replay of the range would recompute the stage and
        # APPEND the rows a second time. After the cursor, the range can
        # never replay, so folding + expiring its stage dirs is safe.
        from zh_ner_tf_spark.sources.sinks import snapshot_compact, snapshot_expire

        for t in ("mentions", "triples"):
            p = os.path.join(graph_root, t)
            if len(committed_snapshots(p)) >= compact_deltas_every:
                snapshot_compact(spark, p)
                snapshot_expire(p, keep_last=1)
    return {"pages_snapshot": head, "processed_pages": n_new,
            "up_to_date": False, "graph_sids": sids,
            "tail_stats": tail_stats, "link_stats": link_stats}


def materialize_graph(
    spark: SparkSession,
    outputs: dict[str, DataFrame],
    root: str,
    stage: str = "graph",
    n_buckets: int = 32,
    replace: bool = False,
) -> dict[str, int]:
    """Publish the pipeline's nodes/edges through the unified
    snapshot+lineage sink (sources/sinks.snapshot_stage_with_lineage):
    per-bucket commits give exact resume after a mid-write kill, the CAS
    snapshot commit gives atomic visibility + time travel, and both
    compose — a killed graph write leaves the tables at their previous
    snapshot, a re-run recomputes only uncommitted buckets and then
    publishes. ``stage`` names the crawl increment; ``replace=True``
    publishes snapshots referencing ONLY this stage's directory (the
    full-rebuild shape — a job regenerating the whole graph must not
    union with a previous run's rows). Returns the committed snapshot
    id per table."""
    import os

    from zh_ner_tf_spark.sources.sinks import snapshot_stage_with_lineage

    nodes_sid, _ = snapshot_stage_with_lineage(
        outputs["nodes"], spark, os.path.join(root, "nodes"), stage,
        "canon_id", n_buckets, replace=replace,
    )
    edges_sid, _ = snapshot_stage_with_lineage(
        outputs["edges"], spark, os.path.join(root, "edges"), stage,
        "src", n_buckets, replace=replace,
    )
    return {"nodes": nodes_sid, "edges": edges_sid}


def _link_reps(nodes: DataFrame, etypes: tuple[str, ...] | None) -> DataFrame:
    """Collapse a published nodes table to one representative name per
    canonical cluster: max freq, ties to the lexicographically larger
    surface (deterministic max(struct)). Shared by the read-only
    link_surfaces_to_graph and the incremental link tail so both link
    against the identical KB."""
    if etypes:
        nodes = nodes.filter(F.col("etype").isin(*etypes))
    return (
        nodes.groupBy("canon_id")
        .agg(F.max(F.struct("freq", "surface")).alias("_b"))
        .select(
            F.col("canon_id").alias("entity_id"),
            F.col("_b.surface").alias("name"),
        )
    )


def _delta_link_tail(
    spark: SparkSession,
    graph_root: str,
    nodes: DataFrame,
    all_strings: DataFrame,
    new_strings: DataFrame | None,
    stage: str,
    n_buckets: int,
    link_params: dict,
    link_sids: dict,
    collect_stats: bool = False,
) -> tuple[DataFrame, dict]:
    """Maintain the corpus alias table (surface -> canonical entity)
    incrementally inside run_incremental (VERDICT r7 item 3): after
    each increment publishes nodes, every distinct corpus surface must
    be linked against the JUST-PUBLISHED canonical space — but
    relinking the whole corpus per increment is the O(total) cost the
    delta tail exists to avoid. Two state tables under
    ``<graph_root>/state`` (same snapshot+lineage sink as the graph
    state — resumable, fingerprinted, time-travelable):

      links(surface, canon_id, canon_name, score_ppm, shared)
      link_reps(entity_id, name)   — the KB the links were computed on

    Per increment: collapse the new nodes to reps (_link_reps), diff
    against the stored prior reps, and run
    operators/linking.refresh_links — only surfaces that are new or
    whose link could have changed (shared gram with a changed rep name
    or a banned-status-flipped gram) go through the posting join; the
    rest carry forward. ``link_sids`` pins the prior state snapshots
    (run_incremental records them in the in-flight intent before any
    publish, exactly like the graph state sids, so a crash replay
    merges the same delta into the same priors). ``new_strings=None``
    or absent priors -> bootstrap: full relink of every surface.

    Returns (published links DataFrame, stats)."""
    import os

    from zh_ner_tf_spark.operators.linking import link_mentions, refresh_links
    from zh_ner_tf_spark.sources.sinks import (
        read_snapshot,
        snapshot_stage_with_lineage,
    )

    links_path = os.path.join(graph_root, "state", "links")
    lreps_path = os.path.join(graph_root, "state", "link_reps")
    etypes = link_params.get("etypes")
    min_ppm = link_params.get("min_score_ppm", 600_000)
    max_df = link_params.get("max_gram_df")

    # consumed by link_mentions 3x (census + grams + join) and the
    # diff/publish below — checkpoint once, KB-sized
    reps_new = _link_reps(
        nodes, tuple(etypes) if etypes else None
    ).localCheckpoint()

    prior_reps = (
        read_snapshot(spark, lreps_path, link_sids.get("link_reps"))
        if link_sids.get("link_reps")
        else None
    )
    prior_links = (
        read_snapshot(spark, links_path, link_sids.get("links"))
        if link_sids.get("links")
        else None
    )
    stats: dict = {}
    if prior_reps is None or prior_links is None or new_strings is None:
        linked = link_mentions(
            all_strings,
            reps_new,
            mention_col="surface",
            max_gram_df=max_df,
            min_score_ppm=min_ppm,
        )
        stats["link_mode"] = "bootstrap"
    else:
        linked = refresh_links(
            all_strings,
            new_strings,
            prior_links.select(
                "surface",
                F.col("canon_id").alias("entity_id"),
                F.col("canon_name").alias("name"),
                "score_ppm",
                "shared",
            ),
            prior_reps,
            reps_new,
            mention_col="surface",
            max_gram_df=max_df,
            min_score_ppm=min_ppm,
            stats_out=stats if collect_stats else None,
        )
        stats["link_mode"] = "delta"
    linked = linked.withColumnRenamed("entity_id", "canon_id").withColumnRenamed(
        "name", "canon_name"
    )
    _, links_out = snapshot_stage_with_lineage(
        linked, spark, links_path, stage, "surface", n_buckets, replace=True,
    )
    snapshot_stage_with_lineage(
        reps_new, spark, lreps_path, stage, "name", n_buckets, replace=True,
    )
    links_out = links_out.drop("_bucket")
    if collect_stats:
        stats["n_links"] = links_out.count()
        stats["n_reps"] = reps_new.count()
    return links_out, stats


def link_surfaces_to_graph(
    spark: SparkSession,
    graph_root: str,
    surfaces: DataFrame,
    surface_col: str = "surface",
    etypes: tuple[str, ...] | None = None,
    min_score_ppm: int = 600_000,
    max_gram_df: int | None = None,
    snapshot_id: int | None = None,
) -> DataFrame:
    """Alias resolution against a PUBLISHED graph (read-only — touches
    no pipeline state): load the nodes table under ``graph_root``
    (optionally a time-travel ``snapshot_id``), collapse each canonical
    cluster to one representative name (max freq, ties to the
    lexicographically larger surface — the deterministic max(struct)
    rule), and link the given surfaces into that canonical space with
    operators/linking.link_mentions. Use it to resolve long-tail
    variant spellings the LSH blocking never band-collided (blocking
    requires shingle overlap ABOVE the band threshold; linking scores
    every shared-gram candidate), or to map external mention lists onto
    an existing graph without re-canonicalizing.

    Returns (surface_col, canon_id, canon_name, score_ppm, shared) —
    one row per surface that links at ``min_score_ppm`` or better.
    """
    import os

    from zh_ner_tf_spark.operators.linking import link_mentions
    from zh_ner_tf_spark.sources.sinks import read_snapshot

    nodes = read_snapshot(
        spark, os.path.join(graph_root, "nodes"), snapshot_id=snapshot_id
    )
    # reps are KB-sized — checkpoint so the nodes scan + agg run once
    # across link_mentions' three entity-side traversals
    reps = _link_reps(nodes, etypes).localCheckpoint()
    return (
        link_mentions(
            surfaces,
            reps,
            mention_col=surface_col,
            max_gram_df=max_gram_df,
            min_score_ppm=min_score_ppm,
        )
        .withColumnRenamed("entity_id", "canon_id")
        .withColumnRenamed("name", "canon_name")
    )
