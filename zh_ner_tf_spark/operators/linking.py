"""Entity linking: mention surface -> best canonical entity.

The north_star pipeline [B BASELINE.json: "triple extraction, entity
linking, canonicalization"] needs a linking stage between NER mentions
and the canonical entity table that blocking + connected components
produce (blocking.py / pipeline.py). This operator resolves each
mention surface to its best-scoring canonical entity:

  candidate generation   inverted-index (posting-list) join on char
                         k-gram hashes -- never all-pairs; the classic
                         sharded-KB linking shape
  hot-gram pruning       entity-side document frequency > ``max_gram_df``
                         bans a gram ("stopword gram") from BOTH sides,
                         capping every posting list the join can fan out
                         over; Jaccard stays exact over the pruned space
  scoring                k-gram Jaccard on the ppm integer lattice
                         (BIGINT ``div`` -- bit-exact across engines and
                         parallelism; the triples.py conf_ppm pattern)
  link decision          one map-side-combinable max(struct) per
                         mention, no window sort; ties break on smaller
                         entity_id, then larger name (documented, exact)

Scale notes (100 TB): the mention side is corpus-sized; the entity side
is KB-sized. The gram-df census and banned set derive from the ENTITY
side only, so they are small and broadcast into both anti-joins. With
``broadcast_entities=True`` (the KB-fits-in-memory case) the posting
join itself is a BroadcastHashJoin -- the corpus side never shuffles for
candidate generation; its only shuffles are the two map-side-combinable
count aggregations (per-mention gram count, per-pair shared count). For
KBs too large to broadcast, the join shuffles on the gram key, where
``max_gram_df`` bounds the entity rows per key, so no gram can produce
an unbounded pair explosion; AQE skew-join backstops mention-side hot
grams at runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from zh_ner_tf_spark.operators.blocking import shingle_hashes

# Working columns injected (and dropped) by link_mentions. Fail loudly
# on clash instead of silently clobbering caller data (skew.py pattern).
_RESERVED = ("_gram", "_n_m", "_n_e", "_shared", "_score_ppm", "_best")


def _check_reserved(*frames: DataFrame) -> None:
    for df in frames:
        clash = [c for c in df.columns if c in _RESERVED]
        if clash:
            raise ValueError(
                f"input columns {clash} collide with link_mentions "
                f"working columns {_RESERVED}; rename them first"
            )


def gram_rows(df: DataFrame, key_cols: list[str], text_col: str, k: int) -> DataFrame:
    """One row per DISTINCT char-k-gram hash of ``text_col``: (*key_cols,
    _gram). Strings shorter than k contribute their whole-string hash
    (shingle_hashes semantics, shared with the MinHash blocking path)."""
    return df.select(
        *key_cols,
        F.explode(shingle_hashes(F.col(text_col), k)).alias("_gram"),
    )


def banned_grams(eg: DataFrame, max_gram_df: int) -> DataFrame:
    """The hot-gram ban census over an entity-side gram_rows frame:
    grams appearing in MORE than ``max_gram_df`` entity rows. The ONE
    definition both link_mentions (pruning) and refresh_links (flip
    detection) use — the incremental==full identity depends on the
    refresh computing EXACTLY the census the linker prunes with, so the
    rule must not fork (review finding r8)."""
    return (
        eg.groupBy("_gram")
        .agg(F.count("*").alias("_n_e"))
        .filter(F.col("_n_e") > max_gram_df)
        .select("_gram")
    )


def link_mentions(
    mentions: DataFrame,
    entities: DataFrame,
    mention_col: str = "surface",
    entity_id_col: str = "entity_id",
    entity_name_col: str = "name",
    k: int = 2,
    max_gram_df: int | None = None,
    min_score_ppm: int = 0,
    broadcast_entities: bool = True,
) -> DataFrame:
    """Link each distinct mention surface to its best canonical entity.

    mentions: any DataFrame with a ``mention_col`` string column (rows
    are deduplicated on it -- a surface links once, however often it
    occurs). entities: (entity_id_col, entity_name_col) canonical table;
    exact duplicate rows are collapsed (they must not inflate gram
    counts), while distinct (id, name) pairs -- including one id under
    several names -- stay separate candidates and resolve through the
    tie-break. Returns one row per linkable mention:

      (mention_col, entity_id, entity_name, score_ppm, shared)

    score_ppm = (1_000_000 * |G_m ∩ G_e|) div (|G_m ∪ G_e|) over the
    pruned distinct-gram space; mentions with no candidate scoring >=
    ``min_score_ppm`` are absent (no-link). Ties break deterministically:
    max score, then min entity_id, then max entity name (the last leg
    only matters under a poly-hash id collision). entity_id_col must be
    a NUMERIC column — the min-id tie-break is expressed as arithmetic
    negation inside a max(struct) aggregate (validated up front; a
    string-id KB should derive a numeric key first, e.g. a poly-hash).

    Traversal contract: ``mentions`` lineage is executed twice (gram
    count + posting join) and ``entities`` three times (df census +
    gram count + posting join) — callers with expensive upstreams
    should checkpoint/persist the inputs rather than this operator
    materializing a corpus-sized gram table on their behalf.
    """
    _check_reserved(mentions, entities)
    id_type = entities.schema[entity_id_col].dataType.typeName()
    if id_type not in {
        "byte", "short", "integer", "long", "float", "double", "decimal"
    }:
        # The min-id tie-break negates the id inside max(struct); a
        # string-id KB would fail at analysis with an unhelpful cast
        # error — enforce the documented numeric contract here instead
        # (ADVICE r7).
        raise ValueError(
            f"link_mentions: {entity_id_col!r} must be numeric (got "
            f"{id_type}); derive a numeric key (e.g. poly-hash) for "
            f"string-id KBs"
        )

    men = mentions.select(mention_col).distinct()
    mg = gram_rows(men, [mention_col], mention_col, k)
    # dedupe the KB side too: a duplicated entity row would double its
    # grams through the df census, _n_e and _shared, silently inflating
    # scores past 1_000_000 — collapse exact duplicates instead.
    ents = entities.select(entity_id_col, entity_name_col).distinct()
    eg = gram_rows(ents, [entity_id_col, entity_name_col], entity_name_col, k)

    if max_gram_df is not None:
        banned = banned_grams(eg, max_gram_df)
        # entity-side census: tiny by construction (only hot grams) ->
        # broadcast both anti-joins; neither big side shuffles here.
        mg = mg.join(F.broadcast(banned), "_gram", "left_anti")
        eg = eg.join(F.broadcast(banned), "_gram", "left_anti")

    n_m = mg.groupBy(mention_col).agg(F.count("*").alias("_n_m"))
    n_e = eg.groupBy(entity_id_col, entity_name_col).agg(
        F.count("*").alias("_n_e")
    )

    eg_join = F.broadcast(eg) if broadcast_entities else eg
    shared = (
        mg.join(eg_join, "_gram")
        .groupBy(mention_col, entity_id_col, entity_name_col)
        .agg(F.count("*").alias("_shared"))
    )

    n_e_join = F.broadcast(n_e) if broadcast_entities else n_e
    scored = (
        shared.join(n_e_join, [entity_id_col, entity_name_col])
        .join(n_m, mention_col)
        .withColumn(
            "_score_ppm",
            F.expr(
                "(CAST(1000000 AS BIGINT) * _shared) div (_n_m + _n_e - _shared)"
            ),
        )
        .filter(F.col("_score_ppm") >= min_score_ppm)
    )

    best = (
        scored.groupBy(mention_col)
        .agg(
            F.max(
                F.struct(
                    F.col("_score_ppm"),
                    (-F.col(entity_id_col)).alias("_neg_eid"),
                    F.col(entity_name_col),
                    F.col("_shared"),
                )
            ).alias("_best")
        )
        .select(
            mention_col,
            (-F.col(f"_best._neg_eid")).alias(entity_id_col),
            F.col(f"_best.{entity_name_col}").alias(entity_name_col),
            F.col("_best._score_ppm").alias("score_ppm"),
            F.col("_best._shared").alias("shared"),
        )
    )
    return best


def refresh_links(
    surfaces: DataFrame,
    new_surfaces: DataFrame,
    prior_links: DataFrame,
    prior_entities: DataFrame,
    entities: DataFrame,
    mention_col: str = "surface",
    entity_id_col: str = "entity_id",
    entity_name_col: str = "name",
    k: int = 2,
    max_gram_df: int | None = None,
    min_score_ppm: int = 0,
    broadcast_entities: bool = True,
    stats_out: dict | None = None,
) -> DataFrame:
    """Incrementally refresh a full link table after the canonical
    entity space changed — EXACTLY equal to relinking every surface
    from scratch, at O(touched) posting-join cost (VERDICT r7 item 3:
    the alias-refresh stage run_incremental's delta tail needs).

    Identity this rests on: link_mentions is PER-MENTION independent —
    a mention's result depends only on (a) its own grams, (b) the
    entity-side gram-df banned set, and (c) the candidate entities
    sharing an unbanned gram with it (their names and n_e). So a
    stored link row stays valid unless one of those inputs moved, and
    the set of surfaces any KB change can affect is computable from
    the KB DIFF alone:

      changed rows   (entity_id, name) pairs present in only one of
                     prior_entities / entities — adds, removes,
                     renames, cluster merges, multi-name shifts;
      flipped grams  grams whose banned status (df > max_gram_df)
                     differs between the two censuses — a flip changes
                     pruning (and n_e/n_m) for everything containing
                     the gram, so names containing a flipped gram
                     join the changed set;
      touch grams    every gram of every changed/flip-affected name
                     (old AND new side — a removed candidate could
                     have been the argmax), plus the flipped grams;
      touched        ``new_surfaces`` plus every surface sharing a
                     touch gram.

    An untouched surface shares no gram with any changed name, so its
    candidate set, every candidate's n_e, its own n_m, and every
    pairwise score are unchanged — its stored row is carried forward
    verbatim; touched surfaces relink against the NEW entity table
    (including surfaces that now score below ``min_score_ppm``: their
    stale rows drop because carry-forward anti-joins on touched).
    Equality with the full relink is pinned by pytest (constructed
    adds/removes/renames/df-flips + hypothesis sweep) and the
    ``incremental_link`` driver row.

    Scale shape (100 TB): the KB diff, banned censuses and touch-gram
    set are KB-churn-sized and broadcast; the only corpus-sized work is
    one gram projection of the distinct-surface set filtered map-side
    against the broadcast touch grams (no corpus shuffle) and the
    output-sized anti-join/union — the posting-list join, the stage
    that dominates a full relink, runs over touched surfaces only.

    ``surfaces``/``new_surfaces``: distinct surface strings (all, and
    the ones new since ``prior_links`` was computed). ``prior_links``
    must be the link_mentions output (same param set) against
    ``prior_entities``. Returns the refreshed full link table in
    link_mentions' output shape."""
    ents_old = prior_entities.select(entity_id_col, entity_name_col).distinct()
    ents_new = entities.select(entity_id_col, entity_name_col).distinct()

    changed_names = (
        ents_old.subtract(ents_new)
        .select(entity_name_col)
        .unionByName(ents_new.subtract(ents_old).select(entity_name_col))
        .distinct()
    )

    flipped = None
    if max_gram_df is not None:

        def _banned(ents: DataFrame) -> DataFrame:
            # the linker's own census rule (banned_grams) — forked
            # definitions would silently desynchronize flip detection
            return banned_grams(
                gram_rows(
                    ents, [entity_id_col, entity_name_col],
                    entity_name_col, k,
                ),
                max_gram_df,
            )

        b_old, b_new = _banned(ents_old), _banned(ents_new)
        flipped = (
            b_old.subtract(b_new).unionByName(b_new.subtract(b_old))
        )
        # names whose own gram set crosses a flipped gram: their n_e
        # (and their candidates' scores) changed even if the name didn't
        all_names = (
            ents_old.select(entity_name_col)
            .unionByName(ents_new.select(entity_name_col))
            .distinct()
        )
        affected = (
            gram_rows(all_names, [entity_name_col], entity_name_col, k)
            .join(F.broadcast(flipped), "_gram")
            .select(entity_name_col)
            .distinct()
        )
        changed_names = changed_names.unionByName(affected).distinct()

    if stats_out is not None:
        # KB-churn-sized; checkpoint before the counts below AND the
        # touch-gram derivation so the stats path doesn't re-run the
        # full-KB censuses per count (review finding r8)
        changed_names = changed_names.localCheckpoint()
        if flipped is not None:
            flipped = flipped.localCheckpoint()

    # Steady-state early exit: most crawl increments add pages without
    # moving the canonical space at all (no rep renamed, no df flip).
    # The touch-gram set is then EMPTY and the corpus-wide gram scan
    # below would provably select nothing — skip it and relink only the
    # new surfaces. The emptiness probes run on the KB-diff-sized
    # frames (limit(1) short-circuits), not the corpus.
    kb_churned = changed_names.limit(1).count() > 0 or (
        flipped is not None and flipped.limit(1).count() > 0
    )
    if kb_churned:
        touch = gram_rows(
            changed_names, [entity_name_col], entity_name_col, k
        ).select("_gram")
        if flipped is not None:
            touch = touch.unionByName(flipped)
        touch = touch.distinct()

        all_s = surfaces.select(mention_col).distinct()
        touched_by_gram = (
            gram_rows(all_s, [mention_col], mention_col, k)
            .join(F.broadcast(touch), "_gram")
            .select(mention_col)
            .distinct()
        )
        touched = new_surfaces.select(mention_col).unionByName(
            touched_by_gram
        )
    else:
        touched = new_surfaces.select(mention_col)
    # consumed 3x below (2x inside link_mentions + the anti-join)
    touched = touched.distinct().localCheckpoint()
    if stats_out is not None:
        # cost evidence for the O(touched) claim — every counted frame
        # was checkpointed above (the e2e test pins these)
        stats_out["n_touched"] = touched.count()
        stats_out["n_changed_names"] = changed_names.count()
        stats_out["n_flipped_grams"] = (
            flipped.count() if flipped is not None else 0
        )

    relinked = link_mentions(
        touched,
        ents_new,
        mention_col=mention_col,
        entity_id_col=entity_id_col,
        entity_name_col=entity_name_col,
        k=k,
        max_gram_df=max_gram_df,
        min_score_ppm=min_score_ppm,
        broadcast_entities=broadcast_entities,
    )
    carried = prior_links.join(touched, mention_col, "left_anti")
    return carried.unionByName(relinked)
