"""Unit tests for operators/linking.py (entity linking).

Hand-computed gram sets pin the exact ppm scores; the driver-grain
query/oracle compare lives in test_entry_contract.py (entity_link).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from zh_ner_tf_spark.operators.linking import link_mentions


def _mentions(spark, surfaces):
    return spark.createDataFrame([(s,) for s in surfaces], "surface string")


def _entities(spark, rows):
    return spark.createDataFrame(rows, "entity_id long, name string")


def test_hand_computed_score(spark):
    """'newyork' vs 'new york': name grams {ne,ew,w_, _y,yo,or,rk}=7,
    surface grams {ne,ew,wy,yo,or,rk}=6, shared {ne,ew,yo,or,rk}=5,
    union 8 -> (1e6*5) div 8 = 625000."""
    got = link_mentions(
        _mentions(spark, ["newyork"]),
        _entities(spark, [(7, "new york")]),
    ).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["surface"], r["entity_id"], r["name"]) == ("newyork", 7, "new york")
    assert (r["score_ppm"], r["shared"]) == (625000, 5)


def test_min_score_threshold_drops_mention(spark):
    """A mention with no candidate at/above the threshold is absent
    (no-link), not emitted with a low score."""
    got = link_mentions(
        _mentions(spark, ["newyork", "zzzz"]),
        _entities(spark, [(7, "new york")]),
        min_score_ppm=300_000,
    ).collect()
    assert [r["surface"] for r in got] == ["newyork"]
    # 'zzzz' shares zero grams -> no candidate row at all, either way
    got_all = link_mentions(
        _mentions(spark, ["zzzz"]), _entities(spark, [(7, "new york")])
    ).collect()
    assert got_all == []


def test_tie_breaks_on_min_entity_id(spark):
    """Identical names under two entity ids score identically; the link
    goes to the smaller entity_id, deterministically."""
    for flip in (False, True):
        rows = [(5, "new york"), (9, "new york")]
        if flip:
            rows = rows[::-1]
        got = link_mentions(
            _mentions(spark, ["newyork"]), _entities(spark, rows)
        ).collect()
        assert len(got) == 1 and got[0]["entity_id"] == 5


def test_argmax_picks_best_score(spark):
    """'newyork' scores higher vs 'new york' (625000) than vs
    'new yorker' (shared 5 of name-grams 9 union 10 -> 500000)."""
    got = link_mentions(
        _mentions(spark, ["newyork"]),
        _entities(spark, [(1, "new yorker"), (2, "new york")]),
    ).collect()
    assert len(got) == 1 and got[0]["entity_id"] == 2
    assert got[0]["score_ppm"] == 625000


def test_gram_df_pruning_bans_hot_grams_from_both_sides(spark):
    """With max_gram_df=1, the gram 'ab' (entity df 2) is banned: the
    mention 'ab' loses its only gram and cannot link; without pruning it
    links perfectly to one of the 'ab...'-sharing entities' gram space.
    Jaccard is computed over the PRUNED space on both sides."""
    ents = _entities(spark, [(1, "abc"), (2, "abd")])
    unpruned = link_mentions(_mentions(spark, ["ab"]), ents).collect()
    # 'ab' grams {ab}; vs 'abc' {ab,bc}: shared 1, union 2 -> 500000;
    # tie with 'abd' -> entity 1
    assert len(unpruned) == 1
    assert unpruned[0]["entity_id"] == 1 and unpruned[0]["score_ppm"] == 500000
    pruned = link_mentions(
        _mentions(spark, ["ab"]), ents, max_gram_df=1
    ).collect()
    assert pruned == []
    # a mention keeping un-banned grams still links, scored over the
    # pruned space: 'abc' pruned grams {bc}; mention 'bc' grams {bc}
    # -> shared 1, union 1 -> 1000000 (perfect over pruned space)
    kept = link_mentions(
        _mentions(spark, ["bc"]), ents, max_gram_df=1
    ).collect()
    assert len(kept) == 1
    assert kept[0]["entity_id"] == 1 and kept[0]["score_ppm"] == 1000000


def test_mentions_deduplicated_on_surface(spark):
    """Duplicate mention rows link once (the operator keys on the
    distinct surface)."""
    got = link_mentions(
        _mentions(spark, ["newyork", "newyork", "newyork"]),
        _entities(spark, [(7, "new york")]),
    ).collect()
    assert len(got) == 1


def test_shuffle_join_path_matches_broadcast_path(spark):
    """broadcast_entities=False (KB too large to broadcast) returns the
    identical link table."""
    men = _mentions(spark, ["newyork", "bigdata", "zz"])
    ents = _entities(spark, [(1, "new york"), (2, "big data"), (3, "old york")])
    a = sorted(map(tuple, link_mentions(men, ents).collect()))
    b = sorted(map(tuple, link_mentions(
        men, ents, broadcast_entities=False).collect()))
    assert a == b and len(a) == 2


def test_reserved_working_columns_raise(spark):
    men = _mentions(spark, ["ab"]).withColumn("_gram", F.lit(1))
    with pytest.raises(ValueError, match="_gram"):
        link_mentions(men, _entities(spark, [(1, "ab")]))


# ---------------------------------------------------------------------------
# integration: linking consumes the pipeline's canonical entity table
# ---------------------------------------------------------------------------

_P = 2147483647


def _ph(s: str) -> int:
    a = 0
    for c in s:
        a = (a * 31 + ord(c)) % _P
    return a


def _py_grams(s: str, k: int = 2) -> set[int]:
    subs = [s] if len(s) < k else [s[i:i + k] for i in range(len(s) - k + 1)]
    return {_ph(x) for x in subs}


def _py_link(surfaces, entities, k=2, max_gram_df=None, min_score_ppm=0):
    """Sequential replica of link_mentions (oracle/numpy_ref philosophy:
    row-at-a-time, shares no code with the distributed path)."""
    eg = {(eid, name): _py_grams(name, k) for eid, name in entities}
    banned: set[int] = set()
    if max_gram_df is not None:
        from collections import Counter

        df = Counter(g for gs in eg.values() for g in gs)
        banned = {g for g, c in df.items() if c > max_gram_df}
        eg = {key: gs - banned for key, gs in eg.items()}
    out = []
    for s in sorted(set(surfaces)):
        gs = _py_grams(s, k) - banned
        best, best_key = None, None
        for (eid, name), egs in eg.items():
            shared = len(gs & egs)
            if shared == 0:
                continue
            ppm = (1_000_000 * shared) // (len(gs) + len(egs) - shared)
            if ppm < min_score_ppm:
                continue
            key = (ppm, -eid, name)
            if best_key is None or key > best_key:
                best_key, best = key, (s, eid, name, ppm, shared)
        if best is not None:
            out.append(best)
    return sorted(out)


def test_linking_consumes_pipeline_canonical_entities(spark):
    """Close the north-rule loop: NER-shaped mentions -> blocking + CC
    canonicalization (graph_from_mentions) -> canonical reps -> LINK
    run-together variant surfaces back into the canonical space. The
    distributed operator must match a sequential pure-Python replica
    exactly on real pipeline output."""
    from zh_ner_tf_spark.pipeline import graph_from_mentions

    occurrences = (
        [("alpha corp", "ORG")] * 5
        + [("alpha corps", "ORG")] * 2      # near-dup, same CC cluster
        + [("beta industries", "ORG")] * 4
        + [("gamma labs", "ORG")] * 3
        + [("john smith", "PER")] * 4
        + [("jon smith", "PER")] * 2        # near-dup person
    )
    mentions = spark.createDataFrame(occurrences, "mention string, etype string")
    triples = spark.createDataFrame([], "subj string, pred string, obj string")
    nodes, _ = graph_from_mentions(mentions, triples)

    # canonical representative per cluster: highest freq, ties to the
    # lexicographically larger surface (max(struct) — deterministic)
    reps = (
        nodes.groupBy("canon_id")
        .agg(F.max(F.struct("freq", "surface")).alias("_b"))
        .select(
            F.col("canon_id").alias("entity_id"),
            F.col("_b.surface").alias("name"),
        )
        .localCheckpoint()
    )
    rep_rows = [(r["entity_id"], r["name"]) for r in reps.collect()]
    assert len(rep_rows) >= 3  # clusters actually formed

    # link the run-together crawl variants of EVERY node surface
    surf_rows = [r["surface"] for r in nodes.select("surface").collect()]
    link_surfaces = sorted({s.replace(" ", "") for s in surf_rows})
    got = link_mentions(
        _mentions(spark, link_surfaces),
        reps,
        min_score_ppm=300_000,
    ).collect()
    got_t = sorted(
        (r["surface"], r["entity_id"], r["name"], r["score_ppm"], r["shared"])
        for r in got
    )
    want = _py_link(link_surfaces, rep_rows, min_score_ppm=300_000)
    assert got_t == want
    # and the linking is useful: every variant resolved somewhere
    assert len(got_t) == len(link_surfaces)


def test_duplicate_entity_rows_do_not_inflate_scores(spark):
    """A duplicated KB row must not double its grams through the df
    census / _n_e / _shared: 'newyork' vs a twice-listed 'new york'
    still scores 625000, not a silently inflated 1000000."""
    got = link_mentions(
        _mentions(spark, ["newyork"]),
        _entities(spark, [(7, "new york"), (7, "new york")]),
    ).collect()
    assert len(got) == 1
    assert (got[0]["score_ppm"], got[0]["shared"]) == (625000, 5)


# ---------------------------------------------------------------- properties

from hypothesis import given, settings
from hypothesis import strategies as st

_surf = st.text(alphabet="ab ü", min_size=1, max_size=6)


@settings(max_examples=10, deadline=None)
@given(
    men=st.lists(_surf, min_size=1, max_size=8),
    ents=st.lists(
        st.tuples(st.integers(1, 5), _surf), min_size=1, max_size=6
    ),
    maxdf=st.one_of(st.none(), st.integers(1, 3)),
    thr=st.sampled_from([0, 300_000, 700_000]),
)
def test_property_link_matches_sequential_replica(spark, men, ents, maxdf, thr):
    """For ANY surface/KB sets (spaces, repeats, non-ASCII, id
    collisions with distinct names), any df-pruning threshold and any
    score floor, the distributed operator equals the sequential
    replica exactly."""
    got = link_mentions(
        _mentions(spark, men),
        _entities(spark, ents),
        max_gram_df=maxdf,
        min_score_ppm=thr,
    ).collect()
    got_t = sorted(
        (r["surface"], r["entity_id"], r["name"], r["score_ppm"], r["shared"])
        for r in got
    )
    want = _py_link(men, ents, max_gram_df=maxdf, min_score_ppm=thr)
    assert got_t == want


def test_link_surfaces_to_published_graph(spark, tmp_path):
    """Alias resolution end-to-end through the REAL publish path:
    graph_from_mentions -> materialize_graph (snapshot+lineage sink) ->
    link_surfaces_to_graph reads the committed snapshot, builds cluster
    reps, and links variant surfaces — exactly matching the sequential
    replica run on the same reps. Time travel: etype filtering works
    and an unpublished root raises."""
    import pytest as _pytest

    from zh_ner_tf_spark.pipeline import (
        graph_from_mentions,
        link_surfaces_to_graph,
        materialize_graph,
    )

    occurrences = (
        [("alpha corp", "ORG")] * 5
        + [("alpha corps", "ORG")] * 2
        + [("beta industries", "ORG")] * 4
        + [("john smith", "PER")] * 3
    )
    mentions = spark.createDataFrame(occurrences, "mention string, etype string")
    triples = spark.createDataFrame([], "subj string, pred string, obj string")
    nodes, edges = graph_from_mentions(mentions, triples)
    root = str(tmp_path / "graph")
    materialize_graph(spark, {"nodes": nodes, "edges": edges}, root, n_buckets=2)

    variants = ["alphacorp", "beta industrie", "jon smith", "zzzz"]
    got = link_surfaces_to_graph(
        spark, root, _mentions(spark, variants), min_score_ppm=300_000
    ).collect()
    got_t = sorted(
        (r["surface"], r["canon_id"], r["canon_name"], r["score_ppm"], r["shared"])
        for r in got
    )
    reps = (
        nodes.groupBy("canon_id")
        .agg(F.max(F.struct("freq", "surface")).alias("_b"))
        .select("canon_id", F.col("_b.surface").alias("name"))
        .collect()
    )
    want = _py_link(
        variants, [(r["canon_id"], r["name"]) for r in reps],
        min_score_ppm=300_000,
    )
    assert got_t == want
    assert {r["surface"] for r in got} >= {"alphacorp", "beta industrie"}
    assert "zzzz" not in {r["surface"] for r in got}

    # etype scoping: PER-only KB cannot resolve the ORG variants
    per_only = link_surfaces_to_graph(
        spark, root, _mentions(spark, variants),
        etypes=("PER",), min_score_ppm=300_000,
    ).collect()
    assert {r["canon_name"] for r in per_only} <= {"john smith"}

    with _pytest.raises(FileNotFoundError):
        link_surfaces_to_graph(
            spark, str(tmp_path / "nowhere"), _mentions(spark, variants)
        )


def test_string_entity_ids_rejected_up_front(spark):
    """ADVICE r7: the min-id tie-break negates entity_id inside
    max(struct); a string-id KB must fail with the documented contract,
    not an analysis-time cast error."""
    men = spark.createDataFrame([("abc",)], "surface STRING")
    ents = spark.createDataFrame(
        [("E1", "abc")], "entity_id STRING, name STRING"
    )
    with pytest.raises(ValueError, match="numeric"):
        link_mentions(men, ents)


# ------------------------------------------------- incremental refresh
def _link_rows(df):
    return sorted(
        (r["surface"], r["entity_id"], r["name"], r["score_ppm"], r["shared"])
        for r in df.collect()
    )


def _check_refresh(spark, all_surfs, new_surfs, old_ents, new_ents,
                   maxdf=None, thr=0):
    """refresh_links over (prior links vs old KB) must equal a full
    link_mentions relink of every surface against the new KB."""
    from zh_ner_tf_spark.operators.linking import refresh_links

    old_surfs = [s for s in all_surfs if s not in set(new_surfs)]
    prior = link_mentions(
        _mentions(spark, old_surfs), _entities(spark, old_ents),
        max_gram_df=maxdf, min_score_ppm=thr,
    )
    stats = {}
    got = refresh_links(
        _mentions(spark, all_surfs),
        _mentions(spark, new_surfs),
        prior,
        _entities(spark, old_ents),
        _entities(spark, new_ents),
        max_gram_df=maxdf,
        min_score_ppm=thr,
        stats_out=stats,
    )
    want = link_mentions(
        _mentions(spark, all_surfs), _entities(spark, new_ents),
        max_gram_df=maxdf, min_score_ppm=thr,
    )
    assert _link_rows(got) == _link_rows(want)
    return stats


def test_refresh_links_entity_added(spark):
    """A new KB entity: the new surface links to it, and an OLD surface
    sharing grams with the new name relinks too (its argmax may move)."""
    stats = _check_refresh(
        spark,
        all_surfs=["alphacorp", "betainc", "gammallc"],
        new_surfs=["betainc"],
        old_ents=[(1, "alpha corp"), (3, "gamma llc")],
        new_ents=[(1, "alpha corp"), (2, "beta inc"), (3, "gamma llc")],
        thr=300_000,
    )
    assert stats["n_changed_names"] == 1


def test_refresh_links_entity_removed_and_renamed(spark):
    """No new surfaces at all: removals must DROP stale link rows and a
    rename must rescore its gram-neighborhood — pure KB churn."""
    stats = _check_refresh(
        spark,
        all_surfs=["alphacorp", "betainc", "gammallc", "zzzz"],
        new_surfs=[],
        old_ents=[(1, "alpha corp"), (2, "beta inc"), (3, "gamma llc")],
        new_ents=[(1, "alpha corporation"), (3, "gamma llc")],
        thr=200_000,
    )
    # the unrelated surface shares no gram with any changed name
    assert stats["n_touched"] < 4


def test_refresh_links_banned_gram_flip(spark):
    """A KB addition pushes a gram's entity-df over max_gram_df: its
    banned status flips, changing n_e for UNCHANGED entities containing
    it — surfaces sharing that gram must relink even though none of
    their candidates was added/removed/renamed."""
    stats = _check_refresh(
        spark,
        all_surfs=["abz", "abq", "qqqq"],
        new_surfs=[],
        old_ents=[(1, "abc"), (2, "abd")],
        new_ents=[(1, "abc"), (2, "abd"), (3, "abe")],
        maxdf=2,
    )
    assert stats["n_flipped_grams"] >= 1
    # both ab-surfaces touched; the unrelated one carried forward
    assert stats["n_touched"] >= 2


def test_refresh_links_untouched_carry_forward_is_cheap(spark):
    """The O(touched) claim: a localized KB change leaves unrelated
    surfaces out of the posting join entirely."""
    surfs = [f"zz{i}zz" for i in range(10)] + ["alphacorp"]
    stats = _check_refresh(
        spark,
        all_surfs=surfs,
        new_surfs=[],
        old_ents=[(1, "alpha corp")],
        new_ents=[(1, "alpha corps")],
        thr=100_000,
    )
    assert stats["n_touched"] == 1  # only the alpha surface


@settings(max_examples=8, deadline=None)
@given(
    surfs=st.lists(_surf, min_size=1, max_size=8, unique=True),
    n_new=st.integers(0, 3),
    old_ents=st.lists(
        st.tuples(st.integers(1, 5), _surf), min_size=0, max_size=5
    ),
    new_ents=st.lists(
        st.tuples(st.integers(1, 5), _surf), min_size=0, max_size=5
    ),
    maxdf=st.one_of(st.none(), st.integers(1, 3)),
    thr=st.sampled_from([0, 300_000]),
)
def test_property_refresh_links_equals_full_relink(
    spark, surfs, n_new, old_ents, new_ents, maxdf, thr
):
    """For ANY old/new KB pair (adds, removes, renames, id collisions,
    df flips in either direction, empty sides) and any corpus split,
    the incremental refresh equals the full relink exactly."""
    new = surfs[: min(n_new, len(surfs))]
    _check_refresh(spark, surfs, new, old_ents, new_ents, maxdf, thr)


def test_refresh_links_unchanged_kb_touches_only_new_surfaces(spark):
    """Steady-state increment (KB identical old vs new): the refresh
    must relink EXACTLY the new surfaces — the corpus-wide gram scan is
    skipped, untouched rows carry forward — and still equal the full
    relink."""
    stats = _check_refresh(
        spark,
        all_surfs=["alphacorp", "betainc", "gammallc", "newsurface"],
        new_surfs=["newsurface"],
        old_ents=[(1, "alpha corp"), (2, "beta inc")],
        new_ents=[(1, "alpha corp"), (2, "beta inc")],
        maxdf=5,
        thr=100_000,
    )
    assert stats["n_touched"] == 1
    assert stats["n_changed_names"] == 0
    assert stats["n_flipped_grams"] == 0
