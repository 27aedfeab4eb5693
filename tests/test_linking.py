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
