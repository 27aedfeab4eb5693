"""Relational operator gates: window-form BIO spans vs oracle, vocab
first-seen order, eval align + conlleval-equivalent P/R/F1 vs the
pure-Python port (including the reference 0-quirk encodings)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from zh_ner_tf_spark.config import PAD_TOKEN, UNK_TOKEN
from zh_ner_tf_spark.fixtures.corpus import gen_ner_corpus
from zh_ner_tf_spark.operators.evaluation import (
    align_tags,
    conlleval_prf1,
    token_accuracy,
)
from zh_ner_tf_spark.operators.sentences import split_sentences, tokenize
from zh_ner_tf_spark.operators.spans import extract_spans
from zh_ner_tf_spark.operators.vocab import build_vocab, vocab_to_dict
from zh_ner_tf_spark.oracle import conlleval_metrics, get_entities, normalize_token


def _exploded_df(spark, corpus, tag_source="gold"):
    rows = []
    for i, (chars, tags) in enumerate(corpus):
        for pos, (ch, tag) in enumerate(zip(chars, tags)):
            rows.append((i, pos, tag, ch))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "pos", "tag", "ch"])
    )


def test_window_spans_match_oracle(spark):
    corpus = gen_ner_corpus(150, seed=42)
    df = _exploded_df(spark, corpus)
    got = {
        (r["doc_id"], r["mention"], r["etype"], r["begin"], r["end"])
        for r in extract_spans(df, ["doc_id"]).collect()
    }
    want = set()
    for i, (chars, tags) in enumerate(corpus):
        for m, t, b, e in get_entities(tags, chars):
            want.add((i, m, t, b, e))
    assert got == want


def test_window_spans_dangling_i_quirk(spark):
    # Quarantined quirk fixture: dangling I-X must OPEN a span (pinned
    # semantics for the reference's UnboundLocalError crash).
    chars = list("abcdef")
    tags = ["I-PER", "I-PER", "O", "I-LOC", "B-LOC", "I-ORG"]
    df = _exploded_df(spark, [(chars, tags)])
    got = {
        (r["mention"], r["etype"], r["begin"], r["end"])
        for r in extract_spans(df, ["doc_id"]).collect()
    }
    want = {(m, t, b, e) for m, t, b, e in get_entities(tags, chars)}
    assert got == want == {
        ("ab", "PER", 0, 1), ("d", "LOC", 3, 3), ("e", "LOC", 4, 4),
        ("f", "ORG", 5, 5),
    }


def test_vocab_build_first_seen_order(spark):
    corpus = gen_ner_corpus(60, seed=42)
    rows = []
    gpos = 0
    for i, (chars, _) in enumerate(corpus):
        for ch in chars:
            rows.append((ch, gpos))
            gpos += 1
    tokens = spark.createDataFrame(pd.DataFrame(rows, columns=["token", "gpos"]))
    vocab = vocab_to_dict(build_vocab(tokens, min_count=1))

    # oracle: first-seen insertion order over normalized stream
    want: dict[str, int] = {}
    for tok, _ in rows:
        t = normalize_token(tok)
        if t not in want:
            want[t] = len(want) + 1
    want[UNK_TOKEN] = len(want) + 1
    want[PAD_TOKEN] = 0
    assert vocab == want


def test_vocab_min_count_keeps_reserved(spark):
    tokens = spark.createDataFrame(
        pd.DataFrame(
            {"token": ["中", "中", "9", "X", "丁"], "gpos": [0, 1, 2, 3, 4]}
        )
    )
    v = vocab_to_dict(build_vocab(tokens, min_count=2))
    # 中 (count 2) kept; <NUM>/<ENG> kept despite count 1; 丁 dropped.
    assert "中" in v and "<NUM>" in v and "<ENG>" in v and "丁" not in v
    assert v["中"] == 1 and v[PAD_TOKEN] == 0


def test_conlleval_prf1_matches_python_port(spark):
    corpus = gen_ner_corpus(120, seed=42)
    gold = [tags for _, tags in corpus]
    # synthetic predictions: perturb deterministically — shift tags of
    # every 3rd sentence, blank every 7th tag
    pred = []
    for i, tags in enumerate(gold):
        p = list(tags)
        if i % 3 == 0 and len(p) > 1:
            p = p[1:] + ["O"]
        p = [("O" if (j % 7 == 3) else t) for j, t in enumerate(p)]
        pred.append(p)

    want = conlleval_metrics(gold, pred)

    rows_g, rows_p = [], []
    for i, (chars, tags) in enumerate(corpus):
        for pos, (ch, t) in enumerate(zip(chars, tags)):
            rows_g.append((i, pos, t, ch))
        for pos, t in enumerate(pred[i]):
            rows_p.append((i, pos, t, chars[pos]))
    gdf = spark.createDataFrame(pd.DataFrame(rows_g, columns=["doc_id", "pos", "tag", "ch"]))
    pdf = spark.createDataFrame(pd.DataFrame(rows_p, columns=["doc_id", "pos", "tag", "ch"]))
    got = {r["etype"]: r.asDict() for r in conlleval_prf1(gdf, pdf, ["doc_id"]).collect()}

    for etype in ("PER", "LOC", "ORG", "__overall__"):
        assert got[etype]["guessed"] == want[etype]["guessed"]
        assert got[etype]["gold"] == want[etype]["gold"]
        assert got[etype]["correct"] == want[etype]["correct"]
        assert abs(got[etype]["precision"] - want[etype]["precision"]) < 1e-6
        assert abs(got[etype]["recall"] - want[etype]["recall"]) < 1e-6
        assert abs(got[etype]["f1"] - want[etype]["f1"]) < 1e-6


def test_align_and_token_accuracy(spark):
    corpus = gen_ner_corpus(40, seed=42)
    gold_rows = [
        (i, chars, tags) for i, (chars, tags) in enumerate(corpus)
    ]
    pred_rows = [
        (i, ["O"] * len(tags)) for i, (_, tags) in enumerate(corpus)
    ]
    g = spark.createDataFrame(gold_rows, "doc_id int, chars array<string>, tags array<string>")
    p = spark.createDataFrame(pred_rows, "doc_id int, tags array<string>")
    aligned = align_tags(g, p, ["doc_id"])
    n_total = sum(len(t) for _, t in corpus)
    n_o = sum(1 for _, tags in corpus for t in tags if t == "O")
    row = token_accuracy(aligned).collect()[0]
    assert row["n_tokens"] == n_total
    assert row["n_correct"] == n_o
    assert abs(row["accuracy"] - round(n_o / n_total, 6)) < 1e-9


def test_sentence_split_and_tokenize(spark):
    df = spark.createDataFrame(
        [(1, "你好。世界！abc?  x  y .."), (2, ""), (3, "nodelim")],
        "doc_id int, text string",
    )
    sents = {
        (r["doc_id"], r["sent_id"], r["sentence"])
        for r in split_sentences(df, "text", ["doc_id"]).collect()
    }
    assert sents == {
        (1, 0, "你好"), (1, 1, "世界"), (1, 2, "abc"), (1, 3, "x  y"),
        (3, 0, "nodelim"),
    }
    toks = {
        (r["doc_id"], r["pos"], r["token"])
        for r in tokenize(
            spark.createDataFrame([(1, "a  b c")], "doc_id int, text string")
        ).collect()
    }
    assert toks == {(1, 0, "a"), (1, 1, "b"), (1, 2, "c")}


def test_asof_join_semantics(spark):
    """Ties (right row AT left ts matches), no-match rows (dropped on
    inner, null on left), and most-recent-wins."""
    import datetime as dt

    import pandas as pd
    from pyspark.sql import functions as F

    from zh_ner_tf_spark.operators.asof import asof_join

    T = lambda s: dt.datetime.fromisoformat(s)  # noqa: E731
    left = spark.createDataFrame(
        pd.DataFrame(
            [
                (1, T("2024-01-01 10:00"), "a"),   # ts == right ts: matches r2
                (1, T("2024-01-01 11:30"), "b"),   # between r2 and r3 -> r2
                (1, T("2024-01-02 00:00"), "c"),   # after r3 -> r3
                (2, T("2024-01-01 05:00"), "d"),   # before any right -> none
                (3, T("2024-01-01 12:00"), "e"),   # key with no right rows
            ],
            columns=["k", "ts", "tag"],
        )
    )
    right = spark.createDataFrame(
        pd.DataFrame(
            [
                (1, T("2024-01-01 09:00"), 100),
                (1, T("2024-01-01 10:00"), 200),
                (1, T("2024-01-01 12:00"), 300),
                (2, T("2024-01-01 06:00"), 400),
            ],
            columns=["k", "rts", "val"],
        )
    )
    inner = {
        r["tag"]: r["val"]
        for r in asof_join(left, right, "k", "ts", "rts").collect()
    }
    assert inner == {"a": 200, "b": 200, "c": 300}
    outer = {
        r["tag"]: r["val"]
        for r in asof_join(left, right, "k", "ts", "rts", how="left").collect()
    }
    assert outer == {"a": 200, "b": 200, "c": 300, "d": None, "e": None}


def test_asof_join_null_right_payload_is_row_atomic(spark):
    """A right row whose payload value is legitimately NULL must still
    win the as-of match as a WHOLE row — the fill must never stitch the
    null column from an older right row (native ASOF semantics)."""
    import datetime as dt

    from zh_ner_tf_spark.operators.asof import asof_join

    T = lambda s: dt.datetime.fromisoformat(s)  # noqa: E731
    left = spark.createDataFrame(
        [(1, T("2024-01-01 12:00"), "x")], "k int, ts timestamp, tag string"
    )
    # newest right row has val=NULL but note='new'; older row has both set.
    right = spark.createDataFrame(
        [
            (1, T("2024-01-01 09:00"), 100, "old"),
            (1, T("2024-01-01 11:00"), None, "new"),
        ],
        "k int, rts timestamp, val int, note string",
    )
    rows = asof_join(left, right, "k", "ts", "rts").collect()
    assert len(rows) == 1
    r = rows[0]
    # the 11:00 row wins as a unit: val stays NULL, never back-fills 100
    assert r["note"] == "new" and r["val"] is None
    assert r["rts_matched"] == T("2024-01-01 11:00")


def test_asof_join_matches_pandas_merge_asof_on_random_data(spark):
    """Cross-oracle: our union+window as-of join == pandas.merge_asof
    (an independent, widely-used implementation of the same semantics:
    backward direction, exact matches allowed) on randomized keys/
    timestamps, including NULL right payloads."""
    import datetime as dt
    import random

    import pandas as pd

    from zh_ner_tf_spark.operators.asof import asof_join

    rng = random.Random(11)
    base = dt.datetime(2024, 1, 1)
    left_rows = [
        (rng.randint(1, 6), base + dt.timedelta(minutes=rng.randint(0, 500)), i)
        for i in range(200)
    ]
    seen = set()
    right_rows = []
    for _ in range(120):
        k = rng.randint(1, 6)
        ts = base + dt.timedelta(minutes=rng.randint(0, 500))
        if (k, ts) in seen:          # operator requires unique (key, ts)
            continue
        seen.add((k, ts))
        val = None if rng.random() < 0.3 else rng.randint(0, 999)
        right_rows.append((k, ts, val))
    lpdf = pd.DataFrame(left_rows, columns=["k", "ts", "row_id"])
    rpdf = pd.DataFrame(right_rows, columns=["k", "rts", "val"]).astype(
        {"val": "object"}
    )
    left = spark.createDataFrame(lpdf)
    right = spark.createDataFrame(
        [(int(k), t, None if v is None else int(v)) for k, t, v in right_rows],
        "k bigint, rts timestamp, val bigint",
    )
    got = {
        r["row_id"]: (r["val"], r["rts_matched"])
        for r in asof_join(left, right, "k", "ts", "rts", how="left").collect()
    }
    want_pdf = pd.merge_asof(
        lpdf.sort_values("ts"),
        rpdf.sort_values("rts").rename(columns={"rts": "rts_matched"}),
        left_on="ts", right_on="rts_matched", by="k",
        direction="backward", allow_exact_matches=True,
    )
    want = {
        int(r.row_id): (
            None if pd.isna(r.val) else int(r.val),
            None if pd.isna(r.rts_matched) else r.rts_matched.to_pydatetime(),
        )
        for r in want_pdf.itertuples()
    }
    # NULL-val matched rows: pandas can't distinguish "no match" from a
    # matched NULL payload in the val column alone — rts_matched does.
    assert got == want


def test_conlleval_prf1_fused_equals_two_frame(spark):
    """The single-sort fused scorer (conlleval_prf1_fused) must equal
    the two-frame operator row-for-row — including the BIO edge shapes
    that stress the boundary expression: I- starts without B-, type
    changes mid-run, O gaps, spans at sequence edges, and docs whose
    gold/pred disagree on span EXTENT but not start."""
    from zh_ner_tf_spark.operators.evaluation import conlleval_prf1_fused

    corpus = gen_ner_corpus(80, seed=9)
    gold = [tags for _, tags in corpus]
    pred = []
    for i, tags in enumerate(gold):
        p = list(tags)
        if i % 2 == 0 and len(p) > 1:
            p = p[1:] + ["O"]            # shift: extent mismatches
        if i % 5 == 0:
            p = [t.replace("B-", "I-") for t in p]   # I- starts
        p = [("O" if (j % 6 == 4) else t) for j, t in enumerate(p)]
        pred.append(p)

    rows_g, rows_p, rows_b = [], [], []
    for i, (chars, tags) in enumerate(corpus):
        for pos, (ch, t) in enumerate(zip(chars, tags)):
            rows_g.append((i, pos, t, ch))
            rows_p.append((i, pos, pred[i][pos], ch))
            rows_b.append((i, pos, t, pred[i][pos]))
    gdf = spark.createDataFrame(
        pd.DataFrame(rows_g, columns=["doc_id", "pos", "tag", "ch"])
    )
    pdf = spark.createDataFrame(
        pd.DataFrame(rows_p, columns=["doc_id", "pos", "tag", "ch"])
    )
    bdf = spark.createDataFrame(
        pd.DataFrame(rows_b, columns=["doc_id", "pos", "gold_tag", "pred_tag"])
    )
    want = sorted(
        map(tuple, conlleval_prf1(gdf, pdf, ["doc_id"]).collect())
    )
    got = sorted(
        map(tuple, conlleval_prf1_fused(bdf, ["doc_id"]).collect())
    )
    assert got == want and len(got) >= 4
