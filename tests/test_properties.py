"""Property-based gates (hypothesis): the invariants that make the
distributed engine safe under ANY partitioning get fuzzed here, plus the
reference 0-quirk parity layer (SURVEY.md §5.2 layer 4)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from zh_ner_tf_spark.config import LABEL2TAG, NUM_TAGS
from zh_ner_tf_spark.operators.tagger import (
    _reverse_sequence,
    batch_logits,
    spans_from_labels,
    viterbi_batch,
)
from zh_ner_tf_spark.oracle import (
    conlleval_metrics,
    get_entities,
    normalize_eval_quirks,
    viterbi_decode,
)

TAGS = list(LABEL2TAG.values())


# ---------------------------------------------------------------- strategies
tag_seq = st.lists(st.sampled_from(TAGS), min_size=1, max_size=25)
lens_strategy = st.lists(st.integers(1, 12), min_size=1, max_size=8)


@settings(max_examples=60, deadline=None)
@given(tag_seq)
def test_span_extraction_roundtrip_covers_every_entity_position(tags):
    chars = [chr(0x4E00 + i) for i in range(len(tags))]
    spans = get_entities(tags, chars)
    covered = set()
    for mention, etype, b, e in spans:
        assert 0 <= b <= e < len(tags)
        assert mention == "".join(chars[b: e + 1])
        for p in range(b, e + 1):
            assert p not in covered, "spans must not overlap"
            covered.add(p)
            assert tags[p] != "O"
    # every non-O position is inside exactly one span
    assert covered == {p for p, t in enumerate(tags) if t != "O"}


@settings(max_examples=40, deadline=None)
@given(tag_seq)
def test_vectorized_spans_match_oracle(tags):
    chars = [chr(0x4E00 + i) for i in range(len(tags))]
    from zh_ner_tf_spark.config import TAG2LABEL

    labels = np.array([[TAG2LABEL[t] for t in tags]], dtype=np.int32)
    lens = np.array([len(tags)])
    got = {
        (r.mention, r.etype, r.begin, r.end)
        for r in spans_from_labels(labels, lens, np.array(chars, object)).itertuples()
    }
    want = set(get_entities(tags, chars))
    assert got == want


@settings(max_examples=30, deadline=None)
@given(lens_strategy, st.integers(0, 2**31 - 1))
def test_batched_viterbi_matches_sequential(lens, seed):
    rng = np.random.RandomState(seed % (2**31 - 1))
    lens_arr = np.array(sorted(lens, reverse=True), dtype=np.int64)
    B, T = len(lens_arr), int(lens_arr.max())
    logits = rng.normal(size=(B, T, NUM_TAGS))
    trans = rng.normal(size=(NUM_TAGS, NUM_TAGS))
    batched = viterbi_batch(logits, lens_arr, trans)
    for b, n in enumerate(lens_arr):
        want = viterbi_decode(logits[b, :n], trans)
        assert list(batched[b, :n]) == want, (b, n)


@settings(max_examples=30, deadline=None)
@given(lens_strategy, st.integers(0, 2**31 - 1))
def test_reverse_sequence_is_involution(lens, seed):
    rng = np.random.RandomState(seed % (2**31 - 1))
    lens_arr = np.array(lens, dtype=np.int64)
    B, T = len(lens_arr), int(lens_arr.max())
    x = rng.normal(size=(B, T, 3))
    assert np.array_equal(_reverse_sequence(_reverse_sequence(x, lens_arr), lens_arr), x)


@settings(max_examples=15, deadline=None)
@given(lens_strategy, st.integers(0, 2**31 - 1))
def test_logits_padding_invariance(lens, seed):
    """The distribution-safety invariant: per-row logits must not depend
    on the other rows in the batch (what makes arbitrary Spark
    partitioning sound)."""
    rng = np.random.RandomState(seed % (2**31 - 1))
    from zh_ner_tf_spark.model.weights import init_weights

    W = init_weights(vocab_size=9, embedding_dim=4, hidden_dim=5,
                     seed=seed % 1000)
    lens_arr = np.array(sorted(lens, reverse=True), dtype=np.int64)
    B, T = len(lens_arr), int(lens_arr.max())
    ids = rng.randint(0, 9, size=(B, T))
    batched = batch_logits(ids, lens_arr, W)
    for b, n in enumerate(lens_arr):
        solo = batch_logits(ids[b: b + 1, :n], np.array([n]), W)
        assert np.allclose(batched[b, :n], solo[0], atol=1e-9), b


def test_conlleval_quirk_encodings_score_identically():
    # reference eval files encode gold 'O' as '0' and pred O as int 0 —
    # scores must equal the clean-string scoring after normalization
    gold_clean = [["B-PER", "I-PER", "O", "B-LOC"], ["O", "B-ORG"]]
    pred_clean = [["B-PER", "O", "O", "B-LOC"], ["B-ORG", "B-ORG"]]
    gold_quirk = [["B-PER", "I-PER", "0", "B-LOC"], ["0", "B-ORG"]]
    pred_quirk = [["B-PER", 0, 0, "B-LOC"], ["B-ORG", "B-ORG"]]
    want = conlleval_metrics(gold_clean, pred_clean)
    got = conlleval_metrics(
        [normalize_eval_quirks(g) for g in gold_quirk],
        [normalize_eval_quirks(p) for p in pred_quirk],
    )
    assert got == want


@given(
    st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=12), min_size=0, max_size=8
    ),
    st.integers(min_value=1, max_value=4),
)
@settings(max_examples=60, deadline=None)
def test_gram_hashes_numpy_matches_naive_python(parts, n):
    """The segmented-reduceat polynomial gram hash (dedup._gram_hashes_np)
    equals a naive per-char/per-token Python fold for arbitrary
    space-splittable text and any n."""
    from zh_ner_tf_spark.config import MINHASH_PRIME as P
    from zh_ner_tf_spark.operators.dedup import _gram_hashes_np

    text = " ".join(parts)

    def tok_hash(tok):
        h = 0
        for ch in tok:
            h = (h * 31 + ord(ch)) % P
        return h

    toks = [t for t in text.split(" ") if t != ""]
    th = [tok_hash(t) for t in toks]
    if len(th) < n:
        h = 0
        for v in th:
            h = (h * 31 + v) % P
        want_distinct = [h]
        want_pos = [h]
    else:
        grams = []
        for i in range(len(th) - n + 1):
            g = 0
            for v in th[i: i + n]:
                g = (g * 31 + v) % P
            grams.append(g)
        want_distinct = sorted(set(grams))
        want_pos = grams
    assert _gram_hashes_np(text, n) == want_distinct
    assert _gram_hashes_np(text, n, distinct=False) == want_pos


@given(st.binary(min_size=0, max_size=400), st.integers(0, 3))
@settings(max_examples=60, deadline=None)
def test_warc_scanner_never_crashes_and_finds_valid_records(junk, n_good):
    """Fuzz: arbitrary junk bytes around well-formed records must never
    crash the scanner, never produce pseudo-records, and every valid
    record that follows a proper boundary is still found."""
    from zh_ner_tf_spark.sources.warc import parse_warc_records

    def record(i):
        http = b"HTTP/1.1 200 OK\r\n\r\n<html>%d</html>" % i
        head = (
            b"WARC/1.0\r\nWARC-Type: response\r\n"
            + b"WARC-Target-URI: https://x.example/%d\r\n" % i
            + b"Content-Length: %d\r\n" % len(http)
        )
        return head + b"\r\n" + http + b"\r\n\r\n"

    goods = [record(i) for i in range(n_good)]
    # junk first: records after it are only guaranteed findable if a
    # clean boundary precedes them, so glue with the boundary separator
    blob = junk + b"\r\n\r\n" + b"".join(goods)
    recs = list(parse_warc_records(blob))
    urls = [r[0] for r in recs]
    for i in range(n_good):
        assert f"https://x.example/{i}" in urls
    # no pseudo-records beyond the planted ones unless the junk itself
    # contains a syntactically valid record (vanishingly unlikely here)
    assert len(recs) <= n_good + 1


@given(st.integers(min_value=0, max_value=10**13))
@settings(max_examples=80, deadline=None)
def test_srp_params_invariants(n_rows):
    """Band-family derivation holds its contract at every corpus size:
    bits_per_band bounded [4, 24], total bits = bpb * bands, band count
    bounded [4, 64], and bucket width never shrinks as the corpus grows
    (monotone non-decreasing bits per band)."""
    from zh_ner_tf_spark.operators.similarity import srp_params

    bits, bands = srp_params(n_rows)
    bpb = bits // bands
    assert bits == bpb * bands
    assert 4 <= bpb <= 24
    assert 4 <= bands <= 64
    bigger_bits, bigger_bands = srp_params(max(n_rows * 2, 1))
    assert bigger_bits // bigger_bands >= bpb


@given(
    st.dictionaries(
        st.text(alphabet="abc/", min_size=1, max_size=8),
        st.binary(min_size=0, max_size=32),
        min_size=0, max_size=8,
    )
)
@settings(max_examples=40, deadline=None)
def test_dir_fingerprint_detects_any_listing_change(tmp_path_factory, files):
    """_dir_fingerprint is a pure function of the (relpath, size,
    mtime_ns) listing: recomputing over an UNTOUCHED tree agrees (the
    idempotent re-commit path), and adding a file, growing a file, or
    an in-place rewrite that preserves name AND size (the ADVICE-r5
    hole, caught via mtime) all change the fingerprint."""
    import os

    from zh_ner_tf_spark.sources.sinks import _dir_fingerprint

    base = tmp_path_factory.mktemp("fp")

    def materialize(d, tree):
        for rel, data in tree.items():
            rel = rel.replace("/", "_")  # keep flat: names are the point
            with open(os.path.join(d, rel), "wb") as f:
                f.write(data)

    d1 = base / "a"; d2 = base / "b"
    d1.mkdir(); d2.mkdir()
    materialize(d1, files); materialize(d2, files)
    # recomputation over the SAME untouched dir is stable — this is the
    # property snapshot_commit_dir's crash-replay idempotence needs
    assert _dir_fingerprint(str(d1)) == _dir_fingerprint(str(d1))
    # adding a file changes it
    fp2 = _dir_fingerprint(str(d2))
    with open(d2 / "zz_new", "wb") as f:
        f.write(b"x")
    assert _dir_fingerprint(str(d2)) != fp2
    if files:
        # growing any one file changes it
        name = sorted(files)[0].replace("/", "_")
        fp1 = _dir_fingerprint(str(d1))
        with open(d1 / name, "ab") as f:
            f.write(b"grow")
        assert _dir_fingerprint(str(d1)) != fp1
        # same-name-same-size in-place rewrite: only mtime moves
        d3 = base / "c"; d3.mkdir()
        materialize(d3, files)
        fp3 = _dir_fingerprint(str(d3))
        path3 = os.path.join(d3, name)
        st = os.stat(path3)
        with open(path3, "wb") as f:
            f.write(files[sorted(files)[0]])          # identical bytes/size
        os.utime(path3, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000))
        assert _dir_fingerprint(str(d3)) != fp3
