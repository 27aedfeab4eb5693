"""`pages` fixture table (FIXTURES.md P1; shape = BASELINE.json input_hint:
url string, warc_ts timestamp, html binary, text string, lang string) and
the sequential oracle html->text extractor.

The extraction rule set is FROZEN (part of engine config): the
byte-identical-text gate (BASELINE.json:6,15) compares the vectorized
Spark UDF (operators/extract_text.py) against ``oracle_extract_text``
below, which is an independent character-state-machine implementation of
the same rules:

  1. drop <script>/<style> elements including their content (case-insens.)
  2. drop <!-- comments -->
  3. every remaining tag becomes one space
  4. decode entities: &amp; &lt; &gt; &quot; &#39; ; &nbsp; -> space
  5. collapse all whitespace runs to single ASCII space; strip ends
"""

from __future__ import annotations

import datetime
import random

ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
            ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&")]


def oracle_extract_text(html: bytes) -> str:
    s = html.decode("utf-8", errors="replace")
    out: list[str] = []
    i, n = 0, len(s)
    low = s.lower()
    while i < n:
        if s.startswith("<!--", i):
            j = low.find("-->", i + 4)
            i = n if j < 0 else j + 3
            continue
        opened = False
        for elem in ("script", "style"):
            if low.startswith("<" + elem, i):
                close = "</" + elem
                j = low.find(close, i)
                if j < 0:
                    i = n
                else:
                    k = low.find(">", j)
                    i = n if k < 0 else k + 1
                opened = True
                break
        if opened:
            continue
        if s[i] == "<":
            j = s.find(">", i)
            out.append(" ")
            i = n if j < 0 else j + 1
            continue
        out.append(s[i])
        i += 1
    text = "".join(out)
    for ent, rep in ENTITIES:
        text = text.replace(ent, rep)
    return " ".join(text.split())


# --------------------------------------------------------------------------
# Deterministic pages generator. Sentences are built over the P2 fixture
# vocabulary with planted entities and connective patterns, so golden
# mentions AND golden triples are computable in closed form by the caller
# (via the oracle tagger + oracle pattern matcher).
# --------------------------------------------------------------------------
def gen_pages(
    n_rows: int = 1000,
    seed: int = 42,
    variant_frac: float = 0.0,
    start: int = 0,
) -> list[dict]:
    """``variant_frac`` > 0 makes that fraction of entity mentions use a
    NOVEL surface — the pool surface extended by its own first char, so
    every char keeps its planted class and the tagger still emits the
    span — giving an increment slice genuinely new surfaces for the
    delta-tail probes (VERDICT r6 item 4). One novel surface per entity
    type keeps the new-surface fraction of the inventory bounded
    (~3/12), and the 3-char shared prefix keeps shingle overlap high
    enough to band-collide with the base surface (new CC edges). The
    extra RNG draw happens only when variant_frac > 0, so the default
    stream is byte-identical to the historical fixture. ``start``
    offsets row indices (urls/timestamps) so a second slice appends
    without colliding with an earlier one."""
    from zh_ner_tf_spark.config import TRIPLE_PATTERNS
    from zh_ner_tf_spark.fixtures.corpus import ENTITY_POOL, FILLER

    rng = random.Random(seed)
    connectives = [p[1].split("|")[0] for p in TRIPLE_PATTERNS]  # CJK arm
    langs = ["zh"] * 7 + ["en", "de", "fr"]
    rows = []
    base_ts = datetime.datetime(2025, 1, 1)

    def surface(etype: str) -> str:
        pool = ENTITY_POOL[etype]
        if variant_frac > 0.0 and rng.random() < variant_frac:
            base = pool[0]
            return "".join(base) + base[0]
        return "".join(rng.choice(pool))

    for i in range(start, start + n_rows):
        sents = []
        for _ in range(rng.randint(1, 4)):
            subj = surface("PER")
            obj = surface(rng.choice(("ORG", "LOC")))
            conn = rng.choice(connectives)
            pad = "".join(rng.choice(FILLER) for _ in range(rng.randint(0, 6)))
            sents.append(f"{subj}{conn}{obj}{pad}")
        body = "。".join(sents) + "。"
        title = f"t{i}"
        comment = "<!-- c -->" if i % 20 == 5 else ""
        script = "<script>var x=1;</script>" if i % 20 == 10 else ""
        nested = f"<b><i>{body[:3]}</i></b>" if i % 20 == 15 else ""
        html = (
            f"<html><head><title>{title}</title>{script}</head>"
            f"<body>{comment}<p>{body}</p>{nested}</body></html>"
        ).encode("utf-8")
        # ~half the rows ship pre-extracted text; the other half carry NULL
        # text and the pipeline must produce it from html.
        text = oracle_extract_text(html) if i % 2 == 0 else None
        rows.append({
            "url": f"https://site{i % 97}.example/{i}",
            "warc_ts": base_ts + datetime.timedelta(seconds=i * 137),
            "html": html,
            "text": text,
            "lang": langs[i % len(langs)],
        })
    return rows


def pages_schema():
    from pyspark.sql import types as T

    return T.StructType([
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ])
