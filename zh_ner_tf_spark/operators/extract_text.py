"""html -> text extraction as a scalar Arrow pandas UDF
(BinaryType -> StringType), byte-identical to the frozen rule set in
fixtures/pages.py (gate: BASELINE.json:6,15 "byte-identical extracted
text per url").

Implementation is an independent vectorized regex pipeline (pandas .str
over the whole Arrow batch) versus the oracle's sequential character
state machine — agreement between the two is the test, not shared code.

Scale: this runs inside the pages scan projection; the binary html column
is read only for rows whose ``text`` is NULL (Catalyst prunes it on the
COALESCE branch only when projected so — the pipeline projects html away
immediately after this stage).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from zh_ner_tf_spark.fixtures.pages import ENTITIES

_COMMENT = re.compile(r"<!--.*?-->", re.S)
_SCRIPT = re.compile(r"<script\b.*?</script[^>]*>", re.S | re.I)
_STYLE = re.compile(r"<style\b.*?</style[^>]*>", re.S | re.I)
# unterminated constructs run to end-of-document (oracle contract)
_COMMENT_OPEN = re.compile(r"<!--.*\Z", re.S)
_SCRIPT_OPEN = re.compile(r"<script\b.*\Z", re.S | re.I)
_STYLE_OPEN = re.compile(r"<style\b.*\Z", re.S | re.I)
_TAG = re.compile(r"<[^>]*>")
_TAG_OPEN = re.compile(r"<[^>]*\Z", re.S)
_WS = re.compile(r"\s+")


def _extract_series(html: pd.Series) -> pd.Series:
    s = html.map(
        lambda b: b.decode("utf-8", errors="replace") if b is not None else None
    )
    s = s.str.replace(_COMMENT, "", regex=True)
    s = s.str.replace(_SCRIPT, "", regex=True)
    s = s.str.replace(_STYLE, "", regex=True)
    s = s.str.replace(_COMMENT_OPEN, "", regex=True)
    s = s.str.replace(_SCRIPT_OPEN, "", regex=True)
    s = s.str.replace(_STYLE_OPEN, "", regex=True)
    s = s.str.replace(_TAG, " ", regex=True)
    s = s.str.replace(_TAG_OPEN, " ", regex=True)
    for ent, rep in ENTITIES:
        s = s.str.replace(ent, rep, regex=False)
    s = s.str.replace(_WS, " ", regex=True).str.strip()
    return s


extract_text_udf = F.pandas_udf(_extract_series, returnType=StringType())


def with_extracted_text(df, html_col: str = "html", text_col: str = "text") -> "DataFrame":  # noqa: F821
    """Fill NULL ``text`` from ``html`` (pre-extracted text is trusted —
    the reference invariant is per-url byte identity, which holds for
    both branches by construction).

    Split-and-union instead of ``coalesce(text, udf(html))``: Catalyst
    evaluates Python UDFs in a separate ArrowEvalPython node BEFORE the
    coalesce, i.e. every row would round-trip through the Python worker
    even when ``text`` is already present. With the split, rows that
    already carry text never leave the JVM."""
    has = df.filter(F.col(text_col).isNotNull())
    needs = df.filter(F.col(text_col).isNull()).withColumn(
        text_col, extract_text_udf(F.col(html_col))
    )
    return has.unionByName(needs)


def sha256_text(col: Column) -> Column:
    """Digest for the byte-identity gate (sha256 over UTF-8 bytes)."""
    return F.sha2(col, 256)
