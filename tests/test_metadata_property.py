"""Property-based check: the Spark column-expression metadata extractors
must agree with an independent pure-Python implementation of the same
spec (crawl/1/extract_document_info.py semantics — re-derived here, not
copied) on randomized reference-shaped documents."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from bigdata_2025_1_spark.functions import metadata as M

import pytest as _pytest_mark

# Slow tier (pytest.ini): excluded from the driver's default run.
pytestmark = _pytest_mark.mark.slow

CODE_RE = re.compile(r"\d{1,4}/(?:\d{4}/)?[A-ZĐ]{1,5}(?:-[A-Z0-9]{1,5})*")
SIGNER_RE = re.compile(r"\b(KT\.|TL\.|THỨ TRƯỞNG|BỘ TRƯỞNG)\b")
DATE_FB_RE = re.compile(r"ngày\s+\d{1,2}\s+tháng")


def spec_extract(content: str) -> dict:
    """Pure-Python spec (extract_document_info.py:17-52 semantics; uses
    split('\\n') — fixture texts have no \\r)."""
    lines = content.split("\n")
    codes = CODE_RE.findall(content)
    main = codes[0] if codes else None
    related = [c for c in codes[1:] if c != main]
    agency = content.split("|")[1].strip() if "|" in content else None
    issue = None
    for line in lines:
        if "Số:" in line and "ngày" in line.lower():
            for part in line.split("|"):
                if "ngày" in part.lower():
                    issue = part.strip()
                    break
            if issue:
                break
    if not issue:
        for line in lines:
            if DATE_FB_RE.search(line.lower()):
                issue = line.strip()
                break
    signer = None
    for line in reversed(lines):
        if SIGNER_RE.search(line):
            words = line.strip().split()
            if len(words) >= 2:
                signer = " ".join(words)
            break
    return {
        "main_code": main,
        "related_codes": related,
        "agency": agency,
        "issue_date": issue,
        "signer": signer,
    }


# Reference-shaped text fragments, composed randomly into documents
fragment = st.one_of(
    st.sampled_from(
        [
            "Số: 23/2025/TT-BTC | Hà Nội, ngày 15 tháng 3 năm 2025",
            "Căn cứ Nghị định 87/2017/NĐ-CP;",
            "BỘ TÀI CHÍNH | CỘNG HÒA XÃ HỘI",
            "KT. BỘ TRƯỞNG",
            "THỨ TRƯỞNG Nguyễn Văn A",
            "TL.",
            "ngày 4 tháng 10 năm 2022",
            "Quyết định 19/QĐ-TTg và 2166/QĐ-BTC",
            "plain text line",
            "",
            "  dòng có   khoảng   trắng  ",
            "99/XY-1 1/A 12/BC",
            # Unicode whitespace (NBSP / ideographic space) — Python strip()
            # and re \s treat these as whitespace; PY_WS_CLASS must agree
            "BỘ TÀI CHÍNH | CỘNG HÒA　",
            "Số: 5/TT |  ngày 2 tháng 3 ",
            "KT. BỘ TRƯỞNG X",
        ]
    ),
    st.text(
        alphabet="abcdefgABCDEFG0123456789 |/-.:ĐƯỞở ngàySốtháng 　\t",
        max_size=40,
    ),
)
documents = st.lists(fragment, min_size=0, max_size=8).map("\n".join)


@settings(max_examples=8, deadline=None)
@given(st.lists(documents, min_size=1, max_size=25))
def test_spark_matches_python_spec(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["i", "text"])
    rows = (
        df.select(
            "i",
            M.main_code(F.col("text")).alias("main_code"),
            M.related_codes(F.col("text")).alias("related_codes"),
            M.agency(F.col("text")).alias("agency"),
            M.issue_date(F.col("text")).alias("issue_date"),
            M.signer(F.col("text")).alias("signer"),
        )
        .orderBy("i")
        .collect()
    )
    for row, text in zip(rows, texts):
        expected = spec_extract(text)
        got = {
            "main_code": row.main_code,
            "related_codes": row.related_codes,
            "agency": row.agency,
            "issue_date": row.issue_date,
            "signer": row.signer,
        }
        assert got == expected, f"text={text!r}"
