"""Golden tests for the legal-document metadata extractors (D5-D8/E4)
against reference-shaped Vietnamese snippets — semantics cited from
crawl/1/extract_document_info.py (see docstrings in functions/metadata.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_2025_1_spark.functions import metadata as M

DOC = (
    "BỘ TÀI CHÍNH | CỘNG HÒA XÃ HỘI CHỦ NGHĨA VIỆT NAM\n"
    "Số: 23/2025/TT-BTC | Hà Nội, ngày 15 tháng 3 năm 2025\n"
    "Căn cứ Nghị định 87/2017/NĐ-CP và Quyết định 19/QĐ-TTg;\n"
    "Thông tư 23/2025/TT-BTC quy định ...\n"
    "KT. BỘ TRƯỞNG\n"
    "THỨ TRƯỞNG Nguyễn Văn A"
)


def _extract(spark, text):
    df = spark.createDataFrame([(text,)], ["text"])
    return df.select(
        M.main_code(F.col("text")).alias("main_code"),
        M.related_codes(F.col("text")).alias("related_codes"),
        M.agency(F.col("text")).alias("agency"),
        M.issue_date(F.col("text")).alias("issue_date"),
        M.signer(F.col("text")).alias("signer"),
    ).first()


def test_full_document(spark):
    row = _extract(spark, DOC)
    assert row.main_code == "23/2025/TT-BTC"
    # ordered, duplicates-of-main removed; '19/QĐ-TT' (not ...TTg): the
    # reference charclass [A-Z0-9] excludes lowercase — exact re.findall parity
    assert row.related_codes == ["87/2017/NĐ-CP", "19/QĐ-TT"]
    # second pipe segment of the WHOLE content — spans the newline up to
    # the next '|' (verbatim reference behavior: content.split('|')[1])
    assert row.agency == "CỘNG HÒA XÃ HỘI CHỦ NGHĨA VIỆT NAM\nSố: 23/2025/TT-BTC"
    # pipe-part containing 'ngày' of the first 'Số:'+'ngày' line
    assert row.issue_date == "Hà Nội, ngày 15 tháng 3 năm 2025"
    # LAST matching signer line, whitespace-joined
    assert row.signer == "THỨ TRƯỞNG Nguyễn Văn A"


def test_issue_date_fallback(spark):
    row = _extract(spark, "mở đầu\nban hành Ngày 5 tháng 2 năm 2020 tại HN\nkết")
    assert row.issue_date == "ban hành Ngày 5 tháng 2 năm 2020 tại HN"


def test_no_matches(spark):
    row = _extract(spark, "plain english text with no patterns at all")
    assert row.main_code is None
    assert row.related_codes == []
    assert row.agency is None
    assert row.issue_date is None
    assert row.signer is None


def test_signer_needs_two_words(spark):
    row = _extract(spark, "nội dung\nTL.\n")
    assert row.signer is None


def test_related_codes_keep_duplicates_and_order(spark):
    text = "Số 1/AB dẫn 2/CD rồi 1/AB rồi 2/CD rồi 3/EF"
    row = _extract(spark, text)
    assert row.main_code == "1/AB"
    assert row.related_codes == ["2/CD", "2/CD", "3/EF"]
