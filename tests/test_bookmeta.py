"""S3 metadata parser semantics vs the reference's rules
(/root/reference/pdf_craft/pdf/handler.py:61-117): separator priority
';' > ',' > '&', trim + empty-drop, stem fallback, D:-date parsing."""

from __future__ import annotations

from pdf_craft_spark.functions.bookmeta import book_meta


def _run(spark, rows):
    df = spark.createDataFrame(
        rows, "doc_id long, raw_title string, raw_author string, raw_moddate string"
    )
    return {r.doc_id: r for r in book_meta(df).collect()}


def test_book_meta_branches(spark):
    out = _run(
        spark,
        [
            (1, None, "Smith, A.; Lee, B. ;; X", "D:20240116093015"),
            (2, "T2", " Smith, Alice,, Lee ", "20240116093015"),
            (3, "T3", "Ann & Lee & ", "D:2024"),
            (4, "T4", "  Solo Author  ", None),
            (5, "T5", "A;B", "D:20XX010Z0000AB"),
            (6, "T6", "A", "D:20240116093015extra'00"),
            (7, "T7", ";;", "D:20249999999999"),
            (8, "T8", "", "D:20240230120000"),
            (9, "T9", None, "D:20240116240000"),
        ],
    )
    # ';' wins over ',' (first separator in priority order)
    assert out[1].authors_joined == "Smith, A.|Lee, B.|X"
    assert out[1].n_authors == 3
    assert out[1].title == "doc_1"  # stem fallback
    assert out[1].modified == "2024-01-16 09:30:15"
    # ',' split, empties dropped, outer whitespace trimmed
    assert out[2].authors_joined == "Smith|Alice|Lee"
    assert out[2].modified == "2024-01-16 09:30:15"  # bare date, no D:
    # '&' split with trailing empty
    assert out[3].authors_joined == "Ann|Lee"
    assert out[3].modified is None  # too short
    # no separator -> single trimmed author
    assert out[4].authors_joined == "Solo Author"
    assert out[4].n_authors == 1
    assert out[4].modified is None  # missing
    assert out[5].modified is None  # non-digit chars in the 14-prefix
    assert out[6].modified == "2024-01-16 09:30:15"  # trailing tz junk ignored
    # all-empty split -> [trim(raw)] fallback (handler.py:86-88)
    assert out[7].authors_joined == ";;"
    assert out[7].n_authors == 1
    assert out[7].modified is None  # month 99: datetime() would raise
    # empty/missing author never enters the parse branch -> []
    assert out[8].authors_joined == ""
    assert out[8].n_authors == 0
    assert out[8].modified is None  # Feb 30: calendar-invalid
    assert out[9].authors_joined == ""
    assert out[9].n_authors == 0
    assert out[9].modified is None  # hour 24: calendar-invalid
