"""S3 proper: PDF book-metadata extraction as Catalyst column functions.

Mirrors the reference's metadata path
(/root/reference/pdf_craft/pdf/handler.py:61-117 and
transform.py:263-278):

- title: the raw ``/Title`` string, falling back to the file stem when
  absent (here: ``doc_<id>``) — transform.py:266;
- authors: the raw ``/Author`` string split on the FIRST separator present
  among ``;`` then ``,`` then ``&`` (handler.py:80-88), segments trimmed,
  empties dropped; no separator → the whole trimmed string;
- modified: ``D:YYYYMMDDHHmmSS...`` PDF date — optional ``D:`` prefix
  stripped, first 14 chars parsed when they are all digits and at least 14
  long (handler.py:95-116); unparseable → NULL (the reference falls back
  to ``datetime.now(UTC)``, which is non-deterministic by definition — a
  NULL is the engine-portable rendering of "no trustworthy date").

All JVM-side scalar expressions — no Python, whole-stage codegen.  The
``modified`` timestamp is emitted as a ``YYYY-MM-DD HH:MM:SS`` string so
results are independent of session timezone (parquet timestamps load as
TIMESTAMP_NTZ, and tz-sensitive renderings would break oracle parity
whenever the session tz is not UTC).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SEPS = (";", ",", "&")


def authors_array(author: Column) -> Column:
    """Split on the first separator present (``;`` > ``,`` > ``&``); trim
    segments, drop empties.  Edge semantics exactly as handler.py:78-88:
    a separator split whose segments are all empty (e.g. ``';;'``) falls
    back to ``[trim(raw)]``; no separator → ``[trim(raw)]``; a NULL or
    empty-string author never enters the parse branch at all → ``[]``."""
    def split_clean(sep: str) -> Column:
        parts = F.split(author, f"[{sep}]")
        return F.filter(F.transform(parts, lambda x: F.trim(x)), lambda x: x != "")

    whole = F.array(F.trim(author))
    col = whole
    for sep in reversed(_SEPS):
        cleaned = split_clean(sep)
        col = F.when(
            F.contains(author, F.lit(sep)),
            F.when(F.size(cleaned) > 0, cleaned).otherwise(whole),
        ).otherwise(col)
    return F.when(
        author.isNull() | (author == F.lit("")),
        F.expr("CAST(array() AS array<string>)"),
    ).otherwise(col)


def modified_from_raw(moddate: Column) -> Column:
    """Parse ``[D:]YYYYMMDDHHmmSS...`` into a 'YYYY-MM-DD HH:MM:SS' string;
    NULL when missing/short/non-digit (handler.py:95-116).  Calendar
    validation mirrors the reference's ``datetime(...)`` constructor —
    out-of-range fields (month 99, Feb 30, hour 24) raise ValueError there
    and render NULL here (try_to_timestamp's strict resolver).

    try_to_timestamp is used ONLY as the validity predicate; the rendered
    string is sliced straight from the digits.  Formatting the parsed
    timestamp instead would be session-timezone-sensitive: a wall time
    falling in a DST gap shifts under date_format while the reference's
    naive datetime() keeps it verbatim."""
    s = F.when(
        moddate.startswith("D:"), moddate.substr(F.lit(3), F.length(moddate))
    ).otherwise(moddate)
    digits = s.substr(1, 14)
    valid = (
        (F.length(s) >= 14)
        & digits.rlike(r"^[0-9]{14}$")
        & F.try_to_timestamp(digits, F.lit("yyyyMMddHHmmss")).isNotNull()
    )
    stamp = F.concat(
        digits.substr(1, 4), F.lit("-"), digits.substr(5, 2), F.lit("-"),
        digits.substr(7, 2), F.lit(" "), digits.substr(9, 2), F.lit(":"),
        digits.substr(11, 2), F.lit(":"), digits.substr(13, 2),
    )
    return F.when(valid, stamp)


def book_meta(
    df: DataFrame,
    doc_id: str = "doc_id",
    title: str = "raw_title",
    author: str = "raw_author",
    moddate: str = "raw_moddate",
) -> DataFrame:
    """The S3 metadata operator: raw PDF metadata columns → normalized
    (doc_id, title, authors_joined, n_authors, modified).  Authors ride as
    a '|'-joined canonical string (arrays stay out of result projections)."""
    authors = authors_array(F.col(author))
    return df.select(
        F.col(doc_id),
        F.coalesce(
            F.col(title), F.concat(F.lit("doc_"), F.col(doc_id).cast("string"))
        ).alias("title"),
        F.array_join(authors, "|").alias("authors_joined"),
        F.size(authors).alias("n_authors"),
        modified_from_raw(F.col(moddate)).alias("modified"),
    )
