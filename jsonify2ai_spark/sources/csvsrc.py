"""CSV/TSV sources (S2/S3).

Semantics contract (reference: worker/app/services/parsers_csv.py:6-26 and
parse_csv.py:4-23): one text line per row, cells joined with ``" | "``, caps
of 50 columns and 2000 chars per row (S2); dialect-sniffed variant caps 5000
rows (S3).

Two forms:
- kernel ``csv_join_lines`` — pure Python over file text (used by the router
  for small files and by tests)
- ``read_csv_joined`` — native ``spark.read.csv`` + ``concat_ws`` projection:
  the scalable path (the JVM CSV reader is vectorized; the join-with-pipes is
  a codegen'd projection). Delimiter sniffing is a 2 KB driver-side probe of
  one file, mirroring the reference's Sniffer-on-sample.
"""

from __future__ import annotations

import csv
import io

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MAX_COLS = 50
MAX_ROW_CHARS = 2000
MAX_ROWS_SNIFFED = 5000


def csv_join_lines(
    text: str,
    delimiter: str | None = None,
    max_cols: int = MAX_COLS,
    max_len: int = MAX_ROW_CHARS,
    max_rows: int | None = None,
) -> list[str]:
    """S2 kernel: rows -> ``"v1 | v2 | ..."`` lines with col/char caps.

    ``delimiter=None`` sniffs from the first 2 KB (S3), falling back to ','.
    """
    if not text:
        return []
    if delimiter is None:
        try:
            delimiter = csv.Sniffer().sniff(text[:2048], delimiters=",;\t|").delimiter
        except csv.Error:
            delimiter = ","
    out: list[str] = []
    for i, row in enumerate(csv.reader(io.StringIO(text), delimiter=delimiter)):
        if max_rows is not None and i >= max_rows:
            break
        cells = [c.strip() for c in row[:max_cols]]
        line = " | ".join(cells)
        if len(line) > max_len:
            line = line[:max_len]
        if line:
            out.append(line)
    return out


def read_csv_joined(
    spark: SparkSession,
    path: str,
    delimiter: str = ",",
    header: bool = False,
    max_cols: int = MAX_COLS,
    max_len: int = MAX_ROW_CHARS,
) -> DataFrame:
    """Scalable S2: native CSV scan -> one ``line`` column of pipe-joined
    cells. Header row (when present) is re-emitted as a data line by reading
    with header=False, matching the reference's output shape."""
    df = spark.read.option("sep", delimiter).option("header", "false").csv(path)
    cols = df.columns[:max_cols]
    joined = F.concat_ws(" | ", *[F.trim(F.coalesce(F.col(c), F.lit(""))) for c in cols])
    return df.select(F.substring(joined, 1, max_len).alias("line")).filter(F.col("line") != "")
