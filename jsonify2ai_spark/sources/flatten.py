"""JSON/JSONL flatteners (S4/S5).

Semantics contract (reference: worker/app/services/parse_json.py:5-39):
- dicts flatten with dot paths, lists with bracket indices: ``a.b[0]: value``
- one output line per scalar leaf; empty containers produce nothing
- JSONL: per-line objects prefixed ``$[{i}]``, cap 10 000 lines, bad lines
  skipped silently

The kernel is pure Python (dynamic shapes can't be a static Catalyst schema);
Spark-side it runs as an Arrow-batched pandas UDF over a string column —
e.g. flattening a JSON payload column of a 100 TB events table is a pure
map stage.
"""

from __future__ import annotations

import json
from typing import Any

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

JSONL_MAX_LINES = 10_000


def flatten_obj(obj: Any, prefix: str = "") -> list[str]:
    """Recursive flatten to ``path: value`` lines (S4 kernel)."""
    out: list[str] = []
    if isinstance(obj, dict):
        for k, v in obj.items():
            sub = f"{prefix}.{k}" if prefix else str(k)
            out.extend(flatten_obj(v, sub))
    elif isinstance(obj, list):
        for i, v in enumerate(obj):
            out.extend(flatten_obj(v, f"{prefix}[{i}]"))
    else:
        if isinstance(obj, bool):
            val = "true" if obj else "false"
        elif obj is None:
            val = "null"
        else:
            val = str(obj)
        out.append(f"{prefix}: {val}" if prefix else val)
    return out


def flatten_json_text(text: str) -> str:
    """Whole-document JSON -> flattened text block (S4)."""
    try:
        obj = json.loads(text)
    except (ValueError, TypeError):
        return ""
    return "\n".join(flatten_obj(obj))


def flatten_jsonl_text(text: str, max_lines: int = JSONL_MAX_LINES) -> str:
    """JSONL -> flattened lines with ``$[{i}]`` prefixes (S5): bad lines are
    skipped, index still advances per input line (position = provenance)."""
    out: list[str] = []
    for i, line in enumerate(text.splitlines()):
        if i >= max_lines:
            break
        line = line.strip()
        if not line:
            continue
        try:
            obj = json.loads(line)
        except ValueError:
            continue
        out.extend(flatten_obj(obj, prefix=f"$[{i}]"))
    return "\n".join(out)


@F.pandas_udf(StringType())
def _flatten_json_udf(s: pd.Series) -> pd.Series:
    return s.map(lambda t: flatten_json_text(t) if t else "")


@F.pandas_udf(StringType())
def _flatten_jsonl_udf(s: pd.Series) -> pd.Series:
    return s.map(lambda t: flatten_jsonl_text(t) if t else "")


def flatten_json_col(col: Column | str, lines: bool = False) -> Column:
    """Column form: flatten a JSON (or JSONL) string column to text lines."""
    col = F.col(col) if isinstance(col, str) else col
    return _flatten_jsonl_udf(col) if lines else _flatten_json_udf(col)
