"""Greedy sequence packing for LLM training pipelines.

Training consumes fixed-size context windows; feeding one short document per
window wastes most of the budget. The standard fix is next-fit packing:
walk documents in a deterministic order, accumulate until the next document
would overflow the budget, then start a new bin (documents are never split;
an oversized document gets its own bin — the tokenizer-side truncation is a
separate, model-specific concern).

The fold is sequential, so the scalable shape is packing WITHIN deterministic
groups (id mod n_groups): each group folds independently in an
applyInPandas (one Arrow batch stream per group, no global order barrier),
and a bin is identified by (pack_group, bin_idx). Group count tunes the
parallelism/packing-efficiency trade: more groups = more parallelism, a few
more partially-filled final bins (one per group). Fully deterministic, so a
re-run or retry packs identically — and the DuckDB oracle (q57) replays the
same fold as a recursive CTE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    budget: int,
    size_col: str = "n_chars",
    id_col: str = "doc_id",
    n_groups: int = 32,
) -> DataFrame:
    """Assign each row to (pack_group, bin_idx) by next-fit over ``id_col``
    order within ``id % n_groups`` groups. One shuffle (the groupBy); the
    fold runs Arrow-batched per group.

    Non-numeric id columns group by ``pmod(xxhash64(id), n_groups)`` — a
    plain ``%`` on a string id is NULL for every row, which would silently
    collapse the whole corpus into one sequential group (and that single
    group is exactly the global-order barrier this design avoids).
    """
    from pyspark.sql.types import LongType, NumericType, StructField, StructType

    if isinstance(df.schema[id_col].dataType, NumericType):
        grp = (F.col(id_col) % n_groups).cast("long")
    else:
        grp = F.pmod(F.xxhash64(id_col), F.lit(n_groups))
    grouped = df.withColumn("pack_group", grp)
    # copy, don't .add(): DataFrame.schema returns the frame's cached
    # StructType and add() mutates it in place
    out_schema = StructType(
        grouped.schema.fields + [StructField("bin_idx", LongType())]
    )

    def fold(pdf):
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        bins: list[int] = []
        acc, b = 0, 0
        for sz in pdf[size_col]:
            sz = int(sz or 0)
            if acc > 0 and acc + sz > budget:
                b += 1
                acc = 0
            acc += sz
            bins.append(b)
        pdf["bin_idx"] = bins
        return pdf

    return grouped.groupBy("pack_group").applyInPandas(fold, schema=out_schema)


def clip_to_token_budget(
    df: DataFrame,
    budget: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document token-budget truncation — the prep step BEFORE
    :func:`pack_sequences` (packing never splits documents, so any doc
    longer than the context budget must be clipped first or it monopolizes
    a bin). Whole-token truncation on the engine's standard whitespace
    tokenization: keep the first ``budget`` tokens, report original and
    kept counts plus the clipped flag for pipeline audit.

    Map-only Column expressions end to end (tokenize -> slice -> re-join):
    zero shuffles at any corpus size, and every output is replayable in
    the DuckDB oracle (same split regex, same join separator). Contentless
    docs (NULL/empty) are dropped, matching the stats operators (q59/q71).
    """
    from jsonify2ai_spark.functions.text import tokens

    nonempty = df.filter(
        F.length(F.trim(F.coalesce(F.col(text_col), F.lit("")))) > 0
    )
    tk = F.array(tokens(F.col(text_col)))
    # let-bind the token array: referencing tokens() in each output column
    # would re-run the split regex per column (no CSE across expressions)
    based = nonempty.select(
        F.col(id_col),
        F.element_at(tk, 1).alias("_tk"),
    )
    n = F.size("_tk")
    kept = F.least(n, F.lit(budget))
    return based.select(
        F.col(id_col),
        n.cast("bigint").alias("n_tokens"),
        kept.cast("bigint").alias("n_kept"),
        (n > budget).alias("clipped"),
        F.concat_ws(" ", F.slice("_tk", 1, budget)).alias("clipped_text"),
    )
