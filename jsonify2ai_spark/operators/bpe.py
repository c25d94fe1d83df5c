"""Distributed BPE tokenizer training (Sennrich et al. 2016) — the
tokenizer-TRAINING step of a training-data pipeline, next to the vocab
builder (build_vocab) and the BPE-ish pre-token counter (functions.text).

Scale shape (the point of doing this on Spark): the CORPUS is touched
exactly once — one pre-tokenize + word-count shuffle produces the
(word, count) frequency table, which is VOCAB-sized (|distinct words|,
not corpus-sized). Every merge round then runs two small jobs over that
cached table: a weighted adjacent-pair count (partial-aggregated; the
classic HF-tokenizers trick of operating on word frequencies instead of
the corpus) and a map-only merge application. 100 TB of text and 10 GB
of text train in the same number of rounds over nearly the same sized
table. The driver holds only the merge list (num_merges pairs) and one
argmax row per round — never data.

Determinism: the winning pair each round is (count desc, pair asc) —
ties break lexicographically, so the learned merge list is reproducible
on any cluster shape (test-pinned against a pure-Python reference).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from jsonify2ai_spark.functions.text import bpe_tokens

# end-of-word sentinel (Sennrich): lets merges distinguish word-final
# symbols; chosen outside the pre-token alphabet so it can never collide
EOW = "</w>"


def _merge_word(syms: Column, a: str, b: str) -> Column:
    """Apply ONE merge (a, b) -> a+b to a symbol array, leftmost-first
    non-overlapping — the greedy scan as a left fold: append each symbol,
    merging with the accumulator's tail when (tail, current) == (a, b).
    Equivalent to the index walk because a+b can never equal a (b is
    nonempty), so a freshly-merged tail cannot be re-merged this round."""
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(a + b))),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def word_frequency_table(
    df: DataFrame, text_col: str = "text", lowercase: bool = True
) -> DataFrame:
    """(word, count) over the BPE pre-token split — the one corpus-sized
    pass; everything downstream is vocabulary-sized."""
    tok = F.explode(bpe_tokens(F.col(text_col))).alias("word")
    words = df.select(tok)
    if lowercase:
        words = words.select(F.lower("word").alias("word"))
    return words.groupBy("word").agg(F.count(F.lit(1)).cast("bigint").alias("count"))


def train_bpe(
    df: DataFrame,
    num_merges: int = 100,
    text_col: str = "text",
    lowercase: bool = True,
    min_pair_count: int = 2,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus; returns the merge
    list in learned order (the tokenizer artifact — feed it to
    :func:`bpe_encode`). Stops early when no adjacent pair reaches
    ``min_pair_count`` (nothing left worth merging).

    Each round: weighted adjacent-pair count over the cached (symbols,
    count) table -> deterministic argmax -> map-only merge application.
    The driver loop is num_merges iterations of vocab-sized jobs — the
    corpus was left behind after :func:`word_frequency_table`.
    """
    wf = word_frequency_table(df, text_col, lowercase)
    vocab = wf.select(
        F.concat(
            F.split(F.col("word"), ""),  # characters, JVM-side
            F.array(F.lit(EOW)),
        ).alias("syms"),
        F.col("count"),
    ).localCheckpoint()  # eager: cut lineage before the merge loop

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs = vocab.select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("syms") - 1),
                    lambda i: F.struct(
                        F.element_at("syms", i).alias("a"),
                        F.element_at("syms", i + F.lit(1)).alias("b"),
                    ),
                )
            ).alias("p"),
            F.col("count"),
        ).filter(F.size("syms") >= 2)
        top = (
            pairs.groupBy("p")
            .agg(F.sum("count").alias("c"))
            .orderBy(F.col("c").desc(), F.col("p.a").asc(), F.col("p.b").asc())
            .first()
        )
        if top is None or top["c"] < min_pair_count:
            break
        a, b = top["p"]["a"], top["p"]["b"]
        merges.append((a, b))
        new_vocab = vocab.select(
            _merge_word(F.col("syms"), a, b).alias("syms"), F.col("count")
        ).localCheckpoint()
        vocab.unpersist()
        vocab = new_vocab
    vocab.unpersist()
    return merges


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    lowercase: bool = True,
) -> DataFrame:
    """Tokenize ``text_col`` with a learned merge list: per word, start
    from characters + EOW and apply every merge in learned order (the
    standard encode rule). Map-only — each merge is one fold over each
    word's symbol array, so cost is O(len(merges) * tokens) per document;
    at serving scale, long merge lists belong in a pandas-UDF trie encoder
    (this expression form is the exact-semantics reference the tests pin).
    Appends ``out_col`` (array<string>, EOW markers kept)."""

    def _encode_word(w: Column) -> Column:
        syms = F.concat(F.split(w, ""), F.array(F.lit(EOW)))
        for a, b in merges:
            syms = _merge_word(syms, a, b)
        return syms

    words = bpe_tokens(F.col(text_col))
    if lowercase:
        words = F.transform(words, F.lower)
    encoded = F.flatten(F.transform(words, _encode_word))
    return df.withColumn(out_col, encoded)
