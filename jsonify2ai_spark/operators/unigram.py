"""Distributed unigram-LM tokenizer training (Kudo 2018 — the
SentencePiece unigram model, the most common LLM tokenizer family next
to BPE) — completes the tokenizer-training surface beside
:mod:`~jsonify2ai_spark.operators.bpe` (reference anchor: the reference
counts tokens with a fixed external tokenizer, worker/app/services
embedding batch path; training one is the capability a training-data
pipeline needs at corpus scale).

Scale shape (the same contract as train_bpe): the CORPUS is touched
exactly once — the word-frequency shuffle produces a VOCAB-sized
(word, count) table — and every EM round is two jobs over that table:
an Arrow-batched forward-backward per word (expected piece counts out
of the segmentation lattice) and a piece-keyed partial-aggregated sum.
100 TB of text and 10 GB train in the same number of rounds over nearly
the same sized table; the driver holds only the piece table (vocab-size
floats), never data.

Determinism: no RNG anywhere — seeding is frequency-ranked with
lexicographic tie-breaks, EM is exact arithmetic over a fixed table,
and pruning ranks by (expected count asc, piece desc) so the kept set
is reproducible on any cluster shape. Pruning uses the expected-count
contribution ranking (the common reimplementation simplification of
Kudo's exact leave-one-out loss; single characters are never pruned, so
full coverage — every word segmentable — is invariant).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jsonify2ai_spark.operators.bpe import word_frequency_table

_NEG_INF = float("-inf")


def seed_pieces(
    wf: DataFrame,
    seed_size: int = 2000,
    max_piece_len: int = 8,
) -> dict[str, float]:
    """Frequency-ranked substring seed vocabulary from a (word, count)
    table: every substring up to ``max_piece_len`` weighted by its
    word's count, top ``seed_size`` kept (count desc, piece asc) — PLUS
    every single character unconditionally (coverage: any word must
    stay segmentable after any amount of pruning). Returns normalized
    log-probs. One vocab-sized explode + aggregate; the top-k collect
    is seed-sized by construction."""
    subs = wf.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(1), F.length("word")),
                    lambda i: F.transform(
                        F.sequence(
                            i,
                            F.least(
                                F.length("word"),
                                i + F.lit(int(max_piece_len) - 1),
                            ),
                        ),
                        lambda j: F.col("word").substr(i, j - i + F.lit(1)),
                    ),
                )
            )
        ).alias("piece"),
        F.col("count"),
    )
    ranked = (
        subs.groupBy("piece")
        .agg(F.sum("count").alias("c"))
        .orderBy(F.col("c").desc(), F.col("piece").asc())
    )
    top = ranked.take(int(seed_size))
    chars = (
        ranked.filter(F.length("piece") == 1).collect()
    )  # alphabet-sized by construction
    counts: dict[str, float] = {}
    for r in list(top) + list(chars):
        counts[r["piece"]] = float(r["c"])
    total = sum(counts.values())
    return {p: math.log(c / total) for p, c in counts.items()}


def _lattice_udf(spark, logp: dict[str, float], max_piece_len: int, mode: str):
    """Arrow-batched per-word lattice pass over a broadcast piece table.
    mode="estep": (word) -> (pieces array, posterior expected counts
    array, word log-likelihood) via forward-backward in log space.
    mode="viterbi": (word) -> best segmentation (max-logprob path, ties
    to the segmentation preferring LONGER first pieces — deterministic
    because the DP argmax uses strict improvement over a fixed scan
    order). Unknown characters fall back to a floor logprob so encode
    is total (flagged by the caller via coverage stats if needed)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    bc = spark.sparkContext.broadcast(logp)
    floor = min(logp.values()) - 10.0 if logp else -30.0
    L = int(max_piece_len)

    def _logsumexp2(a: float, b: float) -> float:
        if a == _NEG_INF:
            return b
        if b == _NEG_INF:
            return a
        m = a if a > b else b
        return m + math.log(math.exp(a - m) + math.exp(b - m))

    def _estep_word(w: str):
        lp = bc.value
        n = len(w)
        alpha = [_NEG_INF] * (n + 1)
        alpha[0] = 0.0
        for i in range(1, n + 1):
            for j in range(max(0, i - L), i):
                p = lp.get(w[j:i])
                if p is None:
                    p = floor if i - j == 1 else None
                if p is None or alpha[j] == _NEG_INF:
                    continue
                alpha[i] = _logsumexp2(alpha[i], alpha[j] + p)
        beta = [_NEG_INF] * (n + 1)
        beta[n] = 0.0
        for i in range(n - 1, -1, -1):
            for j in range(i + 1, min(n, i + L) + 1):
                p = lp.get(w[i:j])
                if p is None:
                    p = floor if j - i == 1 else None
                if p is None or beta[j] == _NEG_INF:
                    continue
                beta[i] = _logsumexp2(beta[i], p + beta[j])
        z = alpha[n]
        counts: dict[str, float] = {}
        if z != _NEG_INF:
            for i in range(n):
                for j in range(i + 1, min(n, i + L) + 1):
                    piece = w[i:j]
                    p = lp.get(piece)
                    if p is None:
                        p = floor if j - i == 1 else None
                    if p is None:
                        continue
                    post = alpha[i] + p + beta[j] - z
                    if post > -30.0:  # numerically-zero posteriors skipped
                        counts[piece] = counts.get(piece, 0.0) + math.exp(post)
        ks = sorted(counts)
        return ks, [counts[k] for k in ks], (z if z != _NEG_INF else 0.0)

    def _viterbi_word(w: str):
        lp = bc.value
        n = len(w)
        best = [_NEG_INF] * (n + 1)
        back = [0] * (n + 1)
        best[0] = 0.0
        for i in range(1, n + 1):
            for j in range(max(0, i - L), i):
                p = lp.get(w[j:i])
                if p is None:
                    p = floor if i - j == 1 else None
                if p is None or best[j] == _NEG_INF:
                    continue
                s = best[j] + p
                if s > best[i]:
                    best[i] = s
                    back[i] = j
        if best[n] == _NEG_INF:
            return [w]  # unreachable given char coverage; total anyway
        out = []
        i = n
        while i > 0:
            out.append(w[back[i]:i])
            i = back[i]
        return out[::-1]

    # explicit pandas_udf(fn, type): `from __future__ import annotations`
    # stringifies hints, which the decorator's hint-inference can't
    # resolve (the bpe.py _ids_lookup_udf lesson)
    if mode == "estep":

        def _f(ws):
            rows = [_estep_word(w or "") for w in ws]
            return pd.DataFrame(
                {
                    "pieces": [r[0] for r in rows],
                    "cnt": [r[1] for r in rows],
                    "ll": [r[2] for r in rows],
                }
            )

        return pandas_udf(_f, "pieces array<string>, cnt array<double>, ll double")

    # viterbi: the input column is a whole DOCUMENT's word array (a
    # pandas UDF cannot run inside a higher-order-function lambda), so
    # each batch element is a list of words -> one flattened piece list
    def _g(word_lists):
        out = []
        for words in word_lists:
            pieces: list[str] = []
            for w in words if words is not None else []:
                pieces.extend(_viterbi_word(w or ""))
            out.append(pieces)
        return pd.Series(out)

    return pandas_udf(_g, "array<string>")


def train_unigram(
    df: DataFrame,
    vocab_size: int = 1000,
    text_col: str = "text",
    lowercase: bool = True,
    seed_size: int = 4000,
    max_piece_len: int = 8,
    em_iters: int = 2,
    shrink: float = 0.75,
    _stats: dict | None = None,
) -> dict[str, float]:
    """Learn a unigram-LM piece table (piece -> logprob) of about
    ``vocab_size`` entries: frequency-ranked substring seed, then
    rounds of (``em_iters`` x EM re-estimation, prune to ``shrink`` of
    the current size by expected-count contribution) until the target —
    the SentencePiece training loop with the reduced pruning criterion
    (see module docstring). Single characters are never pruned, so the
    returned table always segments every seen word.

    Every round is O(vocab-table) Spark work: one Arrow lattice pass +
    one piece-keyed sum per EM iteration. ``_stats`` (probe hook)
    records per-iteration corpus log-likelihood — EM's monotonicity is
    test-pinned on it."""
    spark = df.sparkSession
    wf = word_frequency_table(df, text_col, lowercase).localCheckpoint()
    logp = seed_pieces(wf, seed_size=seed_size, max_piece_len=max_piece_len)

    def em_round(cur: dict[str, float]) -> tuple[dict[str, float], dict[str, float], float]:
        udf = _lattice_udf(spark, cur, max_piece_len, "estep")
        # one lattice pass, materialized: both the count aggregate and
        # the likelihood read it (without the checkpoint the UDF would
        # evaluate twice)
        stepped = (
            wf.select(F.col("count"), udf(F.col("word")).alias("s"))
            .select(
                F.col("count"),
                F.col("s.ll").alias("ll"),
                F.col("s.pieces").alias("pieces"),
                F.col("s.cnt").alias("cnt"),
            )
            .localCheckpoint()
        )
        agg = (
            stepped.select(
                F.explode(F.arrays_zip("pieces", "cnt")).alias("e"),
                F.col("count"),
            )
            .groupBy(F.col("e.pieces").alias("piece"))
            .agg(F.sum(F.col("e.cnt") * F.col("count")).alias("c"))
        )
        rows = agg.collect()  # piece-table-sized: the model, not data
        ll = stepped.agg(F.sum(F.col("ll") * F.col("count"))).first()[0] or 0.0
        counts = {r["piece"]: float(r["c"]) for r in rows if r["c"] and r["c"] > 0}
        # pieces with zero posterior mass everywhere keep a floor count
        # so single-char coverage survives normalization
        for p in cur:
            if len(p) == 1 and p not in counts:
                counts[p] = 1e-6
        total = sum(counts.values())
        return {p: math.log(c / total) for p, c in counts.items()}, counts, float(ll)

    while True:
        counts: dict[str, float] = {}
        for _ in range(max(1, int(em_iters))):
            logp, counts, ll = em_round(logp)
            if _stats is not None:
                _stats.setdefault("ll", []).append(ll)
        if len(logp) <= int(vocab_size):
            break
        # prune: drop the lowest-contribution multi-char pieces down to
        # shrink * size (never below vocab_size), ties piece-desc so the
        # kept set is deterministic
        target = max(int(vocab_size), int(len(logp) * float(shrink)))
        # counts are partial-aggregated double sums whose addition order
        # is cluster-shape-dependent — round before ranking so the kept
        # set is reproducible (the DECIMAL-stability discipline)
        multi = sorted(
            (p for p in logp if len(p) > 1),
            key=lambda p: (round(counts.get(p, 0.0), 9), p),
        )
        n_drop = len(logp) - target
        dropped = set(multi[: max(0, n_drop)])
        if not dropped:
            break
        kept = {p: c for p, c in counts.items() if p not in dropped}
        total = sum(kept.values())
        logp = {p: math.log(c / total) for p, c in kept.items()}
        if _stats is not None:
            _stats.setdefault("prune_rounds", 0)
            _stats["prune_rounds"] += 1
    return logp


def unigram_encode(
    df: DataFrame,
    logp: dict[str, float],
    text_col: str = "text",
    out_col: str = "unigram_tokens",
    lowercase: bool = True,
    max_piece_len: int = 8,
) -> DataFrame:
    """Viterbi segmentation of every document under a trained piece
    table: pre-tokenize (the BPE word splitter — same text contract),
    segment each word by max-logprob path, concatenate in order. One
    Arrow-batched map pass; the piece table rides a broadcast."""
    from jsonify2ai_spark.functions.text import bpe_tokens

    spark = df.sparkSession
    udf = _lattice_udf(spark, logp, max_piece_len, "viterbi")
    words = bpe_tokens(F.col(text_col))
    if lowercase:
        words = F.transform(words, F.lower)
    return df.withColumn(out_col, udf(words))
