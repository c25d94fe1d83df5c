"""SFT sample assembly: conversations -> training text + loss-mask spans.

The training-side counterpart of the chat parsing/lint surface (the
reference parses ChatGPT exports and transcripts into (conv, turn, role,
content) rows — worker/app/services/parse_chatgpt.py,
services/transcript.py; conversation_lint (q102) gates their structure):
an SFT pipeline must then RENDER each conversation into one training
string under a chat template and know, in character offsets, which spans
are the assistant's — the loss mask trains on assistant content only
(the standard instruction-tuning recipe).

Template (fixed-form so the DuckDB oracle replays it exactly):

    <|role|>\\n{content}\\n        per turn, turns in order

Span convention: 0-based [start, end) character offsets of the CONTENT
of every ``mask_role`` turn (headers and newlines are context, never
loss), serialized as ``"start:end;start:end"`` in turn order — the q119
CSV idiom, engine-portable where array<struct> hashing is not.

Scale shape: one window (per-conversation cumulative segment length —
the same partition-bounded window every sessionize/pagination query
uses) + one groupBy with sort_array/collect_list bounded by the
conversation's own turn count. No UDFs, no driver loops; a conversation
is the natural unit and fits a partition by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from jsonify2ai_spark.session import local_rows_df


def render_sft_samples(
    df: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    content_col: str = "text",
    mask_role: str = "assistant",
) -> DataFrame:
    """One row per conversation: ``(conv, text, n_turns, n_mask_turns,
    n_chars, mask_chars, mask_spans)``.

    Turn order is ``(turn_col, role_col, content_col)`` — a total order
    as long as no conversation carries two byte-identical turns at the
    same index (run :func:`~jsonify2ai_spark.operators.textstats.
    conversation_lint` first; its role-double/empty-turn findings are
    exactly the rows that make rendering ambiguous). Empty content
    renders an empty span (``start == end``) rather than dropping the
    turn — the mask stays aligned with the text either way.
    """
    content = F.coalesce(F.col(content_col), F.lit(""))
    header = F.concat(F.lit("<|"), F.col(role_col), F.lit("|>\n"))
    seg = F.concat(header, content, F.lit("\n"))
    w = Window.partitionBy(conv_col).orderBy(turn_col, role_col, content_col)
    turns = df.select(
        F.col(conv_col),
        F.col(turn_col),
        F.col(role_col),
        content.alias("_content"),
        seg.alias("_seg"),
        (
            F.coalesce(
                F.sum(F.length(seg)).over(
                    w.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            )
            + F.length(header)
        ).alias("_start"),
    ).withColumn("_end", F.col("_start") + F.length("_content"))

    ordered = F.sort_array(
        F.collect_list(
            F.struct(
                F.col(turn_col).alias("t"),
                F.col(role_col).alias("r"),
                F.col("_content").alias("c"),
                F.col("_seg").alias("seg"),
                F.col("_start").alias("s"),
                F.col("_end").alias("e"),
            )
        )
    )
    return (
        turns.groupBy(conv_col)
        .agg(ordered.alias("_o"))
        .select(
            F.col(conv_col),
            F.array_join(
                F.transform(F.col("_o"), lambda x: x["seg"]), ""
            ).alias("text"),
            F.size("_o").cast("bigint").alias("n_turns"),
            F.size(F.filter(F.col("_o"), lambda x: x["r"] == F.lit(mask_role)))
            .cast("bigint")
            .alias("n_mask_turns"),
            F.aggregate(
                F.col("_o"),
                F.lit(0).cast("bigint"),
                lambda acc, x: acc + F.length(x["seg"]),
            ).alias("n_chars"),
            F.aggregate(
                F.filter(F.col("_o"), lambda x: x["r"] == F.lit(mask_role)),
                F.lit(0).cast("bigint"),
                lambda acc, x: acc + (x["e"] - x["s"]),
            ).alias("mask_chars"),
            F.array_join(
                F.transform(
                    F.filter(F.col("_o"), lambda x: x["r"] == F.lit(mask_role)),
                    lambda x: F.concat_ws(
                        ":", x["s"].cast("string"), x["e"].cast("string")
                    ),
                ),
                ";",
            ).alias("mask_spans"),
        )
    )


def sft_token_samples(
    df: DataFrame,
    merges: list,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    role_col: str = "role",
    content_col: str = "text",
    mask_role: str = "assistant",
    lowercase: bool = True,
) -> DataFrame:
    """Token-space SFT samples: ``(conv, bpe_tokens, loss_mask,
    n_tokens, n_mask_tokens)`` — the step after
    :func:`render_sft_samples`' char-space contract, aligned BY
    CONSTRUCTION instead of by offset arithmetic: each turn encodes
    separately (whitespace-first BPE is per-word, so a word's subwords
    never depend on neighbors), the turn's mask is 0 over the header
    token(s) and 1 over the content tokens when the turn is
    ``mask_role`` (all 0 otherwise), and the conversation flattens
    turns in order. ``loss_mask[i]`` governs ``bpe_tokens[i]``
    position-for-position.

    Map the tokens to ids with ``tokens_to_ids(..., oov=<unk id>)`` —
    the substitution policy keeps 1:1 alignment; ``oov='drop'`` would
    shift every later mask position and MUST NOT be used on SFT
    samples (test-pinned in the module's alignment test).

    Scale shape: two Arrow encode passes (turn texts + the role-header
    inventory, which is roles-sized and broadcast back), one
    conversation-bounded sort_array collect. No driver loops.
    """
    from jsonify2ai_spark.operators.bpe import bpe_encode_fast

    header = F.concat(F.lit("<|"), F.col(role_col), F.lit("|>"))
    turn_text = F.concat(
        header, F.lit(" "), F.coalesce(F.col(content_col), F.lit(""))
    )
    enc = bpe_encode_fast(
        df.withColumn("_turn_text", turn_text),
        merges,
        text_col="_turn_text",
        out_col="_toks",
        lowercase=lowercase,
    )
    spark = df.sparkSession
    roles = [r[0] for r in df.select(role_col).distinct().collect()]
    if any(r is None for r in roles):
        # a NULL role can never match the header join key (NULL != NULL
        # in an equi-join), so the turn would vanish from its
        # conversation's sample and silently SHIFT every later token
        # relative to render_sft_samples' char-space output — the exact
        # misalignment class the oov='drop' pin exists for (r12 advisor)
        raise ValueError(
            f"sft_token_samples: NULL in role column {role_col!r} — "
            "every turn must carry a role; fill or drop malformed turns "
            "upstream"
        )
    hdr_df = local_rows_df(spark, [(r, f"<|{r}|>") for r in roles],
                           f"{role_col} string, _h string")
    hdr_counts = bpe_encode_fast(
        hdr_df, merges, text_col="_h", out_col="_htoks", lowercase=lowercase
    ).select(role_col, F.size("_htoks").alias("_hn"))

    turn_mask = F.when(
        F.col(role_col) == mask_role,
        F.concat(
            F.array_repeat(F.lit(0), F.col("_hn")),
            F.array_repeat(F.lit(1), F.size("_toks") - F.col("_hn")),
        ),
    ).otherwise(F.array_repeat(F.lit(0), F.size("_toks")))

    # left join + plan-embedded raise instead of the (equivalent-looking)
    # inner join: a role that appears between the inventory collect above
    # and this join's execution (concurrent input change, or a NULL that
    # slipped past a non-deterministic source) must fail loudly, not
    # silently drop the turn and misalign the conversation's mask
    guarded_hn = F.when(
        F.col("_hn").isNull(),
        F.raise_error(
            F.concat(
                F.lit(
                    "sft_token_samples: turn role absent from the header "
                    "inventory (NULL role or input changed under the "
                    "run): "
                ),
                F.coalesce(F.col(role_col), F.lit("NULL")),
            )
        ).cast("int"),
    ).otherwise(F.col("_hn"))
    turns = enc.join(F.broadcast(hdr_counts), role_col, "left").withColumn(
        "_hn", guarded_hn
    ).select(
        F.col(conv_col),
        F.struct(
            F.col(turn_col).alias("t"),
            F.col(role_col).alias("r"),
            F.coalesce(F.col(content_col), F.lit("")).alias("c"),
            F.col("_toks").alias("toks"),
            turn_mask.alias("mask"),
        ).alias("_row"),
    )
    ordered = F.sort_array(F.collect_list("_row"))
    return (
        turns.groupBy(conv_col)
        .agg(ordered.alias("_o"))
        .select(
            F.col(conv_col),
            F.flatten(F.transform(F.col("_o"), lambda x: x["toks"])).alias(
                "bpe_tokens"
            ),
            F.flatten(F.transform(F.col("_o"), lambda x: x["mask"])).alias(
                "loss_mask"
            ),
        )
        .select(
            conv_col,
            "bpe_tokens",
            "loss_mask",
            F.size("bpe_tokens").cast("bigint").alias("n_tokens"),
            F.aggregate(
                "loss_mask", F.lit(0).cast("bigint"), lambda a, x: a + x
            ).alias("n_mask_tokens"),
        )
    )


def preference_pairs(
    df: DataFrame,
    prompt_col: str = "prompt_id",
    prompt_text_col: str = "prompt",
    response_col: str = "response",
    score_col: str = "score",
    pairing: str = "best_worst",
    min_margin: float = 0.0,
) -> DataFrame:
    """Preference-pair assembly — the DPO/RLHF data path that follows
    the SFT chain: candidate responses per prompt (scored by a reward
    model, human ranking, or any quality signal) become
    ``(prompt_id, prompt, chosen, rejected, chosen_score,
    rejected_score, margin)`` training rows. No reference anchor: the
    reference stops at chat parsing (worker/app/services/
    parse_chatgpt.py); this is the north-star generalization's
    preference-tuning step, the q125/q126 render/tokenize face's input.

    Responses rank per prompt by the TOTAL order (score desc, response
    asc — the build_vocab tie rule, so pairs are deterministic on any
    engine and any cluster shape). ``pairing``:

    - ``'best_worst'``  one pair per prompt: rank 1 vs rank n — the
      maximum-margin pair (the common DPO recipe).
    - ``'best_rest'``   rank 1 vs every other response: n-1 pairs —
      when the best answer is trusted and the rest are negatives.
    - ``'adjacent'``    rank i vs rank i+1: n-1 pairs — the
      fine-grained form a listwise ranking is flattened to.

    Pairs with ``margin <= min_margin`` drop (a pair that doesn't
    separate teaches nothing and a 0-margin pair is two equally-good
    answers — training on it is noise); single-response prompts emit
    nothing. A NULL score raises in-plan rather than silently
    mis-ranking (the NULL-role lesson: malformed rows fail loudly).

    Scale shape: one per-prompt window pass (prompt-bounded, the
    sessionize shape) + for 'best_rest'/'best_worst' a broadcast-sized
    self-join keyed on (prompt, rank) only when needed — here both
    derive from the SAME windowed frame via first_value/lag, so the
    whole operator is window-only: no join, no shuffle beyond the one
    prompt-keyed sort.
    """
    if pairing not in ("best_worst", "best_rest", "adjacent"):
        raise ValueError(f"preference_pairs: unknown pairing {pairing!r}")
    sc = F.when(
        F.col(score_col).isNull(),
        F.raise_error(
            F.lit(
                f"preference_pairs: NULL in score column {score_col!r} — "
                "every candidate response must carry a score; drop or "
                "impute upstream"
            )
        ).cast(df.schema[score_col].dataType.simpleString()),
    ).otherwise(F.col(score_col))
    base = df.select(
        F.col(prompt_col),
        F.col(prompt_text_col),
        F.col(response_col).alias("_resp"),
        sc.alias("_score"),
    )
    order = [F.col("_score").desc(), F.col("_resp").asc()]
    w = Window.partitionBy(prompt_col).orderBy(*order)
    ranked = base.select(
        prompt_col,
        prompt_text_col,
        "_resp",
        "_score",
        F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1)).over(Window.partitionBy(prompt_col)).alias("_n"),
        F.first("_resp").over(w).alias("_best"),
        F.first("_score").over(w).alias("_best_score"),
    )
    if pairing == "adjacent":
        pairs = ranked.select(
            prompt_col,
            prompt_text_col,
            F.lag("_resp", 1).over(w).alias("chosen"),
            F.col("_resp").alias("rejected"),
            F.lag("_score", 1).over(w).alias("chosen_score"),
            F.col("_score").alias("rejected_score"),
        ).filter(F.col("chosen").isNotNull())
    elif pairing == "best_rest":
        pairs = ranked.filter(F.col("_rn") > 1).select(
            prompt_col,
            prompt_text_col,
            F.col("_best").alias("chosen"),
            F.col("_resp").alias("rejected"),
            F.col("_best_score").alias("chosen_score"),
            F.col("_score").alias("rejected_score"),
        )
    else:  # best_worst
        pairs = ranked.filter(
            (F.col("_rn") == F.col("_n")) & (F.col("_n") >= 2)
        ).select(
            prompt_col,
            prompt_text_col,
            F.col("_best").alias("chosen"),
            F.col("_resp").alias("rejected"),
            F.col("_best_score").alias("chosen_score"),
            F.col("_score").alias("rejected_score"),
        )
    return pairs.withColumn(
        "margin",
        (F.col("chosen_score") - F.col("rejected_score")).cast("double"),
    ).filter(F.col("margin") > F.lit(float(min_margin)))


def dpo_token_samples(
    pairs: DataFrame,
    merges: list,
    pair_col: str = "prompt_id",
    prompt_text_col: str = "prompt",
    chosen_col: str = "chosen",
    rejected_col: str = "rejected",
    lowercase: bool = True,
) -> DataFrame:
    """Preference pairs -> paired token samples: ``(pair, chosen_tokens,
    chosen_mask, rejected_tokens, rejected_mask, n_chosen_tokens,
    n_rejected_tokens)`` — what a DPO trainer consumes: both sides
    tokenized under ONE tokenizer, each with a position-aligned loss
    mask that is 1 exactly over the response content (the policy /
    reference log-prob sums run over masked positions only).

    Built BY REUSE, not re-derivation: each pair explodes into two
    2-turn conversations — ``(user, prompt), (assistant, response)``
    keyed ``<pair>#chosen`` / ``<pair>#rejected`` — and rides
    :func:`sft_token_samples`' aligned-by-construction contract
    verbatim (same header form, same per-turn encode independence, same
    NULL-role guard); the two sides then pivot back onto one row. Any
    fix to the SFT alignment semantics is a fix here for free.

    Scale shape: sft_token_samples' two Arrow passes over 2x the pair
    count of 2-row conversations, plus one pair-keyed pivot (a groupBy
    with two first() aggregates — no join)."""
    pc = F.col(pair_col).cast("string")
    # duplicate pair keys would collapse SILENTLY: both rows' sides mint
    # the SAME conv_id ("<pair>#chosen"), so sft_token_samples'
    # conversation grouping merges two distinct responses into one
    # 4-turn conversation before any downstream check can see them
    # (best_rest/adjacent pairings emit several rows per prompt — those
    # need a per-pair surrogate key). Guard UPSTREAM of the explode,
    # in-plan, on the pairs frame itself.
    n_per_pair = F.count(F.lit(1)).over(Window.partitionBy(pair_col))
    prompt_guarded = F.when(
        n_per_pair > F.lit(1),
        F.raise_error(
            F.concat(
                F.lit(
                    "dpo_token_samples: duplicate pair key — one row per "
                    f"{pair_col!r} required (best_rest/adjacent pairings "
                    "need a surrogate pair id): "
                ),
                pc,
            )
        ).cast("string"),
    ).otherwise(F.col(prompt_text_col))
    # the guard lives in its OWN projection: a window expression and a
    # generator in one select plant the Generate below the Window, so
    # the count would see the exploded (2-rows-per-pair) frame and fire
    # on every pair
    guarded = pairs.select(
        pc.alias("_pair"),
        prompt_guarded.alias("_prompt"),
        F.col(chosen_col).alias("_chosen"),
        F.col(rejected_col).alias("_rejected"),
    )
    two = guarded.select(
        "_pair",
        "_prompt",
        F.explode(
            F.array(
                F.struct(
                    F.lit("chosen").alias("side"),
                    F.col("_chosen").alias("resp"),
                ),
                F.struct(
                    F.lit("rejected").alias("side"),
                    F.col("_rejected").alias("resp"),
                ),
            )
        ).alias("_s"),
    )
    msgs = two.select(
        F.concat("_pair", F.lit("#"), F.col("_s.side")).alias("conv_id"),
        F.explode(
            F.array(
                F.struct(
                    F.lit(0).alias("turn_idx"),
                    F.lit("user").alias("role"),
                    F.col("_prompt").alias("text"),
                ),
                F.struct(
                    F.lit(1).alias("turn_idx"),
                    F.lit("assistant").alias("role"),
                    F.col("_s.resp").alias("text"),
                ),
            )
        ).alias("_t"),
    ).select("conv_id", "_t.turn_idx", "_t.role", "_t.text")
    samples = sft_token_samples(msgs, merges, lowercase=lowercase)
    split = F.split(F.col("conv_id"), "#", -1)
    # rsplit semantics: the side tag is the LAST segment (pair ids may
    # themselves contain '#'), the pair key is everything before it
    side = F.element_at(split, -1)
    pair = F.expr(
        "substring(conv_id, 1, length(conv_id) - length(element_at("
        "split(conv_id, '#', -1), -1)) - 1)"
    )
    tagged = samples.select(
        pair.alias(pair_col),
        side.alias("_side"),
        "bpe_tokens",
        "loss_mask",
        "n_tokens",
    )
    return (
        tagged.groupBy(pair_col)
        .pivot("_side", ["chosen", "rejected"])
        .agg(
            F.first("bpe_tokens").alias("tokens"),
            F.first("loss_mask").alias("mask"),
            F.first("n_tokens").alias("n_tokens"),
        )
        .select(
            pair_col,
            F.col("chosen_tokens"),
            F.col("chosen_mask"),
            F.col("rejected_tokens"),
            F.col("rejected_mask"),
            F.col("chosen_n_tokens").alias("n_chosen_tokens"),
            F.col("rejected_n_tokens").alias("n_rejected_tokens"),
        )
    )


def best_of_n(
    df: DataFrame,
    prompt_col: str = "prompt_id",
    prompt_text_col: str = "prompt",
    response_col: str = "response",
    score_col: str = "score",
    min_score: float | None = None,
    min_margin: float | None = None,
) -> DataFrame:
    """Rejection-sampling SFT assembly (the Llama 2 §3.2.2 recipe /
    rejection-sampling fine-tuning): keep the single highest-scoring
    candidate response per prompt as a supervised training row — the
    sibling of :func:`preference_pairs` when the downstream consumer is
    SFT rather than DPO (same candidate frame, winner-only output that
    feeds render_sft_samples directly).

    Output per surviving prompt: ``(prompt_id, prompt, response, score,
    n_candidates, margin)`` with margin = winner minus runner-up (6dp;
    NULL for single-candidate prompts — there was no competition).
    Ranking uses the repo's total order (score desc, response asc) so
    the winner is deterministic on any engine; a NULL score raises
    in-plan (the preference_pairs NULL-score contract).

    ``min_score`` drops weak winners (the reward-model floor);
    ``min_margin`` drops ambiguous wins AND single-candidate prompts
    (a NULL margin cannot certify the min — require real competition
    when you ask for separation).

    One prompt-keyed window pass: rank, runner-up (lead), and candidate
    count share the single sort; no joins, no collect.
    """
    sc = F.when(
        F.col(score_col).isNull(),
        F.raise_error(
            F.lit(
                f"best_of_n: NULL in score column {score_col!r} — every "
                "candidate response must carry a score; drop or impute "
                "upstream"
            )
        ).cast(df.schema[score_col].dataType.simpleString()),
    ).otherwise(F.col(score_col))
    w = Window.partitionBy(prompt_col).orderBy(
        F.col("_sc").desc(), F.col(response_col).asc()
    )
    wall = Window.partitionBy(prompt_col)
    ranked = df.select(
        F.col(prompt_col),
        F.col(prompt_text_col),
        F.col(response_col),
        sc.alias("_sc"),
    ).select(
        "*",
        F.row_number().over(w).alias("_rn"),
        F.lead("_sc").over(w).alias("_runner_up"),
        F.count(F.lit(1)).over(wall).alias("n_candidates"),
    )
    out = ranked.filter(F.col("_rn") == 1).select(
        F.col(prompt_col),
        F.col(prompt_text_col),
        F.col(response_col),
        F.col("_sc").alias(score_col),
        F.col("n_candidates").cast("bigint").alias("n_candidates"),
        F.round(F.col("_sc") - F.col("_runner_up"), 6).alias("margin"),
    )
    if min_score is not None:
        out = out.filter(F.col(score_col) >= F.lit(float(min_score)))
    if min_margin is not None:
        out = out.filter(F.col("margin") >= F.lit(float(min_margin)))
    return out
