"""Learned quality classifier — the GPT-3/PaLM-style *model-based* quality
filter that complements the rule-based gates (Gopher word statistics,
C4 page structure): train a linear classifier to score "looks like the
high-quality reference distribution" vs "looks like raw crawl", then keep
or importance-sample by score (Brown et al. 2020 §A; the fasttext
classifier CCNet/RedPajama-style pipelines run).

Spark-native shape: HashingTF over the engine's own JVM tokenizer (no
vocabulary state to ship — the classic scale trade of hash collisions for
O(1) memory at any corpus size) into MLlib LogisticRegression. Training
touches the labeled seed sets once; SCORING is a map-only transform —
zero shuffles, so the filter runs inside any ingest or prep pass at
100 TB. The fitted model is ~dim floats on the driver, broadcast by
MLlib's transform.

No contract row by design: the LR fit is iterative (the oracle policy's
pytest-only class, like train_bpe); behavior is pinned by tests —
separable corpora train to AUC ~1, scores are deterministic for a fixed
seed, and the keep-fraction contract holds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jsonify2ai_spark.functions.text import tokens


def _featurize(df: DataFrame, text_col: str, dim: int) -> DataFrame:
    from pyspark.ml.feature import HashingTF

    toked = df.withColumn(
        "_tok",
        F.coalesce(tokens(F.lower(F.col(text_col))), F.array().cast("array<string>")),
    )
    tf = HashingTF(inputCol="_tok", outputCol="_features", numFeatures=dim)
    return tf.transform(toked).drop("_tok")


def train_quality_classifier(
    good: DataFrame,
    bad: DataFrame,
    text_col: str = "text",
    dim: int = 4096,
    reg_param: float = 1e-3,
    max_iter: int = 50,
):
    """Fit the quality LR on labeled seeds: ``good`` = the high-quality
    reference sample (the role Wikipedia/books play in the GPT-3 recipe),
    ``bad`` = raw-crawl sample. Returns the fitted PipelineModel-free pair
    (HashingTF is stateless — only the LR model carries weights)."""
    from pyspark.ml.classification import LogisticRegression

    labeled = _featurize(
        good.select(F.col(text_col)).withColumn("_label", F.lit(1.0)).unionByName(
            bad.select(F.col(text_col)).withColumn("_label", F.lit(0.0))
        ),
        text_col,
        dim,
    )
    lr = LogisticRegression(
        featuresCol="_features",
        labelCol="_label",
        regParam=reg_param,
        maxIter=max_iter,
        standardization=False,
    )
    return lr.fit(labeled)


def score_quality(
    df: DataFrame,
    model,
    text_col: str = "text",
    out_col: str = "quality_prob",
    dim: int = 4096,
) -> DataFrame:
    """Append P(high-quality) per document — map-only (hash featurize +
    broadcast linear model), streamable and ingest-embeddable."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(_featurize(df, text_col, dim))
    return scored.withColumn(
        out_col, vector_to_array(F.col(model.getProbabilityCol())).getItem(1)
    ).drop("_features", model.getRawPredictionCol(), model.getProbabilityCol(), model.getPredictionCol())


def quality_filter(
    df: DataFrame,
    model,
    threshold: float = 0.5,
    text_col: str = "text",
    dim: int = 4096,
) -> DataFrame:
    """Keep documents with P(high-quality) >= threshold. For the GPT-3
    paper's softer variant — keep with probability ~ score (importance
    sampling rather than a hard cut) — filter on
    ``quality_prob >= rand(seed)`` downstream of :func:`score_quality`."""
    return score_quality(df, model, text_col, dim=dim).filter(
        F.col("quality_prob") >= threshold
    )
