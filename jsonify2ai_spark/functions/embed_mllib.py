"""Native-Spark embedding family (SURVEY §2.9): MLlib stages as drop-in
alternatives to the external embedding transport.

The reference embeds through an HTTP model server (embed_ollama.py:54-114) or
the deterministic dev mode. On a cluster there is a third, fully native
option: fit an MLlib stage on the corpus itself — HashingTF+IDF for a sparse
lexical embedding (no vocabulary state, hashing is stateless and
deterministic) or Word2Vec for a dense distributional one. Both produce the
same ``array<double>`` vector column every other operator consumes
(cosine_topk, similarity_self_join, IVF/LSH ANN), so the embedding provider
is swappable per SURVEY's north star: dev-mode expression ↔ live UDF ↔
MLlib stage, one column contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jsonify2ai_spark.functions.text import tokens


def tfidf_embeddings(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "vector",
    dim: int = 256,
):
    """(df + ``out_col`` array<double>, fitted IDF model).

    Tokenization is the engine's own JVM ``tokens()`` (regex parity with
    every other operator — MLlib's Tokenizer lowercases, which would break
    the shared-token contract), then HashingTF (stateless, deterministic,
    no vocabulary to ship) and a corpus-fit IDF. The fit is one extra pass;
    transform is map-only. ``dim`` buckets bound memory at any corpus size —
    the classic scale trade: collisions, not a 1e8-term vocabulary.
    """
    from pyspark.ml.feature import IDF, HashingTF
    from pyspark.ml.functions import vector_to_array

    # NULL text -> NULL token array, which NPEs inside HashingTF; coalesce
    # to empty so NULL documents embed as zero vectors instead of killing
    # the fit job (the sibling text operators all tolerate NULL)
    toked = df.withColumn(
        "_tok", F.coalesce(tokens(F.col(text_col)), F.array().cast("array<string>"))
    )
    tf = HashingTF(inputCol="_tok", outputCol="_tf", numFeatures=dim)
    tfed = tf.transform(toked)
    idf = IDF(inputCol="_tf", outputCol="_idf").fit(tfed)
    out = (
        idf.transform(tfed)
        .withColumn(out_col, vector_to_array(F.col("_idf")).cast("array<double>"))
        .drop("_tok", "_tf", "_idf")
    )
    return out, idf


def word2vec_embeddings(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "vector",
    dim: int = 64,
    min_count: int = 1,
    seed: int = 7,
    num_partitions: int = 1,
):
    """(df + ``out_col`` array<double>, fitted Word2Vec model).

    Dense distributional embeddings trained on the corpus itself (document
    vector = mean of word vectors, MLlib's convention). ``num_partitions=1``
    + fixed seed keeps training deterministic for tests; raise it at real
    scale and accept run-to-run drift (training is async SGD — that is
    inherent, not a bug).
    """
    from pyspark.ml.feature import Word2Vec
    from pyspark.ml.functions import vector_to_array

    toked = df.withColumn(
        "_tok", F.coalesce(tokens(F.col(text_col)), F.array().cast("array<string>"))
    )
    w2v = Word2Vec(
        inputCol="_tok",
        outputCol="_w2v",
        vectorSize=dim,
        minCount=min_count,
        seed=seed,
        numPartitions=num_partitions,
    ).fit(toked)
    out = (
        w2v.transform(toked)
        .withColumn(out_col, vector_to_array(F.col("_w2v")).cast("array<double>"))
        .drop("_tok", "_w2v")
    )
    return out, w2v
