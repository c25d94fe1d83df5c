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


def tfidf_hashed_weights(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 256,
) -> DataFrame:
    """Sparse hashed TF-IDF weights: (id, bucket, w) — the SQL-expressible
    member of the embedding family.

    Same shape as :func:`tfidf_embeddings` (hash tokens into ``dim`` buckets,
    tf * idf per bucket) but with the engine-portable md5 bucket hash instead
    of MLlib's murmur3, and kept SPARSE: no dense array is materialized, so
    the value path is joins/aggregations end to end and a DuckDB oracle can
    replay it bit for bit. IDF uses MLlib's formula ln((N+1)/(df+1)) so the
    two family members stay semantically aligned. One shuffle (the per-doc
    bucket aggregation); the per-bucket document frequencies are <= ``dim``
    rows and broadcast.

    Cite: reference embedding contract worker/app/services/embed_ollama.py:
    54-114 (swappable provider, one vector-column contract).
    """
    toked = df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("_t"))
    bucketed = toked.select(
        F.col(id_col),
        F.pmod(
            F.conv(F.substring(F.md5(F.col("_t")), 1, 15), 16, 10).cast("bigint"),
            F.lit(dim),
        ).alias("bucket"),
    )
    tf = bucketed.groupBy(id_col, "bucket").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("bucket").agg(F.count(F.lit(1)).alias("df_b"))
    n_docs = df.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        tf.join(F.broadcast(dfreq), "bucket")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col(id_col),
            F.col("bucket"),
            (
                F.col("tf")
                * F.log((F.col("n_docs") + F.lit(1.0)) / (F.col("df_b") + F.lit(1.0)))
            ).alias("w"),
        )
        # a bucket present in EVERY doc has idf 0 — dead weight in a sparse
        # layout (it would join every doc against every probe for a zero
        # contribution); dropping it is the sparse twin of MLlib's idf-zeroing
        .filter(F.col("w") != 0)
    )


def tfidf_cosine_topk(
    df: DataFrame,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 256,
) -> DataFrame:
    """Top-k docs by TF-IDF cosine against the corpus's lowest-id document
    (the deterministic lowest-id self-probe), entirely via sparse joins:
    dot product = sum over shared buckets, norms from one aggregation.
    Docs sharing no bucket with the probe score 0 and are omitted — the
    standard sparse-retrieval contract. Output (id, tfidf_cosine) rounded
    to 6dp, ties broken by id."""
    w = tfidf_hashed_weights(df, text_col, id_col, dim).localCheckpoint(eager=False)
    probe_id = df.agg(F.min(F.col(id_col)).alias("_pid"))
    probe = (
        w.join(F.broadcast(probe_id), F.col(id_col) == F.col("_pid"))
        .select(F.col("bucket"), F.col("w").alias("pw"))
    )
    norms = w.groupBy(id_col).agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm"))
    pnorm = probe.agg(F.sqrt(F.sum(F.col("pw") * F.col("pw"))).alias("pnrm"))
    dots = (
        w.join(F.broadcast(probe), "bucket")
        .groupBy(id_col)
        .agg(F.sum(F.col("w") * F.col("pw")).alias("dot"))
    )
    return (
        dots.join(norms, id_col)
        .crossJoin(F.broadcast(pnorm))
        .filter((F.col("nrm") > 0) & (F.col("pnrm") > 0))
        .select(
            F.col(id_col),
            F.round(F.col("dot") / (F.col("nrm") * F.col("pnrm")), 6).alias(
                "tfidf_cosine"
            ),
        )
        .orderBy(F.col("tfidf_cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


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
