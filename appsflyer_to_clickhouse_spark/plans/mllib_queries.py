"""MLlib-backed scale variants of the dedup/similarity operators
(SURVEY.md §2 Part C "Spark primitive" column names MLlib LSH as the
scale-out path; these register it alongside the hand-rolled,
oracle-checked md5 implementations).

Both are seeded and deterministic but their hash families are JVM-
internal, so no DuckDB twin exists — they carry rows-only checks, and
tests/test_mllib_recall.py pins their recall against the exact
brute-force results instead.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .registry import load, load_fanout, register

_SEED = 42


@register("dedup_minhash_mllib", None)
def q_dedup_minhash_mllib(spark, sf_dir):
    """MLlib MinHashLSH near-dup pairs over word 3-shingles (NGram),
    matching the md5 implementation's unit of similarity: HashingTF
    (binary, no fitted vocabulary — deterministic feature hashing) ->
    MinHashLSH(seed=42, 5 tables) -> approxSimilarityJoin at Jaccard
    distance <= 0.3. The distributed join is bucketed by LSH band
    internally — the same never-all-pairs property as the md5
    implementation."""
    from pyspark.ml.feature import HashingTF, MinHashLSH, NGram, Tokenizer

    docs = load_fanout(spark, sf_dir, "documents").select("doc_id", "text")
    toks = Tokenizer(inputCol="text", outputCol="words").transform(docs)
    grams = NGram(n=3, inputCol="words", outputCol="shingles").transform(toks)
    feats = HashingTF(
        inputCol="shingles", outputCol="features", numFeatures=1 << 18, binary=True
    ).transform(grams)
    model = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=5, seed=_SEED
    ).fit(feats)
    joined = model.approxSimilarityJoin(feats, feats, 0.3, distCol="jaccard_dist")
    return (
        joined.filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("id_a"),
            F.col("datasetB.doc_id").alias("id_b"),
            F.round("jaccard_dist", 6).alias("jaccard_dist"),
        )
        .distinct()
    )


@register("similarity_ivf_kmeans", None)
def q_similarity_ivf_kmeans(spark, sf_dir):
    """Real IVF: seeded KMeans builds 16 coarse clusters over the
    embeddings, the query probes its 2 nearest clusters, exact cosine
    re-ranks — the production form of similarity_ivf_probe (which uses
    the pre-existing label column as a stand-in quantizer). Iterative
    k-means is not SQL-expressible (rows-only here); recall vs brute
    force is pinned in tests/test_mllib_recall.py."""
    from ..operators.ivf import build_ivf, probe_ivf

    emb = load_fanout(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    assigned, model = build_ivf(emb, "v", n_clusters=16)
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).head()["v"]]
    return probe_ivf(assigned, model, qv, k=10, n_probe=2)


@register("similarity_brp_mllib", None)
def q_similarity_brp_mllib(spark, sf_dir):
    """MLlib BucketedRandomProjectionLSH approximate nearest
    neighbours: euclidean-bucketed probe of the query vector's
    neighbourhood, k=10. The 100 TB form of similarity_topk when the
    corpus is pre-bucketed at ingest."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    emb = load_fanout(spark, sf_dir, "embeddings").select(
        "vec_id", array_to_vector(F.col("embedding").cast("array<double>")).alias("features")
    )
    model = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes", bucketLength=2.0, seed=_SEED
    ).fit(emb)
    query = emb.filter(F.col("vec_id") == 0).head()
    nn = model.approxNearestNeighbors(emb, query["features"], 10, distCol="dist")
    return nn.select("vec_id", F.round("dist", 6).alias("dist"))


@register("dedup_semantic_kmeans", None)
def q_dedup_semantic_kmeans(spark, sf_dir):
    """SemDeDup with the PRODUCTION quantizer: seeded-KMeans centroids
    (operators/ivf.py:build_ivf — sample-fit, full-corpus map-only
    assignment) replace dedup_semantic's md5 ternary prototypes; the
    in-cluster cosine prune is the SAME shared stage
    (operators/dedup.py:semantic_prune), so the paper's K grows-with-n
    contract is executed code here, not documentation. Iterative
    k-means is not SQL-expressible (rows-only); the prune is
    recomputed brute-force over this query's own deterministic
    assignment and compared exactly in tests/test_mllib_recall.py."""
    from ..operators.dedup import semantic_prune
    from ..operators.ivf import build_ivf
    from ..operators.similarity import dot

    emb = load_fanout(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    assigned, _ = build_ivf(emb, "v", n_clusters=8)
    # semantic_prune references its input four times (group agg, both
    # verify-join sides, survivor anti-join) and Spark has no cross-
    # input subplan reuse — without a materialization barrier the
    # full-corpus scan + KMeans transform would execute ~4x per run.
    # The md5-prototype twin tolerates that shape (its assignment is a
    # cheap codegen expression); an MLlib transform does not.
    clustered = assigned.select(
        "vec_id", "v", dot(F.col("v"), F.col("v")).alias("nn"), "cluster"
    ).localCheckpoint()
    return semantic_prune(clustered, 0.3)


@register("text_quality_classifier", None)
def q_text_quality_classifier(spark, sf_dir):
    """Model-based quality filtering (the CCNet/C4-style curation
    step): a logistic regression is TRAINED on cheap deterministic
    text features (token count, punctuation ratio, stopword ratio,
    char length) against the repo's rule-based keep flag, then SCORES
    a held-out hash split — the standard path from hand-tuned
    thresholds to a learned filter whose decision boundary transfers
    to unlabeled corpora. Deterministic data flow: features are the
    shared quality_flags projection, the train/test split is an
    md5-hash bucket (stable across runs/engines), and the model is
    seeded; LBFGS training itself is iterative and not
    SQL-expressible, so like the other MLlib builds this is rows-only
    — tests/test_mllib_recall.py pins held-out accuracy against the
    rule labels instead. At 100 TB: training runs on a feature SAMPLE
    (one treeAggregate per iteration over ~8-dim rows), scoring is a
    map-only transform over the full corpus."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.functions import vector_to_array

    from .text_queries import quality_flags

    docs = load(spark, sf_dir, "documents")
    feats = quality_flags(docs).select(
        "doc_id",
        F.col("n_tokens").cast("double").alias("n_tokens"),
        "punct_ratio",
        "stopword_ratio",
        F.length("text").cast("double").alias("char_len"),
        F.col("keep").cast("double").alias("label"),
    ).localCheckpoint()  # tokenization-heavy; train AND test consume it
    bucket = F.expr(
        "conv(substr(md5(cast(doc_id AS string)), 1, 15), 16, 10) % 5"
    )
    train = feats.filter(bucket != 0)
    test = feats.filter(bucket == 0)
    asm = VectorAssembler(
        inputCols=["n_tokens", "punct_ratio", "stopword_ratio", "char_len"],
        outputCol="features",
    )
    lr = LogisticRegression(
        maxIter=50, regParam=0.0, standardization=True, tol=1e-8
    )
    # feats is checkpointed above, so LBFGS's per-iteration re-scan
    # only re-runs the cheap vector assembly, never the tokenization
    model = lr.fit(asm.transform(train))
    # Score with the model SAVED AND RELOADED — not a test nicety but
    # a serialization requirement: a freshly-fit model carries its
    # trainingSummary, the summary holds the training DataFrame and
    # therefore the SparkSession, and the session's ObservationManager
    # is not serializable — so the prediction UDF's closure fails to
    # clean on any FULL materialization of the scored frame (count()
    # masked it by pruning the UDF column; the bench's noop write
    # found it). Loading drops the summary; it is also the deployed
    # shape — production scores with a persisted model artifact.
    import tempfile

    from pyspark.ml.classification import LogisticRegressionModel

    path = tempfile.mkdtemp(prefix="spark_graft_lr_") + "/model"
    model.write().overwrite().save(path)
    model = LogisticRegressionModel.load(path)
    scored = model.transform(asm.transform(test))
    return scored.select(
        "doc_id",
        F.col("label").cast("boolean").alias("rule_keep"),
        F.col("prediction").cast("boolean").alias("model_keep"),
        F.round(vector_to_array("probability")[1], 6).alias("p_keep"),
    )
