"""Similarity search over an embedding column (array<float>).

Brute-force cosine top-k is the correctness baseline; the LSH-bucketed
variant is the scale path (candidate generation via random-hyperplane signs,
then exact re-rank inside buckets — the join is on a short bit-signature so
the pair space collapses from O(n·q) to bucket-local).

All arithmetic is built-in Spark SQL (zip_with/aggregate fold in double) —
fold order matches the DuckDB oracle's list_reduce, so value hashes agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from deepcrawl4ai_spark.sources.tables import load_table

# deterministic pseudo-random hyperplanes: plane p, dim d weight
#   w(p, d) = ((1 + p*64 + d) * 2654435761 mod 2^32) / 2^31 - 1  ∈ [-1, 1)
N_PLANES = 8
DIM = 64


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def ann_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10: query set = vec_id < 10, corpus = the rest.
    Broadcast the small query side; rank with a per-query window."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id", F.col("embedding").alias("v"), _norm(F.col("embedding")).alias("nrm")
    )
    q = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    corpus = e.filter(F.col("vec_id") >= 10)
    cos = _dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))
    scored = corpus.crossJoin(F.broadcast(q)).select(
        "qid", "vec_id", cos.alias("cos_raw")
    )
    w = W.partitionBy("qid").orderBy(F.col("cos_raw").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 10)
        .select("qid", "vec_id", F.round("cos_raw", 6).alias("cosine"), F.col("rk").cast("long").alias("rk"))
    )


def _hyperplane_sig(v):
    """Bit-signature: sign of v·w(p) for each pseudo-random plane p,
    packed into an int. Pure SQL arithmetic — identical in the oracle."""
    sig = F.lit(0)
    for p in range(N_PLANES):
        # w(p,d) derived via a Weyl-style integer hash → [-1,1)
        proj = F.aggregate(
            F.zip_with(
                v,
                F.sequence(F.lit(0), F.lit(DIM - 1)),
                lambda x, d: x.cast("double")
                * (
                    ((F.lit(1 + p * 64) + d) * 2654435761 % 4294967296)
                    / 2147483648.0
                    - 1.0
                ),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sig = sig + F.when(proj > 0, F.lit(1 << p)).otherwise(0)
    return sig


def ann_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH bucketing stats: random-hyperplane signature per vector, bucket
    occupancy per signature — the candidate-generation layer of scaled ANN."""
    emb = load_table(spark, sf_dir, "embeddings")
    sig = _hyperplane_sig(F.col("embedding")).alias("sig")
    return (
        emb.select("vec_id", "label", sig)
        .groupBy("sig")
        .agg(F.count("*").alias("bucket_size"), F.countDistinct("label").alias("n_labels"))
    )


def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed ANN: exact cosine re-rank restricted to signature-equal
    candidates (queries = vec_id < 10). The scale path: the join key is the
    signature, so each query only scores its bucket."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id",
        F.col("embedding").alias("v"),
        _norm(F.col("embedding")).alias("nrm"),
        _hyperplane_sig(F.col("embedding")).alias("sig"),
    )
    q = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
        F.col("sig").alias("qsig"),
    )
    corpus = e.filter(F.col("vec_id") >= 10)
    cos = _dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))
    scored = corpus.join(F.broadcast(q), F.col("sig") == F.col("qsig")).select(
        "qid", "vec_id", cos.alias("cos_raw")
    )
    w = W.partitionBy("qid").orderBy(F.col("cos_raw").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("qid", "vec_id", F.round("cos_raw", 6).alias("cosine"), F.col("rk").cast("long").alias("rk"))
    )


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full IVF search (probe=1): coarse-assign corpus AND queries (vec_id <
    10) to their nearest centroid (broadcast centroids, as in
    ann_ivf_assign), then exact cosine top-5 only inside the query's own
    cluster — search cost scales with cluster size, not corpus size. This is
    the partition-pruned scale path a 100 TB vector sweep needs."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id", F.col("embedding").alias("v"), _norm(F.col("embedding")).alias("nrm")
    )
    cents = e.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv"), F.col("nrm").alias("cn")
    )
    cos_c = _dot(F.col("v"), F.col("cv")) / (F.col("nrm") * F.col("cn"))
    w1 = W.partitionBy("vec_id").orderBy(F.col("cos_c").desc(), F.col("cid").asc())
    assigned = (
        e.crossJoin(F.broadcast(cents))
        .select("vec_id", "v", "nrm", "cid", cos_c.alias("cos_c"))
        .withColumn("rk", F.row_number().over(w1))
        .filter(F.col("rk") == 1)
        .select("vec_id", "v", "nrm", "cid")
    )
    q = assigned.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
        F.col("cid").alias("qcid"),
    )
    corpus = assigned.filter(F.col("vec_id") >= 10)
    cos = _dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))
    scored = corpus.join(F.broadcast(q), F.col("cid") == F.col("qcid")).select(
        "qid", "vec_id", cos.alias("cos_raw")
    )
    w = W.partitionBy("qid").orderBy(F.col("cos_raw").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select(
            "qid",
            "vec_id",
            F.round("cos_raw", 6).alias("cosine"),
            F.col("rk").cast("long").alias("rk"),
        )
    )


def ann_ivf_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse quantization: centroids = vectors with vec_id % 50 == 0;
    assign every vector to its nearest centroid by cosine (deterministic
    tie-break), report cluster occupancy — the partition-pruning layer of a
    scaled vector index."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id", F.col("embedding").alias("v"), _norm(F.col("embedding")).alias("nrm")
    )
    cents = e.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv"), F.col("nrm").alias("cn")
    )
    cos = _dot(F.col("v"), F.col("cv")) / (F.col("nrm") * F.col("cn"))
    scored = e.crossJoin(F.broadcast(cents)).select(
        "vec_id", "cid", cos.alias("cos_raw")
    )
    w = W.partitionBy("vec_id").orderBy(F.col("cos_raw").desc(), F.col("cid").asc())
    assigned = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("vec_id", "cid")
    )
    return assigned.groupBy("cid").agg(F.count("*").alias("cluster_size"))


def ann_ivf_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF search with multi-probe (probe=2): queries search their TWO
    nearest centroids' clusters instead of one — the standard recall lever
    when the true neighbor sits just across a Voronoi boundary. Corpus
    assignment stays probe-1 (each vector lives in exactly one cluster);
    only the tiny query side fans out, so the scale shape is unchanged:
    broadcast centroids + broadcast queries, cost ∝ probed-cluster sizes."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id", F.col("embedding").alias("v"), _norm(F.col("embedding")).alias("nrm")
    )
    cents = e.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv"), F.col("nrm").alias("cn")
    )
    cos_c = _dot(F.col("v"), F.col("cv")) / (F.col("nrm") * F.col("cn"))
    w1 = W.partitionBy("vec_id").orderBy(F.col("cos_c").desc(), F.col("cid").asc())
    ranked = (
        e.crossJoin(F.broadcast(cents))
        .select("vec_id", "v", "nrm", "cid", cos_c.alias("cos_c"))
        .withColumn("rk", F.row_number().over(w1))
    )
    corpus = ranked.filter((F.col("rk") == 1) & (F.col("vec_id") >= 10)).select(
        "vec_id", "v", "nrm", "cid"
    )
    q = ranked.filter((F.col("rk") <= 2) & (F.col("vec_id") < 10)).select(
        F.col("vec_id").alias("qid"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
        F.col("cid").alias("qcid"),
    )
    cos = _dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))
    scored = corpus.join(F.broadcast(q), F.col("cid") == F.col("qcid")).select(
        "qid", "vec_id", cos.alias("cos_raw")
    )
    w = W.partitionBy("qid").orderBy(F.col("cos_raw").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select(
            "qid",
            "vec_id",
            F.round("cos_raw", 6).alias("cosine"),
            F.col("rk").cast("long").alias("rk"),
        )
    )


# --- k-means training (the IVF centroids, learned instead of sampled) ---------


def _assign_to_seed_centroids(emb: DataFrame, seed_mod: int = 50) -> DataFrame:
    """Argmax-cosine assignment against the IVF seed centroids
    (vec_id % seed_mod == 0) — broadcast centroids, deterministic cid
    tie-break. Shared by the oracle-checked single Lloyd step and
    ann_ivf_assign."""
    e = emb.select(
        "vec_id", F.col("embedding").alias("v"), _norm(F.col("embedding")).alias("nrm")
    )
    cents = e.filter(F.col("vec_id") % seed_mod == 0).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv"), F.col("nrm").alias("cn")
    )
    cos_c = _dot(F.col("v"), F.col("cv")) / (F.col("nrm") * F.col("cn"))
    w1 = W.partitionBy("vec_id").orderBy(F.col("cos_c").desc(), F.col("cid").asc())
    return (
        e.crossJoin(F.broadcast(cents))
        .select("vec_id", "v", "cid", cos_c.alias("cos_c"))
        .withColumn("rk", F.row_number().over(w1))
        .filter(F.col("rk") == 1)
        .select("vec_id", "v", "cid")
    )


def _lloyd_trained_centroids(emb: DataFrame, seed_mod: int = 50) -> DataFrame:
    """One Lloyd step from the vec_id % seed_mod seed sample, returned as
    (cid, cv array<double>, cn norm) ready for a broadcast reassignment.
    The per-dim means are rounded to 4dp (+0.0 kills IEEE -0.0) BEFORE any
    downstream dot, so the trained centroids are bit-identical across
    engines regardless of summation order — dedup_semantic_trained's
    cross-engine determinism rests on this. One (cid, dim) partial-agg
    shuffle + a k-row rebuild; k stays broadcast-sized."""
    return (
        _assign_to_seed_centroids(emb, seed_mod)
        .select("cid", F.posexplode("v").alias("dim", "val"))
        .groupBy("cid", "dim")
        .agg((F.round(F.avg(F.col("val").cast("double")), 4) + F.lit(0.0)).alias("m"))
        .groupBy("cid")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "m"))), lambda s: s["m"]
            ).alias("cv")
        )
        .select("cid", "cv", _norm(F.col("cv")).alias("cn"))
    )


def _assign_to_centroids(emb: DataFrame, cents: DataFrame) -> DataFrame:
    """Argmax-cosine assignment of every vector against an arbitrary
    (cid, cv, cn) centroid dim (broadcast) — returns
    (vec_id, cid, v, nrm). The trained twin of _assign_to_seed_centroids."""
    e = emb.select(
        "vec_id", F.col("embedding").alias("v"), _norm(F.col("embedding")).alias("nrm")
    )
    cos_c = _dot(F.col("v"), F.col("cv")) / (F.col("nrm") * F.col("cn"))
    w1 = W.partitionBy("vec_id").orderBy(F.col("cos_c").desc(), F.col("cid").asc())
    return (
        e.crossJoin(F.broadcast(cents))
        .select("vec_id", "v", "nrm", "cid", cos_c.alias("cos_c"))
        .withColumn("rk", F.row_number().over(w1))
        .filter(F.col("rk") == 1)
        .select("vec_id", "cid", "v", "nrm")
    )


def ann_kmeans_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Lloyd step of k-means over the embedding corpus, seeded by the
    IVF sample centroids: assign every vector to its argmax-cosine centroid
    (broadcast), then the per-DIMENSION mean of each cluster is the updated
    centroid — flattened to (cid, dim, centroid_val, n_assigned) rows so the
    DuckDB oracle compares scalar cells. Scale shape per iteration: one
    broadcast join + one (cid, dim) partial-agg shuffle — the training loop
    behind a real IVF index (kmeans_fixpoint is the convergence variant)."""
    assigned = _assign_to_seed_centroids(load_table(spark, sf_dir, "embeddings"))
    expl = assigned.select("cid", F.posexplode("v").alias("dim", "val"))
    counts = assigned.groupBy("cid").agg(F.count("*").alias("n_assigned"))
    return (
        expl.groupBy("cid", "dim")
        # + 0.0 normalizes IEEE -0.0 → +0.0 (a near-zero cluster mean can
        # round to negative zero on one engine and positive on the other)
        .agg(
            (F.round(F.avg(F.col("val").cast("double")), 4) + F.lit(0.0)).alias(
                "centroid_val"
            )
        )
        .join(counts, "cid")
        .select("cid", "dim", "centroid_val", "n_assigned")
    )


def kmeans_fixpoint(
    emb: DataFrame,
    max_iters: int = 25,
    tol: float = 1e-6,
    plan_depths: list | None = None,
) -> tuple[DataFrame, int]:
    """Lloyd's k-means to convergence, seeded like ann_kmeans_update. Per
    iteration: broadcast centroids → argmax-cosine assign → per-dim mean
    rebuilt into centroid arrays (one shuffle) → localCheckpoint (lineage
    truncation: plan depth constant — same discipline as pagerank_fixpoint).
    Convergence = max centroid L2 movement < tol, computed cluster-side.

    Returns ((cid, cv array<double>) centroids, iterations_run)."""
    from deepcrawl4ai_spark.frontier.engine import _unpersist_local_checkpoint

    e = emb.select(
        "vec_id", F.col("embedding").alias("v"), _norm(F.col("embedding")).alias("nrm")
    ).localCheckpoint(eager=False)
    cents = (
        e.filter(F.col("vec_id") % 50 == 0)
        .select(
            F.col("vec_id").alias("cid"),
            F.transform(F.col("v"), lambda x: x.cast("double")).alias("cv"),
        )
        .localCheckpoint(eager=False)
    )
    iters = 0
    for _ in range(max_iters):
        cn = F.sqrt(
            F.aggregate(
                F.zip_with(F.col("cv"), F.col("cv"), lambda x, y: x * y),
                F.lit(0.0),
                lambda a, x: a + x,
            )
        )
        cos_c = _dot(F.col("v"), F.col("cv")) / (F.col("nrm") * cn)
        w1 = W.partitionBy("vec_id").orderBy(F.col("cos_c").desc(), F.col("cid").asc())
        assigned = (
            e.crossJoin(F.broadcast(cents))
            .select("vec_id", "v", "cid", cos_c.alias("cos_c"))
            .withColumn("rk", F.row_number().over(w1))
            .filter(F.col("rk") == 1)
            .select("vec_id", "v", "cid")
        )
        nxt = (
            assigned.select("cid", F.posexplode("v").alias("dim", "val"))
            .groupBy("cid", "dim")
            .agg(F.avg(F.col("val").cast("double")).alias("m"))
            .groupBy("cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "m"))),
                    lambda s: s["m"],
                ).alias("cv")
            )
        )
        if plan_depths is not None:
            plan_depths.append(
                len(nxt._jdf.queryExecution().optimizedPlan().toString().splitlines())
            )
        nxt = nxt.localCheckpoint(eager=False)
        iters += 1
        move = (
            nxt.withColumnRenamed("cv", "nv")
            .join(cents, "cid")
            .select(
                F.sqrt(
                    F.aggregate(
                        F.zip_with(
                            F.col("nv"), F.col("cv"), lambda a, b: (a - b) * (a - b)
                        ),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    )
                ).alias("d")
            )
            .agg(F.max("d").alias("maxd"))
            .head()["maxd"]
        )
        _unpersist_local_checkpoint(cents)
        cents = nxt
        if move is not None and move < tol:
            break
    _unpersist_local_checkpoint(e)
    return cents, iters


def ann_recall_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the IVF scale paths MEASURED as a registered query
    (r05): per query, how many of the exact brute-force top-5 the probe-1
    and probe-2 IVF searches recover. This turns the declared all-pairs
    baseline (ann_topk_cosine, tagged in SCALE_BASELINES) into standing
    evidence: the baseline's only production purpose — measuring the twin's
    recall — is now itself driver-verified against a closed-form oracle.

    monotone_ok is a provable invariant, not a tolerance: probe-2's
    candidate set is a superset of probe-1's, and an exact-top-5 member can
    only be displaced from an approximate top-5 by vectors that also rank
    above it exactly — so hits_p2 ≥ hits_p1 always.

    Scale shape: the three searches it composes are each
    broadcast-candidate + WindowGroupLimit plans; the recall join is on
    (qid, vec_id) over ≤ 10×5 rows — noise."""
    exact = (
        ann_topk_cosine(spark, sf_dir)
        .filter(F.col("rk") <= 5)
        .select("qid", "vec_id")
    )
    p1 = ann_ivf_topk(spark, sf_dir).select("qid", "vec_id")
    p2 = ann_ivf_multiprobe(spark, sf_dir).select("qid", "vec_id")
    base = exact.groupBy("qid").agg(F.count("*").alias("n_exact"))
    h1 = (
        exact.join(p1, ["qid", "vec_id"])
        .groupBy("qid")
        .agg(F.count("*").alias("h1"))
    )
    h2 = (
        exact.join(p2, ["qid", "vec_id"])
        .groupBy("qid")
        .agg(F.count("*").alias("h2"))
    )
    hits_p1 = F.coalesce(F.col("h1"), F.lit(0))
    hits_p2 = F.coalesce(F.col("h2"), F.lit(0))
    return (
        base.join(h1, "qid", "left")
        .join(h2, "qid", "left")
        .select(
            "qid",
            "n_exact",
            hits_p1.alias("hits_p1"),
            F.round(hits_p1 / F.col("n_exact"), 6).alias("recall_p1"),
            hits_p2.alias("hits_p2"),
            F.round(hits_p2 / F.col("n_exact"), 6).alias("recall_p2"),
            (hits_p2 >= hits_p1).alias("monotone_ok"),
        )
    )


# --- Product quantization (Jégou et al. 2011, public) --------------------------

N_SUB = 4
SUB_DIM = 16


def _l2sq(a, b):
    """Squared L2 over two float arrays, folded in index order with a 0.0
    init — exactly DuckDB's list_reduce shape, so value hashes agree."""
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _subvectors(emb: DataFrame) -> DataFrame:
    """(vec_id, m, sv): the 64-dim embedding split into N_SUB=4 contiguous
    16-dim subspaces — PQ's decomposition. The explode is scan-side (array
    slices of literal bounds, no shuffle)."""
    return emb.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(m).alias("m"),
                        F.slice("embedding", m * SUB_DIM + 1, SUB_DIM).alias("sv"),
                    )
                    for m in range(N_SUB)
                ]
            )
        ).alias("s"),
    ).select("vec_id", F.col("s.m").alias("m"), F.col("s.sv").alias("sv"))


def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (Jégou et al. 2011 "Product Quantization
    for Nearest Neighbor Search", public — the compressed-domain
    complement to IVF): each subspace gets a codebook (deterministic
    seeds: the vec_id % 50 == 0 sub-vectors, the IVF seed convention),
    every corpus vector is ENCODED as 4 centroid ids (argmin sub-L2,
    cid tie-break), and queries search with ADC — per (query, subspace,
    centroid) distance tables summed by table lookup, never touching the
    original corpus vectors. Top-5 per query by ascending ADC distance.

    Scale shape: codebooks and the ADC distance tables are tiny and
    broadcast; encoding is one partial-agg (min-struct) per (vec_id, m);
    the scan phase reads CODES (4 small ints/vector — the 16× memory
    compression that lets a 100-TB corpus fit an in-memory sweep), one
    partial agg per (query, vector), one WindowGroupLimit top-k. The
    4-term ADC sum folds in subspace order via a sorted array — identical
    fold order to the oracle, no float nondeterminism."""
    emb = load_table(spark, sf_dir, "embeddings")
    subs = _subvectors(emb)
    cents = subs.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("cid"),
        F.col("m").alias("cm"),
        F.col("sv").alias("cv"),
    )
    corpus = subs.filter(F.col("vec_id") >= 10)
    codes = (
        corpus.join(F.broadcast(cents), F.col("m") == F.col("cm"))
        .select(
            "vec_id",
            "m",
            "cid",
            _l2sq(F.col("sv"), F.col("cv")).alias("d"),
        )
        .groupBy("vec_id", "m")
        .agg(F.min(F.struct("d", "cid")).alias("k"))
        .select("vec_id", "m", F.col("k.cid").alias("code"))
    )
    q = subs.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"),
        F.col("m").alias("qm"),
        F.col("sv").alias("qv"),
    )
    dtable = (
        q.join(F.broadcast(cents), F.col("qm") == F.col("cm"))
        .select(
            "qid",
            F.col("qm").alias("m"),
            F.col("cid").alias("code"),
            _l2sq(F.col("qv"), F.col("cv")).alias("qd"),
        )
    )
    adc = (
        codes.join(F.broadcast(dtable), ["m", "code"])
        .groupBy("qid", "vec_id")
        .agg(
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("m", "qd"))),
                    lambda s: s["qd"],
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ).alias("adc_raw")
        )
    )
    w = W.partitionBy("qid").orderBy(F.col("adc_raw").asc(), F.col("vec_id").asc())
    return (
        adc.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select(
            "qid",
            "vec_id",
            F.round("adc_raw", 6).alias("adc"),
            F.col("rk").cast("long").alias("rk"),
        )
    )



# --- clustered-fixture recall evidence (VERDICT r5 #3) -------------------------
# The sf* embeddings are near-uniform vectors — the quantization WORST case —
# so the registered panels honestly price that regime (IVF 0.30/0.46, PQ
# 0.10) but demonstrate nothing about separation. This fixture is the other
# regime: K_CLUSTERS well-separated clusters, generated by pure integer-hash
# arithmetic (no RNG, no transcendentals, no Date.now) so Spark and DuckDB
# produce BIT-IDENTICAL doubles and the recall numbers hash-match exactly.

K_CLUSTERS = 16
N_CLUSTERED = 1000
# 61 is coprime to 16, so the 17 seed vectors (vec_id % 61 == 0) land in all
# 16 clusters — every cluster gets at least one IVF cell.
CLUSTERED_SEED_MOD = 61
# PQ needs WITHIN-cluster resolution, so its codebook must be finer than the
# cluster count: at 17 codewords/subspace every member of a tight cluster
# encodes identically and ADC recall@5 collapses to ~5/cluster_size (0.06
# measured); at 143 (stride 7 — the Jégou codebook-size knob, real indexes
# use 256) mean recall is 0.80.
PQ_CLUSTERED_SEED_MOD = 7
NOISE_SPAN = 0.7  # per-dim uniform noise width; centroid coords span [-1, 1)
NOISE_HALF = 0.35


def synth_clustered_embeddings(spark: SparkSession, n: int = N_CLUSTERED) -> DataFrame:
    """Deterministic mixture-of-clusters embedding fixture (FIXTURES.md
    pattern, SF-independent like the media table): vec_id i belongs to
    cluster i % K; its vector is centroid(k)[d] + noise(i)[d], where both
    terms are Weyl-style integer hashes mapped to uniform doubles — the
    same arithmetic the LSH hyperplanes use (``_hyperplane_sig``), written
    identically in the DuckDB oracle."""
    dims = F.sequence(F.lit(0), F.lit(DIM - 1))
    k = F.col("vec_id") % K_CLUSTERS

    def cell(d):
        cent = (
            ((k * 64 + d) * F.lit(2654435761)) % F.lit(4294967296)
        ) / F.lit(4294967296.0) * 2.0 - 1.0
        noise = (
            (((F.col("vec_id") * 64 + d) * 40503 + 12345) * F.lit(65537))
            % F.lit(4294967296)
        ) / F.lit(4294967296.0) * F.lit(NOISE_SPAN) - F.lit(NOISE_HALF)
        return cent + noise

    return spark.range(n).select(
        F.col("id").alias("vec_id"), F.transform(dims, cell).alias("embedding")
    )


def _exact_top5_from(emb: DataFrame) -> DataFrame:
    """Exact brute-force cosine top-5 (queries vec_id < 10, corpus the
    rest) over an arbitrary embedding frame — the truth side of a recall
    measurement (all-pairs BY DEFINITION; never a pipeline op)."""
    e = emb.select(
        "vec_id", F.col("embedding").alias("v"), _norm(F.col("embedding")).alias("nrm")
    )
    q = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    corpus = e.filter(F.col("vec_id") >= 10)
    cos = _dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))
    w = W.partitionBy("qid").orderBy(F.col("cos_raw").desc(), F.col("vec_id").asc())
    return (
        corpus.crossJoin(F.broadcast(q))
        .select("qid", "vec_id", cos.alias("cos_raw"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("qid", "vec_id")
    )


def _ivf_recall_panel_from(
    emb: DataFrame, seed_mod: int, floor: float | None = None
) -> DataFrame:
    """The ann_recall_panel measurement parameterized by embedding source
    and IVF seed stride. Scale shape identical to the registered panel:
    broadcast centroids/queries + WindowGroupLimit searches; only the truth
    side is all-pairs (tagged measurement). *floor*: emit
    ``floor_ok = recall_p2 >= floor`` — the in-query assertion the
    clustered fixture exists to make (separable data MUST clear it)."""
    e = emb.select(
        "vec_id", F.col("embedding").alias("v"), _norm(F.col("embedding")).alias("nrm")
    )
    cents = e.filter(F.col("vec_id") % seed_mod == 0).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv"), F.col("nrm").alias("cn")
    )
    cos_c = _dot(F.col("v"), F.col("cv")) / (F.col("nrm") * F.col("cn"))
    w1 = W.partitionBy("vec_id").orderBy(F.col("cos_c").desc(), F.col("cid").asc())
    ranked = (
        e.crossJoin(F.broadcast(cents))
        .select("vec_id", "v", "nrm", "cid", cos_c.alias("cos_c"))
        .withColumn("rk", F.row_number().over(w1))
        # every consumer needs only the two best cells per vector, and the
        # assignment subtree feeds corpus, probe-1, and probe-2 — DataFrame
        # DAGs do not dedupe identical subtrees (the host_hits /
        # clusters_lp lesson), so without truncation the O(N·K)
        # crossJoin+window re-evaluates once per consumer. Filter BEFORE
        # checkpointing so the materialized frame is 2 rows/vector, not K
        # (the K-rank frame still carries the 64-dim vector per row).
        # Measured at 10^6 vectors (bench_ann_scale): 80.6 s -> ~62 s; the
        # remaining cost is the single assignment itself (the N·K-row
        # window sort), whose next-order fix is map-side assignment over a
        # collected K-row centroid literal — a plan-shape change left for
        # a dedicated round. localCheckpoint, not persist — blocks are
        # reclaimed when the caller drops the result; downstream plans
        # keep their Broadcast + WindowGroupLimit audit shape; values are
        # unchanged.
        .filter(F.col("rk") <= 2)
        .localCheckpoint(eager=False)
    )
    corpus = ranked.filter((F.col("rk") == 1) & (F.col("vec_id") >= 10)).select(
        "vec_id", "v", "nrm", "cid"
    )

    def probe_top5(n_probe: int) -> DataFrame:
        q = ranked.filter((F.col("rk") <= n_probe) & (F.col("vec_id") < 10)).select(
            F.col("vec_id").alias("qid"),
            F.col("v").alias("qv"),
            F.col("nrm").alias("qn"),
            F.col("cid").alias("qcid"),
        )
        cos = _dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))
        w = W.partitionBy("qid").orderBy(F.col("cos_raw").desc(), F.col("vec_id").asc())
        return (
            corpus.join(F.broadcast(q), F.col("cid") == F.col("qcid"))
            .select("qid", "vec_id", cos.alias("cos_raw"))
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= 5)
            .select("qid", "vec_id")
        )

    exact = _exact_top5_from(emb)
    base = exact.groupBy("qid").agg(F.count("*").alias("n_exact"))
    h1 = exact.join(probe_top5(1), ["qid", "vec_id"]).groupBy("qid").agg(
        F.count("*").alias("h1")
    )
    h2 = exact.join(probe_top5(2), ["qid", "vec_id"]).groupBy("qid").agg(
        F.count("*").alias("h2")
    )
    hits_p1 = F.coalesce(F.col("h1"), F.lit(0))
    hits_p2 = F.coalesce(F.col("h2"), F.lit(0))
    cols = [
        F.col("qid"),
        F.col("n_exact"),
        hits_p1.alias("hits_p1"),
        F.round(hits_p1 / F.col("n_exact"), 6).alias("recall_p1"),
        hits_p2.alias("hits_p2"),
        F.round(hits_p2 / F.col("n_exact"), 6).alias("recall_p2"),
        (hits_p2 >= hits_p1).alias("monotone_ok"),
    ]
    if floor is not None:
        cols.append(
            (F.round(hits_p2 / F.col("n_exact"), 6) >= F.lit(floor)).alias("floor_ok")
        )
    return base.join(h1, "qid", "left").join(h2, "qid", "left").select(*cols)


def ann_recall_clustered(spark: SparkSession, sf_dir: str) -> DataFrame:  # noqa: ARG001
    """IVF probe-1/probe-2 recall@5 on SEPARABLE data (VERDICT r5 #3): the
    same verified measurement as ann_recall_panel, run over the
    deterministic 16-cluster fixture instead of the near-uniform sf*
    embeddings — together the two rows bracket the operator's operating
    envelope (worst case 0.30/0.46; separable case must clear the 0.8
    floor, asserted in-query via floor_ok). sf_dir is unused (the fixture
    is synthetic at every SF)."""
    return _ivf_recall_panel_from(
        synth_clustered_embeddings(spark), CLUSTERED_SEED_MOD, floor=0.8
    )


def _pq_recall_from(emb: DataFrame, seed_mod: int) -> DataFrame:
    """PQ/ADC recall@5 parameterized by embedding source and codebook seed
    stride — ann_recall_pq's measurement over any fixture."""
    subs = _subvectors(emb)
    cents = subs.filter(F.col("vec_id") % seed_mod == 0).select(
        F.col("vec_id").alias("cid"),
        F.col("m").alias("cm"),
        F.col("sv").alias("cv"),
    )
    corpus = subs.filter(F.col("vec_id") >= 10)
    codes = (
        corpus.join(F.broadcast(cents), F.col("m") == F.col("cm"))
        .select("vec_id", "m", "cid", _l2sq(F.col("sv"), F.col("cv")).alias("d"))
        .groupBy("vec_id", "m")
        .agg(F.min(F.struct("d", "cid")).alias("k"))
        .select("vec_id", "m", F.col("k.cid").alias("code"))
    )
    q = subs.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"),
        F.col("m").alias("qm"),
        F.col("sv").alias("qv"),
    )
    dtable = q.join(F.broadcast(cents), F.col("qm") == F.col("cm")).select(
        "qid",
        F.col("qm").alias("m"),
        F.col("cid").alias("code"),
        _l2sq(F.col("qv"), F.col("cv")).alias("qd"),
    )
    adc = (
        codes.join(F.broadcast(dtable), ["m", "code"])
        .groupBy("qid", "vec_id")
        .agg(
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("m", "qd"))),
                    lambda s: s["qd"],
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ).alias("adc_raw")
        )
    )
    w = W.partitionBy("qid").orderBy(F.col("adc_raw").asc(), F.col("vec_id").asc())
    pq5 = (
        adc.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("qid", "vec_id")
    )
    exact = _exact_top5_from(emb)
    base = exact.groupBy("qid").agg(F.count("*").alias("n_exact"))
    h = exact.join(pq5, ["qid", "vec_id"]).groupBy("qid").agg(F.count("*").alias("h"))
    hits = F.coalesce(F.col("h"), F.lit(0).cast("long"))
    return base.join(h, "qid", "left").select(
        "qid",
        "n_exact",
        hits.alias("hits_pq"),
        F.round(hits / F.col("n_exact"), 6).alias("recall_pq"),
    )


def ann_recall_pq_clustered(spark: SparkSession, sf_dir: str) -> DataFrame:  # noqa: ARG001
    """PQ/ADC recall@5 on the separable 16-cluster fixture (VERDICT r5 #3
    second half): ann_recall_pq prices quantization's worst case (0.10 on
    near-uniform vectors); this row shows the same codebook machinery
    separating when the data has structure — PROVIDED the codebook out-
    resolves the clusters (PQ_CLUSTERED_SEED_MOD note above: 17 codewords
    → 0.06, 143 → 0.80 mean recall; quantization resolution is the knob,
    and this row prices it). sf_dir unused."""
    return _pq_recall_from(synth_clustered_embeddings(spark), PQ_CLUSTERED_SEED_MOD)


def ann_recall_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ recall@5 MEASURED (the ann_recall_panel discipline applied to the
    compressed-domain search): per query, how many of the exact brute-force
    top-5 the ADC scan recovers. Unlike IVF probes there is no superset
    invariant — PQ's loss is quantization distortion, not candidate
    pruning — so the number itself is the evidence: it prices the 16×
    compression. Scale shape: both searches are broadcast + WindowGroupLimit
    plans; the recall join touches ≤ 10×5 rows."""
    exact = (
        ann_topk_cosine(spark, sf_dir)
        .filter(F.col("rk") <= 5)
        .select("qid", "vec_id")
    )
    pq = ann_pq_topk(spark, sf_dir).select("qid", "vec_id")
    base = exact.groupBy("qid").agg(F.count("*").alias("n_exact"))
    h = (
        exact.join(pq, ["qid", "vec_id"])
        .groupBy("qid")
        .agg(F.count("*").alias("h"))
    )
    hits = F.coalesce(F.col("h"), F.lit(0).cast("long"))
    return base.join(h, "qid", "left").select(
        "qid",
        "n_exact",
        hits.alias("hits_pq"),
        F.round(hits / F.col("n_exact"), 6).alias("recall_pq"),
    )


def ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF+PQ — the composed index every production vector store runs
    (Jégou et al. 2011 §IV / the FAISS IVFPQ shape, non-residual variant):
    the coarse IVF quantizer prunes the corpus to the query's Voronoi cell,
    then ADC with the global PQ codebooks scores only that cell's CODES —
    search touches neither the full corpus (IVF's pruning) nor any original
    vector (PQ's compression). Top-5 per query by ascending ADC distance,
    cell-restricted.

    Scale shape: both codebooks broadcast; the per-vector work is one
    coarse argmax (broadcast) + 4 code lookups; the scan phase reads
    (cid, 4 codes) per vector — the 100-TB sweep is a partition-pruned
    compressed-domain scan, the strictly-better composition of
    ann_ivf_topk (pruning, full vectors) and ann_pq_topk (compression,
    full scan)."""
    emb = load_table(spark, sf_dir, "embeddings")
    assigned = _assign_to_seed_centroids(emb).select("vec_id", "cid")
    subs = _subvectors(emb)
    cents = subs.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("pcid"),
        F.col("m").alias("cm"),
        F.col("sv").alias("cv"),
    )
    corpus = subs.filter(F.col("vec_id") >= 10)
    codes = (
        corpus.join(F.broadcast(cents), F.col("m") == F.col("cm"))
        .select(
            "vec_id", "m", "pcid", _l2sq(F.col("sv"), F.col("cv")).alias("d")
        )
        .groupBy("vec_id", "m")
        .agg(F.min(F.struct("d", "pcid")).alias("k"))
        .select("vec_id", "m", F.col("k.pcid").alias("code"))
        .join(assigned, "vec_id")
    )
    q = subs.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"),
        F.col("m").alias("qm"),
        F.col("sv").alias("qv"),
    )
    qcell = assigned.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("cid").alias("qcid")
    )
    dtable = (
        q.join(F.broadcast(cents), F.col("qm") == F.col("cm"))
        .select(
            "qid",
            F.col("qm").alias("m"),
            F.col("pcid").alias("code"),
            _l2sq(F.col("qv"), F.col("cv")).alias("qd"),
        )
        .join(F.broadcast(qcell), "qid")
    )
    adc = (
        codes.alias("c")
        .join(
            F.broadcast(dtable).alias("dt"),
            (F.col("c.m") == F.col("dt.m"))
            & (F.col("c.code") == F.col("dt.code"))
            & (F.col("c.cid") == F.col("dt.qcid")),
        )
        .groupBy(F.col("dt.qid").alias("qid"), F.col("c.vec_id").alias("vec_id"))
        .agg(
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct(F.col("c.m").alias("m"), F.col("dt.qd").alias("qd")))),
                    lambda s: s["qd"],
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ).alias("adc_raw")
        )
    )
    w = W.partitionBy("qid").orderBy(F.col("adc_raw").asc(), F.col("vec_id").asc())
    return (
        adc.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select(
            "qid",
            "vec_id",
            F.round("adc_raw", 6).alias("adc"),
            F.col("rk").cast("long").alias("rk"),
        )
    )


def search_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval with Reciprocal Rank Fusion (Cormack et al. 2009,
    public — the fusion step every lexical+vector search stack runs):
    fuse the corpus BM25 ranking (c3_bm25_rank's fixed query {spark, join})
    with a vector ranking (cosine against the vec_id-0 query embedding over
    the doc-aligned embeddings table) as RRF(k=60): score(d) =
    Σ_r 1/(60 + rank_r(d)) over the rankers that retrieved d in their
    top-20; emit the fused top-10 with both source ranks (0 = not
    retrieved by that ranker).

    Scale shape: each ranker truncates to a CONSTANT top-20 before fusion
    via orderBy+limit — TakeOrderedAndProject, per-partition partial top-K
    merged on the driver, no global sort (an un-partitioned rank≤K window
    is NOT rewritten to WindowGroupLimit and would single-partition the
    corpus); the ranking windows and the fusion full-join run on ≤ 40
    rows. Corpus-side work stays the rankers' own scan+broadcast shapes."""
    from deepcrawl4ai_spark.operators.textops import c3_bm25_rank

    # truncate with orderBy+limit — TakeOrderedAndProject, a distributed
    # partial top-k per partition merged on the driver (the un-partitioned
    # rank<=K window is NOT rewritten to WindowGroupLimit and would move
    # the whole corpus to one partition); the row_number window then ranks
    # only the K survivors
    wt = W.orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
    text_ranked = (
        c3_bm25_rank(spark, sf_dir)
        .orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
        .limit(20)
        .withColumn("text_rank", F.row_number().over(wt))
        .select("doc_id", "text_rank")
    )
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id", F.col("embedding").alias("v"), _norm(F.col("embedding")).alias("nrm")
    )
    q = e.filter(F.col("vec_id") == 0).select(
        F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    cos = _dot(F.col("v"), F.col("qv")) / (F.col("nrm") * F.col("qn"))
    wv = W.orderBy(F.col("c").desc(), F.col("doc_id").asc())
    vec_ranked = (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(F.col("vec_id").alias("doc_id"), cos.alias("c"))
        .orderBy(F.col("c").desc(), F.col("doc_id").asc())
        .limit(20)
        .withColumn("vec_rank", F.row_number().over(wv))
        .select("doc_id", "vec_rank")
    )
    fused = text_ranked.join(vec_ranked, "doc_id", "full")
    rrf = F.round(
        F.coalesce(F.lit(1.0) / (F.lit(60) + F.col("text_rank")), F.lit(0.0))
        + F.coalesce(F.lit(1.0) / (F.lit(60) + F.col("vec_rank")), F.lit(0.0)),
        6,
    )
    wf = W.orderBy(F.col("rrf_score").desc(), F.col("doc_id").asc())
    return (
        fused.select(
            "doc_id",
            F.coalesce(F.col("text_rank"), F.lit(0)).alias("text_rank"),
            F.coalesce(F.col("vec_rank"), F.lit(0)).alias("vec_rank"),
            rrf.alias("rrf_score"),
        )
        .withColumn("final_rank", F.row_number().over(wf))
        .filter(F.col("final_rank") <= 10)
    )
