"""End-to-end corpus-shaping pipeline (VERDICT r4 #1): the query a real
100-TB pre-training user actually runs, composing the per-op stages that are
individually verified elsewhere in the registry:

    documents
      → Gopher quality gate          (text_gopher_rules' arithmetic)
      → repetition filter            (text_repetition_filter's stats)
      → paragraph dedup, keep-first  (dedup_paragraphs' hashes; a doc is
                                      dropped when it repeats a paragraph
                                      first seen in a smaller-doc_id survivor)
      → quality-weighted sampling    (sample_quality_weighted's draw)
      → sequence packing             (pack_sequences' greedy 4096 budget)
      → deterministic shard shuffle  (shard_shuffle's md5 permutation)

Output: the final training-shard manifest — one row per surviving doc with
its (pack_id, shard, pos) placement — plus per-stage survivor counts
(n_input ≥ n_gopher ≥ n_rep ≥ n_para ≥ n_final) broadcast onto every row so
the correctness hash verifies the whole funnel, not just the survivors.

Why a single registered query: the per-op oracles can't catch cross-operator
composition bugs (schema drift between stages, a stage reading pre-filter
stats, population-dependent steps like keep-first computed on the wrong
population). The DuckDB oracle chains the same CTEs closed-form.

Scale shape (audited in PLANS.md): gopher + sampling are scan-side codegen;
repetition stats are two partial-agg groupBys on doc_id; paragraph dedup is
ONE shuffle on the paragraph hash (never a pair space); packing is one
window on lang; the shard permutation is one hash-partitioned window
(per-shard sort, never global). The stage-count aggregate is a broadcast
cross join of a 1-row frame. No all-pairs baseline op anywhere in the path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from deepcrawl4ai_spark.sources.tables import load_table

PACK_BUDGET = 4096
N_SHARDS = 8
PARA_WORDS = 8


def corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")
    n_words = F.size(w)

    # --- stage 1: Gopher gate (per-doc, scan-side — text_gopher_rules) ---
    mean_wlen = (F.col("n_chars") - (n_words - 1)) / n_words
    n_stop_g = F.regexp_count(F.col("text"), F.lit(r"\b(data|key|row|table|query)\b"))
    n_symbol = F.regexp_count(F.col("text"), F.lit(r"[#@…]"))
    gopher_ok = (
        (n_words >= 50)
        & (n_words <= 100_000)
        & (mean_wlen >= 3.0)
        & (mean_wlen <= 10.0)
        & (n_symbol / n_words <= 0.1)
        & (n_stop_g >= 2)
    )

    # --- stage 4 signals (per-doc, scan-side — sample_quality_weighted);
    # computed here so one projection carries every per-doc flag ---
    n_stop_q = F.regexp_count(F.col("text"), F.lit(r"\b(the|a|of|to|and)\b"))
    score = F.round(
        (1.0 - n_stop_q / n_words) * F.least(F.lit(1.0), mean_wlen / 8.0), 6
    )
    draw = F.round(
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":qs"))), 1, 8
                ),
                16,
                10,
            ).cast("long")
            % 10000
        )
        / 10000.0,
        6,
    )
    keep_p = F.least(F.lit(0.9), F.greatest(F.lit(0.1), score))
    sample_ok = draw < keep_p

    base = docs.select(
        "doc_id",
        "lang",
        w.alias("w"),
        n_words.cast("long").alias("n_tokens"),
        gopher_ok.alias("gopher_ok"),
        sample_ok.alias("sample_ok"),
    )

    # --- stage 2: repetition filter (text_repetition_filter's stats —
    # per-doc independent, so computed over all docs and ANDed in) ---
    words = base.select("doc_id", F.explode("w").alias("word"))
    word_stats = words.groupBy("doc_id").agg(
        F.count("*").alias("n_w"), F.count_distinct("word").alias("n_d")
    )
    bigrams = base.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("w") >= 2,
                F.transform(
                    F.sequence(F.lit(0), F.size("w") - 2),
                    lambda i: F.concat_ws(" ", F.col("w")[i], F.col("w")[i + 1]),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("bg"),
    )
    bg_top = (
        bigrams.groupBy("doc_id", "bg")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_bg"), F.sum("c").alias("n_bg"))
    )
    rep = word_stats.join(bg_top, "doc_id", "left").select(
        "doc_id",
        (
            (F.round(1.0 - F.col("n_d") / F.col("n_w"), 6) <= 0.80)
            & (
                F.round(F.coalesce(F.col("top_bg") / F.col("n_bg"), F.lit(0.0)), 6)
                <= 0.18
            )
        ).alias("rep_ok"),
    )
    d2 = base.join(rep, "doc_id")
    s12 = F.col("gopher_ok") & F.col("rep_ok")

    # --- stage 3: paragraph dedup, keep-first, computed on the POPULATION
    # surviving stages 1-2 (dedup_paragraphs' 8-word windows; the keeper for
    # a duplicated paragraph is the smallest surviving doc_id) ---
    paras = F.when(
        F.size("w") >= PARA_WORDS,
        F.transform(
            F.sequence(F.lit(0), (F.size("w") / PARA_WORDS).cast("int") - 1),
            lambda i: F.concat_ws(
                " ", F.slice(F.col("w"), i * PARA_WORDS + 1, PARA_WORDS)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    exploded = (
        d2.filter(s12)
        .select("doc_id", F.explode(paras).alias("para"))
        .select("doc_id", F.md5("para").alias("ph"))
    )
    firsts = exploded.groupBy("ph").agg(
        F.min("doc_id").alias("keeper"), F.count_distinct("doc_id").alias("nd")
    )
    drops = (
        exploded.join(firsts.filter(F.col("nd") >= 2), "ph")
        .filter(F.col("doc_id") != F.col("keeper"))
        .select("doc_id")
        .distinct()
        .withColumn("_para_dup", F.lit(True))
    )
    flags = (
        d2.join(drops, "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            "n_tokens",
            "gopher_ok",
            "rep_ok",
            (s12 & F.col("_para_dup").isNull()).alias("para_sv"),
            "sample_ok",
        )
        # both the funnel-counts agg and the manifest read this frame; at
        # scale a real run materializes it once (checkpoint between stages).
        # localCheckpoint, NOT persist (ADVICE r5): persist pins the frame
        # in the CacheManager until an explicit unpersist that no caller
        # can issue (the returned manifest still reads it lazily), leaking
        # one cached DataFrame per invocation across a long session; a
        # localCheckpoint's blocks are reclaimed by the ContextCleaner as
        # soon as the caller drops the result.
        .localCheckpoint(eager=False)
    )
    final_ok = F.col("para_sv") & F.col("sample_ok")

    # --- funnel counts (1-row agg, broadcast onto the manifest) ---
    counts = flags.agg(
        F.count("*").alias("n_input"),
        F.sum(F.col("gopher_ok").cast("long")).alias("n_gopher"),
        F.sum((F.col("gopher_ok") & F.col("rep_ok")).cast("long")).alias("n_rep"),
        F.sum(F.col("para_sv").cast("long")).alias("n_para"),
        F.sum(final_ok.cast("long")).alias("n_final"),
    )

    # --- stage 5: greedy packing over survivors (pack_sequences) ---
    survivors = flags.filter(final_ok).select("doc_id", "lang", "n_tokens")
    wp = (
        W.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = F.sum("n_tokens").over(wp)
    packed = survivors.select(
        "doc_id",
        "lang",
        "n_tokens",
        F.floor((cum - F.col("n_tokens")) / PACK_BUDGET).cast("int").alias("pack_id"),
    )

    # --- stage 6: deterministic shard shuffle (shard_shuffle) ---
    k = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":shuffle")))
    keyed = packed.withColumn("k", k).withColumn(
        "shard",
        (F.conv(F.substring("k", 1, 8), 16, 10).cast("long") % N_SHARDS).cast("int"),
    )
    ws = W.partitionBy("shard").orderBy("k")
    manifest = keyed.select(
        "doc_id",
        "lang",
        "n_tokens",
        "pack_id",
        "shard",
        F.row_number().over(ws).alias("pos"),
    )
    return manifest.crossJoin(F.broadcast(counts))


def corpus_pipeline_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-6 funnel — same single-registered-query rationale as
    corpus_pipeline (cross-operator composition bugs are invisible to
    per-op oracles), chaining this round's additions:

        documents
          → character-entropy gate     (text_entropy_filter: H≥3 ∧ ≥20 chars)
          → CCNet perplexity cut       (sample_perplexity_buckets — the LM
                                        and the per-lang terciles computed ON
                                        THE ENTROPY SURVIVORS: the
                                        population-dependent stage)
          → near-dup cut               (dedup_minhash_apply's removal list,
                                        corpus-wide — dedup runs on the full
                                        crawl before quality selection, the
                                        RefinedWeb ordering)
          → DSIR selection             (sample_dsir, corpus-wide model,
                                        keep logratio > 0)
          → sequence packing           (pack_sequences' greedy 4096 budget)

    Output: the training-shard manifest (doc_id, lang, n_tokens, pack_id)
    with the funnel counts n_input ≥ n_entropy ≥ n_ppl ≥ n_dedup ≥ n_final
    broadcast onto every row so the hash verifies the whole funnel.

    Scale shape: entropy = two partial aggs; the perplexity stage is the
    unigram scorer (vocab partial-agg + broadcast join) + one per-lang
    window over SURVIVORS; the dedup list is the clusters_lp shape; DSIR is
    one vocab agg + broadcast join; packing one window. The only new cost
    over running the stages separately is zero — stages share scans."""
    from deepcrawl4ai_spark.operators.dedup import dedup_clusters_lp
    from deepcrawl4ai_spark.operators.textops import sample_dsir

    docs = load_table(spark, sf_dir, "documents")
    n_words = F.size(F.split(F.col("text"), " "))

    # --- stage 1: entropy gate (text_entropy_filter's arithmetic, r8
    # single-pass shape: per-doc total on a doc_id window + fold reusing
    # that partitioning — one char-explode evaluation instead of three) ---
    ch = docs.select("doc_id", F.explode(F.split(F.col("text"), "")).alias("c"))
    per = ch.groupBy("doc_id", "c").agg(F.count("*").alias("cnt"))
    per2 = per.withColumn("n_chars_t", F.sum("cnt").over(W.partitionBy("doc_id")))
    pc = F.col("cnt") / F.col("n_chars_t")
    ent = (
        per2.groupBy("doc_id")
        .agg(
            F.round(-F.sum(pc * F.log2(pc)), 6).alias("h"),
            F.max("n_chars_t").alias("n_chars_t"),
        )
        .select(
            "doc_id",
            ((F.col("h") >= 3.0) & (F.col("n_chars_t") >= 20)).alias("ent_ok"),
        )
        # r8: the char-explode entropy chain is the widest scan in the
        # funnel and is read by surv1 (→ vocab/total/scored, 3-4×) AND the
        # flags join — materialize it once (tiny doc_id+bool frame)
        .localCheckpoint(eager=False)
    )

    # --- stage 2: CCNet perplexity cut on the entropy SURVIVORS ---
    surv1 = docs.join(ent.filter(F.col("ent_ok")), "doc_id").select(
        "doc_id", "lang", "text"
    )
    words = surv1.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("word")
    )
    # r8: vocab is read by the total agg and the probability join —
    # checkpoint the vocab-sized partial agg so the survivor-corpus explode
    # behind it runs once, not three times
    vocab = words.groupBy("word").agg(F.count("*").alias("cnt")).localCheckpoint(eager=False)
    total = vocab.agg(F.sum("cnt").alias("total"))
    p = vocab.crossJoin(F.broadcast(total)).select(
        "word", (F.col("cnt") / F.col("total")).alias("pw")
    )
    scored = (
        words.join(F.broadcast(p), "word")
        .groupBy("doc_id")
        .agg(F.round(F.avg(-F.log2(F.col("pw"))), 6).alias("bpw"))
        .join(surv1.select("doc_id", "lang"), "doc_id")
    )
    wppl = W.partitionBy("lang").orderBy("bpw", "doc_id")
    ppl = scored.select(
        "doc_id", ((F.percent_rank().over(wppl) * 3) < 2).alias("ppl_ok")
    )

    # --- stage 3: corpus-wide near-dup removal list (minhash apply) ---
    removed = (
        dedup_clusters_lp(spark, sf_dir)
        .filter(F.col("cluster") != F.col("doc_id"))
        .select("doc_id", F.lit(True).alias("_dup"))
    )

    # --- stage 4: DSIR selection (corpus-wide model) ---
    dsir = sample_dsir(spark, sf_dir).select("doc_id", F.col("selected").alias("dsir_ok"))

    flags = (
        docs.select("doc_id", "lang", n_words.cast("long").alias("n_tokens"))
        .join(ent, "doc_id")
        .join(ppl, "doc_id", "left")
        .join(removed, "doc_id", "left")
        .join(dsir, "doc_id")
        .select(
            "doc_id",
            "lang",
            "n_tokens",
            "ent_ok",
            (F.col("ent_ok") & F.coalesce(F.col("ppl_ok"), F.lit(False))).alias("ppl_sv"),
            F.col("_dup").isNull().alias("nodup"),
            "dsir_ok",
        )
        # one materialization shared by the counts agg and the manifest
        # (the corpus_pipeline localCheckpoint-not-persist rationale)
        .localCheckpoint(eager=False)
    )
    dedup_sv = F.col("ppl_sv") & F.col("nodup")
    final_ok = dedup_sv & F.col("dsir_ok")

    counts = flags.agg(
        F.count("*").alias("n_input"),
        F.sum(F.col("ent_ok").cast("long")).alias("n_entropy"),
        F.sum(F.col("ppl_sv").cast("long")).alias("n_ppl"),
        F.sum(dedup_sv.cast("long")).alias("n_dedup"),
        F.sum(final_ok.cast("long")).alias("n_final"),
    )

    # --- stage 5: greedy packing over the final survivors ---
    survivors = flags.filter(final_ok).select("doc_id", "lang", "n_tokens")
    wp = (
        W.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = F.sum("n_tokens").over(wp)
    manifest = survivors.select(
        "doc_id",
        "lang",
        "n_tokens",
        F.floor((cum - F.col("n_tokens")) / PACK_BUDGET).cast("int").alias("pack_id"),
    )
    return manifest.crossJoin(F.broadcast(counts))


def corpus_pipeline_v3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-7 funnel — DCLM-flavored: the learned classifier gate
    replaces the heuristic quality stages, composed with the same
    single-registered-query rationale as corpus_pipeline / _v2
    (cross-operator composition bugs are invisible to per-op oracles):

        documents
          → character-entropy gate   (text_entropy_filter: H≥3 ∧ ≥20 chars)
          → learned quality gate     (quality_classifier's one-step LR,
                                      TRAINED ON THE ENTROPY SURVIVORS —
                                      the population-dependent stage: the
                                      gradient, totals and keep decision
                                      all shift with the stage-1 cut)
          → near-dup cut             (dedup_minhash_apply's removal list,
                                      corpus-wide — RefinedWeb ordering)
          → temperature sampling     (sample_temperature's alpha-rule with
                                      per-lang counts from the POPULATION
                                      surviving stages 1-3)
          → sequence packing         (greedy 4096 budget)

    Output: the training-shard manifest (doc_id, lang, n_tokens, pack_id)
    with funnel counts n_input ≥ n_entropy ≥ n_clf ≥ n_dedup ≥ n_final
    broadcast onto every row so the hash verifies the whole funnel.

    Scale shape: entropy = two partial aggs; the classifier is one
    (doc_id, bucket) shuffle + a 64-row broadcast gradient (exact-integer
    keep decision — quality_classifier's docstring); the dedup list is the
    clusters_lp shape; temperature is a per-lang tiny agg broadcast back;
    packing one window. Stages share scans; no all-pairs op in the path."""
    return _corpus_pipeline_v3_from(load_table(spark, sf_dir, "documents"))


def _corpus_pipeline_v3_from(docs: DataFrame) -> DataFrame:
    """corpus_pipeline_v3's core over an arbitrary (doc_id, lang, text)
    frame — factored out so the corpus-scale bench can run the identical
    funnel on a synthetic 10^6-doc corpus. Value-identical to the
    pre-split body (the wrapper merely binds docs to the table)."""
    from deepcrawl4ai_spark.operators.dedup import _clusters_lp_from
    from deepcrawl4ai_spark.operators.textops import (
        TEMPERATURE_ALPHA,
        _classifier_dot,
    )

    n_words = F.size(F.split(F.col("text"), " "))

    # --- stage 1: entropy gate (text_entropy_filter's arithmetic, r8
    # single-pass window shape — one char-explode evaluation) ---
    ch = docs.select("doc_id", F.explode(F.split(F.col("text"), "")).alias("c"))
    per = ch.groupBy("doc_id", "c").agg(F.count("*").alias("cnt"))
    per2 = per.withColumn("n_chars_t", F.sum("cnt").over(W.partitionBy("doc_id")))
    pc = F.col("cnt") / F.col("n_chars_t")
    ent = (
        per2.groupBy("doc_id")
        .agg(
            F.round(-F.sum(pc * F.log2(pc)), 6).alias("h"),
            F.max("n_chars_t").alias("n_chars_t"),
        )
        .select(
            "doc_id",
            ((F.col("h") >= 3.0) & (F.col("n_chars_t") >= 20)).alias("ent_ok"),
        )
        # r8: shared by the classifier's survivor population and the flags
        # join — one evaluation of the char-explode entropy chain
        .localCheckpoint(eager=False)
    )

    # --- stage 2: learned gate trained on the entropy SURVIVORS ---
    surv1 = docs.join(ent.filter(F.col("ent_ok")), "doc_id").select(
        "doc_id", "lang", "text"
    )
    clf = _classifier_dot(surv1).select(
        "doc_id", (F.col("dot_int") >= 0).alias("clf_ok")
    )

    # --- stage 3: corpus-wide near-dup removal list (minhash apply) ---
    removed = (
        _clusters_lp_from(docs)
        .filter(F.col("cluster") != F.col("doc_id"))
        .select("doc_id", F.lit(True).alias("_dup"))
    )

    flags = (
        docs.select("doc_id", "lang", n_words.cast("long").alias("n_tokens"))
        .join(ent, "doc_id")
        .join(clf, "doc_id", "left")
        .join(removed, "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            "n_tokens",
            "ent_ok",
            (F.col("ent_ok") & F.coalesce(F.col("clf_ok"), F.lit(False))).alias(
                "clf_sv"
            ),
            F.col("_dup").isNull().alias("nodup"),
        )
        # one materialization shared by counts, the temperature stage and
        # the manifest (the corpus_pipeline localCheckpoint-not-persist
        # rationale)
        .localCheckpoint(eager=False)
    )
    dedup_sv = F.col("clf_sv") & F.col("nodup")

    # --- stage 4: temperature sampling on the stage-3 POPULATION ---
    s3 = flags.filter(dedup_sv)
    lc = s3.groupBy("lang").agg(F.count("*").alias("n_lang"))
    n_min = lc.agg(F.min("n_lang").alias("n_min"))
    rates = lc.crossJoin(F.broadcast(n_min)).select(
        "lang",
        F.round(
            F.pow(
                F.round(F.col("n_min") / F.col("n_lang"), 6),
                F.lit(1.0 - TEMPERATURE_ALPHA),
            ),
            6,
        ).alias("keep_rate"),
    )
    draw = F.round(
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":temp"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % 10000
        )
        / 10000.0,
        6,
    )
    sampled = (
        s3.join(F.broadcast(rates), "lang")
        .withColumn("draw", draw)
        .filter(F.col("draw") < F.col("keep_rate"))
        .select("doc_id", "lang", "n_tokens")
    )

    counts_base = flags.agg(
        F.count("*").alias("n_input"),
        F.sum(F.col("ent_ok").cast("long")).alias("n_entropy"),
        F.sum(F.col("clf_sv").cast("long")).alias("n_clf"),
        F.sum(dedup_sv.cast("long")).alias("n_dedup"),
    )
    n_final = sampled.agg(F.count("*").alias("n_final"))
    counts = counts_base.crossJoin(n_final)

    # --- stage 5: greedy packing over the final survivors ---
    wp = (
        W.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = F.sum("n_tokens").over(wp)
    manifest = sampled.select(
        "doc_id",
        "lang",
        "n_tokens",
        F.floor((cum - F.col("n_tokens")) / PACK_BUDGET).cast("int").alias("pack_id"),
    )
    return manifest.crossJoin(F.broadcast(counts))
