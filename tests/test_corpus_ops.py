"""Invariant tests for the round-6 corpus operators (batches 3, 4, 6).

Value-level parity is the oracle gate (tools/check_correctness.py); these
pin the semantic guarantees the oracles can't state: the winnowing match
guarantee, tercile balance, DSIR's target preference, SemDeDup blocking.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from tests.conftest import SF_SMALL


def test_perplexity_terciles_balanced(spark):
    """Per language the head/middle/tail cut differs by at most one doc,
    and kept == (tier != tail)."""
    from deepcrawl4ai_spark.operators.textops import sample_perplexity_buckets

    rows = sample_perplexity_buckets(spark, SF_SMALL).collect()
    by_lang: dict[str, dict[str, int]] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], {}).setdefault(r["tier"], 0)
        by_lang[r["lang"]][r["tier"]] += 1
        assert r["kept"] == (r["tier"] != "tail")
    for lang, tiers in by_lang.items():
        counts = [tiers.get(t, 0) for t in ("head", "middle", "tail")]
        assert max(counts) - min(counts) <= 1, (lang, counts)


def test_winnowing_guarantee(spark):
    """Schleimer et al. 2003: docs sharing a run of >= w+k-1 = 7 words share
    a selected fingerprint HASH. The synthetic corpus has verified near-dup
    pairs (jaccard >= 0.04); check the guarantee on exact-duplicate texts
    (same md5 => identical gram stream => identical fingerprint hashes),
    plus basic shape: every >=4-word doc fingerprints, positions in range."""
    from deepcrawl4ai_spark.operators.dedup import dedup_exact_keep
    from deepcrawl4ai_spark.operators.textops import text_winnow_fingerprint

    fp = text_winnow_fingerprint(spark, SF_SMALL)
    docs = spark.read.parquet(SF_SMALL + "/documents.parquet")
    n_words = docs.select(
        "doc_id", F.size(F.split("text", " ")).alias("nw")
    )
    per_doc = fp.groupBy("doc_id").agg(
        F.count("*").alias("n_fp"), F.max("fp_pos").alias("max_pos")
    ).join(n_words, "doc_id")
    bad = per_doc.filter(
        (F.col("nw") >= 4) & ((F.col("n_fp") < 1) | (F.col("max_pos") > F.col("nw") - 4))
    ).count()
    assert bad == 0

    dup = dedup_exact_keep(spark, SF_SMALL).limit(5).collect()
    if dup:
        sets = (
            fp.groupBy("doc_id").agg(F.collect_set("fp_hash").alias("hs"))
        )
        pairs = {(r["doc_id"], r["keep_doc"]) for r in dup}
        hs = {
            r["doc_id"]: set(r["hs"])
            for r in sets.filter(
                F.col("doc_id").isin(
                    [d for p in pairs for d in p]
                )
            ).collect()
        }
        texts = {
            r["doc_id"]: r["text"]
            for r in docs.filter(
                F.col("doc_id").isin([d for p in pairs for d in p])
            ).collect()
        }
        for a, b in pairs:
            if texts[a] == texts[b] and len(texts[a].split()) >= 7:
                assert hs.get(a) == hs.get(b), (a, b)


def test_dsir_prefers_target_language(spark):
    """DSIR weights the target ('en') slice above the rest on average —
    the selection actually separates."""
    from deepcrawl4ai_spark.operators.textops import sample_dsir

    agg = (
        sample_dsir(spark, SF_SMALL)
        .groupBy(F.col("lang") == "en")
        .agg(F.avg("logratio").alias("m"))
        .collect()
    )
    means = {r[0]: r["m"] for r in agg}
    assert means[True] > means[False]


def test_entropy_bounded_by_alphabet(spark):
    """H <= log2(distinct chars) per doc, and natural text clears the gate."""
    from deepcrawl4ai_spark.operators.textops import text_entropy_filter

    docs = spark.read.parquet(SF_SMALL + "/documents.parquet")
    alpha = docs.select(
        "doc_id",
        F.size(F.array_distinct(F.split("text", ""))).alias("n_alpha"),
    )
    joined = text_entropy_filter(spark, SF_SMALL).join(alpha, "doc_id")
    bad = joined.filter(
        F.col("entropy_bits") > F.log2(F.col("n_alpha")) + 1e-6
    ).count()
    assert bad == 0
    kept_frac = joined.agg(F.avg(F.col("kept").cast("double"))).first()[0]
    assert kept_frac > 0.9


def test_semantic_dedup_blocking(spark):
    """Every removed vector names a smaller same-cluster partner with
    cosine >= tau, and no vector is removed twice."""
    from deepcrawl4ai_spark.operators.dedup import dedup_semantic

    rows = dedup_semantic(spark, SF_SMALL).collect()
    seen = set()
    for r in rows:
        assert r["partner"] < r["vec_id"]
        assert r["cosine"] >= 0.3
        assert r["vec_id"] not in seen
        seen.add(r["vec_id"])


def test_minhash_apply_consistent_with_clusters(spark):
    """The apply twin is exactly clusters_lp's non-keeper rows, and no
    keeper is ever removed."""
    from deepcrawl4ai_spark.operators.dedup import (
        dedup_clusters_lp,
        dedup_minhash_apply,
    )

    labels = {r["doc_id"]: r["cluster"] for r in dedup_clusters_lp(spark, SF_SMALL).collect()}
    removed = {r["doc_id"]: r["keeper"] for r in dedup_minhash_apply(spark, SF_SMALL).collect()}
    expect = {d: c for d, c in labels.items() if c != d}
    assert removed == expect
    assert not (set(removed) & set(removed.values()))


def test_ivfpq_topk_shape(spark):
    """IVF+PQ returns ranked rows 1..k per query with non-decreasing ADC,
    and every result lies in the query's coarse cell."""
    from deepcrawl4ai_spark.operators.similarity import (
        _assign_to_seed_centroids,
        ann_ivfpq_topk,
    )

    rows = ann_ivfpq_topk(spark, SF_SMALL).collect()
    emb = spark.read.parquet(SF_SMALL + "/embeddings.parquet")
    cell = {
        r["vec_id"]: r["cid"]
        for r in _assign_to_seed_centroids(emb).select("vec_id", "cid").collect()
    }
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["qid"], []).append(r)
        assert cell[r["vec_id"]] == cell[r["qid"]]
    for qid, rs in by_q.items():
        rs.sort(key=lambda r: r["rk"])
        assert [r["rk"] for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= 5
        adcs = [r["adc"] for r in rs]
        assert adcs == sorted(adcs)


def test_winnow_pairs_catch_exact_dups(spark):
    """Long exact-duplicate texts must surface as winnow pairs — the MOSS
    guarantee end to end (>=20 words so the identical gram streams select
    >=2 distinct fingerprints, the pair threshold)."""
    from pyspark.sql import functions as SF

    from deepcrawl4ai_spark.operators.dedup import dedup_winnow_pairs

    docs = spark.read.parquet(SF_SMALL + "/documents.parquet")
    dup_groups = (
        docs.select("doc_id", SF.md5("text").alias("fp"),
                    SF.size(SF.split("text", " ")).alias("nw"))
        .filter(SF.col("nw") >= 20)
        .groupBy("fp")
        .agg(SF.collect_list("doc_id").alias("ids"))
        .filter(SF.size("ids") >= 2)
        .collect()
    )
    pairs = {
        (r["doc1"], r["doc2"])
        for r in dedup_winnow_pairs(spark, SF_SMALL).collect()
    }
    for g in dup_groups:
        ids = sorted(g["ids"])
        for i in range(len(ids) - 1):
            assert (ids[i], ids[i + 1]) in pairs, ids


def test_clustered_recall_floor_enforced(spark):
    """ADVICE r6: the 0.8 recall floor on the separable fixture must be a
    real assertion — the oracle now emits literal TRUE for floor_ok, and
    this test fails loudly if the fixture's probe-2 recall ever regresses
    below the floor (e.g. a CLUSTERED_SEED_MOD / fixture-constant change)."""
    from deepcrawl4ai_spark.operators.similarity import ann_recall_clustered

    rows = ann_recall_clustered(spark, SF_SMALL).collect()
    assert rows, "clustered recall fixture returned no query rows"
    assert all(r["floor_ok"] for r in rows), [
        (r["qid"], r["recall_p2"]) for r in rows if not r["floor_ok"]
    ]


def test_quality_classifier_separates_target(spark):
    """The one-step centered-label LR must actually discriminate: en docs
    (the training label) should be kept at a strictly higher rate than
    non-en docs, and the keep decision must equal the sign of the exact
    integer linear response."""
    from deepcrawl4ai_spark.operators.textops import quality_classifier

    rows = quality_classifier(spark, SF_SMALL).collect()
    kept_en = [r["kept"] for r in rows if r["lang"] == "en"]
    kept_other = [r["kept"] for r in rows if r["lang"] != "en"]
    assert sum(kept_en) / len(kept_en) > sum(kept_other) / len(kept_other)
    assert all(r["kept"] == (r["dot_int"] >= 0) for r in rows)


def test_pipeline_v3_funnel_monotone(spark):
    """Funnel counts must be monotone non-increasing and the manifest rows
    must equal n_final (the composition contract the per-op oracles can't
    see)."""
    from deepcrawl4ai_spark.operators.pipeline import corpus_pipeline_v3

    rows = corpus_pipeline_v3(spark, SF_SMALL).collect()
    r = rows[0]
    assert r["n_input"] >= r["n_entropy"] >= r["n_clf"] >= r["n_dedup"] >= r["n_final"]
    assert len(rows) == r["n_final"]


def test_semantic_trained_invariants(spark):
    """dedup_semantic_trained (r07): removal rows are well-formed
    (partner < vec_id, cosine over threshold), and the trained cell
    structure is a real refinement — one Lloyd step moves at least one
    vector between cells on the sf0.001 corpus (otherwise the row would
    just be dedup_semantic again)."""
    from deepcrawl4ai_spark.operators.dedup import dedup_semantic_trained
    from deepcrawl4ai_spark.operators.similarity import (
        _assign_to_centroids,
        _assign_to_seed_centroids,
        _lloyd_trained_centroids,
    )
    from deepcrawl4ai_spark.sources.tables import load_table

    for r in dedup_semantic_trained(spark, SF_SMALL).collect():
        assert r["partner"] < r["vec_id"]
        assert r["cosine"] >= 0.3

    emb = load_table(spark, SF_SMALL, "embeddings")
    seed = {
        r["vec_id"]: r["cid"]
        for r in _assign_to_seed_centroids(emb).select("vec_id", "cid").collect()
    }
    trained = {
        r["vec_id"]: r["cid"]
        for r in _assign_to_centroids(emb, _lloyd_trained_centroids(emb))
        .select("vec_id", "cid")
        .collect()
    }
    assert set(seed) == set(trained)
    assert sum(1 for k in seed if seed[k] != trained[k]) > 0


def test_trained_cells_on_clustered_fixture(spark):
    """VERDICT r6 #4 measurement: on the SEPARABLE clustered fixture, one
    Lloyd step from the mod-61 seed sample must improve (or preserve)
    cell purity — the fraction of vectors whose cell-majority true label
    matches their own — and must not blow up the blocked pair space
    sum(|cell| choose 2) that SemDeDup sweeps. The measured pair is
    recorded in COVERAGE.md's scale table."""
    from deepcrawl4ai_spark.operators.similarity import (
        CLUSTERED_SEED_MOD,
        K_CLUSTERS,
        _assign_to_centroids,
        _assign_to_seed_centroids,
        _lloyd_trained_centroids,
        synth_clustered_embeddings,
    )

    emb = synth_clustered_embeddings(spark)

    def stats(assigned):
        rows = assigned.select("vec_id", "cid").collect()
        cells: dict[int, list[int]] = {}
        for r in rows:
            cells.setdefault(r["cid"], []).append(r["vec_id"] % K_CLUSTERS)
        pair_space = sum(len(v) * (len(v) - 1) // 2 for v in cells.values())
        pure = sum(
            max(v.count(lbl) for lbl in set(v)) for v in cells.values()
        ) / sum(len(v) for v in cells.values())
        return pair_space, pure

    ps_seed, pur_seed = stats(_assign_to_seed_centroids(emb, CLUSTERED_SEED_MOD))
    ps_tr, pur_tr = stats(
        _assign_to_centroids(
            emb, _lloyd_trained_centroids(emb, CLUSTERED_SEED_MOD)
        )
    )
    print(
        f"clustered fixture: pair_space seed={ps_seed} trained={ps_tr}, "
        f"purity seed={pur_seed:.3f} trained={pur_tr:.3f}"
    )
    assert pur_tr >= pur_seed
    assert ps_tr <= ps_seed * 2
