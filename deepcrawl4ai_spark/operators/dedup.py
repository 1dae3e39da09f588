"""Deduplication operator family for large-scale training-data pipelines.

Exact (hash-groupBy), MinHash+LSH (shingle → minhash → band → bucket-join),
SimHash, and n-gram Jaccard — all expressed with built-in Spark SQL functions
(no Python in the hot path), so the whole pipeline stays in whole-stage
codegen and scales by shuffle on content-hash keys.

Scale notes (100 TB):
- exact dedup is one shuffle on md5(text) — the cheapest possible;
- minhash avoids materializing the shingle set per pair: one explode +
  per-doc agg (map-side partial min), then a self-join on (band, bucket)
  where buckets are tiny by construction;
- simhash is explode + sum, again map-side combinable;
- the n-gram Jaccard here uses blocking (lang) to bound the pair space —
  at full scale the LSH variant replaces it as the candidate generator.

Hash parity contract with the DuckDB oracles: shingle/word hash =
first 8 hex chars of md5 → integer (Spark: conv(,16,10); DuckDB:
CAST('0x'||… AS BIGINT)); minhash h_i(x) = (a_i*x + b_i) mod P.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deepcrawl4ai_spark.sources.tables import load_table

P = 1_000_000_007
# fixed (a, b) for the 8 minhash permutations — shared with the oracle SQL
MINHASH_PARAMS = [
    (2971, 1045),
    (1583, 2099),
    (2221, 3187),
    (1777, 4229),
    (2663, 5281),
    (1987, 6311),
    (2357, 7393),
    (2741, 8443),
]
# 16-permutation extension: the FIRST 8 are MINHASH_PARAMS verbatim, so the
# 16-band candidate set is a provable superset of the 8-band one (each band
# is one permutation) — recall can only go up (dedup_recall_minhash16).
MINHASH_PARAMS_16 = MINHASH_PARAMS + [
    (3181, 9473),
    (1867, 10627),
    (2503, 11779),
    (2087, 12917),
    (2897, 14083),
    (1613, 15241),
    (2273, 16411),
    (3037, 17573),
]


def _words(col):
    return F.split(col, " ")


def _hex_hash(col):
    """First 8 hex chars of md5 as a bigint — identical to the oracle."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def _shingles(words_col):
    """Word 3-grams; empty when the doc has <3 words."""
    return F.when(
        F.size(words_col) >= 3,
        F.transform(
            F.sequence(F.lit(0), F.size(words_col) - 3),
            lambda i: F.concat_ws(
                " ", words_col[i], words_col[i + 1], words_col[i + 2]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: md5(text) groupBy; per doc its fingerprint + duplicate
    count in its group (1 = unique)."""
    docs = load_table(spark, sf_dir, "documents")
    fp = docs.select("doc_id", F.md5("text").alias("fingerprint"))
    counts = fp.groupBy("fingerprint").agg(F.count("*").alias("n_dups"))
    return fp.join(counts, "fingerprint").select("doc_id", "fingerprint", "n_dups")


def dedup_paragraphs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicate-PARAGRAPH detection — the C4/RefinedWeb-style
    cleanup step that removes boilerplate paragraphs repeated across many
    pages (navigation, footers) rather than whole-document dups. Paragraph
    analog on the flat corpus: consecutive 8-word windows; a paragraph is a
    duplicate when its hash occurs in ≥2 DISTINCT documents. Output: one row
    per duplicated paragraph occurrence (doc_id, para_idx, n_docs) — the
    rows a cleaner would drop.

    Scale shape: posexplode → groupBy(hash) with map-side partial
    count-distinct → semi-join back. One shuffle on the paragraph hash; no
    pair space at all (unlike near-dup, repetition is counted, not
    compared)."""
    docs = load_table(spark, sf_dir, "documents")
    w = docs.select("doc_id", _words(F.col("text")).alias("w"))
    paras = F.when(
        F.size("w") >= 8,
        F.transform(
            F.sequence(F.lit(0), (F.size("w") / 8).cast("int") - 1),
            lambda i: F.concat_ws(" ", F.slice(F.col("w"), i * 8 + 1, 8)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    exploded = w.select(
        "doc_id", F.posexplode(paras).alias("para_idx", "para")
    ).select("doc_id", "para_idx", F.md5("para").alias("ph"))
    counts = exploded.groupBy("ph").agg(
        F.count_distinct("doc_id").alias("n_docs")
    )
    return (
        exploded.join(counts.filter(F.col("n_docs") >= 2), "ph")
        .select("doc_id", "para_idx", "n_docs")
    )


def dedup_paragraphs_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-paragraph REMOVAL — the transform `dedup_paragraphs` only
    detects (same relationship as decontaminate_ngrams → decontaminate_apply):
    every corpus-wide repeated paragraph keeps exactly its FIRST occurrence
    (global order (doc_id, para_idx) — the C4 "remove all but one occurrence"
    policy, public) and every later occurrence is dropped; the doc's trailing
    <8-word remainder always survives. One row per doc: (doc_id, n_paras,
    n_removed, clean_text) — so the output IS the paragraph-deduplicated
    corpus.

    Scale shape: posexplode → min-struct agg per paragraph hash (map-side
    partial, one shuffle — the keeper election), join back on the hash, one
    per-doc agg whose order-restoring sort is array_sort over the doc's OWN
    kept paragraphs. No pair space; the within-doc tail never leaves the
    scan."""
    docs = load_table(spark, sf_dir, "documents")
    w = docs.select("doc_id", _words(F.col("text")).alias("w"))
    n_paras = (F.size("w") / 8).cast("int")
    paras = F.when(
        F.size("w") >= 8,
        F.transform(
            F.sequence(F.lit(0), n_paras - 1),
            lambda i: F.concat_ws(" ", F.slice(F.col("w"), i * 8 + 1, 8)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    exploded = w.select(
        "doc_id", F.posexplode(paras).alias("para_idx", "para")
    ).withColumn("ph", F.md5("para"))
    keeper = exploded.groupBy("ph").agg(
        F.min(F.struct("doc_id", "para_idx")).alias("k")
    )
    kept = (
        exploded.join(keeper, "ph")
        .filter(
            (F.col("doc_id") == F.col("k.doc_id"))
            & (F.col("para_idx") == F.col("k.para_idx"))
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_kept"),
            F.transform(
                F.array_sort(F.collect_list(F.struct("para_idx", "para"))),
                lambda s: s["para"],
            ).alias("kept_paras"),
        )
    )
    base = w.select(
        "doc_id",
        n_paras.cast("long").alias("n_paras"),
        F.slice(
            F.col("w"), n_paras * 8 + 1, F.size("w") - n_paras * 8
        ).alias("tail"),
    )
    return base.join(kept, "doc_id", "left").select(
        "doc_id",
        "n_paras",
        (F.col("n_paras") - F.coalesce(F.col("n_kept"), F.lit(0))).alias(
            "n_removed"
        ),
        F.concat_ws(
            " ",
            F.concat(
                F.coalesce(F.col("kept_paras"), F.array().cast("array<string>")),
                F.col("tail"),
            ),
        ).alias("clean_text"),
    )


def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate-SUBSTRING span detection (Lee et al. 2022
    "Deduplicating Training Data Makes Language Models Better", public —
    their ExactSubstr finds ≥50-token spans shared verbatim between docs).
    The suffix-array they build is a single-machine structure; the honest
    distributed shape is sliding 5-word shingles: a shingle position is
    duplicated when its hash occurs in ≥2 distinct docs, and consecutive
    duplicated positions merge into MAXIMAL spans (the island trick:
    position − row_number is constant within a run). Output: one row per
    maximal duplicated span (doc_id, span_start, span_words, n_shingles)
    — span_words = last_start − first_start + 5.

    Scale shape: explode → one shuffle on the shingle hash (count-distinct
    partial agg) → semi-join back → ONE per-doc window (island grouping,
    sorts bounded by doc length). No pair space, no suffix array."""
    docs = load_table(spark, sf_dir, "documents")
    w = docs.select("doc_id", _words(F.col("text")).alias("w"))
    sh = F.when(
        F.size("w") >= 5,
        F.transform(
            F.sequence(F.lit(0), F.size("w") - 5),
            lambda i: F.struct(
                i.alias("i"),
                F.md5(F.concat_ws(" ", F.slice(F.col("w"), i + 1, 5))).alias(
                    "sh"
                ),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<i:int,sh:string>>"))
    pos = w.select("doc_id", F.explode(sh).alias("s")).select(
        "doc_id", F.col("s.i").alias("i"), F.col("s.sh").alias("sh")
    )
    dup_hashes = (
        pos.groupBy("sh")
        .agg(F.count_distinct("doc_id").alias("n_docs"))
        .filter(F.col("n_docs") >= 2)
        .select("sh")
    )
    dup_pos = pos.join(dup_hashes, "sh").select("doc_id", "i")
    from pyspark.sql import Window as W

    win = W.partitionBy("doc_id").orderBy("i")
    islands = dup_pos.withColumn(
        "grp", F.col("i") - F.row_number().over(win)
    )
    return islands.groupBy("doc_id", "grp").agg(
        F.min("i").alias("span_start"),
        (F.max("i") - F.min("i") + 5).alias("span_words"),
        F.count("*").cast("long").alias("n_shingles"),
    ).select("doc_id", "span_start", "span_words", "n_shingles")


def dedup_substring_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-substring REMOVAL — the ExactSubstr cut step (Lee et al.
    2022 drop one occurrence of every duplicated span and keep the other,
    public). Keeper election per duplicated 5-word shingle hash = the
    corpus-wide first occurrence (min (doc_id, position)); every word
    covered by a NON-keeper duplicated shingle is cut, and the clean
    remainder keeps its original order. One row per doc: (doc_id, n_words,
    n_removed, clean_text) — the substring-deduplicated corpus itself.

    Scale shape: the decontaminate_apply machinery pointed at corpus
    self-duplicates — shingle-hash partial agg (dup filter + keeper
    election, two one-shuffle aggs on the same key), covered-position
    explode (≤5× the duplicated occurrences, never the corpus), one
    (doc, position) anti-join, one per-doc reassembly agg whose sort is
    bounded by doc length. No pair space, no suffix array."""
    docs = load_table(spark, sf_dir, "documents")
    w = docs.select("doc_id", _words(F.col("text")).alias("w"))
    sh = F.when(
        F.size("w") >= 5,
        F.transform(
            F.sequence(F.lit(0), F.size("w") - 5),
            lambda i: F.struct(
                i.alias("i"),
                F.md5(F.concat_ws(" ", F.slice(F.col("w"), i + 1, 5))).alias(
                    "sh"
                ),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<i:int,sh:string>>"))
    pos = w.select("doc_id", F.explode(sh).alias("s")).select(
        "doc_id", F.col("s.i").alias("i"), F.col("s.sh").alias("sh")
    )
    # r8: ONE aggregation on the shingle key carries both the dup filter
    # (count-distinct docs) and the keeper election (min (doc_id, i)) — the
    # original ran dup_hashes and keeper as separate agg+join stages, which
    # re-evaluated the corpus-wide shingle explode three times (dup agg,
    # occ-for-keeper, occ-for-non_keeper). Same one-shuffle scale shape,
    # identical keeper values (the min over a hash's occurrences is the min
    # over its duplicated occurrences), one fewer corpus pass.
    dup_stats = (
        pos.groupBy("sh")
        .agg(
            F.count_distinct("doc_id").alias("n_docs"),
            F.min(F.struct("doc_id", "i")).alias("k"),
        )
        .filter(F.col("n_docs") >= 2)
        .select("sh", "k")
    )
    non_keeper = (
        pos.join(dup_stats, "sh")
        .filter(
            ~(
                (F.col("doc_id") == F.col("k.doc_id"))
                & (F.col("i") == F.col("k.i"))
            )
        )
        .select("doc_id", "i")
    )
    covered = non_keeper.select(
        "doc_id", F.explode(F.sequence(F.col("i"), F.col("i") + 4)).alias("widx")
    ).distinct()
    words = w.select("doc_id", F.posexplode("w").alias("widx", "word"))
    kept = words.join(covered, ["doc_id", "widx"], "left_anti")
    agg = kept.groupBy("doc_id").agg(
        F.count("*").alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("widx", "word"))),
                lambda s: s["word"],
            ),
        ).alias("clean_text"),
    )
    totals = w.select("doc_id", F.size("w").cast("long").alias("_n"))
    return totals.join(agg, "doc_id", "left").select(
        "doc_id",
        F.col("_n").alias("n_words"),
        (F.col("_n") - F.coalesce(F.col("n_kept"), F.lit(0))).alias("n_removed"),
        F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
    )


def decontaminate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark DECONTAMINATION (the GPT-3/PaLM-style training-data step,
    public): flag every corpus doc sharing any word n-gram with the held-out
    eval set (here: doc_id % 100 == 0), with the count of distinct shared
    grams. Gram size is corpus-calibrated: 4 here (the synthetic vocabulary
    is ~40 tokens, so 8-grams never collide and the check would be vacuous);
    production corpora use 8-13.

    Scale shape: shingle both sides, hash the grams, equi-join corpus grams
    against the (tiny, broadcast) eval gram set, partial-agg count-distinct
    per doc — one broadcast join, no pair space, no shuffle of the corpus
    side beyond the final per-doc agg."""
    docs = load_table(spark, sf_dir, "documents")
    w = docs.select("doc_id", _words(F.col("text")).alias("w"))
    grams = F.when(
        F.size("w") >= 4,
        F.transform(
            F.sequence(F.lit(0), F.size("w") - 4),
            lambda i: F.md5(F.concat_ws(" ", F.slice(F.col("w"), i + 1, 4))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    g = w.select("doc_id", F.explode(grams).alias("gh"))
    eval_grams = (
        g.filter(F.col("doc_id") % 100 == 0).select("gh").distinct()
    )
    return (
        g.filter(F.col("doc_id") % 100 != 0)
        .join(F.broadcast(eval_grams), "gh")
        .groupBy("doc_id")
        .agg(F.count_distinct("gh").alias("n_shared"))
    )


def decontaminate_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contamination REMOVAL — the transform `decontaminate_ngrams` only
    flags (VERDICT r3 #5): redact every word covered by a contaminated
    4-gram (one shared with the held-out eval set, doc_id % 100 == 0) and
    keep the clean remainder in original word order. One row per corpus doc:
    (doc_id, n_kept, n_removed, clean_text) — clean docs pass through with
    n_removed = 0, fully-contaminated docs survive as empty text, so the
    output IS the training corpus post-decontamination.

    Scale shape: gram-position explode → broadcast join against the tiny
    eval gram set → covered-position explode (≤ 4× the matched grams, never
    the corpus) → left-anti join on (doc, position) → one per-doc agg whose
    order-restoring sort is array_sort over the doc's OWN kept words (bounded
    by doc length, no global sort). No pair space anywhere."""
    docs = load_table(spark, sf_dir, "documents")
    w = docs.select("doc_id", _words(F.col("text")).alias("w"))
    grams = F.when(
        F.size("w") >= 4,
        F.transform(
            F.sequence(F.lit(0), F.size("w") - 4),
            lambda i: F.struct(
                i.alias("i"),
                F.md5(F.concat_ws(" ", F.slice(F.col("w"), i + 1, 4))).alias("gh"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<i:int,gh:string>>"))
    g = w.select("doc_id", F.explode(grams).alias("g")).select(
        "doc_id", F.col("g.i").alias("i"), F.col("g.gh").alias("gh")
    )
    eval_grams = g.filter(F.col("doc_id") % 100 == 0).select("gh").distinct()
    contaminated = (
        g.filter(F.col("doc_id") % 100 != 0)
        .join(F.broadcast(eval_grams), "gh")
        .select("doc_id", "i")
    )
    covered = (
        contaminated.select(
            "doc_id", F.explode(F.sequence(F.col("i"), F.col("i") + 3)).alias("widx")
        ).distinct()
    )
    words = w.filter(F.col("doc_id") % 100 != 0).select(
        "doc_id", F.posexplode("w").alias("widx", "word")
    )
    kept = words.join(covered, ["doc_id", "widx"], "left_anti")
    agg = kept.groupBy("doc_id").agg(
        F.count("*").alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("widx", "word"))),
                lambda s: s["word"],
            ),
        ).alias("clean_text"),
    )
    totals = w.filter(F.col("doc_id") % 100 != 0).select(
        "doc_id", F.size("w").cast("long").alias("_n")
    )
    return totals.join(agg, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("n_kept"), F.lit(0).cast("long")).alias("n_kept"),
        (F.col("_n") - F.coalesce(F.col("n_kept"), F.lit(0))).alias("n_removed"),
        F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
    )


def _shingle_frame_raw(docs: DataFrame) -> DataFrame:
    """(doc_id, sh) word-3-gram frame WITHOUT the corpus-wide distinct —
    the shared base of the MinHash family (r8). No consumer needs a
    global distinct pass: minhash minima are duplicate-invariant, the
    Jaccard denominators use a per-doc count_distinct fold, and the
    verify postings deduplicate AFTER the candidate semi-join (a far
    smaller set) — so the corpus-wide distinct shuffle the old shape
    paid once per consumer is gone outright (guide §2.4). Deliberately
    not checkpointed: corpus-sized (see the contraction-point rule in
    OPTIMIZATION_r08.md)."""
    w = docs.select("doc_id", _words(F.col("text")).alias("w"))
    return w.select("doc_id", F.explode(_shingles(F.col("w"))).alias("sh"))


def _shingle_frame(docs: DataFrame) -> DataFrame:
    """DISTINCT (doc_id, sh) frame — needed only where a genuinely global
    distinct set is consumed (the all-pairs _truth_pairs baseline)."""
    return _shingle_frame_raw(docs).distinct()


def _minhash_cands(docs: DataFrame, params: list, sh: DataFrame | None = None) -> DataFrame:
    """MinHash+LSH candidate pairs with len(params) permutations banded as
    len(params) bands × 1 row: two docs are candidates iff any minhash
    matches. More permutations = strictly MORE bands = a provable superset
    of candidates when the param list extends a shorter one.

    *sh*: optional precomputed DISTINCT shingle frame (_shingle_frame) — the
    minhash minima are unchanged by shingle dedup. When None the original
    single-pass explode (no distinct shuffle) is used: cheaper standalone."""
    if sh is None:
        w = docs.select("doc_id", _words(F.col("text")).alias("w"))
        sh = w.select("doc_id", F.explode(_shingles(F.col("w"))).alias("sh"))
    x = (_hex_hash(F.col("sh")) % P).alias("x")
    h = sh.select("doc_id", x)
    aggs = [
        F.min((F.lit(a) * F.col("x") + F.lit(b)) % P).alias(f"m{i}")
        for i, (a, b) in enumerate(params)
    ]
    # r8: both sides of the band self-join read the banded frame —
    # materialize the per-doc minhash aggregation (k small ints per doc)
    # once instead of evaluating the shingle explode + agg on each side
    mh = h.groupBy("doc_id").agg(*aggs).localCheckpoint(eager=False)
    bands = mh.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"), F.col(f"m{i}").alias("bucket")
                    )
                    for i in range(len(params))
                ]
            )
        ).alias("bb"),
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc1"), F.col("b.doc_id").alias("doc2"))
        .distinct()
    )


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH candidate pairs: 8 permutations, 8 bands × 1 row.
    Two docs are candidates iff any minhash matches."""
    docs = load_table(spark, sf_dir, "documents")
    return _minhash_cands(docs, MINHASH_PARAMS)


def _simhash_sig(docs: DataFrame, n_bits: int) -> DataFrame:
    """(doc_id, simhash) with an *n_bits* signature — ONE groupBy with one
    conditional-sum column per bit plane (the minhash multi-agg idiom): no
    plane explode, so shuffle volume is 1× the word rows, not n_bits×.
    Same ±1-per-bit/sign math as the DuckDB oracles."""
    w = docs.select("doc_id", F.explode(_words(F.col("text"))).alias("word"))
    w = w.select("doc_id", _hex_hash(F.col("word")).alias("wx"))
    aggs = [
        F.sum(
            F.when(F.shiftright(F.col("wx"), b) % 2 == 1, 1).otherwise(-1)
        ).alias(f"s{b}")
        for b in range(n_bits)
    ]
    per_doc = w.groupBy("doc_id").agg(*aggs)
    sig = None
    for b in range(n_bits):
        term = F.when(F.col(f"s{b}") > 0, F.lit(1 << b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sig = term if sig is None else sig + term
    return per_doc.select("doc_id", sig.cast("long").alias("simhash"))


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit SimHash per doc from word hashes (+1/-1 per bit, sign → bit)."""
    return _simhash_sig(load_table(spark, sf_dir, "documents"), 16)


def dedup_simhash_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup at scale: a 32-bit signature (same plane family as
    dedup_simhash, widened — 16 bits saturates on collisions beyond toy
    corpora) banded into 4×8-bit buckets; candidate pairs share ≥1 band
    (equi-join — the pair space collapses exactly like MinHash LSH), then
    verify Hamming distance ≤ 3 via bit_count(xor). Banding guarantee
    (pigeonhole): ≤3 differing bits touch ≤3 of the 4 bands, so every
    hamming ≤ 3 pair shares an untouched band — 100% recall; the band join
    is a pure pruning step, never a correctness filter. 8-bit bands (256
    buckets × 4 bands = 1024 join keys) vs the earlier 4-bit ones (128
    keys) cut the candidate pair space ~30× at equal recall — the selective
    end of the LSH band/width trade-off for this threshold."""
    # r8: both sides of the band self-join read the signature — materialize
    # the word-explode + 32-plane aggregation once instead of twice
    sig = _simhash_sig(load_table(spark, sf_dir, "documents"), 32).localCheckpoint(eager=False)
    bands = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        (F.shiftright(F.col("simhash"), 8 * i) % 256)
                        .cast("int")
                        .alias("bucket"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "simhash", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc1"),
            F.col("b.doc_id").alias("doc2"),
            F.col("a.simhash").alias("s1"),
            F.col("b.simhash").alias("s2"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("s1").bitwiseXOR(F.col("s2")))
    return cand.select("doc1", "doc2", ham.cast("int").alias("hamming")).filter(
        F.col("hamming") <= 3
    )


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram Jaccard near-dup with lang blocking: pairs sharing ≥1 word
    3-gram within the same lang; jaccard = |∩| / |∪| over distinct shingles."""
    docs = load_table(spark, sf_dir, "documents")
    w = docs.select("doc_id", "lang", _words(F.col("text")).alias("w"))
    # r8: sizes + both self-join sides read the distinct shingle set —
    # materialize the explode+distinct once instead of three times (the
    # all-pairs join itself stays the tagged baseline shape)
    sh = (
        w.select("doc_id", "lang", F.explode(_shingles(F.col("w"))).alias("sh"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc1"), F.col("b.doc_id").alias("doc2")
        )
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    out = (
        inter.join(sa, F.col("doc1") == F.col("sa.doc_id"))
        .join(sb, F.col("doc2") == F.col("sb.doc_id"))
        .select(
            "doc1",
            "doc2",
            "n_common",
            F.round(
                F.col("n_common")
                / (F.col("sa.n_sh") + F.col("sb.n_sh") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
    )
    return out.filter(F.col("jaccard") >= 0.02)


def _dot(a, b):
    """Left-fold dot product in double — fold order matches the oracle's
    list_reduce exactly (0.0 + v1 ≡ v1 in IEEE)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup with label blocking: same-label pairs with
    cosine ≥ 0.3 (the synthetic corpus has no true dups; this surfaces the
    closest-pair tail)."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id",
        "label",
        F.col("embedding").alias("v"),
        F.sqrt(_dot(F.col("embedding"), F.col("embedding"))).alias("nrm"),
    )
    a = e.alias("a")
    b = e.alias("b")
    cos = _dot(F.col("a.v"), F.col("b.v")) / (F.col("a.nrm") * F.col("b.nrm"))
    return (
        a.join(
            b,
            (F.col("a.label") == F.col("b.label"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("id1"),
            F.col("b.vec_id").alias("id2"),
            F.round(cos, 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= 0.3)
    )


def dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup, LSH-blocked — the scale path that replaces the
    label-blocked all-pairs variant (dedup_embedding_cosine): blocking key =
    random-hyperplane signature, exact cosine only inside a bucket. Same
    0.3 report threshold so the two variants are directly comparable; at
    100 TB the signature-equality join collapses the pair space to
    bucket-local."""
    from deepcrawl4ai_spark.operators.similarity import _hyperplane_sig

    emb = load_table(spark, sf_dir, "embeddings")
    # r8: both sides of the signature-equality self-join read e —
    # materialize the 16-plane signature pass once
    e = emb.select(
        "vec_id",
        F.col("embedding").alias("v"),
        F.sqrt(_dot(F.col("embedding"), F.col("embedding"))).alias("nrm"),
        _hyperplane_sig(F.col("embedding")).alias("sig"),
    ).localCheckpoint(eager=False)
    a = e.alias("a")
    b = e.alias("b")
    cos = _dot(F.col("a.v"), F.col("b.v")) / (F.col("a.nrm") * F.col("b.nrm"))
    return (
        a.join(
            b,
            (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("id1"),
            F.col("b.vec_id").alias("id2"),
            F.round(cos, 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= 0.3)
    )


def dedup_exact_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup with survivor policy: keep the smallest doc_id per
    fingerprint bucket (bucketed by md5 prefix to guarantee collisions in
    the synthetic corpus); list every dropped doc with its survivor."""
    docs = load_table(spark, sf_dir, "documents")
    fp = docs.select(
        "doc_id", F.substring(F.md5("text"), 1, 2).alias("bucket")
    )
    survivor = fp.groupBy("bucket").agg(F.min("doc_id").alias("keep_doc"))
    return (
        fp.join(survivor, "bucket")
        .filter(F.col("doc_id") != F.col("keep_doc"))
        .select("bucket", "doc_id", "keep_doc")
    )


def _verified_pairs(
    docs: DataFrame, cands: DataFrame, sh: DataFrame | None = None
) -> DataFrame:
    """Exact shingle-Jaccard verification of a candidate pair set (keep
    jaccard ≥ 0.04) — the second stage of every LSH near-dup pipeline.
    *sh*: optional precomputed shingle frame — raw (_shingle_frame_raw)
    or distinct; both are correct (sizes folds count_distinct per doc and
    the postings deduplicate after the candidate semi-join).

    r8 optimization (guide §3.2 — reduce the big side before the join):
    the shingle-postings self-join is PRE-FILTERED to docs that appear in
    the candidate set. The original joined the FULL postings table against
    itself — the same all-pairs-sharing-a-shingle intermediate as the
    tagged _truth_pairs baseline — and only intersected with the LSH
    candidates after the pair aggregation, so the banding pruned nothing
    from the verify stage's pair space. With the semi-join, the pair space
    is bounded by candidate docs (LSH's whole point). Values identical:
    every candidate pair's intersection count is computed from the same
    shingle sets; sizes (the Jaccard denominator) still come from the full
    per-doc shingle counts."""
    if sh is None:
        sh = _shingle_frame_raw(docs)
    cands = cands.localCheckpoint(eager=False)
    cand_docs = (
        cands.select(F.col("doc1").alias("doc_id"))
        .unionByName(cands.select(F.col("doc2").alias("doc_id")))
        .distinct()
    )
    # checkpoint the CONTRACTION points, not the corpus-sized shingle
    # frame: shc (candidate docs only) feeds both self-join sides and
    # sizes (one row per doc) feeds both denominator joins — caching
    # either costs little; caching sh itself at 10^6 docs means holding
    # ~corpus x shingle-width strings (measured slower at the 1M-doc leg)
    shc = (
        sh.join(cand_docs, "doc_id", "left_semi")
        .distinct()
        .localCheckpoint(eager=False)
    )
    sizes = (
        sh.groupBy("doc_id")
        .agg(F.count_distinct("sh").alias("n_sh"))
        .localCheckpoint(eager=False)
    )
    a = shc.alias("a")
    b = shc.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc1"), F.col("b.doc_id").alias("doc2"))
        .agg(F.count("*").alias("n_common"))
    )
    verified = (
        cands.join(inter, ["doc1", "doc2"])
        .join(sizes.alias("sa"), F.col("doc1") == F.col("sa.doc_id"))
        .join(sizes.alias("sb"), F.col("doc2") == F.col("sb.doc_id"))
        .select(
            "doc1",
            "doc2",
            F.round(
                F.col("n_common")
                / (F.col("sa.n_sh") + F.col("sb.n_sh") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
    )
    return verified.filter(F.col("jaccard") >= 0.04)


def dedup_minhash_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full two-stage near-dup pipeline: MinHash+LSH candidate pairs →
    exact shingle-Jaccard verification (keep jaccard ≥ 0.04). At scale the
    candidate stage collapses the pair space; the exact stage only touches
    survivors."""
    docs = load_table(spark, sf_dir, "documents")
    sh = _shingle_frame_raw(docs)
    return _verified_pairs(docs, _minhash_cands(docs, MINHASH_PARAMS, sh), sh)


def dedup_clusters_lp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster assignment over the verified near-dup pair graph: 3-hop
    min-label propagation — cluster = smallest doc_id within 3 hops, which
    for dedup survivor selection IS the keeper id (keep rows where
    cluster == doc_id). Unrolled fixed hops so the DuckDB oracle reproduces
    the arithmetic exactly; real dup clusters are tiny (pairs/triples), so
    3 hops is full convergence there — at open-ended scale the same
    per-iteration plan (join + min partial-agg, the Pregel shape) loops to
    fixpoint. Docs with no near-dup stay their own cluster."""
    return _clusters_lp_from(load_table(spark, sf_dir, "documents"))


def _clusters_lp_from(docs: DataFrame) -> DataFrame:
    """dedup_clusters_lp's core over an arbitrary (doc_id, text) frame —
    factored out so corpus_pipeline_v3 and the corpus-scale bench legs can
    run the identical near-dup chain on synthetic corpora. Value-identical
    to the pre-split body (the wrapper merely binds docs to the table)."""
    sh = _shingle_frame_raw(docs)
    # localCheckpoint the PAIR list (not the doubled edge list): the union
    # below reads `pairs` twice, so an uncheckpointed pairs frame ran the
    # whole verify join twice inside the old edges checkpoint (r8). The
    # doubled union over the cached pair list is then cheap enough to stay
    # lazy. localCheckpoint, NOT persist (the ADVICE r5 corpus_pipeline
    # rationale): checkpoint blocks are reclaimed by the ContextCleaner
    # when the caller drops the result; this also truncates the minhash
    # verify chain out of the 3-hop lineage.
    pairs = (
        _verified_pairs(docs, _minhash_cands(docs, MINHASH_PARAMS, sh), sh)
        .select("doc1", "doc2")
        .localCheckpoint(eager=False)
    )
    edges = (
        # no .distinct(): verified pairs are unique (distinct candidates
        # joined to a pair-keyed aggregate) and strictly doc1 < doc2, so
        # the swapped union is disjoint — the dedup shuffle was a no-op (r8)
        pairs.unionByName(
            pairs.select(F.col("doc2").alias("doc1"), F.col("doc1").alias("doc2"))
        )
    )
    labels = docs.select("doc_id", F.col("doc_id").alias("cluster"))
    # truncate between hops (label_propagation_fixpoint's discipline): each
    # _lp_step reads *labels* twice, so the unrolled 3-hop tree re-evaluates
    # hop 1 four times and the base scan 8× — two eager per-hop checkpoints
    # make the chain linear (3 hop evaluations total). The LAST hop stays
    # lazy so the returned plan still shows the Pregel join + min partial-agg
    # shape the audit pins.
    for i in range(3):
        labels = _lp_step(edges, labels)
        if i < 2:
            labels = labels.localCheckpoint(eager=False)
    return labels


def _lp_step(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """One min-label-propagation hop: per node, min(own label, neighbors'
    labels) — join + min partial-agg, the Pregel shape (one shuffle)."""
    nbr_min = (
        edges.join(
            labels.withColumnRenamed("doc_id", "doc1").select("doc1", "cluster"),
            "doc1",
        )
        .groupBy(F.col("doc2").alias("doc_id"))
        .agg(F.min("cluster").alias("nbr"))
    )
    return labels.join(nbr_min, "doc_id", "left").select(
        "doc_id",
        F.least(F.col("cluster"), F.coalesce(F.col("nbr"), F.col("cluster"))).alias(
            "cluster"
        ),
    )


def label_propagation_fixpoint(
    nodes: DataFrame,
    pairs: DataFrame,
    max_iters: int = 50,
    plan_depths: list | None = None,
) -> tuple[DataFrame, int]:
    """Production cluster assignment: the SAME per-hop plan as
    dedup_clusters_lp but looped until NO label changes (a cluster-side
    count, not a driver row loop), with localCheckpoint() per hop truncating
    lineage so plan depth stays constant (VERDICT r2 'unrolled iterative
    lineage'). Converges in O(cluster diameter) hops — real dup clusters are
    pairs/triples, so typically 1-2.

    *nodes*: one doc_id column; *pairs*: (doc1, doc2) undirected near-dup
    pairs. Returns (labels, iterations_run). *plan_depths* (test hook):
    pre-checkpoint plan line count per hop — constancy proves truncation."""
    from deepcrawl4ai_spark.frontier.engine import _unpersist_local_checkpoint

    edges = (
        pairs.select("doc1", "doc2")
        .unionByName(
            pairs.select(F.col("doc2").alias("doc1"), F.col("doc1").alias("doc2"))
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    labels = nodes.select("doc_id", F.col("doc_id").alias("cluster")).localCheckpoint(eager=False)
    iters = 0
    for _ in range(max_iters):
        nxt = _lp_step(edges, labels)
        if plan_depths is not None:
            plan_depths.append(
                len(nxt._jdf.queryExecution().optimizedPlan().toString().splitlines())
            )
        nxt = nxt.localCheckpoint(eager=False)
        iters += 1
        changed = (
            nxt.withColumnRenamed("cluster", "new")
            .join(labels, "doc_id")
            .filter(F.col("new") != F.col("cluster"))
            .count()
        )
        _unpersist_local_checkpoint(labels)
        labels = nxt
        if changed == 0:
            break
    _unpersist_local_checkpoint(edges)
    return labels, iters


def _truth_pairs(docs: DataFrame, sh: DataFrame | None = None) -> DataFrame:
    """All-pairs exact shingle-Jaccard ≥ 0.04 ground truth — the
    deliberately-unsafe all-pairs shape (tagged via the recall queries in
    SCALE_BASELINES), existing only to measure the LSH twins at test
    scale. *sh*: optional precomputed DISTINCT shingle frame."""
    if sh is None:
        sh = _shingle_frame(docs)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc1"), F.col("b.doc_id").alias("doc2"))
        .agg(F.count("*").alias("n_common"))
    )
    jac = F.round(
        F.col("n_common") / (F.col("sa.n_sh") + F.col("sb.n_sh") - F.col("n_common")),
        6,
    )
    return (
        inter.join(sizes.alias("sa"), F.col("doc1") == F.col("sa.doc_id"))
        .join(sizes.alias("sb"), F.col("doc2") == F.col("sb.doc_id"))
        .select("doc1", "doc2", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= 0.04)
        .select("doc1", "doc2")
    )


def dedup_recall_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH recall MEASURED as a registered query (r05): ground
    truth = ALL document pairs with exact shingle-Jaccard ≥ 0.04 (the
    verify threshold; no lang blocking, no LSH pruning — the uncompromised
    all-pairs answer), found = dedup_minhash_verified's output. found ⊆
    truth by construction (verification is the same exact Jaccard), so the
    single output row is the recall fact itself: how many true near-dup
    pairs LSH banding recovers. Turns the SCALE_BASELINES tag on
    dedup_ngram_jaccard into standing driver-verified evidence.

    Scale shape: the truth side is the tagged all-pairs baseline (this
    query's whole point is to measure the scale twin against it at test
    scale); the aggregates are three 1-row frames broadcast-cross-joined."""
    docs = load_table(spark, sf_dir, "documents")
    sh = _shingle_frame(docs)
    # ONE evaluation of the all-pairs exact-Jaccard subtree, shared by the
    # truth and found sides (checkpointed — it is a tiny pair list). Because
    # verification IS the same exact Jaccard at the same threshold,
    # found = truth ∩ candidates — value-identical to running
    # _verified_pairs independently, without a second postings self-join.
    truth = _truth_pairs(docs, sh).localCheckpoint(eager=False)
    found = truth.join(
        _minhash_cands(docs, MINHASH_PARAMS, sh), ["doc1", "doc2"], "left_semi"
    )
    n_truth = truth.agg(F.count("*").alias("n_truth"))
    n_found = found.agg(F.count("*").alias("n_found"))
    n_hit = truth.join(found, ["doc1", "doc2"]).agg(F.count("*").alias("n_hit"))
    return (
        n_truth.crossJoin(F.broadcast(n_found))
        .crossJoin(F.broadcast(n_hit))
        .select(
            "n_truth",
            "n_found",
            "n_hit",
            F.round(F.col("n_hit") / F.col("n_truth"), 6).alias("recall"),
        )
    )


def dedup_recall_minhash16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The RECALL LEVER, measured: rerun the two-stage near-dup pipeline
    with 16 minhash permutations (16 bands × 1 row) next to the production
    8, against the same all-pairs ground truth. Because MINHASH_PARAMS_16
    extends MINHASH_PARAMS verbatim, the 16-band candidate set is a
    PROVABLE superset of the 8-band one and verification is the same exact
    Jaccard — so monotone_ok (hit16 ≥ hit8) is an invariant, not a
    tolerance, and the recall16 − recall8 delta is the price list for the
    band/width trade-off a 100-TB operator tunes.

    Scale shape: truth = the tagged all-pairs baseline (the measurement's
    point); both pipeline sides stay LSH-pruned; final aggregates are 1-row
    frames broadcast-cross-joined."""
    docs = load_table(spark, sf_dir, "documents")
    sh = _shingle_frame(docs)
    # ONE all-pairs truth evaluation (checkpointed pair list) and ONE 16-perm
    # minhash aggregation shared by both band widths: the first 8 minima of
    # the 16-perm frame ARE the 8-perm minhashes (MINHASH_PARAMS_16 extends
    # MINHASH_PARAMS verbatim), so cands8/cands16 band off the same frame.
    # found_k = truth ∩ cands_k (verification is the same exact Jaccard) —
    # value-identical to the original three independent pipeline runs.
    truth = _truth_pairs(docs, sh).localCheckpoint(eager=False)
    x = (_hex_hash(F.col("sh")) % P).alias("x")
    h = sh.select("doc_id", x)
    aggs = [
        F.min((F.lit(a) * F.col("x") + F.lit(b)) % P).alias(f"m{i}")
        for i, (a, b) in enumerate(MINHASH_PARAMS_16)
    ]
    mh = h.groupBy("doc_id").agg(*aggs).localCheckpoint(eager=False)

    def _cands(n_bands: int) -> DataFrame:
        bands = mh.select(
            "doc_id",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("band"), F.col(f"m{i}").alias("bucket")
                        )
                        for i in range(n_bands)
                    ]
                )
            ).alias("bb"),
        ).select(
            "doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
        )
        a = bands.alias("a")
        b = bands.alias("b")
        return (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.bucket") == F.col("b.bucket"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(F.col("a.doc_id").alias("doc1"), F.col("b.doc_id").alias("doc2"))
            .distinct()
        )

    n_truth = truth.agg(F.count("*").alias("n_truth"))
    h8 = truth.join(_cands(8), ["doc1", "doc2"], "left_semi").agg(
        F.count("*").alias("n_hit8")
    )
    h16 = truth.join(_cands(16), ["doc1", "doc2"], "left_semi").agg(
        F.count("*").alias("n_hit16")
    )
    return (
        n_truth.crossJoin(F.broadcast(h8))
        .crossJoin(F.broadcast(h16))
        .select(
            "n_truth",
            "n_hit8",
            "n_hit16",
            F.round(F.col("n_hit8") / F.col("n_truth"), 6).alias("recall8"),
            F.round(F.col("n_hit16") / F.col("n_truth"), 6).alias("recall16"),
            (F.col("n_hit16") >= F.col("n_hit8")).alias("monotone_ok"),
        )
    )


def dedup_minhash_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level near-dup CUT — the apply twin completing the MinHash
    family (detect: dedup_minhash_verified; cluster: dedup_clusters_lp;
    this: the removal list a pipeline anti-joins against, the same
    detect→apply discipline as dedup_paragraphs_apply /
    dedup_substring_apply). Keeper = the 3-hop min-label cluster id (the
    smallest doc_id in the verified near-dup cluster keeps its slot); every
    other member is emitted as (doc_id, keeper). Docs with no verified
    near-dup never appear — the cut is a left-anti join for survivors.

    Scale shape: exactly dedup_clusters_lp (band equi-join candidates →
    bounded verify → 3 Pregel hops) plus one scan-side filter — no new
    shuffle, no pair space beyond the verified LSH candidates."""
    labels = dedup_clusters_lp(spark, sf_dir)
    return labels.filter(F.col("cluster") != F.col("doc_id")).select(
        "doc_id", F.col("cluster").alias("keeper")
    )


def dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, public): semantic dedup by
    centroid-blocked embedding cosine — assign every vector to its
    argmax-cosine centroid (the IVF/k-means assignment, broadcast
    centroids), compare pairs ONLY within a cluster, and greedily keep the
    lowest vec_id: a vector is removed iff some same-cluster partner with a
    smaller id has cosine ≥ τ (0.3 — the synthetic embeddings are
    near-uniform, so flagged pairs are the genuinely-close tail). Output:
    every removed vector with its smallest flagged partner and that pair's
    cosine (min-struct election — the repo's keeper idiom).

    Scale shape (the paper's whole point): the pair space is blocked per
    centroid cell — k centroids cut the all-pairs O(n²) to Σ|cell|²,
    with the cell size bounded by the k chosen at index build; one
    broadcast (centroids) + one shuffle on cid. The all-pairs baseline it
    replaces is dedup_embedding_cosine (tagged in SCALE_BASELINES)."""
    from deepcrawl4ai_spark.operators.similarity import (
        _assign_to_seed_centroids,
        _dot,
        _norm,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    # materialize the assignment ONCE before the self-join (the
    # _ivf_recall_panel_from fix, VERDICT r7 'what's wrong' #2): both sides
    # of the per-cell pair join read the same cached frame instead of
    # re-evaluating the broadcast-argmax subtree twice. The assignment
    # chain's plan shape stays audited via ann_kmeans_update/ann_ivf_assign.
    assigned = (
        _assign_to_seed_centroids(emb)
        .select("vec_id", "cid", "v", _norm(F.col("v")).alias("nrm"))
        .localCheckpoint(eager=False)
    )
    a = assigned.alias("a")
    b = assigned.alias("b")
    cos = F.round(
        _dot(F.col("a.v"), F.col("b.v")) / (F.col("a.nrm") * F.col("b.nrm")), 6
    )
    flagged = (
        a.join(
            b,
            (F.col("a.cid") == F.col("b.cid"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("b.vec_id").alias("vec_id"),
            F.col("b.cid").alias("cid"),
            F.col("a.vec_id").alias("partner"),
            cos.alias("cosine"),
        )
        .filter(F.col("cosine") >= 0.3)
    )
    best = F.min(F.struct("partner", "cosine")).alias("k")
    return (
        flagged.groupBy("vec_id", "cid")
        .agg(best)
        .select(
            "vec_id",
            "cid",
            F.col("k.partner").alias("partner"),
            F.col("k.cosine").alias("cosine"),
        )
    )


def dedup_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup candidate pairs from winnowing fingerprints — the MOSS
    match step downstream of text_winnow_fingerprint: two docs are
    candidates when they share ≥ 2 selected fingerprint HASHES (one shared
    hash already implies a common ≥7-word run by the winnowing guarantee;
    two distinct shared hashes cut the accidental-collision tail). Emits
    (doc1, doc2, n_shared).

    Scale shape: the fingerprint postings join on fp_hash — the pair space
    collapses to per-fingerprint bucket sizes exactly like an LSH band
    join, never all-pairs; one distinct + one equi-join + one pair
    partial-agg."""
    from deepcrawl4ai_spark.operators.textops import text_winnow_fingerprint

    # r8: both sides of the postings self-join read the fingerprint set —
    # materialize the winnowing window chain once
    fp = (
        text_winnow_fingerprint(spark, sf_dir)
        .select("doc_id", "fp_hash")
        .distinct()
        .localCheckpoint(eager=False)
    )
    a = fp.alias("a")
    b = fp.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fp_hash") == F.col("b.fp_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc1"), F.col("b.doc_id").alias("doc2")
        )
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= 2)
    )


def dedup_semantic_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over TRAINED cells (VERDICT r6 #4): the centroid structure
    comes from one Lloyd step of k-means — exactly ann_kmeans_update's
    update rule, seeded by the vec_id % 50 sample — instead of the raw
    seed vectors. This is the composition a real curation pipeline runs:
    SemDeDup (Abbas et al. 2023, arXiv:2303.09540, public) trains k-means
    on the embedding corpus first, then sweeps pairs per cell.

    Cross-engine determinism: the per-dim cluster means are rounded to
    4dp (+0.0 normalizes IEEE -0.0) BEFORE the reassignment, so the
    trained centroids both engines dot against are bit-identical by
    construction and the argmax-cosine assignment cannot drift on
    floating-point summation order — dot products and norms then fold the
    same arrays in the same index order on both sides.

    Scale shape: one Lloyd step adds a (cid, dim) partial-agg shuffle and
    a k-row centroid rebuild on top of dedup_semantic's broadcast-assign
    + per-cell pair join. Pair space is still sum(|cell|^2) with the
    trained cells; the centroid dim stays k rows, broadcast. The trained
    assignment is materialized ONCE (localCheckpoint) before the
    self-join — r8 optimization closing VERDICT r7 'what's wrong' #2:
    the uncached shape re-ran the Lloyd step and the reassignment on BOTH
    sides of the pair join, a 2× tax at any scale. The Lloyd/assignment
    plan shape stays audited via ann_kmeans_update.

    Reference parity: the reference engine has no ANN/semantic-dedup
    machinery — this extends the training-data operator library."""
    from deepcrawl4ai_spark.operators.similarity import (
        _assign_to_centroids,
        _dot,
        _lloyd_trained_centroids,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    assigned = _assign_to_centroids(emb, _lloyd_trained_centroids(emb)).localCheckpoint(eager=False)
    a = assigned.alias("a")
    b = assigned.alias("b")
    cos = F.round(
        _dot(F.col("a.v"), F.col("b.v")) / (F.col("a.nrm") * F.col("b.nrm")), 6
    )
    flagged = (
        a.join(
            b,
            (F.col("a.cid") == F.col("b.cid"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("b.vec_id").alias("vec_id"),
            F.col("b.cid").alias("cid"),
            F.col("a.vec_id").alias("partner"),
            cos.alias("cosine"),
        )
        .filter(F.col("cosine") >= 0.3)
    )
    best = F.min(F.struct("partner", "cosine")).alias("k")
    return (
        flagged.groupBy("vec_id", "cid")
        .agg(best)
        .select(
            "vec_id",
            "cid",
            F.col("k.partner").alias("partner"),
            F.col("k.cosine").alias("cosine"),
        )
    )
