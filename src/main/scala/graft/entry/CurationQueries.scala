package graft.entry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.GraftSession
import graft.ext.{Curation, TextAnalysis}

/** Training-data curation surface (ext/Curation + the repetition filter):
  * reproducible epoch shuffles, sharded export assignment, weighted
  * corpus mixing, duplicate-n-gram quality scoring. All decisions are
  * md5(seed,id)-derandomized, which is what lets DuckDB replicate them
  * bit-for-bit. */
object CurationQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    GraftSession.table(s, dir, "documents")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Deterministic epoch shuffle + 8-way shard assignment: the corpus in
    // seed-'ep1' order with each row's export shard. Range-partitioned
    // sort on the hash — the 100 TB shuffle plan.
    "q61_det_shuffle" -> ((s, dir) => {
      val d = docs(s, dir)
      d.select(col("doc_id"),
          Curation.shuffleKey("ep1", col("doc_id")).as("skey"),
          Curation.shard("ep1", col("doc_id"), 8).as("shard"))
        .orderBy("skey", "doc_id")
    }),

    // Top-bigram character coverage (the OTHER Gopher §A1.1 repetition
    // rule): fraction of each doc's characters covered by its single
    // most frequent word bigram — catches one-phrase domination
    // (boilerplate/SEO stuffing) that q62's distinct-ratio can't see.
    // Gram explode + count + rank-1 WindowGroupLimit; one division of
    // exact integers so the double hash-matches.
    "q167_top_gram_coverage" -> ((s, dir) => {
      TextAnalysis.withTopGramCoverage(docs(s, dir), "doc_id", "text",
          n = 2)
        .orderBy("doc_id")
    }),

    // UniMax epoch-capped mixture allocation over LANGUAGES (the
    // algorithm's own unit): a 1.5×-corpus token budget water-filled
    // under a 2-epoch-per-language cap. en (≈2.6× every other
    // language) is budget-limited while the small languages hit the
    // epoch cap — both phases of the closed form live at every SF.
    // All integer floor arithmetic; the sequential-loop equivalence
    // is property-spec'd in CurationSpec.
    "q217_unimax_allocation" -> ((s, dir) => {
      val d = TextAnalysis.withTokenCounts(docs(s, dir), "text")
      Curation.unimaxAllocationOfTotal(d, "lang", "n_tokens",
          epochCap = 2L, budgetNum = 3L, budgetDen = 2L)
        .orderBy("lang")
    }),

    // Token-budget corpus sampling: a reproducible quarter-of-the-
    // corpus token slice via sharded hash-order prefixes (the
    // packSequences cumsum idiom — no single-task global window).
    // Budget = total/4 computed from the data, so the row is
    // SF-invariant.
    "q233_budget_sample" -> ((s, dir) => {
      val d = TextAnalysis.withTokenCounts(docs(s, dir), "text")
        .select(col("doc_id"), col("n_tokens"))
      val total = d.agg(sum(col("n_tokens"))).head().getLong(0)
      Curation.budgetSample(d, "doc_id", "n_tokens",
          budget = total / 4, seed = "bs1", nShards = 8)
        .orderBy("doc_id")
    }),

    // END-TO-END MIXTURE pipeline as ONE query: quality gate → UniMax
    // allocation over the survivors → epoch expansion → per-INSTANCE
    // deterministic order + shard (epoch:doc keyed, so repeated epochs
    // spread across shards). Two corpus scans, zero corpus shuffles.
    "q231_mixture_pipeline" -> ((s, dir) => {
      Curation.mixturePipeline(docs(s, dir))
        .orderBy("skey", "doc_id", "epoch")
    }),

    // MIXTURE EXECUTION: q217's UniMax allocation materialized into
    // the epoch-expanded training stream — per (doc, epoch) instance,
    // full epochs replicated, the fractional epoch hash-sampled with
    // token-exact-in-expectation odds. One broadcast join + map-only
    // explode; the corpus never shuffles.
    "q225_mixture_execute" -> ((s, dir) => {
      val d = TextAnalysis.withTokenCounts(docs(s, dir), "text")
      val alloc = Curation.unimaxAllocationOfTotal(d, "lang", "n_tokens",
        epochCap = 2L, budgetNum = 3L, budgetDen = 2L)
      Curation.executeMixture(docs(s, dir).select("doc_id", "lang"),
          "lang", "doc_id", alloc, seed = "um1")
        .orderBy("doc_id", "epoch")
    }),

    // Fill-in-the-middle transform at FIM-rate 0.75: hash-selected
    // docs split at two deterministic code-point positions into
    // (prefix, middle, suffix) with a PSM/SPM mode draw; the rest pass
    // through plain. Map-only, reproducible per (seed, id); CJK docs
    // exercise the code-point unit system.
    "q227_fim_transform" -> ((s, dir) => {
      Curation.fimTransform(docs(s, dir), "doc_id", "text",
          seed = "fim1", rate = 0.75)
        .orderBy("doc_id")
    }),

    // T5 span corruption (the denoising objective next to q227's
    // FIM): deterministic hash-drawn spans → numbered sentinels in
    // the input, sentinel+span pairs in the target. ZERO shuffle —
    // masks, run merging, sentinel numbering (the transform INDEX
    // over the run-start array, no cumsum) and both reassemblies are
    // array HOFs in the scan projection; the oracle derives the same
    // rows through the explode+window spelling.
    "q252_span_corrupt" -> ((s, dir) => {
      Curation.spanCorrupt(docs(s, dir), "doc_id", "text",
          seed = "sc1", startDenom = 8, spanLen = 2)
        .orderBy("doc_id")
    }),

    // Temperature mixture weights (α = 0.5) over languages — the
    // mBERT/XLM-R-style upsampling curve next to q217's UniMax. sqrt
    // is correctly rounded IEEE so each numerator is bit-identical;
    // the denominator folds in language order through the exact-fold
    // device — the weights hash as doubles.
    "q221_temperature_mixture" -> ((s, dir) => {
      val d = TextAnalysis.withTokenCounts(docs(s, dir), "text")
      Curation.temperatureMixture(d, "lang", "n_tokens", alpha = 0.5)
        .orderBy("lang")
    }),

    // Per-source percentile-rank normalization of the q74 quality
    // score: the cross-source score equalizer that makes one global
    // threshold meaningful over heterogeneous sources. Exact integer
    // PERCENT_RANK (floor-e9), ties share ranks.
    "q222_percentile_normalize" -> ((s, dir) => {
      val sig = TextAnalysis.withQualitySignals(docs(s, dir), "text")
        .withColumn("q_score",
          floor(col("alpha_ratio") * lit(1e9) + lit(0.5)).cast("long"))
      graft.ext.Stats.groupPercentileRank(sig, Seq("source"), "q_score")
        .select("doc_id", "source", "q_score", "pctl_e9")
        .orderBy("doc_id")
    }),

    // Eval-side leakage report (q64's contamination transposed): per
    // benchmark item (docs 0-9), its max containment over the corpus,
    // the worst doc, and how many docs exceed τ=0.3 — the direction a
    // decontamination run reports. Eval shingles broadcast; the only
    // shuffle carries matched (eval, doc) pairs.
    "q223_eval_leakage" -> ((s, dir) => {
      val d = docs(s, dir)
      Curation.evalLeakage(d.filter(col("doc_id") >= 10),
          d.filter(col("doc_id") < 10), "doc_id", "text",
          n = 3, tauE9 = 300000000L)
        .orderBy("eval_id")
    }),

    // DPO/RLHF preference-pair construction: per source, the best and
    // worst doc by alpha_ratio (an exact-division score) as a
    // (chosen, rejected) pair with margin. One hash agg of min/max
    // structs — no window, no per-group sort; ties resolve to
    // (highest-id chosen, lowest-id rejected) deterministically.
    "q174_preference_pairs" -> ((s, dir) => {
      val scored = TextAnalysis.withQualitySignals(docs(s, dir), "text")
      Curation.preferencePairs(scored, "source", "doc_id", "alpha_ratio")
        .orderBy("source")
    }),

    // Duplicate-LINE repetition (the third Gopher §A1.1 rule): excess
    // exact-copy lines per doc, as line-count and character fractions.
    // The corpus has no physical lines, so the row rebuilds them
    // deterministically (2-token chunks joined by \n — the oracle
    // replays the same reconstruction; width 2 because the word-soup
    // corpus almost never repeats a wider chunk) and exercises the REAL
    // operator: split → (doc, line) hash agg with partials → four
    // integer sums per doc. Duplicate docs' shared chunks make the
    // signal non-vacuous. Fractions are one exact-integer division.
    "q168_line_repetition" -> ((s, dir) => {
      TextAnalysis.withLineRepetition(
          TextQueries.rebuiltLines(s, dir, w = 2), "doc_id", "text")
        .orderBy("doc_id")
    }),

    // Duplicate-bigram repetition score (boilerplate/repetition quality
    // filter): exact distinct-vs-total gram counts, map-only.
    "q62_repetition" -> ((s, dir) => {
      TextAnalysis.withRepetitionScore(docs(s, dir), "text", n = 2)
        .select("doc_id", "n_grams", "n_distinct_grams", "dup_gram_ratio")
        .orderBy("doc_id")
    }),

    // Per-source dataset card: doc/token/char counts, corpus-level
    // alpha ratio (ONE division of exact sums), exact-dup doc count.
    // Digests shuffle, text never does.
    "q93_dataset_card" -> ((s, dir) => {
      Curation.datasetCard(docs(s, dir), "source", "text")
        .orderBy("source")
    }),

    // Weighted sample WITHOUT replacement (Efraimidis–Spirakis):
    // inclusion odds ∝ char length, the "sample big docs more" corpus
    // subsample. The draw is the md5-u32 hash, so the oracle replays
    // it exactly — ln and the u division are correctly-rounded IEEE
    // ops that agree bit-for-bit across engines. Plans as TakeOrdered:
    // per-partition top-k, corpus never shuffles.
    "q155_weighted_sample" -> ((s, dir) => {
      val d = docs(s, dir)
      // output integer columns only: the KEY is ln-derived and JVM vs
      // glibc ln differ by 1 ulp on rare inputs (observed on q156's
      // draw) — never enough to reorder distinct docs, but enough to
      // fail a bit-exact double hash
      Curation.weightedSample(d, "doc_id", length(col("text")),
          k = 20, seed = "ws1")
        .select(col("doc_id"), length(col("text")).cast("long").as("w"))
        .orderBy(col("doc_id").asc)
    }),

    // The per-stratum form: top-5 weighted draw per source — balanced
    // weighted subsampling. rank<=k over the key window plans as
    // WindowGroupLimit (local per-task top-k BEFORE the shuffle).
    "q156_weighted_sample_stratified" -> ((s, dir) => {
      val d = docs(s, dir)
      Curation.weightedSampleStratified(d, Seq("source"), "doc_id",
          length(col("text")), k = 5, seed = "ws2")
        .select("source", "doc_id", "rank")
        .orderBy(col("source").asc, col("rank").asc)
    }),

    // Deterministic train/val/test split (80/10/10): fixed-point hash
    // intervals, map-only, stable under corpus growth — a doc keeps its
    // split forever regardless of what arrives later.
    "q87_split_assign" -> ((s, dir) => {
      Curation.assignSplits(docs(s, dir), "doc_id", "sp1",
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .select("doc_id", "split")
        .orderBy("doc_id")
    }),

    // Epoch-weighted UP-sampling (the complement of q63's thinning):
    // src0 ×2.5 (2 copies + hash-coin half copy), src1 dropped, src2 ×3
    // exactly, every other source ×1. Map-only explode fanout — the
    // copies are born in the scan, nothing shuffles.
    "q88_upsample_mix" -> ((s, dir) => {
      Curation.upsampleSources(docs(s, dir), "source", "doc_id",
          Seq("src0" -> 2.5, "src1" -> 0.0, "src2" -> 3.0), seed = "mix2")
        .select("doc_id", "source", "copy")
        .orderBy("doc_id", "copy")
    }),

    // Weighted corpus mix: per-source keep rates (src0 all, src1 half,
    // src2 quarter, src3 a tenth, everything else dropped), one filter
    // pass, exact integer thresholds.
    "q63_corpus_mix" -> ((s, dir) => {
      Curation.mixSources(docs(s, dir), "source", "doc_id",
          Seq("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.25, "src3" -> 0.1),
          seed = "mix1")
        .select("doc_id", "source")
        .orderBy("doc_id")
    }),

    // Benchmark-contamination scan: docs 0-9 stand in as the held-out
    // eval set; every other doc reports what fraction of its distinct
    // trigrams appear in that set. Eval vocabulary broadcasts.
    "q64_contamination" -> ((s, dir) => {
      val d = docs(s, dir)
      Curation.contamination(d.filter(col("doc_id") >= 10),
          d.filter(col("doc_id") < 10), "doc_id", "text", n = 3)
        .orderBy("doc_id")
    }),

    // Top TF-IDF term per document (rational idf — see
    // TextAnalysis.topTfidfTerm for why not log).
    "q65_tfidf" -> ((s, dir) => {
      TextAnalysis.topTfidfTerm(docs(s, dir), "doc_id", "text")
        .orderBy("doc_id")
    }),

    // Sequence packing: seed-shuffled per-shard document streams cut
    // into 1024-token training sequences — per doc, the pack its first
    // token lands in and the offset inside it. One shuffle (hash by
    // shard) + per-shard window; shard-partitioned so no single-task
    // global cumsum.
    "q71_pack_sequences" -> ((s, dir) => {
      val d = TextAnalysis.withTokenCounts(docs(s, dir), "text")
      Curation.packSequences(d, "doc_id", "n_tokens",
          budget = 1024L, seed = "ep2", nShards = 8)
        .select("doc_id", "shard", "n_tokens", "pack", "pack_offset")
        .orderBy("doc_id")
    }),

    // Two-phase ANNEALING mixture plan (the Llama-3-style
    // end-of-training quality anneal): phase 'pretrain' samples
    // proportionally (α = 1) over the WHOLE corpus; phase 'anneal'
    // re-weights with strong small-group upsampling (α = 0.25, the
    // sqrt-sqrt chain) over the QUALITY-GATED slice only. Both
    // phases are the SAME temperatureMixture derivation (exact-fold
    // denominators), so the whole plan hashes.
    "q264_annealing_plan" -> ((s, dir) => {
      val d = docs(s, dir)
      val pre = Curation.temperatureMixture(
          TextAnalysis.withTokenCounts(d, "text"), "lang", "n_tokens",
          alpha = 1.0)
        .withColumn("phase", lit("pretrain"))
      val ann = Curation.temperatureMixture(
          TextAnalysis.qualityVerdict(d, "text")
            .where(col("verdict") === "keep"),
          "lang", "n_tokens", alpha = 0.25)
        .withColumn("phase", lit("anneal"))
      pre.unionByName(ann)
        .select("phase", "lang", "n_tokens", "weight")
        .orderBy("phase", "lang")
    }),

    // End-to-end INGEST pipeline in ONE query (the q197/q231
    // convention for the chunked-pretrain/RAG path): quality gate →
    // fixed-stride overlapping chunking → deterministic sequence
    // packing of the SURVIVING CHUNKS (pack identity = "doc:chunk").
    // One linear frame: the gate and chunk stages fuse into the scan
    // side, packing adds the single shard-keyed exchange — the corpus
    // is never re-read between stages.
    "q261_ingest_pipeline" -> ((s, dir) => {
      val kept = TextAnalysis.qualityVerdict(docs(s, dir), "text")
        .where(col("verdict") === "keep")
        .select("doc_id", "text")
      val chunks = TextAnalysis.chunkTokens(kept, "doc_id", "text",
          chunkSize = 32, overlap = 8)
        .withColumn("chunk_key",
          concat_ws(":", col("doc_id"), col("chunk_id")))
      Curation.packSequences(chunks, "chunk_key", "n_tokens",
          budget = 256L, seed = "ing1", nShards = 8)
        .select("doc_id", "chunk_id", "start_token", "n_tokens",
          "chunk_hash", "shard", "pack", "pack_offset")
        .orderBy("doc_id", "chunk_id")
    }),

    // First-failing-rule quality verdict: keep, or the name of the
    // first gate failed (too_short -> low_alpha -> high_punct ->
    // repetitive). Map-only; the verdict histogram is the filter-tuning
    // signal.
    "q72_quality_verdict" -> ((s, dir) => {
      TextAnalysis.qualityVerdict(docs(s, dir), "text")
        .select("doc_id", "verdict")
        .orderBy("doc_id")
    }),

    // Corpus-conditional bigram familiarity (the self-trained
    // "perplexity filter" shape): per doc, the exact-integer sum of
    // quantized conditional bigram probabilities under the corpus's own
    // bigram table. Low scores = out-of-domain / scrambled text.
    "q80_bigram_familiarity" -> ((s, dir) => {
      TextAnalysis.bigramFamiliarity(docs(s, dir), "doc_id", "text")
        .orderBy("doc_id")
    }),

    // Per-source quality quota (curriculum selection): the 20 highest-
    // alpha-ratio docs of each source via the bounded-state grouped
    // top-k — <=k pairs per group per partition shuffle, never a full
    // per-source sort. Scores quantized to exact longs for
    // engine-stable ordering.
    "q74_quality_quota" -> ((s, dir) => {
      val sig = TextAnalysis.withQualitySignals(docs(s, dir), "text")
        .withColumn("q_score",
          floor(col("alpha_ratio") * lit(1e9) + lit(0.5)).cast("long"))
      graft.ext.Sketches.groupedTopK(sig, "source", "doc_id", "q_score",
          k = 20)
        .orderBy("source", "rank")
    }))

  val oracleSql: Map[String, String] = Map(
    "q61_det_shuffle" ->
      """SELECT doc_id,
        | md5(concat('ep1','#',CAST(doc_id AS VARCHAR))) AS skey,
        | CAST(concat('0x', substr(md5(concat('ep1','#',CAST(doc_id AS VARCHAR))),1,8)) AS BIGINT) % 8 AS shard
        |FROM documents ORDER BY skey, doc_id""".stripMargin,
    "q62_repetition" ->
      """WITH toks AS (SELECT doc_id, string_split_regex(text,'\s+') t FROM documents),
        |sh AS (SELECT doc_id, array_to_string(t[i:i+1],' ') s
        |       FROM toks, unnest(generate_series(1, len(t)-1)) u(i)
        |       WHERE len(t) >= 2),
        |agg AS (SELECT doc_id, COUNT(*) AS n_grams,
        |               COUNT(DISTINCT s) AS n_distinct_grams
        |        FROM sh GROUP BY 1)
        |SELECT t.doc_id,
        | COALESCE(a.n_grams, 0) AS n_grams,
        | COALESCE(a.n_distinct_grams, 0) AS n_distinct_grams,
        | CASE WHEN a.n_grams IS NULL THEN 0.0
        |      ELSE 1.0 - CAST(a.n_distinct_grams AS DOUBLE)
        |                 / CAST(a.n_grams AS DOUBLE) END AS dup_gram_ratio
        |FROM toks t LEFT JOIN agg a ON t.doc_id = a.doc_id
        |ORDER BY t.doc_id""".stripMargin,
    // q62's token/bigram CTEs + per-(doc, gram) counts + the same
    // (count desc, gram asc) rank-1 tie-break as the Spark window
    "q167_top_gram_coverage" ->
      """WITH toks AS (SELECT doc_id, string_split_regex(text,'\s+') t FROM documents),
        |base AS (SELECT doc_id,
        |           CAST(length(array_to_string(t, ' ')) AS BIGINT) chars
        |         FROM toks),
        |sh AS (SELECT doc_id, array_to_string(t[i:i+1],' ') s
        |       FROM toks, unnest(generate_series(1, len(t)-1)) u(i)
        |       WHERE len(t) >= 2),
        |cnt AS (SELECT doc_id, s, COUNT(*) c FROM sh GROUP BY 1,2),
        |top AS (SELECT doc_id, s, c FROM (
        |          SELECT doc_id, s, c, ROW_NUMBER() OVER (
        |            PARTITION BY doc_id ORDER BY c DESC, s ASC) rk
        |          FROM cnt) rkd
        |        WHERE rk = 1)
        |SELECT b.doc_id, top.s AS top_gram,
        |  COALESCE(top.c, 0) AS top_gram_count,
        |  CASE WHEN b.chars > 0 AND top.c IS NOT NULL
        |       THEN CAST(top.c * length(top.s) AS DOUBLE)
        |            / CAST(b.chars AS DOUBLE)
        |       ELSE 0.0 END AS top_gram_coverage
        |FROM base b LEFT JOIN top ON b.doc_id = top.doc_id
        |ORDER BY b.doc_id""".stripMargin,
    // the UniMax closed form verbatim: ascending (cap, lang) prefix
    // sums, the monotone capped predicate, i* = first uncapped row,
    // even-split tail alloc = (R + j - 1) // m — every step BIGINT
    // floor arithmetic (// and Spark's div agree on non-negatives)
    "q217_unimax_allocation" ->
      """WITH per AS (SELECT lang,
        |  CAST(SUM(len(string_split_regex(text,'\s+'))) AS BIGINT) AS n_tokens
        | FROM documents GROUP BY 1),
        |g AS (SELECT lang, n_tokens, n_tokens*2 AS cap_tokens,
        |  CAST(ROW_NUMBER() OVER (ORDER BY n_tokens*2, lang) AS BIGINT) AS i,
        |  COUNT(*) OVER () AS k, SUM(n_tokens) OVER () AS total,
        |  COALESCE(SUM(n_tokens*2) OVER (ORDER BY n_tokens*2, lang
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pfx
        | FROM per),
        |b AS (SELECT *, (3*total)//2 AS budget,
        |  CASE WHEN cap_tokens*(k-i+1) <= budget - pfx THEN 1 ELSE 0 END AS capped
        | FROM g),
        |s AS (SELECT *, MIN(CASE WHEN capped=0 THEN i END) OVER () AS istar FROM b),
        |f AS (SELECT *,
        |  COALESCE(SUM(CASE WHEN i < istar THEN cap_tokens ELSE 0 END) OVER (), 0) AS sumcapped
        | FROM s),
        |o AS (SELECT lang, n_tokens, cap_tokens,
        |  CASE WHEN istar IS NULL OR i < istar THEN cap_tokens
        |       ELSE (budget - sumcapped + (i - istar)) // (k - istar + 1)
        |  END AS alloc_tokens
        | FROM f)
        |SELECT lang, n_tokens, cap_tokens,
        |  CAST(alloc_tokens AS BIGINT) AS alloc_tokens,
        |  CAST(CASE WHEN n_tokens > 0 THEN (alloc_tokens*1000) // n_tokens
        |       ELSE 0 END AS BIGINT) AS epochs_milli
        |FROM o ORDER BY lang""".stripMargin,
    // sharded cumsum prefixes under per-lane quotas: the md5 lane and
    // order draws (q63's idiom), budget = total//4 from the data,
    // remainder tokens to the low lanes — all integer floor arithmetic
    "q233_budget_sample" ->
      """WITH d AS (SELECT doc_id,
        |    CAST(len(string_split_regex(text,'\s+')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS t FROM d),
        |p AS (SELECT doc_id, n_tokens,
        |    CAST(concat('0x', substr(md5(concat('bs1:sh','#',CAST(doc_id AS VARCHAR))),1,8)) AS BIGINT) % 8 AS shard,
        |    md5(concat('bs1','#',CAST(doc_id AS VARCHAR))) AS sk
        |  FROM d),
        |c AS (SELECT doc_id, n_tokens, shard,
        |    CAST(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY sk, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
        |  FROM p)
        |SELECT doc_id, n_tokens, shard, cum_tokens
        |FROM c, tot
        |WHERE cum_tokens <= (t//4)//8
        |  + CASE WHEN shard < (t//4) % 8 THEN 1 ELSE 0 END
        |ORDER BY doc_id""".stripMargin,
    // the q197-style one-chain oracle: the quality gate's formulas
    // (q33/q31 idioms) feed the q217 closed form, the q225 expansion,
    // and the md5 instance order/shard — every stage the Spark
    // pipeline's own SQL twin, composed
    "q231_mixture_pipeline" ->
      """WITH q AS (SELECT doc_id, lang,
        |    CAST(len(string_split_regex(text,'\s+')) AS BIGINT) AS n_tokens
        |  FROM documents
        |  WHERE len(string_split_regex(text,'\s+')) >= 20
        |    AND (CASE WHEN length(text) = 0 THEN 0.0
        |         ELSE CAST(length(regexp_replace(text,'[^A-Za-z]','','g')) AS DOUBLE)
        |              / CAST(length(text) AS DOUBLE) END) >= 0.805),
        |per AS (SELECT lang, CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
        |  FROM q GROUP BY 1),
        |g AS (SELECT lang, n_tokens, n_tokens*2 AS cap_tokens,
        |  CAST(ROW_NUMBER() OVER (ORDER BY n_tokens*2, lang) AS BIGINT) AS i,
        |  COUNT(*) OVER () AS k, SUM(n_tokens) OVER () AS total,
        |  COALESCE(SUM(n_tokens*2) OVER (ORDER BY n_tokens*2, lang
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pfx
        | FROM per),
        |b AS (SELECT *, (3*total)//2 AS budget,
        |  CASE WHEN cap_tokens*(k-i+1) <= budget - pfx THEN 1 ELSE 0 END AS capped
        | FROM g),
        |s AS (SELECT *, MIN(CASE WHEN capped=0 THEN i END) OVER () AS istar FROM b),
        |f AS (SELECT *,
        |  COALESCE(SUM(CASE WHEN i < istar THEN cap_tokens ELSE 0 END) OVER (), 0) AS sumcapped
        | FROM s),
        |o AS (SELECT lang, n_tokens,
        |  CASE WHEN istar IS NULL OR i < istar THEN cap_tokens
        |       ELSE (budget - sumcapped + (i - istar)) // (k - istar + 1)
        |  END AS alloc_tokens
        | FROM f WHERE n_tokens > 0),
        |aa AS (SELECT lang,
        |  CAST(alloc_tokens // n_tokens AS BIGINT) AS efull,
        |  CAST(((alloc_tokens % n_tokens) * 4294967296) // n_tokens AS BIGINT) AS thresh
        | FROM o),
        |inst AS (SELECT q.doc_id, q.lang, CAST(u.e AS BIGINT) AS epoch
        |  FROM q JOIN aa USING (lang),
        |    unnest(generate_series(0, aa.efull)) u(e)
        |  WHERE u.e < aa.efull
        |    OR CAST(concat('0x', substr(md5(concat('mx1','#',CAST(q.doc_id AS VARCHAR))),1,8)) AS BIGINT) < aa.thresh),
        |ik AS (SELECT doc_id, lang, epoch,
        |    concat(CAST(epoch AS VARCHAR), ':', CAST(doc_id AS VARCHAR)) AS key
        |  FROM inst)
        |SELECT doc_id, lang, epoch,
        |  CAST(concat('0x', substr(md5(concat('mx1:shard','#',key)),1,8)) AS BIGINT) % 8 AS shard,
        |  md5(concat('mx1:ord','#',key)) AS skey
        |FROM ik ORDER BY skey, doc_id, epoch""".stripMargin,
    // q217's closed form feeding the epoch expansion: full epochs via
    // generate_series (inclusive upper bound = the fractional epoch),
    // fractional docs by the md5-u32 threshold (q63's idiom); the
    // threshold division exact BIGINT at test scale (Spark side
    // decimal-widened for 100 TB counts)
    "q225_mixture_execute" ->
      """WITH per AS (SELECT lang,
        |  CAST(SUM(len(string_split_regex(text,'\s+'))) AS BIGINT) AS n_tokens
        | FROM documents GROUP BY 1),
        |g AS (SELECT lang, n_tokens, n_tokens*2 AS cap_tokens,
        |  CAST(ROW_NUMBER() OVER (ORDER BY n_tokens*2, lang) AS BIGINT) AS i,
        |  COUNT(*) OVER () AS k, SUM(n_tokens) OVER () AS total,
        |  COALESCE(SUM(n_tokens*2) OVER (ORDER BY n_tokens*2, lang
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pfx
        | FROM per),
        |b AS (SELECT *, (3*total)//2 AS budget,
        |  CASE WHEN cap_tokens*(k-i+1) <= budget - pfx THEN 1 ELSE 0 END AS capped
        | FROM g),
        |s AS (SELECT *, MIN(CASE WHEN capped=0 THEN i END) OVER () AS istar FROM b),
        |f AS (SELECT *,
        |  COALESCE(SUM(CASE WHEN i < istar THEN cap_tokens ELSE 0 END) OVER (), 0) AS sumcapped
        | FROM s),
        |o AS (SELECT lang, n_tokens,
        |  CASE WHEN istar IS NULL OR i < istar THEN cap_tokens
        |       ELSE (budget - sumcapped + (i - istar)) // (k - istar + 1)
        |  END AS alloc_tokens
        | FROM f WHERE n_tokens > 0),
        |aa AS (SELECT lang,
        |  CAST(alloc_tokens // n_tokens AS BIGINT) AS efull,
        |  CAST(((alloc_tokens % n_tokens) * 4294967296) // n_tokens AS BIGINT) AS thresh
        | FROM o)
        |SELECT d.doc_id, d.lang, CAST(u.e AS BIGINT) AS epoch
        |FROM documents d JOIN aa USING (lang),
        |  unnest(generate_series(0, aa.efull)) u(e)
        |WHERE u.e < aa.efull
        |  OR CAST(concat('0x', substr(md5(concat('um1','#',CAST(d.doc_id AS VARCHAR))),1,8)) AS BIGINT) < aa.thresh
        |ORDER BY d.doc_id, epoch""".stripMargin,
    // the same md5-u32 draws (selection, both cut points, mode bit);
    // substr/length count code points in both engines — the CDC
    // family's pinned unit system; 3221225472 = 0.75 * 2^32
    "q227_fim_transform" ->
      """WITH h AS (SELECT doc_id, text, length(text) AS len,
        |  CAST(concat('0x', substr(md5(concat('fim1:sel','#',CAST(doc_id AS VARCHAR))),1,8)) AS BIGINT) AS hsel,
        |  CAST(concat('0x', substr(md5(concat('fim1:a','#',CAST(doc_id AS VARCHAR))),1,8)) AS BIGINT) AS ha,
        |  CAST(concat('0x', substr(md5(concat('fim1:b','#',CAST(doc_id AS VARCHAR))),1,8)) AS BIGINT) AS hb,
        |  CAST(concat('0x', substr(md5(concat('fim1:m','#',CAST(doc_id AS VARCHAR))),1,8)) AS BIGINT) AS hm
        | FROM documents),
        |f AS (SELECT doc_id, text, len, hm,
        |  (text IS NOT NULL AND len >= 2 AND hsel < 3221225472) AS sel,
        |  least(1 + (ha % len), 1 + (hb % len)) AS lo,
        |  greatest(1 + (ha % len), 1 + (hb % len)) AS hi
        | FROM h)
        |SELECT doc_id,
        |  CASE WHEN NOT sel THEN 'plain'
        |       WHEN hm % 2 = 0 THEN 'psm' ELSE 'spm' END AS fim_mode,
        |  CASE WHEN NOT sel THEN text
        |       ELSE substr(text, 1, CAST(lo - 1 AS INTEGER)) END AS prefix,
        |  CASE WHEN NOT sel THEN ''
        |       ELSE substr(text, CAST(lo AS INTEGER), CAST(hi - lo AS INTEGER)) END AS middle,
        |  CASE WHEN NOT sel THEN ''
        |       ELSE substr(text, CAST(hi AS INTEGER), CAST(len - hi + 1 AS INTEGER)) END AS suffix
        |FROM f ORDER BY doc_id""".stripMargin,
    // independent derivation of the span-corruption rows through the
    // explode+window spelling: per-position md5-u32 start draws, the
    // spanLen-window mask merge, LAG run starts, sentinel numbers as
    // the cumulative run count, string_agg reassembly ORDER BY the
    // same interleave keys (2p-1 sentinel / 2p token)
    "q252_span_corrupt" ->
      """WITH t AS (SELECT doc_id, list_filter(string_split_regex(text,'\s+'),
        |    x -> length(x) > 0) AS tk FROM documents),
        |tok AS (SELECT doc_id, i - 1 AS pos, tk[i] AS tok
        |  FROM t, unnest(generate_series(1, len(tk))) u(i)
        |  WHERE len(tk) >= 1),
        |m AS (SELECT doc_id, pos, tok,
        |  CASE WHEN CAST(concat('0x', substr(md5(concat('sc1:st','#',
        |      CAST(doc_id AS VARCHAR), ':', CAST(pos AS VARCHAR))),1,8))
        |      AS BIGINT) % 8 = 0 THEN 1 ELSE 0 END AS st
        | FROM tok),
        |mm AS (SELECT *, MAX(st) OVER (PARTITION BY doc_id ORDER BY pos
        |    ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) = 1 AS masked
        | FROM m),
        |rs AS (SELECT *, masked AND NOT COALESCE(
        |    LAG(masked) OVER (PARTITION BY doc_id ORDER BY pos), FALSE)
        |    AS run_start FROM mm),
        |sd AS (SELECT *, SUM(CASE WHEN run_start THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY doc_id ORDER BY pos
        |      ROWS UNBOUNDED PRECEDING) AS sid FROM rs),
        |inp AS (SELECT doc_id, string_agg(piece, ' ' ORDER BY pos)
        |    AS input_text FROM (
        |  SELECT doc_id, pos,
        |    CASE WHEN NOT masked THEN tok
        |         WHEN run_start THEN concat('<extra_id_',
        |           CAST(sid - 1 AS VARCHAR), '>') END AS piece
        |  FROM sd) WHERE piece IS NOT NULL GROUP BY 1),
        |tgt AS (SELECT doc_id, string_agg(p, ' ' ORDER BY k)
        |    AS target_text FROM (
        |  SELECT doc_id, pos*2 - 1 AS k, concat('<extra_id_',
        |      CAST(sid - 1 AS VARCHAR), '>') AS p
        |    FROM sd WHERE run_start
        |  UNION ALL
        |  SELECT doc_id, pos*2, tok FROM sd WHERE masked) GROUP BY 1),
        |ns AS (SELECT doc_id, CAST(SUM(CASE WHEN run_start THEN 1
        |    ELSE 0 END) AS BIGINT) AS n_spans FROM sd GROUP BY 1)
        |SELECT d.doc_id,
        |  COALESCE(inp.input_text, '') AS input_text,
        |  COALESCE(tgt.target_text, '') AS target_text,
        |  COALESCE(ns.n_spans, 0) AS n_spans
        |FROM (SELECT DISTINCT doc_id FROM documents) d
        |LEFT JOIN inp USING (doc_id) LEFT JOIN tgt USING (doc_id)
        |LEFT JOIN ns USING (doc_id)
        |ORDER BY d.doc_id""".stripMargin,
    // numerators are sqrt(BIGINT) — correctly rounded IEEE, identical
    // across engines; the denominator is the SAME ordered fold the
    // Spark side runs (list ORDER BY lang == sort_array on (g, s)
    // structs), so the double weights hash bit-for-bit
    "q221_temperature_mixture" ->
      """WITH per AS (SELECT lang,
        |  CAST(SUM(len(string_split_regex(text,'\s+'))) AS BIGINT) AS n_tokens
        | FROM documents GROUP BY 1),
        |s AS (SELECT lang, n_tokens,
        |  sqrt(CAST(n_tokens AS DOUBLE)) AS sv FROM per),
        |d AS (SELECT list_reduce(list_prepend(0.0, list(sv ORDER BY lang)),
        |  (a, b) -> a + b) AS denom FROM s)
        |SELECT lang, n_tokens, sv/denom AS weight FROM s, d
        |ORDER BY lang""".stripMargin,
    // q74's q_score + exact PERCENT_RANK floored at e9: (rank-1)*1e9
    // // (n-1), ties share ranks, single-row groups pin to 0
    "q222_percentile_normalize" ->
      """WITH s AS (SELECT doc_id, source,
        |    CASE WHEN length(text) = 0 THEN 0
        |         ELSE CAST(FLOOR(CAST(length(regexp_replace(text,'[^A-Za-z]','','g')) AS DOUBLE)
        |              / CAST(length(text) AS DOUBLE) * 1e9 + 0.5) AS BIGINT) END AS q_score
        |  FROM documents),
        |r AS (SELECT doc_id, source, q_score,
        |    CAST(RANK() OVER (PARTITION BY source ORDER BY q_score) AS BIGINT) AS rk,
        |    COUNT(*) OVER (PARTITION BY source) AS n
        |  FROM s)
        |SELECT doc_id, source, q_score,
        |  CASE WHEN n > 1 THEN ((rk - 1) * 1000000000) // (n - 1)
        |       ELSE 0 END AS pctl_e9
        |FROM r ORDER BY doc_id""".stripMargin,
    // q64's distinct-shingle CTE transposed to the eval side:
    // containment = hits*1e9 // |eval shingles| per (eval, doc) pair;
    // worst doc via the min-struct argmax (containment desc, doc asc);
    // eval items matching nothing keep their row via the LEFT JOIN
    "q223_eval_leakage" ->
      """WITH toks AS (SELECT doc_id, string_split_regex(text,'\s+') t FROM documents),
        |sh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+2],' ') s
        |       FROM toks, unnest(generate_series(1, len(t)-2)) u(i)
        |       WHERE len(t) >= 3
        |       UNION ALL
        |       SELECT doc_id, array_to_string(t,' ') FROM toks WHERE len(t) < 3),
        |ev AS (SELECT doc_id AS eval_id, s FROM sh WHERE doc_id < 10),
        |evn AS (SELECT eval_id, COUNT(*) AS n_shingles FROM ev GROUP BY 1),
        |pair AS (SELECT ev.eval_id, d.doc_id, COUNT(*) AS hits
        |         FROM sh d JOIN ev ON d.s = ev.s WHERE d.doc_id >= 10
        |         GROUP BY 1, 2),
        |pc AS (SELECT p.eval_id, p.doc_id,
        |         (p.hits * 1000000000) // e.n_shingles AS c_e9
        |       FROM pair p JOIN evn e USING (eval_id)),
        |roll AS (SELECT eval_id, MAX(c_e9) AS maxc,
        |         (MIN({'negc': -c_e9, 'doc': doc_id})).doc AS worst,
        |         CAST(SUM(CASE WHEN c_e9 >= 300000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_over
        |       FROM pc GROUP BY 1)
        |SELECT e.eval_id, e.n_shingles,
        |  COALESCE(r.maxc, 0) AS max_containment_e9,
        |  r.worst AS worst_doc_id,
        |  COALESCE(r.n_over, 0) AS n_docs_over
        |FROM evn e LEFT JOIN roll r USING (eval_id)
        |ORDER BY e.eval_id""".stripMargin,
    // chosen = row 1 of (score desc, id desc), rejected = row 1 of
    // (score asc, id asc) — the SQL mirror of max/min(struct(score,
    // id)); q33's exact-division alpha_ratio; NULL scores drop out of
    // the CASE and the single-usable-row guard is chosen <> rejected
    "q174_preference_pairs" ->
      """WITH q AS (SELECT doc_id, source,
        |  CASE WHEN length(text) = 0 THEN 0.0
        |       ELSE CAST(length(regexp_replace(text,'[^A-Za-z]','','g')) AS DOUBLE)
        |            / CAST(length(text) AS DOUBLE) END AS score
        |  FROM documents),
        |f AS (SELECT * FROM q WHERE score IS NOT NULL),
        |c AS (SELECT source, doc_id, score, row_number()
        |        OVER (PARTITION BY source ORDER BY score DESC, doc_id DESC) rn
        |      FROM f),
        |r AS (SELECT source, doc_id, score, row_number()
        |        OVER (PARTITION BY source ORDER BY score ASC, doc_id ASC) rn
        |      FROM f)
        |SELECT c.source, c.doc_id AS chosen_id, r.doc_id AS rejected_id,
        |  c.score AS chosen_score, r.score AS rejected_score,
        |  c.score - r.score AS margin
        |FROM c JOIN r ON c.source = r.source AND c.rn = 1 AND r.rn = 1
        |WHERE c.doc_id <> r.doc_id AND c.score - r.score >= 0
        |ORDER BY c.source""".stripMargin,
    // same 2-token-chunk line reconstruction as the Spark side, then
    // the operator's (doc, line) count + four integer sums; fractions
    // are one exact division each so the doubles hash-match
    "q168_line_repetition" -> (TextQueries.rebuiltSqlCte(2) +
      """,
        |lines AS (SELECT doc_id, l
        |          FROM rebuilt, unnest(string_split(text, chr(10))) u(l)
        |          WHERE length(l) > 0),
        |cnt AS (SELECT doc_id, l, COUNT(*) c FROM lines GROUP BY 1, 2),
        |agg AS (SELECT doc_id, SUM(c) nl, COUNT(*) nd,
        |          SUM(c * length(l)) chars, SUM((c-1) * length(l)) dupch
        |        FROM cnt GROUP BY 1)
        |SELECT d.doc_id,
        |  CAST(COALESCE(nl, 0) AS BIGINT) AS n_lines,
        |  CASE WHEN nl IS NULL THEN 0.0
        |       ELSE CAST(nl - nd AS DOUBLE) / CAST(nl AS DOUBLE)
        |  END AS dup_line_fraction,
        |  CASE WHEN chars IS NULL OR chars = 0 THEN 0.0
        |       ELSE CAST(dupch AS DOUBLE) / CAST(chars AS DOUBLE)
        |  END AS dup_line_char_fraction
        |FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id
        |ORDER BY d.doc_id""".stripMargin),
    // same null-text sentinel + zero-chars guard as datasetCard
    "q93_dataset_card" ->
      """WITH h AS (SELECT source, COALESCE(md5(text), 'null') AS hh,
        |             COALESCE(len(string_split_regex(text,'\s+')), 0) AS ntok,
        |             COALESCE(length(text), 0) AS nch,
        |             COALESCE(length(regexp_replace(text,'[^A-Za-z]','','g')), 0) AS nal
        |           FROM documents),
        |c AS (SELECT hh, COUNT(*) AS copies FROM h GROUP BY 1)
        |SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(ntok) AS BIGINT) AS n_tokens,
        |  CAST(SUM(nch) AS BIGINT) AS n_chars,
        |  CASE WHEN SUM(nch) = 0 THEN 0.0
        |       ELSE CAST(SUM(nal) AS DOUBLE)/CAST(SUM(nch) AS DOUBLE) END AS alpha_ratio,
        |  CAST(SUM(CASE WHEN copies>1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_docs
        |FROM h JOIN c USING (hh)
        |GROUP BY source ORDER BY source""".stripMargin,
    // the A-ES draw replayed exactly: same md5-u32 hash, same
    // (h + 0.5)/2^32 division, same ln — all correctly-rounded IEEE,
    // so sample_key hashes match bit-for-bit
    "q155_weighted_sample" ->
      """WITH k AS (SELECT doc_id,
        |  ln((CAST(CAST(concat('0x', substr(md5(concat('ws1','#',CAST(doc_id AS VARCHAR))),1,8)) AS BIGINT) AS DOUBLE) + 0.5)
        |     / 4294967296.0) / CAST(LENGTH(text) AS DOUBLE) AS sample_key
        | FROM documents WHERE LENGTH(text) > 0),
        |top AS (SELECT doc_id FROM k
        |        ORDER BY sample_key DESC, doc_id ASC LIMIT 20)
        |SELECT t.doc_id, CAST(LENGTH(d.text) AS BIGINT) AS w
        |FROM top t JOIN documents d USING (doc_id)
        |ORDER BY doc_id ASC""".stripMargin,
    "q156_weighted_sample_stratified" ->
      """WITH k AS (SELECT source, doc_id,
        |  ln((CAST(CAST(concat('0x', substr(md5(concat('ws2','#',CAST(doc_id AS VARCHAR))),1,8)) AS BIGINT) AS DOUBLE) + 0.5)
        |     / 4294967296.0) / CAST(LENGTH(text) AS DOUBLE) AS sample_key
        | FROM documents WHERE LENGTH(text) > 0),
        |r AS (SELECT source, doc_id, sample_key,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY source
        |    ORDER BY sample_key DESC, doc_id ASC) AS INTEGER) AS rank FROM k)
        |SELECT source, doc_id, rank FROM r
        |WHERE rank <= 5 ORDER BY source ASC, rank ASC""".stripMargin,
    // bounds = cumulative fixed-point fractions: 0.8*2^32 = 3435973836,
    // + 0.1*2^32 = 3865470565; 'test' takes the remainder
    "q87_split_assign" ->
      """SELECT doc_id, CASE
        | WHEN CAST(concat('0x', substr(md5(concat('sp1','#',CAST(doc_id AS VARCHAR))),1,8)) AS BIGINT) < 3435973836 THEN 'train'
        | WHEN CAST(concat('0x', substr(md5(concat('sp1','#',CAST(doc_id AS VARCHAR))),1,8)) AS BIGINT) < 3865470565 THEN 'val'
        | ELSE 'test' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin,
    // whole copies by source; the fractional src0 half-copy flips on the
    // 'up#mix2' hash coin (threshold 0.5*2^32 = 2147483648)
    "q88_upsample_mix" ->
      """WITH n AS (SELECT doc_id, source,
        |  CASE source WHEN 'src0' THEN 2 WHEN 'src1' THEN 0
        |              WHEN 'src2' THEN 3 ELSE 1 END
        |  + CASE WHEN source = 'src0' AND
        |      CAST(concat('0x', substr(md5(concat('up#mix2','#',CAST(doc_id AS VARCHAR))),1,8)) AS BIGINT)
        |        < 2147483648 THEN 1 ELSE 0 END AS c
        | FROM documents)
        |SELECT doc_id, source, CAST(u.copy AS BIGINT) AS copy
        |FROM n, unnest(generate_series(0, c-1)) u(copy)
        |ORDER BY doc_id, copy""".stripMargin,
    "q63_corpus_mix" ->
      """SELECT doc_id, source FROM documents
        |WHERE CAST(concat('0x', substr(md5(concat('mix1','#',CAST(doc_id AS VARCHAR))),1,8)) AS BIGINT)
        |  < CASE source WHEN 'src0' THEN 4294967296
        |                WHEN 'src1' THEN 2147483648
        |                WHEN 'src2' THEN 1073741824
        |                WHEN 'src3' THEN 429496729
        |                ELSE 0 END
        |ORDER BY doc_id""".stripMargin,
    "q64_contamination" ->
      """WITH toks AS (SELECT doc_id, string_split_regex(text,'\s+') t FROM documents),
        |sh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+2],' ') s
        |       FROM toks, unnest(generate_series(1, len(t)-2)) u(i)
        |       WHERE len(t) >= 3
        |       UNION ALL
        |       SELECT doc_id, array_to_string(t,' ') FROM toks WHERE len(t) < 3),
        |ev AS (SELECT DISTINCT s FROM sh WHERE doc_id < 10)
        |SELECT d.doc_id, COUNT(*) AS n_shingles,
        | CAST(SUM(CASE WHEN ev.s IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
        | CAST(SUM(CASE WHEN ev.s IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |   / CAST(COUNT(*) AS DOUBLE) AS contamination
        |FROM sh d LEFT JOIN ev ON d.s = ev.s
        |WHERE d.doc_id >= 10
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q65_tfidf" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split_regex(text,'\s+')) term FROM documents),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1,2),
        |dfreq AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
        |n AS (SELECT COUNT(*) AS n FROM documents),
        |s AS (SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
        |       CAST(tf.tf*(n.n+1) AS DOUBLE)/CAST(dfreq.df+1 AS DOUBLE) AS score
        |      FROM tf, dfreq, n WHERE tf.term = dfreq.term)
        |SELECT doc_id, term AS top_term, tf, df, score FROM s
        |QUALIFY row_number() OVER (PARTITION BY doc_id
        |                           ORDER BY score DESC, term ASC) = 1
        |ORDER BY doc_id""".stripMargin,
    // Same md5 shard/order derivation as q61; CAST the window SUM to
    // BIGINT (DuckDB HUGEINT otherwise lands as float64 and breaks the
    // hash against Spark's int64).
    "q71_pack_sequences" ->
      """WITH t AS (SELECT doc_id,
        |   len(string_split_regex(text,'\s+')) AS n_tokens,
        |   md5(concat('ep2','#',CAST(doc_id AS VARCHAR))) AS skey,
        |   CAST(concat('0x', substr(md5(concat('ep2','#',CAST(doc_id AS VARCHAR))),1,8)) AS BIGINT) % 8 AS shard
        | FROM documents),
        |c AS (SELECT doc_id, n_tokens, shard,
        |   CAST(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY skey, doc_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |     - n_tokens AS strt
        | FROM t)
        |SELECT doc_id, shard, n_tokens,
        |  strt // 1024 AS pack,
        |  strt % 1024 AS pack_offset
        |FROM c ORDER BY doc_id""".stripMargin,
    "q72_quality_verdict" ->
      """WITH toks AS (SELECT doc_id, text, string_split_regex(text,'\s+') t FROM documents),
        |sh AS (SELECT doc_id, array_to_string(t[i:i+1],' ') s
        |       FROM toks, unnest(generate_series(1, len(t)-1)) u(i)
        |       WHERE len(t) >= 2),
        |rep AS (SELECT doc_id,
        |         1.0 - CAST(COUNT(DISTINCT s) AS DOUBLE)
        |               / CAST(COUNT(*) AS DOUBLE) AS dup_ratio
        |        FROM sh GROUP BY 1),
        |sig AS (SELECT k.doc_id,
        |   len(k.t) AS n_tokens,
        |   CASE WHEN length(k.text) = 0 THEN 0.0
        |        ELSE CAST(length(regexp_replace(k.text,'[^A-Za-z]','','g')) AS DOUBLE)
        |             / CAST(length(k.text) AS DOUBLE) END AS alpha_ratio,
        |   CASE WHEN length(k.text) = 0 THEN 0.0
        |        ELSE CAST(length(regexp_replace(k.text,'[A-Za-z0-9\s]','','g')) AS DOUBLE)
        |             / CAST(length(k.text) AS DOUBLE) END AS punct_ratio,
        |   COALESCE(r.dup_ratio, 0.0) AS dup_gram_ratio
        | FROM toks k LEFT JOIN rep r ON k.doc_id = r.doc_id)
        |SELECT doc_id,
        | CASE WHEN n_tokens < 5 THEN 'too_short'
        |      WHEN alpha_ratio < 0.5 THEN 'low_alpha'
        |      WHEN punct_ratio > 0.2 THEN 'high_punct'
        |      WHEN dup_gram_ratio > 0.2 THEN 'repetitive'
        |      ELSE 'keep' END AS verdict
        |FROM sig ORDER BY doc_id""".stripMargin,
    // both phases through q221's exact-fold spelling (α=1 identity,
    // α=0.25 sqrt·sqrt — correctly rounded IEEE in any engine); the
    // anneal phase's corpus is q72's gate CTE chain
    "q264_annealing_plan" ->
      """WITH toks AS (SELECT doc_id, lang, text,
        |    string_split_regex(text,'\s+') t FROM documents),
        |sh AS (SELECT doc_id, array_to_string(t[i:i+1],' ') s
        |       FROM toks, unnest(generate_series(1, len(t)-1)) u(i)
        |       WHERE len(t) >= 2),
        |rep AS (SELECT doc_id,
        |         1.0 - CAST(COUNT(DISTINCT s) AS DOUBLE)
        |               / CAST(COUNT(*) AS DOUBLE) AS dup_ratio
        |        FROM sh GROUP BY 1),
        |sig AS (SELECT k.doc_id, k.lang,
        |   len(k.t) AS n_tokens,
        |   CASE WHEN length(k.text) = 0 THEN 0.0
        |        ELSE CAST(length(regexp_replace(k.text,'[^A-Za-z]','','g')) AS DOUBLE)
        |             / CAST(length(k.text) AS DOUBLE) END AS alpha_ratio,
        |   CASE WHEN length(k.text) = 0 THEN 0.0
        |        ELSE CAST(length(regexp_replace(k.text,'[A-Za-z0-9\s]','','g')) AS DOUBLE)
        |             / CAST(length(k.text) AS DOUBLE) END AS punct_ratio,
        |   COALESCE(r.dup_ratio, 0.0) AS dup_gram_ratio
        | FROM toks k LEFT JOIN rep r ON k.doc_id = r.doc_id),
        |kd AS (SELECT lang, n_tokens FROM sig
        |       WHERE n_tokens >= 5 AND alpha_ratio >= 0.5
        |         AND punct_ratio <= 0.2 AND dup_gram_ratio <= 0.2),
        |pre_per AS (SELECT lang, CAST(SUM(len(t)) AS BIGINT) AS n_tokens
        |  FROM toks GROUP BY 1),
        |pre_s AS (SELECT lang, n_tokens,
        |  CAST(n_tokens AS DOUBLE) AS sv FROM pre_per),
        |pre_d AS (SELECT list_reduce(list_prepend(0.0,
        |  list(sv ORDER BY lang)), (a, b) -> a + b) AS denom FROM pre_s),
        |ann_per AS (SELECT lang, CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
        |  FROM kd GROUP BY 1),
        |ann_s AS (SELECT lang, n_tokens,
        |  sqrt(sqrt(CAST(n_tokens AS DOUBLE))) AS sv FROM ann_per),
        |ann_d AS (SELECT list_reduce(list_prepend(0.0,
        |  list(sv ORDER BY lang)), (a, b) -> a + b) AS denom FROM ann_s)
        |SELECT * FROM (
        |  SELECT 'pretrain' AS phase, lang, n_tokens,
        |    sv/denom AS weight FROM pre_s, pre_d
        |  UNION ALL
        |  SELECT 'anneal', lang, n_tokens, sv/denom FROM ann_s, ann_d)
        |ORDER BY phase, lang""".stripMargin,
    // q72's gate CTEs → q91's chunk CTEs over survivors → q71's pack
    // CTEs keyed on the "doc:chunk" identity — the three certified
    // fragments composed verbatim
    "q261_ingest_pipeline" ->
      """WITH toks AS (SELECT doc_id, text, string_split_regex(text,'\s+') t FROM documents),
        |sh AS (SELECT doc_id, array_to_string(t[i:i+1],' ') s
        |       FROM toks, unnest(generate_series(1, len(t)-1)) u(i)
        |       WHERE len(t) >= 2),
        |rep AS (SELECT doc_id,
        |         1.0 - CAST(COUNT(DISTINCT s) AS DOUBLE)
        |               / CAST(COUNT(*) AS DOUBLE) AS dup_ratio
        |        FROM sh GROUP BY 1),
        |sig AS (SELECT k.doc_id, k.text,
        |   len(k.t) AS n_tokens,
        |   CASE WHEN length(k.text) = 0 THEN 0.0
        |        ELSE CAST(length(regexp_replace(k.text,'[^A-Za-z]','','g')) AS DOUBLE)
        |             / CAST(length(k.text) AS DOUBLE) END AS alpha_ratio,
        |   CASE WHEN length(k.text) = 0 THEN 0.0
        |        ELSE CAST(length(regexp_replace(k.text,'[A-Za-z0-9\s]','','g')) AS DOUBLE)
        |             / CAST(length(k.text) AS DOUBLE) END AS punct_ratio,
        |   COALESCE(r.dup_ratio, 0.0) AS dup_gram_ratio
        | FROM toks k LEFT JOIN rep r ON k.doc_id = r.doc_id),
        |kd AS (SELECT doc_id, text FROM sig
        |       WHERE n_tokens >= 5 AND alpha_ratio >= 0.5
        |         AND punct_ratio <= 0.2 AND dup_gram_ratio <= 0.2),
        |t2 AS (SELECT doc_id, string_split_regex(text,'\s+') AS tk FROM kd),
        |st AS (SELECT doc_id, tk, CAST(u.s AS INTEGER) AS s
        |       FROM t2, unnest(generate_series(1, len(tk), 24)) u(s)
        |       WHERE u.s = 1 OR u.s + 8 <= len(tk)),
        |ch AS (SELECT doc_id,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY s) - 1 AS INTEGER) AS chunk_id,
        |  s AS start_token,
        |  len(tk[s:s+31]) AS n_tokens,
        |  md5(array_to_string(tk[s:s+31],' ')) AS chunk_hash
        | FROM st),
        |pk AS (SELECT *, concat(CAST(doc_id AS VARCHAR), ':',
        |         CAST(chunk_id AS VARCHAR)) AS ck FROM ch),
        |h AS (SELECT *, md5(concat('ing1','#',ck)) AS skey,
        |   CAST(concat('0x', substr(md5(concat('ing1','#',ck)),1,8)) AS BIGINT) % 8 AS shard
        | FROM pk),
        |c AS (SELECT *, CAST(SUM(n_tokens) OVER (PARTITION BY shard
        |        ORDER BY skey, ck ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS BIGINT) - n_tokens AS strt
        | FROM h)
        |SELECT doc_id, chunk_id, start_token, n_tokens, chunk_hash,
        |  shard, strt // 256 AS pack, strt % 256 AS pack_offset
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin,
    // same (1e9*c)/cp double op order as the Spark column, quantized to
    // BIGINT per bigram BEFORE the per-doc sum (integer summation is
    // order-free; a double sum would not hash-match)
    "q80_bigram_familiarity" ->
      """WITH toks AS (SELECT doc_id, string_split_regex(text,'\s+') t FROM documents),
        |bg AS (SELECT doc_id, t[i] AS w1, t[i+1] AS w2
        |       FROM toks, unnest(generate_series(1, len(t)-1)) u(i)
        |       WHERE len(t) >= 2),
        |cb AS (SELECT w1, w2, COUNT(*) AS c FROM bg GROUP BY 1, 2),
        |cp AS (SELECT w1, CAST(SUM(c) AS BIGINT) AS cp FROM cb GROUP BY 1)
        |SELECT b.doc_id, COUNT(*) AS n_bigrams,
        |  CAST(SUM(CAST(FLOOR(1e9 * cb.c / cp.cp + 0.5) AS BIGINT)) AS BIGINT)
        |    AS familiarity
        |FROM bg b JOIN cb USING (w1, w2) JOIN cp USING (w1)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q74_quality_quota" ->
      """WITH s AS (SELECT source, doc_id,
        |    CASE WHEN length(text) = 0 THEN 0
        |         ELSE CAST(FLOOR(CAST(length(regexp_replace(text,'[^A-Za-z]','','g')) AS DOUBLE)
        |              / CAST(length(text) AS DOUBLE) * 1e9 + 0.5) AS BIGINT) END AS q_score
        |  FROM documents),
        |r AS (SELECT source, doc_id, q_score,
        |    row_number() OVER (PARTITION BY source
        |                       ORDER BY q_score DESC, doc_id ASC) AS rank
        |  FROM s)
        |SELECT source, rank, doc_id, q_score FROM r WHERE rank <= 20
        |ORDER BY source, rank""".stripMargin)
}
