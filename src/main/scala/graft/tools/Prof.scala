package graft.tools

import org.apache.spark.sql.functions._

/** Scratch stage profiler for optimization work (not part of the
  * driver contract). */
object Prof {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val d = graft.core.GraftSession.table(spark, dir, "documents")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime; val r = f
      println(f"[prof] $label%-28s ${(System.nanoTime - t0) / 1e9}%8.3f s")
      r
    }
    d.count(); d.count()
    val model = time("model build+ckpt")(
      graft.ext.TextAnalysis.knTrigramCounts(
        d.where(col("lang") === "en"), "text").localCheckpoint(true))
    time("facts+gate count") {
      val facts = graft.ext.TextAnalysis.knTrigramScoreFacts(
        d, "doc_id", "text", model)
      facts.filter(col("sum_p_e9") >=
          col("n_trigrams") * lit(40000000L))
        .select("doc_id").count()
    }
    time("q197 pipeline alone") {
      graft.ext.Curation.curationPipeline(d,
        graft.ext.Curation.CurationConfig()).orderBy("doc_id").count()
    }
    time("q279 full #1") {
      graft.SparkEntry.queries("q279_lm_gated_pipeline_trigram")(
        spark, dir).count()
    }
    time("q279 full #2") {
      graft.SparkEntry.queries("q279_lm_gated_pipeline_trigram")(
        spark, dir).count()
    }
    time("q279 plan-only") {
      graft.SparkEntry.queries("q279_lm_gated_pipeline_trigram")(
        spark, dir).queryExecution.executedPlan; ()
    }
    time("q269 full") {
      graft.SparkEntry.queries("q269_lm_gated_pipeline")(
        spark, dir).count()
    }
    time("q288 full") {
      graft.SparkEntry.queries("q288_lm_gated_pipeline_mkn")(
        spark, dir).count()
    }
    val mat: org.apache.spark.sql.DataFrame =>
        org.apache.spark.sql.DataFrame =
      df => broadcast(df.localCheckpoint(true))
    time("facts+gate MAT #1") {
      val facts = graft.ext.TextAnalysis.knTrigramScoreFacts(
        d, "doc_id", "text", model, mat)
      facts.filter(col("sum_p_e9") >=
          col("n_trigrams") * lit(40000000L))
        .select("doc_id").count()
    }
    time("facts+gate MAT #2") {
      val facts = graft.ext.TextAnalysis.knTrigramScoreFacts(
        d, "doc_id", "text", model, mat)
      facts.filter(col("sum_p_e9") >=
          col("n_trigrams") * lit(40000000L))
        .select("doc_id").count()
    }
    time("q197 plan-only") {
      graft.ext.Curation.curationPipeline(d,
          graft.ext.Curation.CurationConfig()).orderBy("doc_id")
        .queryExecution.executedPlan; ()
    }
    time("q197 again") {
      graft.ext.Curation.curationPipeline(d,
        graft.ext.Curation.CurationConfig()).orderBy("doc_id").count()
    }
    // q197 planning decomposition
    def planOnly(label: String)(df: => org.apache.spark.sql.DataFrame) =
      time(label) { df.queryExecution.executedPlan; () }
    val cfg = graft.ext.Curation.CurationConfig()
    planOnly("p: qualitySignals") {
      graft.ext.TextAnalysis.withQualitySignals(d, "text")
    }
    val perDoc = graft.ext.TextAnalysis.withQualitySignals(d, "text")
      .filter(col("n_tokens") >= cfg.minTokens &&
        col("alpha_ratio") >= cfg.minAlphaRatio)
      .select(col("doc_id"), col("source"),
        graft.functions.TextFunctions.rebuiltLineText(
          graft.functions.TextFunctions.tokens(col("text")),
          cfg.lineWidth).as("text"))
    planOnly("p: perDoc")(perDoc)
    val bp = graft.ext.Dedup.removeBoilerplateLines(perDoc, "doc_id",
      "text", maxDocFreq = cfg.maxLineDocFreq)
    planOnly("p: +boilerplate")(bp)
    val cleaned = graft.ext.Dedup.dedupLinesKeepFirst(
        bp.select("doc_id", "source", "text"), "doc_id", "text")
      .select(col("doc_id"), col("source"),
        length(col("text")).cast("long").as("n_chars_clean"))
    planOnly("p: +dedupLines")(cleaned)
    val fp = graft.ext.TextAnalysis.withFingerprint(d, "text")
      .select("doc_id", "fingerprint")
    val clustered = cleaned.join(fp, "doc_id")
      .withColumn("cluster", min(col("doc_id")).over(
        org.apache.spark.sql.expressions.Window.partitionBy("fingerprint")))
    planOnly("p: +cluster")(clustered)
    val ranked = graft.ext.Curation.groupQuotaRank(clustered,
        groupCols = Seq("source"),
        order = Seq(col("n_chars_clean").desc, col("doc_id").asc))
      .withColumn("quota_rank",
        when(col("quota_rank") <= cfg.quotaK, col("quota_rank")))
    planOnly("p: +quotaRank")(ranked)
    val asg = graft.ext.Curation.assignSplits(ranked, "cluster",
        cfg.splitSeed, cfg.splits)
      .select("doc_id", "source", "n_chars_clean", "quota_rank",
        "cluster", "split")
    planOnly("p: +assignSplits")(asg)
    planOnly("p: +orderBy")(asg.orderBy("doc_id"))
    planOnly("p: full q197 again") {
      graft.ext.Curation.curationPipeline(d,
        graft.ext.Curation.CurationConfig()).orderBy("doc_id")
    }
    spark.stop()
  }
}
