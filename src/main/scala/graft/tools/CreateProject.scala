package graft.tools

import org.apache.spark.sql.SparkSession
import graft.core.{GraftSession, ProjectConfig, TableCatalog}
import graft.ingest.{Normalize, Readers, VcfReader}

/** Config-driven project build — the reference's ingestion entry point
  * (`/root/reference/clinpy/scripts/create_project.py`, E9) as one
  * orchestrated Spark job.
  *
  * `runMain graft.tools.CreateProject <config.yaml>`
  *
  * Differences by design (SURVEY §3.1): the per-sample Python loop
  * becomes one plan per modality over all files; staging tables don't
  * exist (lazy frames); re-running is idempotent (Normalize dedups on
  * natural keys), which replaces the reference's pk-violation failure
  * mode on duplicate ingest (`readme.md:47-49`).
  */
object CreateProject {

  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: CreateProject <config.yaml>")
    val spark = GraftSession.local()
    try run(spark, ProjectConfig.load(args(0)))
    finally spark.stop()
  }

  def run(spark: SparkSession, cfg: ProjectConfig): Unit = {
    val warehouse = cfg.string("project", "db")
      .getOrElse(sys.error("config: project.db is required"))
    val catalog = new TableCatalog(spark, warehouse)

    // samples (E8)
    cfg.string("sample_meta", "file").foreach { path =>
      val keep = cfg.stringList("sample_meta", "columns")
      val df = Readers.sampleMeta(spark, path, keep)
      if (!catalog.exists("samples"))
        catalog.write(df, "samples")
    }

    // junctions (E2 + E3)
    if (cfg.has("modalities", "rna", "junctions")) {
      val manifest = cfg.stringMap("modalities", "rna", "junctions", "manifest")
      val minReads = cfg.int("modalities", "rna", "junctions",
        "min_junction_reads").getOrElse(10)
      val filtered = cfg.bool("modalities", "rna", "junctions", "filtered")
      val staged = Readers.sjOutAll(spark, manifest, minReads)
      Normalize.normalizeJunctions(catalog, staged, filtered)
    }

    // expression (E1)
    if (cfg.has("modalities", "rna", "expression")) {
      val genes = cfg.stringMap("modalities", "rna", "expression", "genes")
      if (genes.nonEmpty) {
        val df = genes.map { case (s, p) => Readers.rsemGenes(spark, p, s) }
          .reduce(_ unionByName _)
        if (!catalog.exists("gene_expression"))
          catalog.write(df, "gene_expression")
      }
      val iso = cfg.stringMap("modalities", "rna", "expression", "isoforms")
      if (iso.nonEmpty) {
        val df = iso.map { case (s, p) => Readers.rsemIsoforms(spark, p, s) }
          .reduce(_ unionByName _)
        if (!catalog.exists("transcript_expression"))
          catalog.write(df, "transcript_expression")
      }
    }

    // variants (E4–E7)
    for (modality <- Seq("snps", "rna_snps")
         if cfg.has("modalities", modality, "vcf")) {
      val rna = modality == "rna_snps"
      val manifest = cfg.stringMap("modalities", modality, "vcf", "manifest")
      val policy = cfg.string("modalities", modality, "vcf", "policy")
        .getOrElse("union")
      val formatKeys = cfg.stringList("modalities", modality, "vcf",
        "format_keys") match { case Nil => Seq("GT"); case ks => ks }
      val fieldTypes = cfg.stringMap("modalities", modality, "vcf",
        "fields").toMap
      val filtered = cfg.bool("modalities", modality, "vcf", "filtered")
      val staged = VcfReader.readAll(spark, manifest, fieldTypes, policy,
        formatKeys)
      val impactCols = fieldTypes.keys.map(_.toLowerCase).toSeq.sorted
      val fmtCols = formatKeys.flatMap(k =>
        if (k.equalsIgnoreCase("GT")) Seq("gt", "gt_raw")
        else Seq(k.toLowerCase))
      Normalize.normalizeVariants(catalog, staged, impactCols, fmtCols,
        rna, filtered)
    }
  }
}
