package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.{FilterSpec, TableCatalog}

/** Table-level variant queries
  * (`/root/reference/clinpy/assays/variants.py`, intent per SURVEY §2.10 —
  * the reference joins the impacts table twice and never the mapping
  * table; here variants ⋈ sample_variants ⋈ variant_impacts as
  * documented).
  */
final class Variants(catalog: TableCatalog, rna: Boolean = false,
    filtered: Boolean = false) {

  private def t(base: String): DataFrame =
    catalog.read(catalog.variantTable(base, rna, filtered))

  def dim: DataFrame = t("variants")
  def sampleVariants: DataFrame = t("sample_variants")
  def impacts: DataFrame = t("variant_impacts")

  /** Full denormalized view: dim ⋈ bridge ⋈ impacts. */
  def denormalized: DataFrame =
    dim.join(sampleVariants, Seq("variant_id"))
      .join(impacts, Seq("variant_id"))

  /** Dynamic-spec filter (F8, `variants.py:53-80`): impact-side and
    * format-side specs compiled to Catalyst predicates and applied
    * server-side. */
  def filter(impactSpecs: Seq[FilterSpec] = Nil,
      formatSpecs: Seq[FilterSpec] = Nil,
      samples: Seq[String] = Nil): DataFrame = {
    var df = denormalized
    if (impactSpecs.nonEmpty) df = df.filter(FilterSpec.and(impactSpecs))
    if (formatSpecs.nonEmpty) df = df.filter(FilterSpec.and(formatSpecs))
    if (samples.nonEmpty) df = df.filter(col("samplename").isin(samples: _*))
    df
  }

  /** Region search (`variants.py:82-109`; comparison direction fixed per
    * SURVEY §2.10): variants with pos in [start, end] on chrom. */
  def searchRegion(chrom: String, start: Long, end: Long,
      withSamples: Boolean = true): DataFrame = {
    val v = dim.filter(col("chrom") === chrom &&
      col("pos").between(start, end))
    if (withSamples) v.join(sampleVariants, Seq("variant_id")) else v
  }

  /** Summary counts (A2, `variants.py:111-118`): samples carrying
    * variants, distinct variants, total observations. */
  def summary: DataFrame =
    sampleVariants.agg(
      countDistinct(col("samplename")).as("n_samples"),
      countDistinct(col("variant_id")).as("n_variants"),
      count(lit(1)).as("n_observations"))

  /** Human-readable summary (the reference's `__str__`, which built the
    * string but forgot to return it — SURVEY §2.10). */
  def summaryString: String = {
    val r = summary.head()
    s"${r.getLong(1)} variants across ${r.getLong(0)} samples " +
      s"(${r.getLong(2)} observations, " +
      s"family=${catalog.variantTable("variants", rna, filtered)})"
  }
}
