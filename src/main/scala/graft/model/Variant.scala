package graft.model

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.query.Variants

/** One variant reified as an entity (`/root/reference/clinpy/assays/
  * variants.py:121-173`, intent per SURVEY §2.10: scalar id, regular
  * methods). Identified by natural key (chrom, pos, ref, alt); the
  * surrogate id is recomputed by hash, never looked up. */
final case class Variant(chrom: String, pos: Long, ref: String, alt: String) {

  /** xxhash64 surrogate — matches Normalize.surrogateId. */
  def keyFilter: org.apache.spark.sql.Column =
    col("chrom") === chrom && col("pos") === pos &&
      col("ref") === ref && col("alt") === alt

  /** Samples carrying this variant, optional genotype filter
    * (`variants.py:137-158`). Genotypes are normalized array<int>;
    * `het` = (0,1), `hom` = (1,1) literal parity. */
  def samples(variants: Variants, genotype: Option[String] = None): DataFrame = {
    val base = variants.dim.filter(keyFilter)
      .join(variants.sampleVariants, Seq("variant_id"))
    genotype match {
      case Some("het") => base.filter(col("gt") === array(lit(0), lit(1)))
      case Some("hom") => base.filter(col("gt") === array(lit(1), lit(1)))
      case Some(other) => base.filter(col("gt_raw") === other)
      case None        => base
    }
  }

  /** Impact annotations of this variant (`variants.py:160-169`). */
  def impacts(variants: Variants, fields: Seq[String] = Nil): DataFrame = {
    val imp = variants.dim.filter(keyFilter)
      .join(variants.impacts, Seq("variant_id"))
    if (fields.isEmpty) imp
    else imp.select(("variant_id" +: fields).map(col): _*)
  }
}
