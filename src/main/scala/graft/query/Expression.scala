package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.TableCatalog

/** Expression-matrix queries (`/root/reference/clinpy/assays/expression.py`,
  * intent per SURVEY §2.10 — the reference file has unrunnable defects).
  *
  * Long form is the storage format (gene_expression /
  * transcript_expression, composite key (samplename, gene|transcript));
  * wide form is an explicit pivot at the API edge. At scale the pivot's
  * column set = sample list is bounded (thousands), while genes are the
  * row dimension — the right orientation for a columnar store.
  */
final class Expression(catalog: TableCatalog, project: Project) {

  private def table(genes: Boolean): DataFrame =
    catalog.read(if (genes) "gene_expression" else "transcript_expression")

  private def featureCol(genes: Boolean): String =
    if (genes) "gene" else "transcript"

  /** Long-form expression, filtered by features / samples / cohort
    * (`expression.py:17-51`): chained semi-join pattern (J10/F2/F3). */
  def expression(genes: Boolean = true, features: Seq[String] = Nil,
      samples: Seq[String] = Nil, cohorts: Seq[String] = Nil,
      what: Seq[String] = Seq("expected_count", "tpm", "fpkm")): DataFrame = {
    var df = table(genes)
    if (features.nonEmpty)
      df = df.filter(col(featureCol(genes)).isin(features: _*))
    if (samples.nonEmpty)
      df = df.filter(col("samplename").isin(samples: _*))
    if (cohorts.nonEmpty) {
      val coh = project.samples(cohorts, expandMeta = false)
        .select(col("sample_id").as("samplename"))
      df = df.join(broadcast(coh), Seq("samplename"), "left_semi")
    }
    df.select((featureCol(genes) +: "samplename" +: what).map(col): _*)
  }

  /** Typed view of the gene-expression core (SURVEY §1.5). */
  def genesTyped: org.apache.spark.sql.Dataset[graft.model.Rows.GeneExpressionRow] = {
    val spark = catalog.spark
    import spark.implicits._
    table(genes = true)
      .select("gene", "samplename", "expected_count", "tpm", "fpkm")
      .as[graft.model.Rows.GeneExpressionRow]
  }

  /** Wide matrix: rows = features, columns = samples, values = `what`
    * (A4 pivot, `expression.py:53-61`). Sample list enumerated up front
    * (from the samples dim, not a distinct scan) → single-pass pivot with
    * a static schema. */
  def wide(genes: Boolean = true, what: String = "tpm",
      samples: Seq[String] = Nil, cohorts: Seq[String] = Nil): DataFrame = {
    val sampleList =
      if (samples.nonEmpty) samples
      else project.samples(cohorts, expandMeta = false)
        .select("sample_id").collect().map(_.getString(0)).sorted.toSeq
    expression(genes, Nil, sampleList, Nil, Seq(what))
      .groupBy(featureCol(genes))
      .pivot("samplename", sampleList)
      .agg(first(col(what)))
  }
}
