package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{MapType, StringType}
import graft.core.TableCatalog

/** Sample-metadata queries (`/root/reference/clinpy/assays/project.py`,
  * implementing the documented intent — the reference class cannot run as
  * written, SURVEY §2.10).
  *
  * The samples table is tiny (one row per sample); it is the canonical
  * broadcast dimension of every cohort filter in the engine.
  */
final class Project(catalog: TableCatalog) {

  def samplesTable: DataFrame = catalog.read("samples")

  /** Sample rows, optionally restricted to cohorts, with the JSON
    * `sample_meta` blob flattened to columns (C6/C7,
    * `project.py:20-39`). */
  def samples(cohorts: Seq[String] = Nil,
      expandMeta: Boolean = true): DataFrame = {
    val base =
      if (cohorts.isEmpty) samplesTable
      else samplesTable.filter(col("cohort").isin(cohorts: _*))
    if (!expandMeta || !base.columns.contains("sample_meta")) base
    else {
      val m = from_json(col("sample_meta"), MapType(StringType, StringType))
      // key set discovered from data (project.py:14-17) — one tiny scan.
      // Keys shadowing real columns (a meta blob containing "cohort")
      // are skipped: base columns win, silently replacing them would
      // corrupt every downstream cohort filter.
      val keys = base.select(explode(map_keys(m)).as("k"))
        .distinct().collect().map(_.getString(0)).sorted
        .filterNot(base.columns.contains)
      keys.foldLeft(base)((df, k) => df.withColumn(k, m.getItem(k)))
    }
  }

  /** Cohort sizes (`project.py:56-66`). */
  def cohortCounts: DataFrame =
    samplesTable.groupBy("cohort").agg(count(lit(1)).as("n_samples"))

  /** Attach/overwrite a user annotation for one sample (C8,
    * `project.py:41-53`): read-modify-overwrite of the tiny samples
    * table (SURVEY §4.4.5). */
  def addAnnotation(sampleId: String, annotJson: String): Unit =
    catalog.rewrite("samples") { df =>
      val withCol =
        if (df.columns.contains("user_annot")) df
        else df.withColumn("user_annot", lit(null).cast("string"))
      withCol.withColumn("user_annot",
        when(col("sample_id") === sampleId, lit(annotJson))
          .otherwise(col("user_annot")))
    }
}
