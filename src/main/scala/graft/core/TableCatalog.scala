package graft.core

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Table name → Parquet location resolution, including the reference's
  * filtered/rna table-name prefix matrix
  * (`/root/reference/clinpy/assays/variants.py:19-31`,
  * `snp_functions.py:153-163`: `variants`, `filtered_variants`,
  * `rna_variants`, `filtered_rna_variants` and the junction pair
  * `junctions`/`all_junctions`).
  *
  * Layout: one directory per table under `root`. Big fact tables are
  * written partitioned (junctions/variants by `chrom` — the reference's
  * hot indexed predicate) so chromosome-filtered queries prune whole
  * directories; per-sample bridge tables may additionally be bucketed by
  * the sample key on a real warehouse.
  */
final class TableCatalog(val spark: SparkSession, val root: String) {

  def path(table: String): String = s"$root/$table"

  /** Variant table-family name: prefix matrix (rna? filtered?). */
  def variantTable(base: String, rna: Boolean, filtered: Boolean): String = {
    val p1 = if (filtered) "filtered_" else ""
    val p2 = if (rna) "rna_" else ""
    s"$p1$p2$base"
  }

  /** Junction dim name: filtered pair (`junction.py:28-35`). */
  def junctionTable(filtered: Boolean): String =
    if (filtered) "junctions" else "all_junctions"

  def junctionBridge(filtered: Boolean): String =
    if (filtered) "sample_to_junction" else "sample_to_alljunction"

  private def fs(p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  /** Filesystem-agnostic (local, HDFS, object stores) via the Hadoop FS
    * API — a java.io check would report false on any remote root and make
    * mergeDim overwrite instead of append. */
  def exists(table: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path(table))
    fs(p).exists(p)
  }

  def read(table: String): DataFrame = spark.read.parquet(path(table))

  def write(df: DataFrame, table: String, partitionBy: Seq[String] = Nil,
      mode: SaveMode = SaveMode.ErrorIfExists): Unit = {
    val w = df.write.mode(mode)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(path(table))
  }

  def append(df: DataFrame, table: String, partitionBy: Seq[String] = Nil): Unit =
    write(df, table, partitionBy, SaveMode.Append)

  /** Read-modify-overwrite for small tables (the `samples` annotation
    * update, SURVEY §4.4.5). Materializes through a staging dir so the
    * read and the overwrite don't race on the same files. */
  def rewrite(table: String)(f: DataFrame => DataFrame): Unit = {
    val tmp = path(s"__tmp_$table")
    f(read(table)).write.mode(SaveMode.Overwrite).parquet(tmp)
    spark.read.parquet(tmp).write.mode(SaveMode.Overwrite).parquet(path(table))
    val p = new org.apache.hadoop.fs.Path(tmp)
    fs(p).delete(p, true)
  }
}
