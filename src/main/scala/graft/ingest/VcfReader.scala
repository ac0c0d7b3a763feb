package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.SchemaBuilder

/** VEP-annotated VCF ingestion (SURVEY §2.1 S3/S4, §2.8 E4–E6), rebuilt
  * Spark-first: headers are introspected on the driver (they are tiny);
  * record parsing is pure column expressions over `spark.read.text` — no
  * UDFs, fully codegen'd, parallel by file split.
  *
  * Reference semantics preserved (`/root/reference/clinpy/utils/snp_functions.py:81-131`):
  *  - 7 mandatory fields: chrom, pos, id, ref, alt, qual, filter
  *  - multi-allelic truncation to the FIRST alt (`snp_functions.py:100`)
  *  - first FILTER entry only (`snp_functions.py:101`)
  *  - FORMAT fields of sample 0, by position in the FORMAT key string
  *  - CSQ exploded to one row per transcript impact, fields decoded
  *    positionally per-file (each file's own header order)
  *  - typed coercion with '' → NULL (`snp_functions.py:55-78`); fields
  *    not in the config are ignored (`vcf.yaml:10` ignore policy)
  *  - genotype normalized to array<int> with the raw string kept
  *    (SURVEY §1.5: `"(0, 1)"` stringified-tuple parity via gt_raw)
  */
object VcfReader {

  /** Driver-side header introspection (`snp_functions.py:26-31`). */
  final case class VcfHeader(csqFields: Seq[String], formatKeys: Seq[String])

  def readHeader(path: String): VcfHeader = {
    val src = scala.io.Source.fromFile(path)
    try {
      val header = src.getLines().takeWhile(_.startsWith("#")).toList
      val csq = header
        .find(l => l.startsWith("##INFO=<ID=CSQ"))
        .map { l =>
          val fmt = l.split("Format: ").last.stripSuffix("\">")
          fmt.split("\\|").map(_.trim.toLowerCase).toSeq
        }
        .getOrElse(Seq.empty)
      val fmts = header.filter(_.startsWith("##FORMAT=<ID="))
        .map(_.stripPrefix("##FORMAT=<ID=").takeWhile(_ != ','))
      VcfHeader(csq, fmts)
    } finally src.close()
  }

  /** Reconcile CSQ field sets across files (policy: error|union|intersection,
    * `vcf.yaml:7`). */
  def reconcileCsq(headers: Seq[VcfHeader], policy: String): Seq[String] =
    SchemaBuilder.reconcile(headers.map(_.csqFields), policy)

  /** Typed coercion with ''→NULL (`snp_functions.py:55-78`). */
  def coerce(c: Column, typ: String): Column = {
    val nn = nullif(c, lit(""))
    typ.toLowerCase match {
      case "int"            => nn.cast("long")
      case "float"          => nn.cast("double")
      case "bool" =>
        when(lower(nn).isin("yes", "true", "1"), true)
          .when(lower(nn).isin("no", "false", "0"), false)
          .otherwise(lit(null).cast("boolean"))
      case _                => nn
    }
  }

  /** Parse one single-sample VCF into impact-exploded rows.
    *
    * @param impactFields (name → type) columns to decode from CSQ, a
    *                     subset of the config's vcf.yaml field table;
    *                     names not present in this file's header are
    *                     emitted as NULL (union policy support)
    * @param formatKeys   FORMAT fields to extract from sample 0
    */
  def read(spark: SparkSession, path: String, sample: String,
      impactFields: Seq[(String, String)],
      formatKeys: Seq[String]): DataFrame =
    read(spark, path, sample, impactFields, formatKeys, readHeader(path))

  /** Variant taking a pre-parsed header (readAll already holds them —
    * avoids scanning every file's header twice on the driver). */
  def read(spark: SparkSession, path: String, sample: String,
      impactFields: Seq[(String, String)],
      formatKeys: Seq[String], hdr: VcfHeader): DataFrame = {

    // record-level parse via the DSv2 source (graft.sources.VcfDataSource):
    // mandatory fields pre-parsed, INFO/FORMAT/sample payloads raw
    val base = spark.read.format("vcf").load(path)
      .select(col("chrom"), col("pos"), col("id"), col("ref"), col("alt"),
        col("qual"), col("filter"),
        col("info").as("__info"),
        split(col("format"), ":").as("__fmtkeys"),
        split(col("sample0"), ":").as("__smp0"))

    // FORMAT fields of sample 0, positional per record.
    val withFormat = formatKeys.foldLeft(base) { (df, k) =>
      val pos = array_position(col("__fmtkeys"), k)
      val v = when(pos > 0, element_at(col("__smp0"), pos.cast("int")))
      if (k.equalsIgnoreCase("GT"))
        df.withColumn("gt_raw", v)
          .withColumn("gt",
            when(v.isNotNull,
              transform(split(v, "[/|]"),
                g => nullif(g, lit(".")).cast("int"))))
      else df.withColumn(k.toLowerCase, v)
    }

    // CSQ explode: one output row per transcript impact.
    val csqStr = regexp_extract(col("__info"), "(?:^|;)CSQ=([^;]*)", 1)
    val exploded = withFormat
      .withColumn("__csq",
        explode_outer(when(csqStr =!= "", split(csqStr, ","))))
      .withColumn("__csqf", split(col("__csq"), "\\|", -1))

    // positional decode against THIS file's header order; configured
    // fields absent from the file become NULL columns (union policy).
    val decoded = impactFields.foldLeft(exploded) { case (df, (name, typ)) =>
      val idx = hdr.csqFields.indexOf(name.toLowerCase)
      val raw =
        if (idx < 0) lit(null).cast("string")
        else element_at(col("__csqf"), idx + 1)
      df.withColumn(name.toLowerCase, coerce(raw, typ))
    }

    decoded
      .drop("__info", "__fmtkeys", "__smp0", "__csq", "__csqf")
      .withColumn("samplename", lit(sample))
  }

  /** All samples in one plan, with per-file CSQ order handled per file and
    * a reconciliation policy across headers. */
  def readAll(spark: SparkSession, manifest: Seq[(String, String)],
      vcfFieldTypes: Map[String, String], policy: String,
      formatKeys: Seq[String]): DataFrame = {
    require(manifest.nonEmpty, "readAll: empty VCF manifest")
    val headers = manifest.map { case (_, p) => readHeader(p) }
    val fields = reconcileCsq(headers, policy)
      .filter(f => vcfFieldTypes.contains(f)) // ignore-undeclared policy
      .map(f => f -> vcfFieldTypes(f))
    manifest.zip(headers).map { case ((sample, p), hdr) =>
      read(spark, p, sample, fields, formatKeys, hdr)
    }.reduce(_ unionByName _)
  }
}
