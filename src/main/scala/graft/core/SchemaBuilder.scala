package graft.core

import org.apache.spark.sql.types._

/** Config-driven dynamic schema construction — the Spark equivalent of the
  * reference's YAML→DDL path (`/root/reference/clinpy/utils/utils.py:28-89`
  * `str_to_type`/`dict_to_table`) and the VCF-header-driven variant DDL
  * (`/root/reference/clinpy/utils/snp_functions.py:134-186`).
  *
  * The type whitelist is exactly the reference's: int, str, float, date,
  * bool, json (+ fk, which in Spark is a documented invariant, not a
  * constraint). `json` maps to a StringType column holding JSON text,
  * queried with `from_json`/`get_json_object`.
  */
object SchemaBuilder {

  /** One column description: reference `config.yaml` / `vcf.yaml` row. */
  final case class ColumnSpec(name: String, typ: String,
      nullable: Boolean = true, indexed: Boolean = false)

  def sparkType(t: String): DataType = t.toLowerCase match {
    case "int" | "integer"      => LongType
    case "str" | "string"       => StringType
    case "float" | "double"     => DoubleType
    case "date"                 => DateType
    case "bool" | "boolean"     => BooleanType
    case "json"                 => StringType
    case "fk"                   => LongType
    case other =>
      throw new IllegalArgumentException(
        s"unsupported column type '$other' (allowed: int, str, float, date, bool, json, fk)")
  }

  /** Build a StructType from specs; names lowercased like the reference's
    * ingest (`create_project.py:52`). */
  def build(specs: Seq[ColumnSpec]): StructType =
    StructType(specs.map(s =>
      StructField(s.name.toLowerCase, sparkType(s.typ), s.nullable,
        metadata = if (s.indexed)
          new MetadataBuilder().putBoolean("indexed", true).build()
        else Metadata.empty)))

  /** Columns flagged `indexed` in config — at scale these become the
    * partition/bucket/sort keys of the Parquet layout (SURVEY §4.2:
    * SQLite secondary indexes → partitioning + min/max stats). */
  def indexedColumns(schema: StructType): Seq[String] =
    schema.fields.filter(f =>
      f.metadata.contains("indexed") && f.metadata.getBoolean("indexed"))
      .map(_.name).toSeq

  /** Field-set reconciliation across per-file discovered schemas — the
    * reference's `compare_fields` error/union/intersection policy
    * (`snp_functions.py:11-52`, knob `vcf.yaml:7`). Order-preserving:
    * first-seen order wins, as positional CSQ decoding depends on each
    * file's own order (handled per-file at parse time). */
  def reconcile(fieldSets: Seq[Seq[String]], policy: String): Seq[String] = {
    require(fieldSets.nonEmpty, "no field sets to reconcile")
    policy.toLowerCase match {
      case "error" =>
        if (fieldSets.distinct.size > 1)
          throw new IllegalStateException(
            s"field sets differ across files: ${fieldSets.distinct}")
        fieldSets.head
      case "union" =>
        fieldSets.flatten.distinct
      case "intersection" =>
        val common = fieldSets.map(_.toSet).reduce(_ intersect _)
        fieldSets.head.filter(common)
      case other =>
        throw new IllegalArgumentException(
          s"unknown reconciliation policy '$other' (error|union|intersection)")
    }
  }
}
