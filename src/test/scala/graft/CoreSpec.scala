package graft

import org.apache.spark.sql.types._
import graft.core.{FilterSpec, SchemaBuilder, TableCatalog}
import graft.core.SchemaBuilder.ColumnSpec

class CoreSpec extends SparkSpecBase {
  import spark.implicits._

  test("SchemaBuilder maps the reference type whitelist") {
    val schema = SchemaBuilder.build(Seq(
      ColumnSpec("Sample_ID", "int", indexed = true),
      ColumnSpec("name", "str"), ColumnSpec("score", "float"),
      ColumnSpec("seen", "date"), ColumnSpec("ok", "bool"),
      ColumnSpec("meta", "json"), ColumnSpec("parent", "fk")))
    assert(schema.fieldNames.toSeq ==
      Seq("sample_id", "name", "score", "seen", "ok", "meta", "parent"))
    assert(schema("sample_id").dataType == LongType)
    assert(schema("score").dataType == DoubleType)
    assert(schema("seen").dataType == DateType)
    assert(schema("ok").dataType == BooleanType)
    assert(schema("meta").dataType == StringType)
    assert(SchemaBuilder.indexedColumns(schema) == Seq("sample_id"))
    intercept[IllegalArgumentException](SchemaBuilder.sparkType("blob"))
  }

  test("reconcile policies: error / union / intersection") {
    val a = Seq("x", "y", "z"); val b = Seq("x", "z", "w")
    assert(SchemaBuilder.reconcile(Seq(a, a), "error") == a)
    intercept[IllegalStateException](SchemaBuilder.reconcile(Seq(a, b), "error"))
    assert(SchemaBuilder.reconcile(Seq(a, b), "union") == Seq("x", "y", "z", "w"))
    assert(SchemaBuilder.reconcile(Seq(a, b), "intersection") == Seq("x", "z"))
  }

  test("FilterSpec compiles every operator") {
    val df = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, null, 30.0))
      .toDF("id", "tag", "v")
    def n(s: FilterSpec) = df.filter(s.toColumn).count()
    assert(n(FilterSpec("id", "=", 2L)) == 1)
    assert(n(FilterSpec("id", "!=", 2L)) == 2)
    assert(n(FilterSpec("v", ">=", 20.0)) == 2)
    assert(n(FilterSpec("v", "<", 20.0)) == 1)
    assert(n(FilterSpec("tag", "in", Seq("a", "b"))) == 2)
    assert(n(FilterSpec("tag", "not_in", Seq("a"))) == 1)
    assert(n(FilterSpec("tag", "like", "a%")) == 1)
    assert(n(FilterSpec("tag", "is_null")) == 1)
    assert(n(FilterSpec("tag", "is_not_null")) == 2)
    assert(n(FilterSpec("v", "between", Seq(15.0, 25.0))) == 1)
    assert(df.filter(FilterSpec.and(Seq(
      FilterSpec("id", ">", 1L), FilterSpec("v", "<=", 20.0)))).count() == 1)
    assert(df.filter(FilterSpec.and(Nil)).count() == 3)
    intercept[IllegalArgumentException](FilterSpec("id", "regex", "x").toColumn)
  }

  test("TableCatalog prefix matrix and round trip") {
    val cat = new TableCatalog(spark, tmpDir("cat"))
    assert(cat.variantTable("variants", rna = false, filtered = false) == "variants")
    assert(cat.variantTable("variants", rna = true, filtered = false) == "rna_variants")
    assert(cat.variantTable("variants", rna = false, filtered = true) == "filtered_variants")
    assert(cat.variantTable("variants", rna = true, filtered = true) == "filtered_rna_variants")
    assert(cat.junctionTable(filtered = true) == "junctions")
    assert(cat.junctionTable(filtered = false) == "all_junctions")

    val df = Seq((1L, "x"), (2L, "y")).toDF("id", "v")
    cat.write(df, "t1")
    assert(cat.exists("t1") && cat.read("t1").count() == 2)
    cat.append(df, "t1")
    assert(cat.read("t1").count() == 4)
    cat.rewrite("t1")(d => d.filter(d("id") === 1L))
    assert(cat.read("t1").count() == 2)
  }
}
