package graft

import org.apache.spark.sql.functions._

class VcfSourceSpec extends SparkSpecBase {

  test("DSv2 vcf source: short name, schema, record parse") {
    val df = spark.read.format("vcf").load(fixture("s1.vcf"))
    assert(df.columns.toSeq == Seq("chrom", "pos", "id", "ref", "alt",
      "qual", "filter", "info", "format", "sample0", "samplename"))
    val rows = df.orderBy("pos").collect()
    assert(rows.length == 2)
    assert(rows(0).getString(0) == "chr1" && rows(0).getLong(1) == 100L)
    assert(rows(0).getString(2) == "rs1")
    // first-alt truncation + first-FILTER + '.' qual -> null
    assert(rows(1).isNullAt(2))
    assert(rows(1).getString(4) == "C")
    assert(rows(1).getString(6) == "PASS")
    assert(rows(1).isNullAt(5))
    assert(rows(0).getAs[String]("samplename") == "s1")
  }

  test("multi-file load: one partition per file, samplename per file") {
    val df = spark.read.format("vcf")
      .load(fixture("s1.vcf"), fixture("s2.vcf"))
    assert(df.rdd.getNumPartitions == 2)
    val bySample = df.groupBy("samplename").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySample == Map("s1" -> 2L, "s2" -> 2L))
  }

  test("URI-scheme paths open via Hadoop FS; multi-path JSON parse") {
    val df = spark.read.format("vcf")
      .load("file:" + fixture("s1.vcf"), "file:" + fixture("s2.vcf"))
    assert(df.count() == 4)
    val samples = df.select("samplename").distinct().collect()
      .map(_.getString(0)).toSet
    assert(samples == Set("s1", "s2"))
  }

  test("column pruning and chrom/pos pushdown") {
    val df = spark.read.format("vcf")
      .load(fixture("s1.vcf"), fixture("s2.vcf"))
    // empty projection (count) and narrow projection both work pruned
    assert(df.count() == 4)
    assert(df.select("pos").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(100L, 100L, 200L, 300L))
    // pushed predicate: only chr2 rows surface; filter evaluated in-source
    val chr2 = df.filter(col("chrom") === "chr2" && col("pos") >= 250L)
    assert(chr2.count() == 1)
    val scanDesc = chr2.queryExecution.executedPlan.toString
    assert(scanDesc.contains("EqualTo(chrom,chr2)"), scanDesc)
  }

  test("filters and projection compose on the source") {
    val df = spark.read.format("vcf")
      .load(fixture("s1.vcf"), fixture("s2.vcf"))
      .filter(col("chrom") === "chr1" && col("pos") === 100L)
      .select("samplename", "ref", "alt")
    assert(df.count() == 2)
    assert(df.select("ref").distinct().head().getString(0) == "A")
  }
}
