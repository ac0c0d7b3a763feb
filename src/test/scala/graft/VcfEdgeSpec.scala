package graft

import org.apache.spark.sql.functions._
import graft.ingest.VcfReader

/** VCF edge cases beyond the main fixtures: records with no CSQ
  * annotation, empty FORMAT hits, and absent FORMAT keys. */
class VcfEdgeSpec extends SparkSpecBase {

  private lazy val path: String = {
    val p = java.nio.file.Files.createTempFile("edge", ".vcf")
    val content =
      """##fileformat=VCFv4.2
        |##INFO=<ID=CSQ,Number=.,Type=String,Description="Consequence annotations from Ensembl VEP. Format: Consequence|IMPACT">
        |##FORMAT=<ID=GT,Number=1,Type=String,Description="Genotype">
        |""".stripMargin +
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\ts9\n" +
        // record WITHOUT a CSQ entry in INFO
        "chr3\t10\t.\tC\tG\t5.0\tPASS\tDP=9\tGT\t0/1\n" +
        // record with CSQ and a FORMAT key (DP) absent from FORMAT string
        "chr3\t20\trs9\tT\tA\t9.0\tPASS\tCSQ=stop_lost|HIGH\tGT\t1|1\n"
    java.nio.file.Files.writeString(p, content)
    p.toString
  }

  test("record without CSQ still yields one row with null impact fields") {
    val df = VcfReader.read(spark, path, "s9",
      impactFields = Seq("consequence" -> "str", "impact" -> "str"),
      formatKeys = Seq("GT", "DP"))
    val rows = df.orderBy("pos").collect()
    assert(rows.length == 2)
    val noCsq = rows(0)
    assert(noCsq.getAs[Long]("pos") == 10L)
    assert(noCsq.isNullAt(noCsq.fieldIndex("consequence")))
    assert(noCsq.getSeq[Int](noCsq.fieldIndex("gt")).toSeq == Seq(0, 1))
    // DP requested but absent from this file's FORMAT column → null
    assert(noCsq.isNullAt(noCsq.fieldIndex("dp")))
  }

  test("pipe-separated genotype (phased) normalizes like slash-separated") {
    val df = VcfReader.read(spark, path, "s9",
      impactFields = Seq("consequence" -> "str"), formatKeys = Seq("GT"))
    val r = df.filter(col("pos") === 20).head()
    assert(r.getSeq[Int](r.fieldIndex("gt")).toSeq == Seq(1, 1))
    assert(r.getAs[String]("gt_raw") == "1|1")
    assert(r.getAs[String]("consequence") == "stop_lost")
  }
}
