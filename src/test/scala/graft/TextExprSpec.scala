package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.functions.expressions.TextExpressions

/** The native WordShingles expression must be value-identical to the
  * higher-order-function composition it replaces (and hence to the DuckDB
  * oracle CTE): same split semantics, window join, distinct order,
  * short-doc fallback. */
class TextExprSpec extends SparkSpecBase {
  import spark.implicits._

  private val cases = Seq(
    "the quick brown fox jumps over the lazy dog",
    "a b c",                         // exactly n tokens (n=3)
    "a b",                           // short doc → whole-doc shingle
    "one",                           // single token
    "",                              // empty → [""]
    "  leading and   multi   spaces\ttabs\nnewlines  ",
    "dup dup dup dup dup",           // duplicate shingles collapse
    "x y z x y z x y z")             // repeated trigram

  test("wordShingles == array_distinct(transform(slice)) composition") {
    for (n <- Seq(1, 2, 3, 8)) {
      val df = cases.toDF("text")
      val got = df.select(TextExpressions.wordShingles(spark, col("text"), n))
        .as[Seq[String]].collect().toSeq
      val want = df.select(
          TextFunctions.shingles(TextFunctions.tokens(col("text")), n))
        .as[Seq[String]].collect().toSeq
      assert(got == want, s"n=$n")
    }
  }

  test("wordShingles stays inside whole-stage codegen") {
    val df = cases.toDF("text")
      .select(explode(TextExpressions.wordShingles(spark, col("text"), 3)))
    // "*(n)" prefixes mark operators inside a whole-stage-codegen span
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Generate explode(word_shingles"), plan)
    assert(df.count() > 0)
  }

  test("Dedup.shingled emits one row per distinct shingle") {
    val df = Seq(("d1", "a b c d"), ("d2", "a b")).toDF("doc_id", "text")
    val got = graft.ext.Dedup.shingled(df, "doc_id", "text", 3)
      .as[(String, String)].collect().toSet
    assert(got == Set(("d1", "a b c"), ("d1", "b c d"), ("d2", "a b")))
  }
}
