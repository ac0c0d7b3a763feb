package graft.tools

import graft.core.GraftSession
import graft.ranges.IntervalSets
import org.apache.spark.sql.functions._

/** Scratch plan inspector for the bucketed interval-set operators:
  * prints the formatted physical plans so exchange reuse and
  * co-partitioning can be verified rather than guessed. */
object IntervalPlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("8")
    val iv = spark.range(100000).select(lit(0L).as("chrom"),
      (col("id") * 7919 % 1000000L).as("s1"),
      (col("id") * 7919 % 1000000L + 1 + col("id") % 40).as("e1"))
    val b = iv.filter(col("s1") % 37 === 0)
      .select(col("chrom"), col("s1").as("s2"), col("e1").as("e2"))
    println("===== mergeOverlappingBucketed =====")
    IntervalSets.mergeOverlappingBucketed(iv, Seq("chrom"), "s1", "e1", 500L)
      .explain("formatted")
    println("===== subtractBucketed =====")
    IntervalSets.subtractBucketed(iv, b, Seq("chrom"), "s1", "e1",
      "s2", "e2", 500L).explain("formatted")
    spark.stop()
  }
}
