package graft

import org.apache.spark.sql.functions._
import graft.ext.Graph

class GraphSpec extends SparkSpecBase {
  import spark.implicits._

  private def ranks(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
    df.as[(Long, Double)].collect().toMap

  test("pageRank: uniform cycle stays uniform; mass conserved") {
    // 0 → 1 → 2 → 3 → 0: perfect symmetry, every rank must be 1/4 at
    // every iteration (the analytic fixed point)
    val ring = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L)).toDF("a", "b")
    val got = ranks(Graph.pageRank(ring, "a", "b", iters = 7))
    assert(got.keySet == Set(0L, 1L, 2L, 3L))
    got.values.foreach(r => assert(math.abs(r - 0.25) < 1e-15, got))
    // no dangling vertices → damped mass fully redistributed
    assert(math.abs(got.values.sum - 1.0) < 1e-12)
  }

  test("pageRank: hub authority, weights matter, dangling leaks") {
    // 3 spokes all pointing at a hub: hub must outrank every spoke,
    // and the hub is dangling (no out-edges) so total mass < 1
    val star = Seq((1L, 0L), (2L, 0L), (3L, 0L)).toDF("a", "b")
    val got = ranks(Graph.pageRank(star, "a", "b", iters = 10))
    assert(got(0L) > got(1L) * 2)
    assert(got.values.sum < 1.0)
    // weighted: src 1 splits 9:1 between two targets — target ranks
    // must order by weight
    val wed = Seq((1L, 2L, 9L), (1L, 3L, 1L), (2L, 1L, 1L), (3L, 1L, 1L))
      .toDF("a", "b", "w")
    val wr = ranks(Graph.pageRank(wed, "a", "b", Some("w"), iters = 20))
    assert(wr(2L) > wr(3L))
  }

  test("pageRank: exactFold bit-stable under repartitioning; ≈ plain sum") {
    val rnd = (0 until 200).map { i =>
      ((i * 7919L) % 40, (i * 104729L + 13) % 40, 1L + i % 5)
    }.filter(p => p._1 != p._2).toDF("a", "b", "w")
    val exact1 = ranks(Graph.pageRank(rnd, "a", "b", Some("w"),
      iters = 10, exactFold = true))
    val exact2 = ranks(Graph.pageRank(rnd.repartition(13), "a", "b",
      Some("w"), iters = 10, exactFold = true))
    assert(exact1 == exact2) // BIT equality — the oracle contract
    val plain = ranks(Graph.pageRank(rnd, "a", "b", Some("w"), iters = 10))
    exact1.foreach { case (v, r) =>
      assert(math.abs(r - plain(v)) < 1e-12, s"vertex $v")
    }
    // multi-edges pre-sum: duplicating an edge row == doubling weight
    val dup = rnd.unionByName(rnd)
    val dbl = rnd.withColumn("w", col("w") * 2)
    assert(ranks(Graph.pageRank(dup, "a", "b", Some("w"), iters = 5,
        exactFold = true)) ==
      ranks(Graph.pageRank(dbl, "a", "b", Some("w"), iters = 5,
        exactFold = true)))
  }
}
