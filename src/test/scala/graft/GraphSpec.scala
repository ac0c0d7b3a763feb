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

  test("pageRank: empty graph fails loudly, not with Infinity ranks") {
    val none = Seq.empty[(Long, Long)].toDF("a", "b")
    val e = intercept[IllegalArgumentException](
      Graph.pageRank(none, "a", "b", iters = 3))
    assert(e.getMessage.contains("at least one non-null edge"))
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

  private def triSet(df: org.apache.spark.sql.DataFrame) =
    df.as[(Long, Long, Long)].collect().toSet

  test("triangles: each emitted once, sorted; == brute force") {
    // K4 (4 triangles), a pendant chain (none), a triangle sharing a
    // vertex with K4
    val k4 = for (i <- 0L to 3L; j <- (i + 1) to 3L) yield (i, j)
    val edges = (k4 ++ Seq((3L, 10L), (10L, 11L), (11L, 12L),
      (0L, 20L), (20L, 21L), (21L, 0L))).toDF("a", "b")
    val got = triSet(Graph.triangles(edges, "a", "b"))
    val expected = Set((0L, 1L, 2L), (0L, 1L, 3L), (0L, 2L, 3L),
      (1L, 2L, 3L), (0L, 20L, 21L))
    assert(got == expected)
    // direction/duplication/self-loop noise is invisible
    val noisy = edges
      .unionByName(edges.select(col("b").as("a"), col("a").as("b")))
      .unionByName(Seq((5L, 5L)).toDF("a", "b"))
    assert(triSet(Graph.triangles(noisy, "a", "b")) == expected)
    // brute-force cross-check on a pseudo-random graph
    val rnd = (0 until 150).map { i =>
      ((i * 7919L) % 30, (i * 104729L + 13) % 30)
    }.filter(p => p._1 != p._2)
    val canon = rnd.map(p => (p._1 min p._2, p._1 max p._2)).toSet
    val brute = for {
      Seq(x, y, z) <- canon.flatMap(e => Seq(e._1, e._2)).toSeq
        .distinct.sorted.combinations(3).toSet
      if canon((x, y)) && canon((x, z)) && canon((y, z))
    } yield (x, y, z)
    assert(triSet(Graph.triangles(rnd.toDF("a", "b"), "a", "b")) == brute)
  }

  test("shortestPaths: hop counts, multi-source min, horizon, early exit") {
    // 0-1-2-3-4-5 path plus a shortcut 0→9→4
    val e = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (0L, 9L), (9L, 4L)).toDF("a", "b")
    def sp(sources: Seq[Long], hops: Int): Map[Long, Int] =
      Graph.shortestPaths(e, "a", "b", sources.toDF("id"), hops)
        .as[(Long, Int)].collect().toMap
    assert(sp(Seq(0L), 10) == Map(0L -> 0, 1L -> 1, 2L -> 2, 3L -> 3,
      9L -> 1, 4L -> 2, 5L -> 3)) // shortcut wins over the long path
    // horizon truncates
    assert(sp(Seq(0L), 1) == Map(0L -> 0, 1L -> 1, 9L -> 1))
    // multi-source: per-vertex min over seeds
    assert(sp(Seq(0L, 3L), 10) == Map(0L -> 0, 3L -> 0, 1L -> 1,
      9L -> 1, 4L -> 1, 2L -> 2, 5L -> 2))
    // directed: nothing reaches a source-only vertex
    assert(!sp(Seq(5L), 10).contains(4L))
  }

  test("kCore: peeling == brute force; cascades; partition-invariant") {
    def core(e: org.apache.spark.sql.DataFrame, k: Int): Map[Long, Long] =
      Graph.kCore(e, "a", "b", k).as[(Long, Long)].collect().toMap
    // triangle + tail: the 2-core is exactly the triangle — and the
    // peel must CASCADE (removing 5 drops 4 to degree 1, then 3)
    val tri = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L))
      .toDF("a", "b")
    assert(core(tri, 2) == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
    // path graph: 2-core is empty (everything peels away)
    val path = (1L until 10L).map(i => (i, i + 1)).toDF("a", "b")
    assert(core(path, 2).isEmpty)
    // 5-clique: the 4-core is the whole clique, 5-core empty
    val k5 = (for (i <- 1L to 5L; j <- (i + 1) to 5L) yield (i, j))
      .toDF("a", "b")
    assert(core(k5, 4) == (1L to 5L).map(_ -> 4L).toMap)
    assert(core(k5, 5).isEmpty)
    // self-loops and duplicate/reversed edges contribute nothing
    val noisy = tri.unionByName(Seq((1L, 1L), (2L, 1L), (3L, 2L))
      .toDF("a", "b"))
    assert(core(noisy, 2) == core(tri, 2))
    // random graph == driver brute-force peeling, any partitioning
    val rnd = (0 until 200).map { i =>
      ((i * 7919L) % 40, (i * 104729L + 13) % 40)
    }.filter(p => p._1 != p._2)
    def brute(k: Int): Map[Long, Long] = {
      var edges = rnd.map(p => (p._1 min p._2, p._1 max p._2)).distinct
      var changed = true
      while (changed) {
        val deg = edges.flatMap(e => Seq(e._1, e._2))
          .groupBy(identity).view.mapValues(_.size.toLong).toMap
        val bad = deg.filter(_._2 < k).keySet
        changed = bad.nonEmpty
        edges = edges.filter(e => !bad(e._1) && !bad(e._2))
      }
      edges.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
        .view.mapValues(_.size.toLong).toMap
    }
    for (k <- Seq(2, 3, 5)) {
      assert(core(rnd.toDF("a", "b"), k) == brute(k), s"k=$k")
      assert(core(rnd.toDF("a", "b").repartition(13), k) == brute(k))
    }
  }

  test("kCore: string (digest) ids keep their native type") {
    // the dedup family keys graphs by md5 digests; a silent
    // cast("long") turned every id into NULL and returned an empty
    // core (round-10 verdict defect) — pin the native-type contract
    def d(i: Long) = java.security.MessageDigest.getInstance("MD5")
      .digest(i.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val tri = Seq((d(1), d(2)), (d(2), d(3)), (d(3), d(1)),
      (d(3), d(4)), (d(4), d(5))).toDF("a", "b")
    val got = Graph.kCore(tri, "a", "b", 2)
    assert(got.schema("id").dataType ==
      org.apache.spark.sql.types.StringType)
    assert(got.as[(String, Long)].collect().toMap ==
      Map(d(1) -> 2L, d(2) -> 2L, d(3) -> 2L))
    assert(Graph.kCore(tri, "a", "b", 3).isEmpty)
  }

  /** In-JVM reference of the synchronous min-tie LPA rule — the spec's
    * independent third implementation (operator, DuckDB oracle, this). */
  private def refLpa(edges: Seq[(Long, Long)], iters: Int)
      : Map[Long, Long] = {
    val adj = (edges ++ edges.map(e => (e._2, e._1)))
      .filter(e => e._1 != e._2).distinct
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var lab: Map[Long, Long] = adj.keySet.map(v => v -> v).toMap
    (1 to iters).foreach { _ =>
      lab = adj.map { case (v, ns) =>
        val counts = ns.groupBy(lab).view.mapValues(_.size).toSeq
        v -> counts.minBy { case (l, c) => (-c, l) }._1
      }
    }
    lab
  }

  test("labelPropagation == the synchronous min-tie reference on an " +
      "irregular fixture; partitioning-invariant; splits what CC merges") {
    // two dense cliques bridged by one edge + a pendant chain —
    // ONE connected component, but density structure LPA can see
    val cliqueA = for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val cliqueB = for (i <- 10L to 13L; j <- (i + 1) to 13L) yield (i, j)
    val fixture = (cliqueA ++ cliqueB ++
      Seq((4L, 10L), (13L, 20L), (20L, 21L), (7L, 7L))).toSeq
    for (iters <- Seq(1, 2, 4)) {
      val want = refLpa(fixture, iters)
      val df = fixture.toDF("a", "b")
      val got = Graph.labelPropagation(df, "a", "b", iters)
        .as[(Long, Long)].collect().toMap
      assert(got == want, s"iters=$iters")
      val gotRep = Graph.labelPropagation(df.repartition(7), "a", "b",
        iters).as[(Long, Long)].collect().toMap
      assert(gotRep == want, s"iters=$iters repartitioned")
    }
    // after enough rounds the two cliques hold distinct internal labels
    // (community structure), while CC labels everything as one
    val lab4 = refLpa(fixture, 4)
    assert(lab4(1L) == lab4(2L) && lab4(2L) == lab4(3L))
    assert(lab4(11L) == lab4(12L) && lab4(12L) == lab4(13L))
    assert(lab4(2L) != lab4(12L),
      "fixture lost its two-community structure — pick a better fixture")
    val cc = graft.ext.Dedup.connectedComponents(
        fixture.filter(e => e._1 != e._2).toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(cc.values.toSet.size == 1, "CC must merge the bridged cliques")
  }
}
