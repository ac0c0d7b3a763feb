package graft

import org.apache.spark.sql.functions._
import graft.plans.BinnedRangeJoinRule

/** The transparent binned range-join optimizer rule: plans change, results
  * don't. */
class RangeRuleSpec extends SparkSpecBase {
  import spark.implicits._

  private def intervals(n: Int, seed: Int, keyMod: Int) = {
    val r = new scala.util.Random(seed)
    (0 until n).map { i =>
      val s = r.nextInt(5000).toLong
      (i.toLong, (i % keyMod).toLong, s, s + r.nextInt(300))
    }
  }

  private def withRule[T](f: => T): T = {
    spark.experimental.extraOptimizations =
      Seq(BinnedRangeJoinRule)
    try f finally spark.experimental.extraOptimizations = Nil
  }

  test("overlap join rewritten to binned form, results identical") {
    val a = intervals(500, 1, 4).toDF("ida", "ka", "sa", "ea")
    val b = intervals(500, 2, 4).toDF("idb", "kb", "sb", "eb")
    def q = a.join(b,
      $"ka" === $"kb" && $"sa" <= $"eb" && $"sb" <= $"ea")
      .select("ida", "idb")
    val want = q.as[(Long, Long)].collect().toSeq.sorted
    val (got, plan) = withRule {
      spark.conf.set("spark.graft.rangejoin.binwidth", "128")
      val df = q
      (df.as[(Long, Long)].collect().toSeq.sorted,
        df.queryExecution.optimizedPlan.toString)
    }
    assert(plan.contains(BinnedRangeJoinRule.BinName), plan)
    assert(got == want)
    assert(got.size == got.distinct.size)
  }

  test("pure range join (no equi keys) also rewrites — kills the cartesian") {
    val a = intervals(200, 3, 1).toDF("ida", "ka", "sa", "ea").drop("ka")
    val b = intervals(200, 4, 1).toDF("idb", "kb", "sb", "eb").drop("kb")
    def q = a.join(b, $"sa" <= $"eb" && $"sb" <= $"ea").select("ida", "idb")
    val want = q.as[(Long, Long)].collect().toSeq.sorted
    val (got, plan) = withRule {
      (q.as[(Long, Long)].collect().toSeq.sorted,
        q.queryExecution.optimizedPlan.toString)
    }
    assert(plan.contains(BinnedRangeJoinRule.BinName), plan)
    assert(got == want)
  }

  test("rule is idempotent and leaves non-range joins alone") {
    withRule {
      val a = intervals(100, 5, 3).toDF("ida", "ka", "sa", "ea")
      val b = intervals(100, 6, 3).toDF("idb", "kb", "sb", "eb")
      val ranged = a.join(b,
        $"ka" === $"kb" && $"sa" <= $"eb" && $"sb" <= $"ea")
      val plan = ranged.queryExecution.optimizedPlan.toString
      // exactly one Generate per side — no repeated rewrite in the
      // fixed-point batch
      assert(plan.sliding("Generate".length).count(_ == "Generate") == 2, plan)

      val equiOnly = a.join(b, $"ka" === $"kb").select("ida", "idb")
      val equiPlan = equiOnly.queryExecution.optimizedPlan.toString
      assert(!equiPlan.contains(BinnedRangeJoinRule.BinName), equiPlan)
      assert(equiOnly.count() ==
        a.groupBy("ka").count().as[(Long, Long)].collect()
          .map { case (k, n) => n * b.filter($"kb" === k).count() }.sum)
    }
  }

  test("wide rows bypass binning — bounded fanout, same results") {
    // one pathological row spanning ~6e7 bins at width 16: without the
    // maxbins guard, Sequence would allocate that array per evaluation
    val a = (Seq((0L, 0L, 0L, 1000000000L)) ++
      intervals(200, 9, 1).map { case (i, k, s, e) => (i + 1, k, s, e) })
      .toDF("ida", "ka", "sa", "ea")
    val b = (Seq((500L, 0L, 10L, 900000000L)) ++
      intervals(200, 10, 1).map { case (i, k, s, e) => (i + 1 + 500, k, s, e) })
      .toDF("idb", "kb", "sb", "eb")
    def q = a.join(b, $"ka" === $"kb" && $"sa" <= $"eb" && $"sb" <= $"ea")
      .select("ida", "idb")
    val want = q.as[(Long, Long)].collect().toSeq.sorted
    val (got, plan) = withRule {
      spark.conf.set("spark.graft.rangejoin.binwidth", "16")
      spark.conf.set("spark.graft.rangejoin.maxbins", "64")
      try {
        val df = q
        (df.as[(Long, Long)].collect().toSeq.sorted,
          df.queryExecution.optimizedPlan.toString)
      } finally {
        spark.conf.unset("spark.graft.rangejoin.maxbins")
        spark.conf.unset("spark.graft.rangejoin.binwidth")
      }
    }
    assert(plan.contains(BinnedRangeJoinRule.BinName), plan) // binned fast path
    assert(plan.contains("Union"), plan)                     // wide-row fallback
    assert(got == want)
    assert(got.size == got.distinct.size)
  }

  test("CBO column stats size the bin width to the coordinate domain") {
    spark.conf.unset("spark.graft.rangejoin.binwidth") // stats must decide
    val a = intervals(300, 11, 2).toDF("ida", "ka", "sa", "ea")
    val b = intervals(300, 12, 2).toDF("idb", "kb", "sb", "eb")
    a.write.mode("overwrite").saveAsTable("rr_stats_a")
    b.write.mode("overwrite").saveAsTable("rr_stats_b")
    spark.sql("ANALYZE TABLE rr_stats_a COMPUTE STATISTICS FOR ALL COLUMNS")
    spark.sql("ANALYZE TABLE rr_stats_b COMPUTE STATISTICS FOR ALL COLUMNS")
    val ta = spark.table("rr_stats_a"); val tb = spark.table("rr_stats_b")
    def q = ta.join(tb,
      col("ka") === col("kb") && col("sa") <= col("eb") &&
        col("sb") <= col("ea"))
      .select("ida", "idb")
    val want = q.as[(Long, Long)].collect().toSeq.sorted
    // the width the rule should derive from the same min/max stats
    val domain =
      math.max(ta.agg(max("ea")).head().getLong(0),
        tb.agg(max("eb")).head().getLong(0)) -
      math.min(ta.agg(min("sa")).head().getLong(0),
        tb.agg(min("sb")).head().getLong(0))
    val expectedW = math.max(1L, domain / 64)
    val (got, plan) = withRule {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      spark.conf.set("spark.graft.rangejoin.targetbins", "64")
      try {
        val df = q
        (df.as[(Long, Long)].collect().toSeq.sorted,
          df.queryExecution.optimizedPlan.toString)
      } finally {
        spark.conf.unset("spark.graft.rangejoin.targetbins")
        spark.conf.unset("spark.sql.cbo.enabled")
      }
    }
    assert(plan.contains(BinnedRangeJoinRule.BinName), plan)
    assert(plan.contains(s"/ $expectedW.0"),
      s"expected stats-derived width $expectedW in plan:\n$plan")
    // stats prove both sides narrow (extent/width < maxbins): the wide
    // fallback branches and their re-scans must be elided entirely
    assert(!plan.contains("Union"), plan)
    assert(got == want)
  }

  test("selective equi key (CBO) suppresses the rewrite; results identical") {
    // same ANALYZEd tables as the width test, but joined on the UNIQUE id
    // (ndv = rows): per-key pair space is 1, so binning is pure overhead
    val a = intervals(300, 11, 2).toDF("ida", "ka", "sa", "ea")
    val b = intervals(300, 12, 2).toDF("idb", "kb", "sb", "eb")
    a.write.mode("overwrite").saveAsTable("rr_sel_a")
    b.write.mode("overwrite").saveAsTable("rr_sel_b")
    spark.sql("ANALYZE TABLE rr_sel_a COMPUTE STATISTICS FOR ALL COLUMNS")
    spark.sql("ANALYZE TABLE rr_sel_b COMPUTE STATISTICS FOR ALL COLUMNS")
    val ta = spark.table("rr_sel_a"); val tb = spark.table("rr_sel_b")
    def q = ta.join(tb,
      col("ida") === col("idb") && col("sa") <= col("eb") &&
        col("sb") <= col("ea"))
      .select("ida", "idb")
    val want = q.as[(Long, Long)].collect().toSeq.sorted
    withRule {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      try {
        val plan = q.queryExecution.optimizedPlan.toString
        assert(!plan.contains(BinnedRangeJoinRule.BinName), plan)
        assert(q.as[(Long, Long)].collect().toSeq.sorted == want)
        // threshold 0 disables the gate: the rewrite fires again
        spark.conf.set("spark.graft.rangejoin.maxpairsperkey", "0")
        try {
          val forced = q.queryExecution.optimizedPlan.toString
          assert(forced.contains(BinnedRangeJoinRule.BinName), forced)
        } finally spark.conf.unset("spark.graft.rangejoin.maxpairsperkey")
      } finally spark.conf.unset("spark.sql.cbo.enabled")
    }
  }

  test("composite equi key (CBO) suppresses the rewrite only jointly") {
    // two keys of ndv 4 each: alone, pairs/key = 300·300/16 = 5625 >
    // 4096 (not selective enough — the old best-single-key gate would
    // rewrite); combined, 300·300/256 = 351 <= 4096 → suppress
    val mk = (n: Int, off: Int) => (0 until n).map { i =>
      (i.toLong + off, (i % 4).toLong, ((i / 4) % 4).toLong,
        i * 5L, i * 5L + 12L)
    }
    mk(300, 0).toDF("ida", "k1a", "k2a", "sa", "ea")
      .write.mode("overwrite").saveAsTable("rr_comp_a")
    mk(300, 7).toDF("idb", "k1b", "k2b", "sb", "eb")
      .write.mode("overwrite").saveAsTable("rr_comp_b")
    spark.sql("ANALYZE TABLE rr_comp_a COMPUTE STATISTICS FOR ALL COLUMNS")
    spark.sql("ANALYZE TABLE rr_comp_b COMPUTE STATISTICS FOR ALL COLUMNS")
    val ta = spark.table("rr_comp_a"); val tb = spark.table("rr_comp_b")
    def q = ta.join(tb,
      col("k1a") === col("k1b") && col("k2a") === col("k2b") &&
        col("sa") <= col("eb") && col("sb") <= col("ea"))
      .select("ida", "idb")
    val want = q.as[(Long, Long)].collect().toSeq.sorted
    withRule {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      try {
        val plan = q.queryExecution.optimizedPlan.toString
        assert(!plan.contains(BinnedRangeJoinRule.BinName), plan)
        assert(q.as[(Long, Long)].collect().toSeq.sorted == want)
        // tighten the threshold below the combined estimate (351): the
        // gate re-opens, proving it uses the combined product, not a
        // single key
        spark.conf.set("spark.graft.rangejoin.maxpairsperkey", "300")
        try {
          val forced = q.queryExecution.optimizedPlan.toString
          assert(forced.contains(BinnedRangeJoinRule.BinName), forced)
          assert(q.as[(Long, Long)].collect().toSeq.sorted == want)
        } finally spark.conf.unset("spark.graft.rangejoin.maxpairsperkey")
      } finally spark.conf.unset("spark.sql.cbo.enabled")
    }
  }

  test("library RangeJoin plans are not double-binned by the rule") {
    withRule {
      val a = intervals(100, 7, 2).toDF("ida", "k", "sa", "ea")
      val b = intervals(100, 8, 2).toDF("idb", "k", "sb", "eb")
      val lib = graft.ranges.RangeJoin.overlapJoin(a, b, Seq("k"),
        "sa", "ea", "sb", "eb", 64L).select("ida", "idb")
      val plan = lib.queryExecution.optimizedPlan.toString
      assert(!plan.contains(BinnedRangeJoinRule.BinName), plan)
      val naive = a.join(b, Seq("k"))
        .filter($"sa" <= $"eb" && $"sb" <= $"ea").select("ida", "idb")
      assert(lib.as[(Long, Long)].collect().toSeq.sorted ==
        naive.as[(Long, Long)].collect().toSeq.sorted)
    }
  }

  test("rule output broadcasts a dim-sized side (stats-driven physical)") {
    // the rule only rewrites the LOGICAL plan; when one input is under
    // the broadcast threshold, JoinSelection must still pick a
    // BroadcastHashJoin on (keys, bin) — the zero-shuffle annotation
    // plan of RangeJoin.overlapJoinBroadcast, but reached from a plain
    // naive-overlap query with no hints (size estimates survive the
    // injected Generate)
    val big = intervals(5000, 9, 3).toDF("ida", "ka", "sa", "ea")
    val small = intervals(40, 10, 3).toDF("idb", "kb", "sb", "eb")
    def q = big.join(small,
      $"ka" === $"kb" && $"sa" <= $"eb" && $"sb" <= $"ea")
      .select("ida", "idb")
    val want = q.as[(Long, Long)].collect().toSeq.sorted
    val (got, opt, phys) = withRule {
      spark.conf.set("spark.graft.rangejoin.binwidth", "128")
      try {
        val df = q
        (df.as[(Long, Long)].collect().toSeq.sorted,
          df.queryExecution.optimizedPlan.toString,
          df.queryExecution.executedPlan.toString)
      } finally spark.conf.unset("spark.graft.rangejoin.binwidth")
    }
    assert(opt.contains(BinnedRangeJoinRule.BinName), opt)
    assert(got == want)
    assert(phys.contains("BroadcastHashJoin"), phys)
    assert(!phys.contains("Exchange hashpartitioning"), phys)
  }
}
