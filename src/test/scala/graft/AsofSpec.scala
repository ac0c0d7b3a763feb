package graft

import graft.operators.AsofJoin

class AsofSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val left = Seq(
    ("u1", 100L, "p1"), ("u1", 205L, "p2"), ("u1", 50L, "p0"),
    ("u2", 300L, "p3")).toDF("user", "ts", "purchase")
  private lazy val right = Seq(
    ("u1", 90L, "c1"), ("u1", 100L, "c2"), ("u1", 200L, "c3"),
    ("u2", 400L, "c4")).toDF("user", "ts", "click")

  test("backward asof: latest right at-or-before each left") {
    val got = AsofJoin.backward(left, right, Seq("user"), "ts", "ts")
      .select("user", "ts", "purchase", "click")
      .as[(String, Long, String, Option[String])].collect().toSet
    assert(got == Set(
      ("u1", 50L, "p0", None),          // nothing at or before 50
      ("u1", 100L, "p1", Some("c2")),   // equal ts matches (>=)
      ("u1", 205L, "p2", Some("c3")),
      ("u2", 300L, "p3", None)))        // u2's only click is later
  }

  test("backwardWithin: matches outside the gap are nulled") {
    val got = AsofJoin.backwardWithin(left, right, Seq("user"), "ts", "ts",
        maxGap = 10L)
      .select("user", "ts", "click")
      .as[(String, Long, Option[String])].collect().toSet
    assert(got == Set(
      ("u1", 50L, None),
      ("u1", 100L, Some("c2")),
      ("u1", 205L, Some("c3")),        // gap 5 <= 10
      ("u2", 300L, None)))
  }

  test("backwardWithin on TimestampType columns (gap unit = seconds)") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val l = Seq(("u1", ts("2024-01-01 00:00:30"), "p1"),
      ("u1", ts("2024-01-01 00:05:00"), "p2"))
      .toDF("user", "ts", "purchase")
    val r = Seq(("u1", ts("2024-01-01 00:00:00"), "c1"))
      .toDF("user", "ts", "click")
    val got = AsofJoin.backwardWithin(l, r, Seq("user"), "ts", "ts",
        maxGap = 60L)
      .select("user", "purchase", "click")
      .as[(String, String, Option[String])].collect().toSet
    assert(got == Set(("u1", "p1", Some("c1")), ("u1", "p2", None)))
  }

  test("backward asof == brute force on random data") {
    val rnd = new scala.util.Random(42)
    val l = (0 until 400).map(i =>
      (s"u${rnd.nextInt(8)}", rnd.nextInt(1000).toLong, i.toLong))
      .toDF("user", "ts", "lid")
    // right side unique per (user, ts) as the contract requires
    val rRows = (0 until 400).map(i =>
      (s"u${rnd.nextInt(8)}", rnd.nextInt(1000).toLong, i.toLong))
      .groupBy(r => (r._1, r._2)).map(_._2.maxBy(_._3)).toSeq
    val r = rRows.toDF("user", "ts", "rid")

    val got = AsofJoin.backward(l, r, Seq("user"), "ts", "ts")
      .select("user", "ts", "lid", "rid")
      .as[(String, Long, Long, Option[Long])].collect()
      .map(x => x._3 -> x._4).toMap

    val byUser = rRows.groupBy(_._1)
    l.as[(String, Long, Long)].collect().foreach { case (u, ts, lid) =>
      val want = byUser.getOrElse(u, Seq.empty)
        .filter(_._2 <= ts).sortBy(x => (x._2, x._3)).lastOption.map(_._3)
      assert(got(lid) == want, s"lid=$lid user=$u ts=$ts")
    }
  }

  test("forward asof == brute force on random data") {
    val rnd = new scala.util.Random(7)
    val l = (0 until 400).map(i =>
      (s"u${rnd.nextInt(8)}", rnd.nextInt(1000).toLong, i.toLong))
      .toDF("user", "ts", "lid")
    val rRows = (0 until 400).map(i =>
      (s"u${rnd.nextInt(8)}", rnd.nextInt(1000).toLong, i.toLong))
      .groupBy(r => (r._1, r._2)).map(_._2.maxBy(_._3)).toSeq
    val r = rRows.toDF("user", "ts", "rid")

    val got = AsofJoin.forward(l, r, Seq("user"), "ts", "ts")
      .select("user", "ts", "lid", "rid")
      .as[(String, Long, Long, Option[Long])].collect()
      .map(x => x._3 -> x._4).toMap

    val byUser = rRows.groupBy(_._1)
    l.as[(String, Long, Long)].collect().foreach { case (u, ts, lid) =>
      // earliest right at-or-after ts; equal-ts right matches
      val want = byUser.getOrElse(u, Seq.empty)
        .filter(_._2 >= ts).sortBy(x => (x._2, -x._3)).headOption.map(_._3)
      assert(got(lid) == want, s"lid=$lid user=$u ts=$ts")
    }
  }

  test("bucketed asof == plain asof at any width, both directions") {
    // single key — the regime the bucketed form exists for — plus a
    // key with NO right rows (entering match must stay null through
    // every bucket) and cross-bucket gaps (empty buckets between
    // matches, welded by the summary window's ignoreNulls carry)
    val rnd = new scala.util.Random(11)
    val l = ((0 until 500).map(i =>
        ("k1", rnd.nextInt(100000).toLong, i.toLong)) ++
      (500 until 520).map(i => ("k2", rnd.nextInt(1000).toLong, i.toLong)))
      .toDF("k", "ts", "lid")
    val rRows = (0 until 300).map(i =>
        ("k1", rnd.nextInt(100000).toLong, i.toLong))
      .groupBy(r => (r._1, r._2)).map(_._2.maxBy(_._3)).toSeq
    val r = rRows.toDF("k", "ts", "rid")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "ts", "lid", "rid")
        .as[(String, Long, Long, Option[Long])].collect().toSet
    val wantB = rows(AsofJoin.backward(l, r, Seq("k"), "ts", "ts"))
    val wantF = rows(AsofJoin.forward(l, r, Seq("k"), "ts", "ts"))
    for (width <- Seq(1L, 7L, 64L, 4096L, 1000000L)) {
      assert(rows(AsofJoin.backwardBucketed(l, r, Seq("k"), "ts", "ts",
        width)) == wantB, s"backward width=$width")
      assert(rows(AsofJoin.forwardBucketed(l, r, Seq("k"), "ts", "ts",
        width)) == wantF, s"forward width=$width")
    }
    // width-free overloads: the data-derived width must give the same
    // rows as every explicit width (and the derivation itself must be
    // sane: positive, no wider than the combined timeline span)
    assert(rows(AsofJoin.backwardBucketed(l, r, Seq("k"), "ts", "ts"))
      == wantB, "backward auto width")
    assert(rows(AsofJoin.forwardBucketed(l, r, Seq("k"), "ts", "ts"))
      == wantF, "forward auto width")
    val dw = AsofJoin.deriveBucketWidth(l, r, "ts", "ts")
    assert(dw >= 1L && dw <= 100000L, s"derived width $dw")
    // empty inputs: derivation degrades to 1, never throws
    assert(AsofJoin.deriveBucketWidth(
      l.filter($"lid" < 0), r.filter($"rid" < 0), "ts", "ts") == 1L)
    // mixed timestamp/date timelines unify through set-op coercion
    // BEFORE unit conversion — a per-side conversion would mix
    // day-numbers with micros and derive a garbage width
    val lMix = Seq(("k1", java.sql.Timestamp.valueOf("2024-01-05 10:00:00"),
      1L)).toDF("k", "ts", "lid")
    val rMix = Seq(("k1", java.sql.Date.valueOf("2024-01-03"), 9L))
      .toDF("k", "ts", "rid")
    val wMixed = AsofJoin.deriveBucketWidth(lMix, rMix, "ts", "ts")
    // span ≈ 2.4 days in MICROS over the 256-bucket floor
    val spanMicros = 2L * 86400000000L + 10L * 3600000000L
    assert(wMixed == math.max(1L, (spanMicros + 1) / 256), s"w=$wMixed")
    // equal-ts right must still match in both directions across the
    // bucketed path (the __src tie column survives the two-pass plan)
    val lt = Seq(("k1", 64L, 0L)).toDF("k", "ts", "lid") // on a boundary
    val rt = Seq(("k1", 64L, 9L)).toDF("k", "ts", "rid")
    assert(rows(AsofJoin.backwardBucketed(lt, rt, Seq("k"), "ts", "ts",
      64L)) == Set(("k1", 64L, 0L, Some(9L))))
    assert(rows(AsofJoin.forwardBucketed(lt, rt, Seq("k"), "ts", "ts",
      64L)) == Set(("k1", 64L, 0L, Some(9L))))
    // fractional timeline refuses loudly (no exact bucketing)
    val ld = Seq(("k1", 1.5, 0L)).toDF("k", "ts", "lid")
    val rd = Seq(("k1", 1.0, 9L)).toDF("k", "ts", "rid")
    val err = intercept[IllegalArgumentException](
      AsofJoin.backwardBucketed(ld, rd, Seq("k"), "ts", "ts", 10L))
    assert(err.getMessage.contains("integral"))
  }

  test("bucketed asof on a TimestampType timeline == plain") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val l = Seq(("u1", ts("2024-01-01 00:00:30"), "p1"),
      ("u1", ts("2024-01-03 00:05:00"), "p2"))
      .toDF("user", "ts", "purchase")
    val r = Seq(("u1", ts("2024-01-01 00:00:00"), "c1"),
      ("u1", ts("2024-01-02 00:00:00"), "c2"))
      .toDF("user", "ts", "click")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("user", "purchase", "click")
        .as[(String, String, Option[String])].collect().toSet
    // hour-sized buckets in MICROS (the unix_micros walk unit)
    assert(rows(AsofJoin.backwardBucketed(l, r, Seq("user"), "ts", "ts",
        3600000000L)) ==
      rows(AsofJoin.backward(l, r, Seq("user"), "ts", "ts")))
  }

  test("asof plan has no join node — one shuffle + window") {
    val plan = AsofJoin.backward(left, right, Seq("user"), "ts", "ts")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    assert(plan.contains("Window"))
  }
}
