package graft.entry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.GraftSession
import graft.ext.Stats

/** Exact distributed statistics over the fact table (ext/Stats).
  *
  * Native stddev/corr stream doubles through merge-order-dependent
  * accumulators — unreproducible across layouts and engines. These queries
  * run the order-independent exact-moments formulation instead, which is
  * why they can be hash-compared against DuckDB at all (the oracle runs
  * the identical fixed double expression tree over the same exact sums).
  *
  * Median (q60) is the exact interpolating percentile over an integral
  * value grid — both engines interpolate the same exact doubles. The
  * sketch path for arbitrary reals at scale is percentile_approx (q27).
  */
object StatsQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    GraftSession.table(s, dir, name)

  /** One k for BOTH q66 sides — the oracle SQL interpolates it, so the
    * sketch size can't drift between Spark and DuckDB. */
  private val KmvK = 64

  /** Shared 2% sampling threshold for q67: floor(0.02 · 2^32). */
  private val SampleThreshold = (0.02 * 4294967296.0).toLong

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Two-sample χ² distribution drift, exactly in integers: the
    // language mix of the second-wave sources (src10+) against the
    // first wave's — the dataset-shift monitor a recurring ingest
    // runs per batch. Cells are floor-e9 via divmod; one (bucket,
    // side) aggregation collapses the corpus.
    "q236_chi2_drift" -> ((s, dir) => {
      val d = t(s, dir, "documents")
        .select(col("lang"), (length(col("source")) > 4).as("is_cur"))
      Stats.chiSquareDrift(d, "lang", "is_cur")
        .orderBy("bucket")
    }),

    // Two-sample KS drift on the token-count distribution (same
    // ref/cur split as q236): exact integer numerator cleared of both
    // denominators, one floor-e9 division at the end, argmax value by
    // the min-struct device. The shape monitor χ² bucketing can miss.
    "q238_ks_drift" -> ((s, dir) => {
      val d = graft.ext.TextAnalysis.withTokenCounts(
          t(s, dir, "documents"), "text")
        .select(col("n_tokens"), (length(col("source")) > 4).as("is_cur"))
      Stats.ksDrift(d, "n_tokens", "is_cur")
    }),

    // Quantile discretizer (feature binning) the SCALABLE way: 9
    // decile cutpoints per key (one tiny aggregate, broadcast back) +
    // a map-side integer fold assigns buckets — no per-key ntile sort
    // of the corpus (the few-key window ceiling). Cutpoint semantics:
    // ties share a bucket (the ML binning contract; ntile would split
    // them by row order). Cross-engine exactness: interpolated
    // cutpoints of integral quantities land on the 0.1 grid only up
    // to an ulp (the two engines' lerp forms differ), so both sides
    // ROUND the cutpoints to the tenth grid — floor(c·10 + 0.5) is
    // immune to ulp drift (the grid value sits 0.5 from the floor
    // boundary), and dividing the SAME integer by 10 yields identical
    // doubles everywhere. Review finding: the earlier "deciles land
    // on the half grid" justification was data-luck, not invariant.
    "q146_decile_bins" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val cuts = li.groupBy("l_returnflag")
        .agg(expr("percentile(l_quantity, array(0.1,0.2,0.3,0.4,0.5," +
          "0.6,0.7,0.8,0.9))").as("cuts"))
      li.join(broadcast(cuts), "l_returnflag")
        .select(col("l_returnflag"), col("l_orderkey"),
          col("l_linenumber"), col("l_quantity"),
          (lit(1) + aggregate(
            transform(col("cuts"),
              c => when(col("l_quantity") >
                floor(c * lit(10d) + lit(0.5d)) / lit(10d), 1)
                .otherwise(0)),
            lit(0), (acc, x) => acc + x)).as("bucket"))
        // (orderkey, linenumber) is NOT unique in the synthetic data
        // (45.8k of 60k) — qty completes the order; rows still tied
        // are identical in every output column, so the hash is stable
        .orderBy("l_returnflag", "l_orderkey", "l_linenumber",
          "l_quantity")
    }),

    // Join-key skew report — the diagnostic that decides between the
    // plain, salted (q136), and bloom (q145) join plans: top-10 keys
    // by share of the fact table. Per-key counts (one shuffle of
    // (key, 1) partials), then TakeOrdered top-10 — a distributed
    // heap merge, NOT a global sort — against a 1-row totals
    // broadcast.
    "q147_skew_report" -> ((s, dir) => {
      val counts = t(s, dir, "events")
        .groupBy("user_id").agg(count(lit(1)).as("n"))
      val tot = counts.agg(sum(col("n")).as("total"),
        count(lit(1)).as("n_keys"))
      val top = counts.orderBy(col("n").desc, col("user_id")).limit(10)
      top
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("n").desc, col("user_id"))).cast("long"))
        .crossJoin(broadcast(tot))
        .select(col("rk"), col("user_id"), col("n"),
          (col("n").cast("double") / col("total").cast("double"))
            .as("share"),
          col("total"), col("n_keys"))
        .orderBy("rk")
    }),

    // EXACT distributed p50/p90/p99 — the value-domain-histogram
    // selection: quantize to the cent grid (the q67 device), roll up
    // to a (type, cent)-sized histogram, and read the order statistic
    // at rank ceil(p·n) off the integer cumulative sum. No per-key
    // sort of the raw values, no interpolation float hazard — the
    // histogram is the shuffle, bounded by the value domain (25k
    // cents) × |types| regardless of row count. All rank arithmetic
    // integral (ceil(a/b) = (a+b−1) div b).
    "q149_exact_percentiles" -> ((s, dir) => {
      import graft.ext.Incremental
      // built through the MERGEABLE histogram state (ext/Incremental)
      // split at xxhash64(user_id) parity — NULL-SAFE, a raw `% 2`
      // pair of filters would drop NULL keys from BOTH halves — and
      // folded; the oracle recomputing from all raw rows certifies
      // merge == recompute end-to-end on the rank-selection arithmetic
      val ev = t(s, dir, "events")
      val half = pmod(xxhash64(col("user_id")), lit(2))
      val stA = Incremental.histogramState(
        ev.filter(half === 0), Seq("event_type"), "value")
      val stB = Incremental.histogramState(
        ev.filter(half =!= 0), Seq("event_type"), "value")
      Incremental.percentilesFromState(
          Incremental.histogramMerge(stA, stB, Seq("event_type")),
          Seq("event_type"),
          Seq(("p50_cents", 1, 2), ("p90_cents", 9, 10),
            ("p99_cents", 99, 100)))
        .orderBy("event_type")
    }),

    // IQR outlier fences over the same cent histogram: quartiles by
    // rank selection — REUSING Incremental.percentilesFromState
    // ((1·n+3) div 4 and (3·n+3) div 4 are exactly its rank formula
    // at 1/4 and 3/4) — fences in DOUBLED integer space (2·cent vs
    // 2·q ± 3·iqr) so the 1.5×IQR never leaves exact arithmetic.
    "q150_iqr_outliers" -> ((s, dir) => {
      import graft.ext.Incremental
      val ev = t(s, dir, "events")
      val v = ev.filter(col("value").isNotNull)
        .select(col("event_type"),
          floor(col("value") * lit(100d) + lit(0.5d)).cast("long")
            .as("cent"))
      val q13 = Incremental.percentilesFromState(
          Incremental.histogramState(ev, Seq("event_type"), "value"),
          Seq("event_type"), Seq(("q1", 1, 4), ("q3", 3, 4)))
        .drop("n_values")
      val iqr = col("q3") - col("q1")
      v.join(broadcast(q13), "event_type")
        .groupBy(col("event_type"), col("q1"), col("q3"),
          (col("q3") - col("q1")).as("iqr"))
        .agg(sum(when(
            lit(2) * col("cent") < lit(2) * col("q1") - lit(3) * iqr ||
            lit(2) * col("cent") > lit(2) * col("q3") + lit(3) * iqr,
            1).otherwise(0)).as("n_outliers"))
        .orderBy("event_type")
    }),

    // MAD robust outliers (median absolute deviation — the
    // breakdown-resistant companion of q150's IQR fences): per type,
    // median by rank selection, then the DEVIATION histogram derived
    // from the VALUE histogram itself (|unit − med| regroup — work ∝
    // distinct units, the raw rows are never rescanned), MAD = median
    // of deviations, outliers = Σc where deviation > 3·MAD. Exact
    // integer arithmetic end to end on the cent grid.
    "q193_mad_outliers" -> ((s, dir) => {
      import graft.ext.Incremental
      val ev = t(s, dir, "events")
      val hist = Incremental.histogramState(ev, Seq("event_type"), "value")
      val med = Incremental.percentilesFromState(hist, Seq("event_type"),
        Seq(("med", 1, 2)))
      val dev = hist.join(broadcast(med.select("event_type", "med")),
          Seq("event_type"))
        .groupBy(col("event_type"),
          abs(col("unit") - col("med")).as("unit"))
        .agg(sum(col("c")).as("c"))
      val mad = Incremental.percentilesFromState(dev, Seq("event_type"),
        Seq(("mad", 1, 2))).drop("n_values")
      dev.join(broadcast(mad), Seq("event_type"))
        .groupBy(col("event_type"), col("mad"))
        .agg(sum(when(col("unit") > lit(3) * col("mad"), col("c"))
          .otherwise(lit(0L))).as("n_outliers"))
        .join(broadcast(med), Seq("event_type"))
        .select(col("event_type"), col("n_values"),
          col("med").as("median_cents"), col("mad").as("mad_cents"),
          col("n_outliers"))
        .orderBy("event_type")
    }),

    // n / mean / sample variance / population stddev of the price column
    // per returnflag, exact on the cent grid (scale=100).
    "q58_desc_stats" -> ((s, dir) => {
      Stats.descriptive(t(s, dir, "lineitem"), col("l_extendedprice"),
          scale = 100.0, keys = Seq("l_returnflag"))
        .orderBy("l_returnflag")
    }),

    // Pearson correlation quantity↔price per returnflag from exact
    // cross-moments (one shuffle, map-side partials).
    "q59_corr" -> ((s, dir) => {
      Stats.pearson(t(s, dir, "lineitem"),
          col("l_quantity"), 1.0, col("l_extendedprice"), 100.0,
          keys = Seq("l_returnflag"))
        .orderBy("l_returnflag")
    }),

    // Exact median (interpolating percentile) of the integral quantity
    // column per returnflag.
    "q60_median" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(expr("percentile(l_quantity, 0.5)").as("median_qty"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag")
    }),

    // PORTABLE distinct sketch: bottom-64 KMV over md5-u32 hashes —
    // unlike HLL (q27, engine-specific, rows-only check) the estimate is
    // a pure hash function, so the oracle matches it bit-for-bit while
    // the Spark side keeps sketch economics (64-long bounded state,
    // map-side partials, one tiny shuffle).
    "q66_kmv_distinct" -> ((s, dir) => {
      graft.ext.Sketches.kmvDistinct(t(s, dir, "lineitem"),
          "l_returnflag", "l_partkey", k = KmvK, withExact = true)
        .orderBy("l_returnflag")
    }),

    // Count-min sketch build + point queries (the frequency complement
    // of q66's KMV): a 4×64 counter matrix from ONE corpus pass
    // (map-side partials collapse to ≤ d·w cells per task), then 20
    // probe keys read min-of-4-cells against the broadcast artifact.
    // Estimates are exact functions of the md5 hash family, so the
    // oracle replays build AND probe bit-for-bit; exact counts ride
    // along to expose the one-sided +ε·N error.
    "q176_count_min" -> ((s, dir) => {
      import graft.ext.Sketches
      val cms = Sketches.countMin(t(s, dir, "orders"), "o_custkey",
        depth = 4, width = 64)
      val keys = s.range(1, 21).select(col("id").as("o_custkey"))
      val exact = t(s, dir, "orders").groupBy("o_custkey")
        .agg(count(lit(1)).as("exact_cnt"))
      Sketches.countMinEstimate(cms, keys, "o_custkey",
          depth = 4, width = 64)
        .join(exact, Seq("o_custkey"), "left")
        .select(col("o_custkey"), col("estimate"),
          coalesce(col("exact_cnt"), lit(0L)).as("exact_cnt"))
        .orderBy("o_custkey")
    }),

    // Sketch-grade quantile, reproducibly: exact median of a
    // DETERMINISTIC 2% hash sample (md5 row key < 0.02*2^32). The sample
    // is a map-side filter — no sketch merge, no full sort — and the
    // hash makes the "random" subset identical in any engine. Price on
    // the cent grid so interpolation stays exact.
    "q67_sampled_quantile" -> ((s, dir) => {
      val rowKey = concat_ws("-", col("l_orderkey"), col("l_linenumber"))
      t(s, dir, "lineitem")
        .filter(graft.ext.Sketches.hashU32(rowKey) < lit(SampleThreshold))
        .groupBy("l_returnflag")
        .agg(expr("percentile(CAST(FLOOR(CAST(l_extendedprice AS DOUBLE)" +
            "*100.0 + 0.5) AS BIGINT), 0.5)").as("median_price_cents"),
          count(lit(1)).as("n_sampled"))
        .orderBy("l_returnflag")
    }),

    // Bounded-state grouped top-k: the 5 highest-quantity parts per
    // returnflag. A window row_number would sort every (flag, part)
    // group row; the TopK aggregator's partials shuffle at most 5 pairs
    // per flag per partition.
    "q69_grouped_topk" -> ((s, dir) => {
      val sums = t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"), col("l_partkey"))
        .agg(sum(col("l_quantity").cast("long")).as("qty"))
      graft.ext.Sketches.groupedTopK(sums, "l_returnflag", "l_partkey",
          "qty", k = 5)
        .orderBy("l_returnflag", "rank")
    }),

    // Two-pass exact heavy hitters: Misra-Gries bounded-state candidates
    // (256 counters, map-side partials), then exact counts of only those
    // candidates. Exact output from sketch-sized state — one full-scan
    // pass more than a sketch, one full GROUP BY less than the naive
    // plan.
    "q70_heavy_hitters" -> ((s, dir) => {
      graft.ext.Sketches.heavyHitters(t(s, dir, "lineitem"),
          "l_quantity", phi = 0.015, k = 256)
        .orderBy("l_quantity")
    }),

    // One-pass table profile (ANALYZE shape): nulls / exact distincts /
    // native-typed min-max per column, long form. A single Aggregate
    // over the table; the pivot to rows is a literal-struct explode of
    // the one result row.
    "q92_profile" -> ((s, dir) => {
      Stats.profile(t(s, dir, "documents"),
          Seq("doc_id", "text", "lang", "source", "n_chars"))
        .orderBy("col_name")
    }),

    // Declarative constraint suite (the Deequ shape): six checks over
    // orders — all row-local ones ride ONE Aggregate over the table,
    // uniqueness joins that same pass as COUNT(*complete) −
    // COUNT(DISTINCT), the FK check is one left join against the
    // broadcast-sized distinct customer keys. Three checks fail on
    // purpose (range/set/regex) so both report polarities are
    // exercised.
    "q123_constraint_suite" -> ((s, dir) => {
      import graft.ext.Quality._
      suite(t(s, dir, "orders"), Seq(
        NotNull("o_custkey"),
        Unique(Seq("o_orderkey")),
        InRange("o_totalprice", 0.0, 300000.0),
        InSet("o_orderstatus", Seq("O", "F")),
        MatchesRegex("o_orderpriority", "^[1-3]-[A-Z]+$"),
        ForeignKey("o_custkey", t(s, dir, "customer"), "c_custkey")))
    }),

    // Incremental aggregate maintenance (ext/Incremental): the monthly
    // order roll-up maintained as mergeable partial-aggregate state —
    // here a 4/5 "snapshot" and a 1/5 "delta batch" aggregate
    // separately and MERGE, and the result must equal the oracle's
    // direct full-table GROUP BY exactly (counts/decimal sums add
    // exactly, min/max are lattice joins; the mean derives at read
    // time from exact state). The refresh pattern that never re-scans
    // fact history at 100 TB.
    "q130_incremental_agg" -> ((s, dir) => {
      import graft.ext.Incremental
      // month as DATE: a timestamp month column would parquet-write as
      // a UTC instant while the oracle's date_trunc stays naive
      val ord = t(s, dir, "orders")
        .withColumn("month",
          trunc(col("o_orderdate").cast("date"), "month"))
      val snapshot = Incremental.aggregateState(
        ord.filter(col("o_orderkey") % 5 =!= 0), Seq("month"),
        "o_totalprice")
      val deltaState = Incremental.aggregateState(
        ord.filter(col("o_orderkey") % 5 === 0), Seq("month"),
        "o_totalprice")
      // Output edge: render the exact DECIMAL(38,2) sum as DOUBLE.
      // The exactness argument is about the MERGE (decimal state adds
      // exactly in any order); the display type is a read-time choice,
      // and DECIMAL(38,x) is the one output type whose cross-engine
      // hash canonicalization differs (r8 verdict: parquet
      // fixed-len-byte-array vs HUGEINT rendering). Cents < 2^53 at
      // any driver sf, so the cast is value-exact on both engines.
      Incremental.finish(
          Incremental.merge(snapshot, deltaState, Seq("month")))
        .withColumn("sum_val", col("sum_val").cast("double"))
        .orderBy("month")
    }),

    // Winsorized mean per event type (ext/Incremental): values clamp
    // to their group's exact [p05, p95] grid percentiles (q149's rank
    // selection) and the CLAMPED UNITS aggregate — integer arithmetic
    // until one edge division, built through the mergeable histogram
    // split/folded at user parity like q149 (merge == recompute
    // certified on the winsorized path too).
    "q160_winsorized_mean" -> ((s, dir) => {
      import graft.ext.Incremental
      val ev = t(s, dir, "events")
      val half = pmod(xxhash64(col("user_id")), lit(2))
      val hist = Incremental.histogramMerge(
        Incremental.histogramState(ev.filter(half === 0),
          Seq("event_type"), "value"),
        Incremental.histogramState(ev.filter(half =!= 0),
          Seq("event_type"), "value"),
        Seq("event_type"))
      Incremental.winsorizedMean(hist, Seq("event_type"), 100.0)
        .orderBy("event_type")
    }),

    // Mergeable correlation/regression state (ext/Incremental): exact
    // decimal (x, y, x², y², xy) sums per l_returnflag, built SPLIT
    // 4/5 + 1/5 and MERGED; Pearson r / OLS slope / intercept derive
    // at read time as a fixed sequence of correctly-rounded IEEE ops
    // (×, −, ÷, sqrt — no transcendental), which the oracle replays
    // from its own from-scratch sums. Inputs chosen so every sum's
    // value fits a double EXACTLY (integer quantity × 2dp discount —
    // decimal(38,12)→double conversion is only engine-identical for
    // ≤2^53-scaled values, probed this round).
    "q158_incremental_corr" -> ((s, dir) => {
      import graft.ext.Incremental
      val li = t(s, dir, "lineitem")
      val snap = Incremental.corrState(
        li.filter(col("l_orderkey") % 5 =!= 0), Seq("l_returnflag"),
        "l_quantity", "l_discount")
      val delta = Incremental.corrState(
        li.filter(col("l_orderkey") % 5 === 0), Seq("l_returnflag"),
        "l_quantity", "l_discount")
      Incremental.corrFinish(
          Incremental.corrMerge(snap, delta, Seq("l_returnflag")))
        .select(col("l_returnflag"), col("n_rows"),
          col("sum_x").cast("double").as("sum_x"),
          col("sum_y").cast("double").as("sum_y"),
          col("sum_xy").cast("double").as("sum_xy"),
          col("mean_x"), col("mean_y"), col("pearson_r"),
          col("slope"), col("intercept"))
        .orderBy("l_returnflag")
    }),

    // Incremental JOIN maintenance (insert-only IVM): orders ⋈
    // customer where BOTH sides take an append — the maintained view
    // is snapshot-join ∪ joinDelta's three delta terms (ΔA⋈B ∪ A⋈ΔB ∪
    // ΔA⋈ΔB), and the union must equal the oracle's from-scratch full
    // join exactly. Every delta term broadcasts the delta side, so the
    // snapshot history is scanned map-only and shuffled never — the
    // connectedComponentsDelta convention applied to joins.
    "q157_incremental_join" -> ((s, dir) => {
      import graft.ext.Incremental
      val ord = t(s, dir, "orders")
        .select(col("o_custkey").as("custkey"), col("o_orderkey"),
          col("o_totalprice").cast("decimal(18,2)").cast("double")
            .as("price"))
      val cust = t(s, dir, "customer")
        .select(col("c_custkey").as("custkey"), col("c_name"))
      val (snapA, deltaA) = (ord.filter(col("o_orderkey") % 5 =!= 0),
        ord.filter(col("o_orderkey") % 5 === 0))
      val (snapB, deltaB) = (cust.filter(col("custkey") % 7 =!= 0),
        cust.filter(col("custkey") % 7 === 0))
      snapA.join(snapB, Seq("custkey"))
        .unionByName(Incremental.joinDelta(snapA, deltaA, snapB, deltaB,
          Seq("custkey")))
        .orderBy("o_orderkey")
    }),

    // Order-independent content digest per source (ext/Stats): the
    // release-integrity primitive — one map-side-combined aggregate,
    // the md5-u32 row hashes SUM exactly so partitioning and row
    // order are invisible, and the oracle recomputes the same number
    // relationally. Two releases (or two engines, as here) agreeing
    // on (n_rows, digest_hi, digest_lo) hold the same row multiset —
    // the hi/lo BIGINT halves render the DECIMAL(38,0) state in a
    // type both engines canonicalize identically.
    "q133_content_digest" -> ((s, dir) => {
      Stats.contentDigest(t(s, dir, "documents"),
          cols = Seq("doc_id", "text", "lang", "source", "n_chars"),
          keys = Seq("source"))
        .orderBy("source")
    }))

  val oracleSql: Map[String, String] = Map(
    // cumulative-count numerator |cumRef·nCur − cumCur·nRef| in
    // HUGEINT, max + smallest-attaining-value via the min-struct
    // argmax, one floor-e9 division — the Spark DECIMAL(38,0) twin
    "q238_ks_drift" ->
      """WITH d AS (SELECT
        |    CAST(len(string_split_regex(text,'\s+')) AS BIGINT) AS v,
        |    (length(source) > 4) AS is_cur
        |  FROM documents),
        |per AS (SELECT v,
        |    CAST(SUM(CASE WHEN is_cur THEN 0 ELSE 1 END) AS BIGINT) AS r,
        |    CAST(SUM(CASE WHEN is_cur THEN 1 ELSE 0 END) AS BIGINT) AS c
        |  FROM d GROUP BY 1),
        |cum AS (SELECT v,
        |    CAST(SUM(r) OVER w AS HUGEINT) AS cr,
        |    CAST(SUM(c) OVER w AS HUGEINT) AS cc,
        |    CAST(SUM(r) OVER () AS HUGEINT) AS nr,
        |    CAST(SUM(c) OVER () AS HUGEINT) AS nc
        |  FROM per WINDOW w AS (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |num AS (SELECT v, nr, nc, abs(cr*nc - cc*nr) AS num FROM cum),
        |best AS (SELECT CAST(MAX(nr) AS BIGINT) AS n_ref,
        |    CAST(MAX(nc) AS BIGINT) AS n_cur,
        |    MIN({'neg': -num, 'v': v}) AS b
        |  FROM num)
        |SELECT n_ref, n_cur,
        |  CASE WHEN n_ref > 0 AND n_cur > 0
        |       THEN CAST(((0 - (b).neg) * 1000000000)
        |            // (CAST(n_ref AS HUGEINT) * n_cur) AS BIGINT)
        |       ELSE 0 END AS ks_e9,
        |  (b).v AS ks_at_value
        |FROM best""".stripMargin,
    // (o·N − r·c)²/(N·r·c) through HUGEINT divmod — the identical
    // floor-e9 rendering the Spark side computes in DECIMAL(38,0)
    "q236_chi2_drift" ->
      """WITH per AS (SELECT lang AS bucket,
        |  CAST(SUM(CASE WHEN length(source) > 4 THEN 0 ELSE 1 END) AS BIGINT) AS n_ref,
        |  CAST(SUM(CASE WHEN length(source) > 4 THEN 1 ELSE 0 END) AS BIGINT) AS n_cur
        | FROM documents GROUP BY 1),
        |t AS (SELECT *,
        |  CAST(SUM(n_ref + n_cur) OVER () AS HUGEINT) AS n,
        |  CAST(SUM(n_ref) OVER () AS HUGEINT) AS cref,
        |  CAST(SUM(n_cur) OVER () AS HUGEINT) AS ccur,
        |  CAST(n_ref + n_cur AS HUGEINT) AS r FROM per),
        |c AS (SELECT bucket, n_ref, n_cur,
        |  CAST(
        |    (CASE WHEN cref = 0 THEN 0 ELSE
        |      ((n_ref*n - r*cref)*(n_ref*n - r*cref) // (n*r*cref)) * 1000000000
        |      + (((n_ref*n - r*cref)*(n_ref*n - r*cref) % (n*r*cref)) * 1000000000) // (n*r*cref)
        |     END)
        |    + (CASE WHEN ccur = 0 THEN 0 ELSE
        |      ((n_cur*n - r*ccur)*(n_cur*n - r*ccur) // (n*r*ccur)) * 1000000000
        |      + (((n_cur*n - r*ccur)*(n_cur*n - r*ccur) % (n*r*ccur)) * 1000000000) // (n*r*ccur)
        |     END) AS BIGINT) AS chi2_cell_e9
        | FROM t)
        |SELECT bucket, n_ref, n_cur, chi2_cell_e9,
        |  CAST(SUM(chi2_cell_e9) OVER () AS BIGINT) AS total_chi2_e9,
        |  COUNT(*) OVER () - 1 AS dof
        |FROM c ORDER BY bucket""".stripMargin,
    // identical cutpoint semantics: quantile_cont list + ordered fold;
    // integer sum, order-irrelevant
    "q146_decile_bins" ->
      """WITH c AS (SELECT l_returnflag,
        |    quantile_cont(l_quantity, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS cuts
        |  FROM lineitem GROUP BY 1)
        |SELECT l.l_returnflag, l.l_orderkey, l.l_linenumber, l.l_quantity,
        |  1 + CAST(list_sum(list_transform(c.cuts,
        |    x -> CASE WHEN l.l_quantity > FLOOR(x*10 + 0.5)/10
        |         THEN 1 ELSE 0 END)) AS INTEGER)
        |    AS bucket
        |FROM lineitem l JOIN c USING (l_returnflag)
        |ORDER BY l_returnflag, l_orderkey, l_linenumber, l_quantity""".stripMargin,
    "q149_exact_percentiles" ->
      """WITH v AS (SELECT event_type,
        |    CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS cent
        |  FROM events WHERE value IS NOT NULL),
        |h AS (SELECT event_type, cent, COUNT(*) AS c FROM v GROUP BY 1, 2),
        |w AS (SELECT event_type, cent, SUM(c) OVER (PARTITION BY event_type
        |  ORDER BY cent ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |  AS cum FROM h),
        |n AS (SELECT event_type, COUNT(*) AS n FROM v GROUP BY 1)
        |SELECT w.event_type,
        |  MIN(CASE WHEN cum >= (n.n + 1) // 2 THEN cent END) AS p50_cents,
        |  MIN(CASE WHEN cum >= (9*n.n + 9) // 10 THEN cent END) AS p90_cents,
        |  MIN(CASE WHEN cum >= (99*n.n + 99) // 100 THEN cent END) AS p99_cents,
        |  MAX(n.n) AS n_values
        |FROM w JOIN n USING (event_type)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // same rank formula, applied twice: median of cents, then median
    // of the |cent − med| deviation histogram; outliers from the
    // deviation histogram's counts
    "q193_mad_outliers" ->
      """WITH v AS (SELECT event_type,
        |    CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS cent
        |  FROM events WHERE value IS NOT NULL),
        |h AS (SELECT event_type, cent, COUNT(*) AS c FROM v GROUP BY 1, 2),
        |w AS (SELECT event_type, cent, SUM(c) OVER (PARTITION BY event_type
        |  ORDER BY cent ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |  AS cum FROM h),
        |n AS (SELECT event_type, COUNT(*) AS n FROM v GROUP BY 1),
        |med AS (SELECT w.event_type,
        |    MIN(CASE WHEN cum >= (n.n + 1) // 2 THEN cent END) AS med,
        |    CAST(MAX(n.n) AS BIGINT) AS n_values
        |  FROM w JOIN n USING (event_type) GROUP BY 1),
        |d AS (SELECT h.event_type, ABS(h.cent - med.med) AS du,
        |    CAST(SUM(h.c) AS BIGINT) AS c
        |  FROM h JOIN med USING (event_type) GROUP BY 1, 2),
        |dw AS (SELECT event_type, du, SUM(c) OVER (PARTITION BY event_type
        |  ORDER BY du ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |  AS cum FROM d),
        |mad AS (SELECT dw.event_type,
        |    MIN(CASE WHEN cum >= (n.n + 1) // 2 THEN du END) AS mad
        |  FROM dw JOIN n USING (event_type) GROUP BY 1)
        |SELECT med.event_type, med.n_values, med.med AS median_cents,
        |  mad.mad AS mad_cents,
        |  CAST(SUM(CASE WHEN d.du > 3*mad.mad THEN d.c ELSE 0 END)
        |    AS BIGINT) AS n_outliers
        |FROM d JOIN med USING (event_type) JOIN mad USING (event_type)
        |GROUP BY 1, 2, 3, 4 ORDER BY 1""".stripMargin,
    "q150_iqr_outliers" ->
      """WITH v AS (SELECT event_type,
        |    CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS cent
        |  FROM events WHERE value IS NOT NULL),
        |h AS (SELECT event_type, cent, COUNT(*) AS c FROM v GROUP BY 1, 2),
        |w AS (SELECT event_type, cent, SUM(c) OVER (PARTITION BY event_type
        |  ORDER BY cent ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |  AS cum FROM h),
        |n AS (SELECT event_type, COUNT(*) AS n FROM v GROUP BY 1),
        |q AS (SELECT w.event_type,
        |    MIN(CASE WHEN cum >= (n.n + 3) // 4 THEN cent END) AS q1,
        |    MIN(CASE WHEN cum >= (3*n.n + 3) // 4 THEN cent END) AS q3
        |  FROM w JOIN n USING (event_type) GROUP BY 1)
        |SELECT v.event_type, q.q1, q.q3, q.q3 - q.q1 AS iqr,
        |  CAST(SUM(CASE WHEN 2*v.cent < 2*q.q1 - 3*(q.q3 - q.q1)
        |    OR 2*v.cent > 2*q.q3 + 3*(q.q3 - q.q1) THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_outliers
        |FROM v JOIN q USING (event_type)
        |GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin,
    "q147_skew_report" ->
      """WITH c AS (SELECT user_id, COUNT(*) AS n FROM events GROUP BY 1),
        |t AS (SELECT CAST(SUM(n) AS BIGINT) AS total, COUNT(*) AS n_keys
        |  FROM c),
        |k AS (SELECT user_id, n FROM c
        |  ORDER BY n DESC, user_id NULLS FIRST LIMIT 10)
        |SELECT row_number() OVER (ORDER BY k.n DESC,
        |    k.user_id NULLS FIRST) AS rk,
        |  k.user_id, k.n,
        |  CAST(k.n AS DOUBLE)/CAST(t.total AS DOUBLE) AS share,
        |  t.total, t.n_keys
        |FROM k CROSS JOIN t
        |ORDER BY rk""".stripMargin,
    // One SELECT per check: the row-local ones as conditional sums over
    // orders, uniqueness as count-minus-distinct, the FK as a left join
    // against distinct customer keys — then shared passed/ORDER BY.
    "q123_constraint_suite" ->
      """WITH r AS (
        |  SELECT 'not_null(o_custkey)' AS check_name, COUNT(*) AS n_rows,
        |    CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_violations FROM orders
        |  UNION ALL
        |  SELECT 'unique(o_orderkey)', COUNT(*),
        |    CAST(SUM(CASE WHEN o_orderkey IS NOT NULL THEN 1 ELSE 0 END)
        |      - COUNT(DISTINCT o_orderkey) AS BIGINT) FROM orders
        |  UNION ALL
        |  SELECT 'in_range(o_totalprice,0.0,300000.0)', COUNT(*),
        |    CAST(SUM(CASE WHEN o_totalprice IS NOT NULL AND NOT
        |      (o_totalprice >= 0.0 AND o_totalprice <= 300000.0)
        |      THEN 1 ELSE 0 END) AS BIGINT) FROM orders
        |  UNION ALL
        |  SELECT 'in_set(o_orderstatus:O,F)', COUNT(*),
        |    CAST(SUM(CASE WHEN o_orderstatus IS NOT NULL AND
        |      o_orderstatus NOT IN ('O', 'F') THEN 1 ELSE 0 END)
        |      AS BIGINT) FROM orders
        |  UNION ALL
        |  SELECT 'regex(o_orderpriority:^[1-3]-[A-Z]+$)', COUNT(*),
        |    CAST(SUM(CASE WHEN o_orderpriority IS NOT NULL AND NOT
        |      regexp_matches(o_orderpriority, '^[1-3]-[A-Z]+$')
        |      THEN 1 ELSE 0 END) AS BIGINT) FROM orders
        |  UNION ALL
        |  SELECT 'fk(o_custkey)', COUNT(*),
        |    CAST(SUM(CASE WHEN d.__k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM (SELECT o_custkey FROM orders WHERE o_custkey IS NOT NULL) f
        |  LEFT JOIN (SELECT DISTINCT c_custkey AS __k FROM customer) d
        |    ON f.o_custkey = d.__k)
        |SELECT check_name, n_rows, n_violations,
        |  n_violations = 0 AS passed
        |FROM r ORDER BY check_name""".stripMargin,
    // q133: the identical canonicalize → md5-u32 → exact integer sum,
    // written relationally (chr(1)/chr(2) the separator and null
    // marker; cells LENGTH-PREFIXED — the netstring device — so a
    // value containing chr(1) cannot shift cell boundaries; NULLS
    // FIRST pins the nullable group key against Spark's asc default).
    // The sum accumulates in HUGEINT and renders as the same
    // (digest_hi, digest_lo) BIGINT divmod-2^63 pair as Spark's
    // DECIMAL(38,0) state — the type both engines hash identically.
    "q133_content_digest" ->
      """WITH d AS (SELECT source, COUNT(*) AS n_rows,
        |  CAST(SUM(CAST(CAST(concat('0x', substr(md5(concat_ws(chr(1),
        |    CASE WHEN doc_id IS NULL THEN chr(2) ELSE concat(CAST(length(CAST(doc_id AS VARCHAR)) AS VARCHAR), ':', CAST(doc_id AS VARCHAR)) END,
        |    CASE WHEN text IS NULL THEN chr(2) ELSE concat(CAST(length(text) AS VARCHAR), ':', text) END,
        |    CASE WHEN lang IS NULL THEN chr(2) ELSE concat(CAST(length(lang) AS VARCHAR), ':', lang) END,
        |    CASE WHEN source IS NULL THEN chr(2) ELSE concat(CAST(length(source) AS VARCHAR), ':', source) END,
        |    CASE WHEN n_chars IS NULL THEN chr(2) ELSE concat(CAST(length(CAST(n_chars AS VARCHAR)) AS VARCHAR), ':', CAST(n_chars AS VARCHAR)) END)),
        |    1, 8))
        |    AS BIGINT) AS HUGEINT)) AS HUGEINT) AS digest
        |FROM documents GROUP BY 1)
        |SELECT source, n_rows,
        |  CAST(digest // CAST('9223372036854775808' AS HUGEINT) AS BIGINT)
        |    AS digest_hi,
        |  CAST(digest % CAST('9223372036854775808' AS HUGEINT) AS BIGINT)
        |    AS digest_lo
        |FROM d ORDER BY source NULLS FIRST""".stripMargin,
    // q160: the q149 histogram/rank device + LEAST/GREATEST clamp —
    // integer sums, one (s/n)/100 double edge, same op order
    "q160_winsorized_mean" ->
      """WITH v AS (SELECT event_type,
        |    CAST(FLOOR(value*100 + 0.5) AS BIGINT) AS cent
        |  FROM events WHERE value IS NOT NULL),
        |h AS (SELECT event_type, cent, COUNT(*) AS c FROM v GROUP BY 1, 2),
        |w AS (SELECT event_type, cent, c, SUM(c) OVER (PARTITION BY event_type
        |  ORDER BY cent ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |  AS cum FROM h),
        |n AS (SELECT event_type, COUNT(*) AS n FROM v GROUP BY 1),
        |cuts AS (SELECT w.event_type,
        |    MIN(CASE WHEN cum >= (5*n.n + 99) // 100 THEN cent END) AS lo,
        |    MIN(CASE WHEN cum >= (95*n.n + 99) // 100 THEN cent END) AS hi
        |  FROM w JOIN n USING (event_type) GROUP BY 1)
        |SELECT v.event_type, COUNT(*) AS n_values,
        |  MAX(c.lo) AS lo_unit, MAX(c.hi) AS hi_unit,
        |  (CAST(SUM(LEAST(GREATEST(v.cent, c.lo), c.hi)) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE)) / 100.0 AS winsorized_mean
        |FROM v JOIN cuts c USING (event_type)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // q158: the oracle rebuilds the exact sums from scratch and
    // replays corrFinish's double expression term for term (each
    // decimal→double conversion is value-exact by construction, every
    // subsequent op correctly rounded → bit-identical)
    "q158_incremental_corr" ->
      """WITH st AS (SELECT l_returnflag, COUNT(*) AS n_rows,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS sum_x,
        |  CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DECIMAL(38,6)) AS sum_y,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6)) * CAST(l_quantity AS DECIMAL(18,6))) AS DECIMAL(38,12)) AS sum_xx,
        |  CAST(SUM(CAST(l_discount AS DECIMAL(18,6)) * CAST(l_discount AS DECIMAL(18,6))) AS DECIMAL(38,12)) AS sum_yy,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6)) * CAST(l_discount AS DECIMAL(18,6))) AS DECIMAL(38,12)) AS sum_xy
        | FROM lineitem
        | WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
        | GROUP BY 1),
        |d AS (SELECT l_returnflag, n_rows,
        |  CAST(n_rows AS DOUBLE) AS n, CAST(sum_x AS DOUBLE) AS sx,
        |  CAST(sum_y AS DOUBLE) AS sy, CAST(sum_xx AS DOUBLE) AS sxx,
        |  CAST(sum_yy AS DOUBLE) AS syy, CAST(sum_xy AS DOUBLE) AS sxy
        | FROM st)
        |SELECT l_returnflag, n_rows, sx AS sum_x, sy AS sum_y,
        |  sxy AS sum_xy, sx / n AS mean_x, sy / n AS mean_y,
        |  CASE WHEN n_rows >= 2 AND (n * sxx - sx * sx) > 0
        |            AND (n * syy - sy * sy) > 0
        |    THEN (n * sxy - sx * sy)
        |      / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) END
        |    AS pearson_r,
        |  CASE WHEN n_rows >= 2 AND (n * sxx - sx * sx) > 0
        |    THEN (n * sxy - sx * sy) / (n * sxx - sx * sx) END AS slope,
        |  CASE WHEN n_rows >= 2 AND (n * sxx - sx * sx) > 0
        |    THEN (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx)
        |      / n END AS intercept
        |FROM d ORDER BY l_returnflag""".stripMargin,
    // q157: the oracle computes the full join from scratch — the
    // snapshot-join ∪ delta-terms union must agree row for row
    "q157_incremental_join" ->
      """SELECT o.o_custkey AS custkey, o.o_orderkey,
        |  CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price,
        |  c.c_name
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |ORDER BY o.o_orderkey""".stripMargin,
    // q130: the oracle computes the SAME answer from scratch — one
    // direct GROUP BY over all orders; the merge path must agree
    // bit-for-bit (exact decimal sums, read-time IEEE mean)
    "q130_incremental_agg" ->
      """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |  COUNT(*) AS n_rows,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |    AS DECIMAL(38,2)) AS DOUBLE) AS sum_val,
        |  MIN(o_totalprice) AS min_val,
        |  MAX(o_totalprice) AS max_val,
        |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |    AS DECIMAL(38,2)) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
        |    AS mean_val
        |FROM orders GROUP BY 1 ORDER BY month""".stripMargin,
    // one SELECT per profiled column, min/max on the native type then
    // rendered VARCHAR — mirrors min(col).cast(string)
    "q92_profile" -> {
      def one(c: String) =
        s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows,
           | CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
           | COUNT(DISTINCT $c) AS n_distinct,
           | CAST(MIN($c) AS VARCHAR) AS min_val,
           | CAST(MAX($c) AS VARCHAR) AS max_val FROM documents""".stripMargin
      Seq("doc_id", "text", "lang", "source", "n_chars").map(one)
        .mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
    },
    // Identical quantize → exact DECIMAL sums → fixed double tree.
    "q58_desc_stats" ->
      """WITH m AS (
        |  SELECT l_returnflag, COUNT(*) AS n,
        |    SUM(CAST(FLOOR(CAST(l_extendedprice AS DOUBLE)*100.0 + 0.5)
        |        AS DECIMAL(38,0))) AS s1,
        |    SUM(CAST(FLOOR(CAST(l_extendedprice AS DOUBLE)*100.0 + 0.5) AS DECIMAL(19,0)) *
        |             CAST(FLOOR(CAST(l_extendedprice AS DOUBLE)*100.0 + 0.5) AS DECIMAL(19,0))) AS s2
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, n,
        |  CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) / 100.0 AS mean,
        |  ((CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
        |    - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
        |   / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))) / 10000.0
        |    AS var_samp,
        |  SQRT(((CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
        |    - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
        |   / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) / 10000.0)
        |    AS stddev_pop
        |FROM m ORDER BY l_returnflag""".stripMargin,
    "q59_corr" ->
      """WITH m AS (
        |  SELECT l_returnflag, COUNT(*) AS n,
        |    SUM(CAST(FLOOR(CAST(l_quantity AS DOUBLE)*1.0 + 0.5)
        |        AS DECIMAL(38,0))) AS sx,
        |    SUM(CAST(FLOOR(CAST(l_quantity AS DOUBLE)*1.0 + 0.5) AS DECIMAL(19,0)) *
        |             CAST(FLOOR(CAST(l_quantity AS DOUBLE)*1.0 + 0.5) AS DECIMAL(19,0))) AS sxx,
        |    SUM(CAST(FLOOR(CAST(l_extendedprice AS DOUBLE)*100.0 + 0.5)
        |        AS DECIMAL(38,0))) AS sy,
        |    SUM(CAST(FLOOR(CAST(l_extendedprice AS DOUBLE)*100.0 + 0.5) AS DECIMAL(19,0)) *
        |             CAST(FLOOR(CAST(l_extendedprice AS DOUBLE)*100.0 + 0.5) AS DECIMAL(19,0))) AS syy,
        |    SUM(CAST(FLOOR(CAST(l_quantity AS DOUBLE)*1.0 + 0.5) AS DECIMAL(19,0)) *
        |             CAST(FLOOR(CAST(l_extendedprice AS DOUBLE)*100.0 + 0.5) AS DECIMAL(19,0))) AS sxy
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, n,
        |  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |  / SQRT((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |       * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |          - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS corr
        |FROM m ORDER BY l_returnflag""".stripMargin,
    "q60_median" ->
      """SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS median_qty,
        | COUNT(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin,
    // same md5 cell family for build and probe; min over the 4 rows,
    // empty cells read 0; exact counts from a plain GROUP BY
    "q176_count_min" ->
      """WITH rows_i AS (SELECT unnest(generate_series(0, 3)) AS r),
        |cells AS (SELECT r,
        |    CAST(concat('0x', substr(md5(concat('cms', CAST(r AS VARCHAR),
        |      '#', CAST(o_custkey AS VARCHAR))), 1, 8)) AS BIGINT) % 64
        |      AS bucket,
        |    COUNT(*) AS c
        |  FROM orders, rows_i WHERE o_custkey IS NOT NULL GROUP BY 1, 2),
        |keys AS (SELECT unnest(generate_series(1, 20)) AS k),
        |probes AS (SELECT k, r,
        |    CAST(concat('0x', substr(md5(concat('cms', CAST(r AS VARCHAR),
        |      '#', CAST(k AS VARCHAR))), 1, 8)) AS BIGINT) % 64 AS bucket
        |  FROM keys, rows_i),
        |est AS (SELECT k, MIN(COALESCE(c, 0)) AS e
        |  FROM probes LEFT JOIN cells USING (r, bucket) GROUP BY 1),
        |ex AS (SELECT o_custkey, COUNT(*) AS ec FROM orders GROUP BY 1)
        |SELECT k AS o_custkey, CAST(e AS BIGINT) AS estimate,
        |  CAST(COALESCE(ec, 0) AS BIGINT) AS exact_cnt
        |FROM est LEFT JOIN ex ON est.k = ex.o_custkey
        |ORDER BY o_custkey""".stripMargin,
    // Same KMV estimator replicated relationally: distinct u32 hashes,
    // rank within group, (k-1)*2^32 / kth-min (exact count under k).
    "q66_kmv_distinct" ->
      s"""WITH h AS (SELECT DISTINCT l_returnflag AS grp,
        |    CAST(concat('0x', substr(md5(CAST(l_partkey AS VARCHAR)),1,8)) AS BIGINT) AS hv
        |  FROM lineitem WHERE l_partkey IS NOT NULL),
        |r AS (SELECT grp, hv,
        |    row_number() OVER (PARTITION BY grp ORDER BY hv) AS rn,
        |    COUNT(*) OVER (PARTITION BY grp) AS cnt
        |  FROM h),
        |e AS (SELECT l_returnflag AS grp,
        |    COUNT(DISTINCT l_partkey) AS exact_distinct
        |  FROM lineitem WHERE l_partkey IS NOT NULL GROUP BY 1)
        |SELECT r.grp AS l_returnflag,
        |  CASE WHEN MAX(r.cnt) < $KmvK THEN CAST(MAX(r.cnt) AS DOUBLE)
        |       ELSE ${(KmvK - 1).toLong * 4294967296L}.0
        |            / CAST(MAX(CASE WHEN r.rn = $KmvK THEN r.hv END) AS DOUBLE)
        |  END AS kmv_distinct,
        |  MAX(e.exact_distinct) AS exact_distinct
        |FROM r JOIN e ON r.grp IS NOT DISTINCT FROM e.grp
        |GROUP BY r.grp ORDER BY l_returnflag""".stripMargin,
    "q67_sampled_quantile" ->
      s"""SELECT l_returnflag,
        |  quantile_cont(CAST(FLOOR(CAST(l_extendedprice AS DOUBLE)*100.0
        |    + 0.5) AS BIGINT), 0.5) AS median_price_cents,
        |  COUNT(*) AS n_sampled
        |FROM lineitem
        |WHERE CAST(concat('0x', substr(md5(concat_ws('-',
        |    CAST(l_orderkey AS VARCHAR),
        |    CAST(l_linenumber AS VARCHAR))),1,8)) AS BIGINT)
        |  < $SampleThreshold
        |GROUP BY 1 ORDER BY l_returnflag""".stripMargin,
    "q69_grouped_topk" ->
      """WITH s AS (SELECT l_returnflag, l_partkey,
        |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        |  FROM lineitem GROUP BY 1, 2),
        |r AS (SELECT l_returnflag, l_partkey, qty,
        |    row_number() OVER (PARTITION BY l_returnflag
        |                       ORDER BY qty DESC, l_partkey ASC) AS rank
        |  FROM s)
        |SELECT l_returnflag, rank, l_partkey, qty FROM r
        |WHERE rank <= 5
        |ORDER BY l_returnflag, rank""".stripMargin,
    "q70_heavy_hitters" ->
      """SELECT CAST(l_quantity AS BIGINT) AS l_quantity, COUNT(*) AS cnt
        |FROM lineitem WHERE l_quantity IS NOT NULL
        |GROUP BY 1
        |HAVING COUNT(*) >= CEIL(0.015 *
        |  (SELECT COUNT(*) FROM lineitem WHERE l_quantity IS NOT NULL))
        |ORDER BY l_quantity""".stripMargin)
}
