package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge lists (the companion of
  * [[Dedup.connectedComponents]]' label propagation): weighted PageRank
  * by power iteration — the centrality signal a curation pipeline reads
  * off link/citation/transition graphs (seed-page quality, crawl
  * prioritization; Page et al. 1999).
  */
object Graph {

  /** Weighted PageRank, `iters` rounds of power iteration:
    *
    * {{{ r'(v) = (1-d)/N + d * Σ_{u→v} r(u) · w(u→v) / wout(u) }}}
    *
    * Dangling vertices (no out-edges) simply leak their damped mass —
    * the common simplification; redistribute beforehand if the sum
    * must stay 1. Multi-edges are pre-summed per (src, dst).
    *
    * Scale shape: each round is ONE shuffle (contributions grouped by
    * target); ranks and the normalized edge list stay keyed the same
    * way round over round, and each round's result is materialized
    * through [[org.apache.spark.sql.graftshim.CheckpointShim]] so the
    * plan does not nest `iters` deep (the CC lesson: lineage, not
    * data, is what kills iterative jobs). Edges are cached once;
    * out-weight normalization is a second one-off shuffle.
    *
    * `exactFold = true` folds each target's contributions ascending by
    * source id — bit-reproducible across engines and partitionings
    * (the oracle mode, q140), at the price of materializing a
    * per-target contribution array (memory ∝ in-degree: fine for
    * type/category graphs, wrong for power-law web graphs). The
    * default float `sum` keeps partial aggregation — the 100 TB path —
    * and is exact-modulo-summation-order.
    *
    * For bit-exactness keep `weightCol` integral (LONG counts): the
    * out-weight sums stay exact and every division is one IEEE op.
    *
    * @return (id, rank) for every vertex appearing in any edge
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      weightCol: Option[String] = None, damping: Double = 0.85,
      iters: Int = 10, exactFold: Boolean = false): DataFrame = {
    require(iters >= 0, "iters must be >= 0")
    require(damping >= 0.0 && damping <= 1.0, "damping must be in [0,1]")
    val w0 = weightCol.map(col).getOrElse(lit(1L))
    val e0 = edges
      .filter(col(srcCol).isNotNull && col(dstCol).isNotNull)
      .groupBy(col(srcCol).as("__src"), col(dstCol).as("__dst"))
      .agg(sum(w0).as("__w"))
    val out = e0.groupBy("__src").agg(sum(col("__w")).as("__wout"))
    val eNorm = e0.join(out, "__src")
      .select(col("__src"), col("__dst"),
        (col("__w").cast("double") / col("__wout").cast("double"))
          .as("__p"))
      .cache()
    val nodes = eNorm.select(col("__src").as("id"))
      .unionByName(eNorm.select(col("__dst").as("id")))
      .distinct().cache()
    val n = nodes.count()
    val base = (1.0 - damping) / n.toDouble
    var ranks = nodes.select(col("id"),
      lit(1.0 / n.toDouble).as("rank"))
    var prevRdd: Option[org.apache.spark.rdd.RDD[_]] = None
    var i = 0
    while (i < iters) {
      val contrib = eNorm
        .join(ranks.select(col("id").as("__rid"), col("rank")),
          col("__src") === col("__rid"))
        .select(col("__dst"), col("__src"),
          (col("rank") * col("__p")).as("__c"))
      val sums =
        if (exactFold)
          contrib.groupBy("__dst").agg(
            aggregate(
              transform(
                sort_array(collect_list(
                  struct(col("__src").as("s"), col("__c").as("c")))),
                x => x("c")),
              lit(0.0), (acc, x) => acc + x).as("__s"))
        else
          contrib.groupBy("__dst").agg(sum(col("__c")).as("__s"))
      val next = nodes
        .join(sums, col("id") === col("__dst"), "left")
        .select(col("id"),
          (lit(base) + lit(damping) * coalesce(col("__s"), lit(0.0)))
            .as("rank"))
      val (mat, rdd) =
        org.apache.spark.sql.graftshim.CheckpointShim.materialize(next)
      prevRdd.foreach(_.unpersist())
      prevRdd = Some(rdd)
      ranks = mat
      i += 1
    }
    ranks
  }
}
