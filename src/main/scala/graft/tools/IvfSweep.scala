package graft.tools

import org.apache.spark.sql.functions._
import graft.core.GraftSession
import graft.ext.Similarity

/** IVF recall-vs-cost sweep: `runMain graft.tools.IvfSweep [sfDir]
  * [copies]`. Replicates the embeddings table, trains IVF centroids at
  * several (cells, lloyd-iters) points, and reports recall@10 against
  * brute force plus wall time for each nProbe — the table users pick an
  * operating point from. Everything is deterministic (hash-seeded
  * k-means, deterministic replicate ids), so numbers reproduce
  * bit-for-bit run to run. */
object IvfSweep {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.lift(1).map(_.toInt).getOrElse(20)
    val spark = GraftSession.local()
    import spark.implicits._

    // Replicate WITH deterministic per-component hash noise (±1 sigma
    // of the base data's component spread): exact replicate() twins
    // would sit in the query's own cell and every recall would read a
    // meaningless 1.000 — perturbed copies scatter across cell
    // boundaries like a real corpus.
    val noisy = ScaleProbe.replicate(GraftSession.table(spark, sfDir, "embeddings")
      .select("vec_id", "embedding", "label"), "vec_id", copies)
      .withColumn("embedding",
        transform(col("embedding"), (x, i) => x +
          (pmod(xxhash64(col("vec_id"), i), lit(20001L)) - lit(10000L))
            .cast("double") / lit(10000.0) * lit(0.12)))
    val emb = noisy.cache()
    val n = emb.count()
    val isQuery = col("vec_id") < 50
    val k = 10

    def topSets(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Int)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

    val t0 = System.nanoTime()
    val brute = topSets(Similarity.bruteForceTopK(emb,
      emb.filter(isQuery), "vec_id", "embedding", k))
    val bruteSec = (System.nanoTime() - t0) / 1e9
    println(f"[ivf] vectors=$n brute_force_baseline ${bruteSec}%.2f s (50 queries, k=$k)")

    def recall(got: Map[Long, Set[Long]]): Double =
      brute.map { case (q, t) =>
        got.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
      }.sum / brute.size

    for (cells <- Seq(64, 200); iters <- Seq(0, 2)) {
      val tTrain = System.nanoTime()
      val cents = Similarity.trainCentroids(emb, "vec_id", "embedding",
        k = cells, iters = iters).cache()
      cents.count()
      val trainSec = (System.nanoTime() - tTrain) / 1e9
      for (nProbe <- Seq(1, 2, 4, 8)) {
        val tQ = System.nanoTime()
        val got = topSets(Similarity.ivfTopKProbed(emb, "vec_id",
          "embedding", cents, isQuery, k = k, nProbe = nProbe))
        val qSec = (System.nanoTime() - tQ) / 1e9
        println(f"[ivf] cells=$cells%-4d iters=$iters nProbe=$nProbe " +
          f"recall=${recall(got)}%.3f query=${qSec}%5.2f s train=${trainSec}%5.2f s")
      }
      cents.unpersist()
    }
    spark.stop()
  }
}
