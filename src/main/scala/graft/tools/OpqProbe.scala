package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.GraftSession
import graft.ext.Similarity

/** OPQ rotation probe: quantization distortion with and without the
  * learned rotation on an anisotropic correlated corpus (numbers quoted
  * in BENCH.md). The corpus generator and the distortion metric live
  * here and are SHARED with ExtSpec's OPQ test — one definition, so the
  * probe's published numbers and the spec's asserted ones can't drift. */
object OpqProbe {

  /** Deterministic anisotropic corpus: a steep variance spectrum
    * (pow(decay, i)) pushed through a FIXED dense mixing matrix so the
    * variance spreads across every PQ subspace boundary — the case plain
    * PQ splits badly and a rotation provably helps. sin-hash
    * "gaussians", so every run is exact, not statistical. */
  def anisotropicVecs(n: Int, d: Int,
      decay: Double): Seq[(Long, Array[Double])] = {
    val mix = Array.tabulate(d, d)((i, j) => math.sin(i * d + j + 1) / 2.0)
    val scales = Array.tabulate(d)(i => math.pow(decay, i))
    (0 until n).map { r =>
      val z = Array.tabulate(d)(i => math.sin(r * 37 + i * 11 + 0.5) +
        math.sin(r * 101 + i * 29))
      (r.toLong, Array.tabulate(d)(i =>
        (0 until d).map(j => mix(i)(j) * scales(j) * z(j)).sum))
    }
  }

  /** Mean squared reconstruction error of a trained codebook over the
    * corpus — the OPQ paper's objective. */
  def distortion(df: DataFrame, vcol: String, cb: DataFrame,
      d: Int, m: Int): Double = {
    val cbm = cb.collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toArray).toMap
    val sub = d / m
    Similarity.pqEncode(df, "vec_id", vcol, cb)
      .select(col(vcol).cast("array<double>"), col("pq_code"))
      .collect()
      .map { r =>
        val x = r.getSeq[Double](0); val code = r.getSeq[Long](1)
        (0 until m).map { s =>
          val cw = cbm(s)(code(s).toInt)
          (0 until sub).map(i => { val t = x(s * sub + i) - cw(i); t * t }).sum
        }.sum
      }.sum / df.count()
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("8")
    import spark.implicits._
    val d = 32; val m = 4; val ksub = 16
    val vecs = anisotropicVecs(600, d, decay = 0.4)
      .toDF("vec_id", "embedding").cache()
    val cb = Similarity.pqTrain(vecs, "vec_id", "embedding",
      m = m, ksub = ksub, iters = 2)
    val dPq = distortion(vecs, "embedding", cb, d, m)
    val rot = Similarity.opqRotation(vecs, "vec_id", "embedding", m = m)
    val rotated = Similarity.rotate(vecs, "embedding", rot, "rvec").cache()
    val cbR = Similarity.pqTrain(rotated, "vec_id", "rvec",
      m = m, ksub = ksub, iters = 2)
    val dOpq = distortion(rotated, "rvec", cbR, d, m)
    println(f"[opq] distortion pq=$dPq%.5f opq=$dOpq%.5f ratio=${dOpq / dPq}%.3f")
    spark.stop()
  }
}
