package graft.tools
import org.apache.spark.sql.functions._
import graft.core.GraftSession
import graft.ext.Similarity
object OpqProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("8")
    import spark.implicits._
    val d = 32; val decay = 0.4; val m = 4; val ksub = 16
    val mix = Array.tabulate(d, d)((i, j) => math.sin(i * d + j + 1) / 2.0)
    val scales = Array.tabulate(d)(i => math.pow(decay, i))
    val vecs = (0 until 600).map { r =>
      val z = Array.tabulate(d)(i => math.sin(r * 37 + i * 11 + 0.5) + math.sin(r * 101 + i * 29))
      (r.toLong, Array.tabulate(d)(i => (0 until d).map(j => mix(i)(j) * scales(j) * z(j)).sum))
    }.toDF("vec_id", "embedding").cache()
    def distortion(df: org.apache.spark.sql.DataFrame, vcol: String,
        cb: org.apache.spark.sql.DataFrame): Double = {
      val cbm = cb.collect().map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2)))
        .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toArray).toMap
      val sub = d / m
      Similarity.pqEncode(df, "vec_id", vcol, cb)
        .select(col(vcol).cast("array<double>"), col("pq_code")).collect()
        .map { r =>
          val x = r.getSeq[Double](0); val code = r.getSeq[Long](1)
          (0 until m).map { s =>
            val cw = cbm(s)(code(s).toInt)
            (0 until sub).map(i => { val t = x(s * sub + i) - cw(i); t * t }).sum
          }.sum
        }.sum / df.count()
    }
    val cb = Similarity.pqTrain(vecs, "vec_id", "embedding", m = m, ksub = ksub, iters = 2)
    val dPq = distortion(vecs, "embedding", cb)
    val rot = Similarity.opqRotation(vecs, "vec_id", "embedding", m = m)
    val rotated = Similarity.rotate(vecs, "embedding", rot, "rvec").cache()
    val cbR = Similarity.pqTrain(rotated, "vec_id", "rvec", m = m, ksub = ksub, iters = 2)
    val dOpq = distortion(rotated, "rvec", cbR)
    println(f"[opq] distortion pq=$dPq%.5f opq=$dOpq%.5f ratio=${dOpq/dPq}%.3f")
    spark.stop()
  }
}
