package graft.tools
import org.apache.spark.sql.functions._
import graft.core.GraftSession
import graft.ext.Similarity
object PqProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local("8")
    import spark.implicits._
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").cache()
    val isQuery = $"vec_id" < 50
    def topSets(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Int)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val brute = topSets(Similarity.bruteForceTopK(emb, emb.filter(isQuery), "vec_id", "embedding", 5))
    def recall(got: Map[Long, Set[Long]]) = brute.map { case (q, t) =>
      got.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size }.sum / brute.size
    for (m <- Seq(8, 16, 32); ksub <- Seq(16, 32)) {
      val cb = Similarity.pqTrain(emb, "vec_id", "embedding", m = m, ksub = ksub, iters = 2)
      val rAdc = recall(topSets(Similarity.pqTopKAdc(emb, "vec_id", "embedding", cb, isQuery, 5)))
      val r50 = recall(topSets(Similarity.pqTopKRerank(emb, "vec_id", "embedding", cb, isQuery, 5, 50)))
      println(f"[pq] m=$m%2d ksub=$ksub%2d adc@5=$rAdc%.3f rerank50=$r50%.3f")
    }
    spark.stop()
  }
}
