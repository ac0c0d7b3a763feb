package graft.tools

import graft.SparkEntry
import graft.core.GraftSession

/** Plan inspector: `runMain graft.tools.Explain <sfDir> <query...>` prints
  * the formatted physical plan of each named query (all queries if none
  * given). Used to keep plans honest: pushed filters, broadcast joins,
  * no cartesian products, codegen coverage. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.local("8")
    names.foreach { n =>
      println(s"\n===== $n =====")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
