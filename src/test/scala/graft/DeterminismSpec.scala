package graft

/** Double-run identity for the queries whose output depends on ordering
  * or hashing decisions (ranking ANN, LSH, sampling) — the residual
  * flake risk for the driver's hash compare. Any nondeterminism (RNG,
  * partition-order dependence, float tie instability) shows up here
  * before it shows up in a round. */
class DeterminismSpec extends SparkSpecBase {
  private val sf = "/root/testdata/sf0.001"
  private val risky = Seq("q40_cosine_topk", "q43_ivf_ann", "q41_lsh_buckets",
    "q35_minhash_lsh", "q37_simhash", "q29_stratified_sample",
    "q44_fraction_sample", "q26_asof")

  risky.foreach { name =>
    test(s"$name is run-to-run identical") {
      val fn = SparkEntry.queries(name)
      val a = fn(spark, sf).collect().map(_.toString).toSeq
      val b = fn(spark, sf).collect().map(_.toString).toSeq
      assert(a == b)
      assert(a.nonEmpty || name == "q44_fraction_sample") // tiny sf may sample few
    }
  }
}
