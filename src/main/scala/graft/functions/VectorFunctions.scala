package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` / `array<double>` embedding
  * columns — the similarity-search primitives (BASELINE.json north star).
  *
  * Built on higher-order array functions; [[graft.functions.expressions.CosineSimilarity]]
  * provides a codegen'd fast path for the hot loop (see `cosineFast`).
  */
object VectorFunctions {

  private def d(a: Column): Column = transform(a, _.cast("double"))

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(d(a), d(b), _ * _), lit(0.0), _ + _)

  def norm(a: Column): Column =
    sqrt(aggregate(transform(d(a), x => x * x), lit(0.0), _ + _))

  /** Cosine similarity; null-safe on zero norms (returns null). */
  def cosine(a: Column, b: Column): Column = {
    val den = norm(a) * norm(b)
    when(den =!= 0.0, dot(a, b) / den)
  }

  /** Squared L2 distance. */
  def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(d(a), d(b), (x, y) => (x - y) * (x - y)), lit(0.0), _ + _)

  /** Deterministic pseudo-random hyperplane component for plane `p`,
    * dimension `i`: md5-derived value in [-0.5, 0.5). Lets every executor
    * (and any other engine) regenerate identical hyperplanes without
    * shipping them. */
  def hyperplaneComponent(p: Int, i: Column): Column =
    (conv(substring(md5(concat(lit(s"hp${p}_"), i.cast("string"))), 1, 6), 16, 10)
      .cast("double") / lit(16777216.0)) - lit(0.5)

  /** Sign bit of the projection of `vec` onto deterministic hyperplane
    * `p` — one bit of a random-hyperplane LSH signature. */
  def hyperplaneBit(vec: Column, p: Int): Column = {
    val proj = aggregate(
      zip_with(d(vec), sequence(lit(0), size(vec) - 1),
        (x, i) => x * hyperplaneComponent(p, i)),
      lit(0.0), _ + _)
    when(proj >= 0, lit(1)).otherwise(lit(0))
  }

  /** `nBits`-bit random-hyperplane LSH bucket id for a vector. Vectors at
    * small angles collide with high probability — the bucket is the ANN
    * pre-filter (Charikar's SimHash for angular distance). */
  def lshBucket(vec: Column, nBits: Int): Column =
    (0 until nBits).map(p => hyperplaneBit(vec, p) * lit(1L << p))
      .reduce(_ + _)
}
