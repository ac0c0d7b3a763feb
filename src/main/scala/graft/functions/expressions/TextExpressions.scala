package graft.functions.expressions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native shingling for the dedup hot path.
  *
  * `TextFunctions.shingles(tokens(text), n)` composes four higher-order /
  * collection expressions (split → sequence → transform(slice+array_join)
  * → array_distinct) that are interpreted per row and allocate one slice
  * array per shingle; at corpus scale the shingle explode dominates the
  * whole MinHash pipeline (BENCH: ~4 s of q35's 9.6 s at sf0.1 was this
  * composition). This expression produces the identical distinct-shingle
  * array in ONE pass over the text.
  *
  * Value-identical to the composition it replaces (and therefore to the
  * DuckDB oracle CTE) for NON-NULL text: whitespace regex split with
  * Java `-1` limit semantics, space-joined n-gram windows,
  * first-occurrence-order distinct, whole-doc fallback shingle for
  * documents with < n tokens. NULL text differs deliberately: this
  * expression null-propagates (standard Spark unary semantics — the row
  * contributes no shingles downstream), where the old composition
  * produced the single-element array `[null]`, grouping all null-text
  * docs under one null shingle in dedup pipelines.
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(s: Any): Any =
    TextExprHelpers.wordShingles(s.asInstanceOf[UTF8String], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.TextExprHelpers" +
        s".wordShingles($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Static helpers callable from generated code. */
object TextExprHelpers {

  private val Ws = java.util.regex.Pattern.compile("\\s+")

  /** Distinct space-joined word n-grams of `text`; < n tokens collapse to
    * one whole-doc shingle. Identical to
    * `array_distinct(transform(...))` over `split(text, "\\s+")`. */
  def wordShingles(text: UTF8String, n: Int): ArrayData = {
    // Pattern.split(input, -1) == String.split("\\s+", -1) == the split()
    // builtin's UTF8String.split semantics (leading empty token kept)
    val toks = Ws.split(text.toString, -1)
    val m = toks.length
    if (m < n) {
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i < m) {
        if (i > 0) sb.append(' ')
        sb.append(toks(i)); i += 1
      }
      new GenericArrayData(Array[Any](UTF8String.fromString(sb.toString)))
    } else {
      val seen = new java.util.LinkedHashSet[String](math.max(8, m * 2))
      var i = 0
      while (i <= m - n) {
        val sb = new java.lang.StringBuilder
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j)); j += 1
        }
        seen.add(sb.toString)
        i += 1
      }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var k = 0
      while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
      new GenericArrayData(out)
    }
  }
}

object TextExpressions {

  /** Register as SQL temp functions (same route as VectorExpressions:
    * Spark 4 removed public Expression→Column construction). Delegates to
    * the shared GraftFunctions list. */
  def ensureRegistered(spark: SparkSession): Unit =
    graft.functions.GraftFunctions.register(spark)

  def wordShingles(spark: SparkSession, text: Column, n: Int): Column = {
    ensureRegistered(spark)
    call_function("graft_shingles", text, org.apache.spark.sql.functions.lit(n))
  }
}
