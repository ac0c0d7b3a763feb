package graft.functions.expressions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expressions for the dense-vector hot loops (SURVEY §4.4
  * preference order: custom `Expression` with codegen before anything
  * else). The higher-order-function formulations in
  * [[graft.functions.VectorFunctions]] are CodegenFallback-interpreted and
  * allocate per element; these generate a tight primitive loop inside
  * whole-stage codegen — the difference is ~10× on pairwise similarity
  * scans (see BENCH history).
  *
  * Both operands must be array<double>; summation is sequential in element
  * order, bit-identical to the `aggregate(zip_with(...))` forms they
  * replace.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  // operands must already be array<double> (callers cast; see
  // VectorFunctions.cosineFast)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_similarity"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < n) {
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; nx += xi * xi; ny += yi * yi; i += 1
    }
    val den = math.sqrt(nx) * math.sqrt(ny)
    if (den == 0.0) null else java.lang.Double.valueOf(dot / den)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |int n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double dot = 0.0, nx = 0.0, ny = 0.0;
         |for (int i = 0; i < n; i++) {
         |  double xi = $a.getDouble(i); double yi = $b.getDouble(i);
         |  dot += xi * yi; nx += xi * xi; ny += yi * yi;
         |}
         |double den = java.lang.Math.sqrt(nx) * java.lang.Math.sqrt(ny);
         |if (den == 0.0) { ${ev.isNull} = true; }
         |else { ${ev.value} = dot / den; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(newLeft, newRight)
}

/** Plain dot product, same contract as [[CosineSimilarity]]. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var i = 0
    while (i < n) { dot += x.getDouble(i) * y.getDouble(i); i += 1 }
    java.lang.Double.valueOf(dot)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |int n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double dot = 0.0;
         |for (int i = 0; i < n; i++) { dot += $a.getDouble(i) * $b.getDouble(i); }
         |${ev.value} = dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(newLeft, newRight)
}

object VectorExpressions {

  /** Register as SQL temp functions (Spark 4 removed public
    * Expression→Column construction; the registry + call_function is the
    * supported route). Delegates to the shared GraftFunctions list so
    * DataFrame helpers and injected-extension sessions stay in sync. */
  def ensureRegistered(spark: SparkSession): Unit =
    graft.functions.GraftFunctions.register(spark)

  def cosine(spark: SparkSession, a: Column, b: Column): Column = {
    ensureRegistered(spark)
    call_function("graft_cosine", a, b)
  }

  def dot(spark: SparkSession, a: Column, b: Column): Column = {
    ensureRegistered(spark)
    call_function("graft_dot", a, b)
  }
}
