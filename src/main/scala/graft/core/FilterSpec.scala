package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dynamic predicate DSL: a data-described filter compiled to a Catalyst
  * [[Column]], the Spark-native equivalent of the reference's
  * `sqlalchemy_filters.apply_filters` surface
  * (`/root/reference/clinpy/assays/variants.py:53-80`).
  *
  * Because the spec compiles to ordinary `Column` expressions the resulting
  * predicate participates fully in Catalyst pushdown — at scale the filter
  * lands in the Parquet scan, not in a post-read stage.
  */
final case class FilterSpec(field: String, op: String, value: Any = null) {

  /** Scalar → lit; Seq → array literal (genotype specs like `gt = [0,1]`
    * compare against array columns). */
  private def valueLit(v: Any): Column = v match {
    case s: Seq[_]   => array(s.map(x => lit(x)): _*)
    case a: Array[_] => array(a.toSeq.map(x => lit(x)): _*)
    case other       => lit(other)
  }

  def toColumn: Column = {
    val c = col(field)
    op.toLowerCase match {
      case "==" | "=" | "eq"        => c === valueLit(value)
      case "!=" | "<>" | "ne"       => c =!= valueLit(value)
      case ">" | "gt"               => c > lit(value)
      case ">=" | "ge" | "gte"      => c >= lit(value)
      case "<" | "lt"               => c < lit(value)
      case "<=" | "le" | "lte"      => c <= lit(value)
      case "in"                     => c.isin(FilterSpec.values(value): _*)
      case "not_in" | "nin"         => !c.isin(FilterSpec.values(value): _*)
      case "like"                   => c.like(String.valueOf(value))
      case "ilike"                  => c.ilike(String.valueOf(value))
      case "is_null"                => c.isNull
      case "is_not_null"            => c.isNotNull
      case "between" =>
        FilterSpec.values(value) match {
          case Seq(lo, hi) => c.between(lit(lo), lit(hi))
          case other => throw new IllegalArgumentException(
            s"between expects [lo, hi], got $other")
        }
      case other =>
        throw new IllegalArgumentException(s"unsupported filter op: $other")
    }
  }
}

object FilterSpec {
  private def values(v: Any): Seq[Any] = v match {
    case s: Seq[_]   => s
    case a: Array[_] => a.toSeq
    case other       => Seq(other)
  }

  /** AND-combine a list of specs (the reference applies spec lists
    * conjunctively). Empty list compiles to TRUE. */
  def and(specs: Seq[FilterSpec]): Column =
    specs.map(_.toColumn).reduceOption(_ && _).getOrElse(lit(true))

  /** OR-combine. */
  def or(specs: Seq[FilterSpec]): Column =
    specs.map(_.toColumn).reduceOption(_ || _).getOrElse(lit(false))
}
