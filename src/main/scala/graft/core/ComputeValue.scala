package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Orange's lazy column-expression IR — `Variable.compute_value`
  * (reference Orange/preprocess/transformation.py:15-339) — as a small
  * ADT that lowers to Catalyst `Column`s.
  *
  * In the reference, a derived column is a closure evaluated recursively
  * by `Table.from_table` (table.py:778-874) in 5000-row chunks; here the
  * whole derivation DAG flattens into ONE `select` of Column trees, so
  * Catalyst sees everything (CSE, pushdown, codegen) and the transform
  * stays a zero-shuffle projection regardless of derivation depth —
  * exactly the "flattened select per transform" called out in SURVEY §7.
  */
object ComputeValue {

  sealed trait CV { def lower(src: String => Column): Column }

  /** Passthrough/rename (transformation.py:84-96). */
  final case class Identity(source: String) extends CV {
    def lower(src: String => Column): Column = src(source)
  }

  /** One-hot 0/1 (or −1/1) for one value, NaN/NULL-propagating
    * (transformation.py:100-173). */
  final case class Indicator(source: String, value: Any,
      negative: Boolean = false) extends CV {
    def lower(src: String => Column): Column = {
      val c = src(source)
      val no = if (negative) lit(-1) else lit(0)
      when(c.isNull, null).otherwise(when(c === lit(value), 1).otherwise(no))
    }
  }

  /** (x − offset) · factor (transformation.py:176-208). */
  final case class Normalizer(source: String, offset: Double, factor: Double)
      extends CV {
    def lower(src: String => Column): Column = (src(source) - offset) * factor
  }

  /** Dictionary recode with optional default (transformation.py:211-339,
    * Lookup + MappingTransform unified; unknown key → default). */
  final case class Mapping(source: String, mapping: Map[String, String],
      default: Option[String] = None) extends CV {
    def lower(src: String => Column): Column = {
      val c = src(source)
      val base: Column = default.map(lit(_)).getOrElse(lit(null).cast("string"))
      mapping.toSeq.sortBy(_._1).reverse.foldLeft(base) {
        case (els, (k, v)) => when(c === k, v).otherwise(els)
      }
    }
  }

  /** Threshold discretizer with Orange's bin labels `< a`, `a - b`, `≥ b`
    * (preprocess/discretize.py:25-148). */
  final case class Discretizer(source: String, thresholds: Seq[Double])
      extends CV {
    def lower(src: String => Column): Column = {
      val c = src(source)
      val labels = Discretizer.labels(thresholds)
      val base = lit(labels.last)
      thresholds.zipWithIndex.reverse.foldLeft(base) {
        case (els, (t, i)) => when(c < t, labels(i)).otherwise(els)
      }
    }
  }
  object Discretizer {
    def labels(ts: Seq[Double]): Seq[String] =
      if (ts.isEmpty) Seq("all")
      else (s"< ${ts.head}" +:
        ts.sliding(2).filter(_.size == 2).map(p => s"${p(0)} - ${p(1)}").toSeq) :+
        s"≥ ${ts.last}"
  }

  /** Escape hatch: any Spark SQL scalar expression over source columns —
    * Orange's FeatureFunc (§2.7) parsed by Spark's own SQL parser. */
  final case class SqlExpr(sql: String) extends CV {
    def lower(src: String => Column): Column = expr(sql)
  }

  /** A derived variable: target name + derivation. */
  final case class Derived(name: String, cv: CV)

  /** Orange `Table.transform(domain)`: one flattened select computing
    * every target variable (kept columns referenced by Identity). */
  def domainTransform(df: DataFrame, targets: Seq[Derived]): DataFrame = {
    val src: String => Column = col(_)
    df.select(targets.map(t => t.cv.lower(src).as(t.name)): _*)
  }
}
