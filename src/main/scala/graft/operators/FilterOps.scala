package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Orange's row-filter algebra (reference: Orange/data/filter.py:41-554,
  * vectorized at Orange/data/table.py:1743-2030), re-expressed as a small
  * ADT that lowers to a single Catalyst boolean [[Column]].
  *
  * Because the whole tree becomes one predicate, Catalyst pushes it into
  * the parquet scan (PushedFilters) — nothing here ever materializes an
  * intermediate mask the way the reference's NumPy indicator vectors do,
  * so the operator is shuffle-free and scan-bound at any scale.
  *
  * Null semantics: Orange treats "unknown == unknown" as true in
  * SameValue when matching the missing value (Orange/data/variable.py:
  * 226-236); we expose that as `nullSafe` using SQL `<=>`.
  */
object FilterOps {

  sealed trait OFilter { def toColumn: Column }

  /** Rows with no missing value in the given columns (filter.py:41-84). */
  final case class IsDefined(cols: Seq[String]) extends OFilter {
    def toColumn: Column = cols.map(col(_).isNotNull).reduce(_ && _)
  }

  /** Equality on one column; nullSafe reproduces Orange's
    * unknown-equals-unknown (filter.py:143-198). */
  final case class SameValue(column: String, value: Any, nullSafe: Boolean = false)
      extends OFilter {
    def toColumn: Column =
      if (nullSafe) col(column) <=> lit(value) else col(column) === lit(value)
  }

  /** Discrete membership: value ∈ set (filter.py:272-301). */
  final case class FilterDiscrete(column: String, values: Seq[Any]) extends OFilter {
    def toColumn: Column = col(column).isin(values: _*)
  }

  /** Continuous comparisons (filter.py:304-397). */
  sealed trait ContOp
  object ContOp {
    case object Equal extends ContOp;   case object NotEqual extends ContOp
    case object Less extends ContOp;    case object LessEqual extends ContOp
    case object Greater extends ContOp; case object GreaterEqual extends ContOp
    case object Between extends ContOp; case object Outside extends ContOp
    case object IsDefined extends ContOp
  }
  final case class FilterContinuous(column: String, op: ContOp,
      ref: Double = 0d, max: Double = 0d) extends OFilter {
    def toColumn: Column = {
      val c = col(column)
      op match {
        case ContOp.Equal        => c === ref
        case ContOp.NotEqual     => c =!= ref
        case ContOp.Less         => c < ref
        case ContOp.LessEqual    => c <= ref
        case ContOp.Greater     => c > ref
        case ContOp.GreaterEqual => c >= ref
        case ContOp.Between      => c.between(ref, max)
        case ContOp.Outside      => !c.between(ref, max)
        case ContOp.IsDefined    => c.isNotNull
      }
    }
  }

  /** String comparisons incl. Contains/StartsWith/EndsWith and
    * case-insensitive variants (filter.py:400-501). */
  sealed trait StrOp
  object StrOp {
    case object Equal extends StrOp;    case object NotEqual extends StrOp
    case object Less extends StrOp;     case object LessEqual extends StrOp
    case object Greater extends StrOp;  case object GreaterEqual extends StrOp
    case object Between extends StrOp;  case object Outside extends StrOp
    case object Contains extends StrOp; case object NotContain extends StrOp
    case object StartsWith extends StrOp; case object NotStartsWith extends StrOp
    case object EndsWith extends StrOp;   case object NotEndsWith extends StrOp
    case object IsDefined extends StrOp;  case object NotIsDefined extends StrOp
  }
  final case class FilterString(column: String, op: StrOp,
      ref: String = "", max: String = "", caseSensitive: Boolean = true)
      extends OFilter {
    def toColumn: Column = {
      val c0 = col(column)
      val (c, r, m) =
        if (caseSensitive) (c0, lit(ref), lit(max))
        else (lower(c0), lit(ref.toLowerCase), lit(max.toLowerCase))
      op match {
        case StrOp.Equal         => c === r
        case StrOp.NotEqual      => c =!= r
        case StrOp.Less          => c < r
        case StrOp.LessEqual     => c <= r
        case StrOp.Greater      => c > r
        case StrOp.GreaterEqual  => c >= r
        case StrOp.Between       => c >= r && c <= m
        case StrOp.Outside       => !(c >= r && c <= m)
        case StrOp.Contains      => c.contains(r)
        case StrOp.NotContain    => !c.contains(r)
        case StrOp.StartsWith    => c.startsWith(r)
        case StrOp.NotStartsWith => !c.startsWith(r)
        case StrOp.EndsWith      => c.endsWith(r)
        case StrOp.NotEndsWith   => !c.endsWith(r)
        case StrOp.IsDefined     => c0.isNotNull
        case StrOp.NotIsDefined  => c0.isNull
      }
    }
  }

  /** Membership in a string list, optional case-insensitivity
    * (filter.py:503-542). */
  final case class FilterStringList(column: String, values: Seq[String],
      caseSensitive: Boolean = true) extends OFilter {
    def toColumn: Column =
      if (caseSensitive) col(column).isin(values: _*)
      else lower(col(column)).isin(values.map(_.toLowerCase): _*)
  }

  /** Regex search semantics (re.search, not full match) — filter.py:544-554. */
  final case class FilterRegex(column: String, pattern: String) extends OFilter {
    def toColumn: Column = col(column).rlike(pattern)
  }

  /** AND/OR conjunction tree with negation (filter.py:200-244). */
  final case class Values(children: Seq[OFilter],
      conjunction: Boolean = true, negate: Boolean = false) extends OFilter {
    def toColumn: Column = {
      val combined =
        if (conjunction) children.map(_.toColumn).reduce(_ && _)
        else children.map(_.toColumn).reduce(_ || _)
      if (negate) !combined else combined
    }
  }

  /** Apply a filter tree to a DataFrame — one Catalyst predicate. */
  def apply(df: DataFrame, f: OFilter): DataFrame = df.filter(f.toColumn)
}
