package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verified operator query: a Spark builder + (optionally) the
  * equivalent ANSI SQL for the DuckDB oracle. Column aliases MUST match
  * between the two — the driver sorts columns by name before hashing. */
final case class Q(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** SQL-text twins of graft.core.Tables' deterministic aggregates, used to
  * generate oracle SQL that is bit-identical to the Spark plan's output. */
object SqlGen {
  def sqlSum(x: String): String =
    s"CAST(SUM(CAST(($x) AS DECIMAL(38,6))) AS DOUBLE)"
  def sqlMean(x: String): String = s"${sqlSum(x)} / COUNT($x)"
  /** (Σx² − (Σx)²/n) / (n−1) — matches Tables.exactVarSamp. */
  def sqlVarSamp(x: String): String =
    s"(${sqlSum(s"($x)*($x)")} - ${sqlSum(x)} * ${sqlSum(x)} / COUNT($x)) / (COUNT($x) - 1)"
  def sqlStdSamp(x: String): String = s"SQRT(${sqlVarSamp(x)})"
  def sqlCorr(x: String, y: String): String = {
    val n = s"CAST(COUNT(${x}) AS DOUBLE)"
    val sx = sqlSum(x); val sy = sqlSum(y)
    val sxx = sqlSum(s"($x)*($x)"); val syy = sqlSum(s"($y)*($y)")
    val sxy = sqlSum(s"($x)*($y)")
    s"($n * $sxy - $sx * $sy) / (SQRT($n * $sxx - $sx * $sx) * SQRT($n * $syy - $sy * $sy))"
  }
  def sqlCovarSamp(x: String, y: String): String = {
    val n = s"CAST(COUNT(${x}) AS DOUBLE)"
    s"(${sqlSum(s"($x)*($y)")} - ${sqlSum(x)} * ${sqlSum(y)} / $n) / ($n - 1)"
  }
  /** SQL twin of Tables.detSum: order-independent sum of derived doubles. */
  def sqlDetSum(term: String): String =
    s"CAST(SUM(CAST(ROUND($term, 12) AS DECIMAL(38,14))) AS DOUBLE)"
  /** Twin of Tables.detSum(term, scale) — coarse grid for big terms. */
  def sqlDetSum(term: String, scale: Int): String =
    s"CAST(SUM(CAST(ROUND($term, $scale) AS DECIMAL(38,${scale + 2}))) AS DOUBLE)"
  /** 32-bit int from first 8 hex chars of md5 — twin of Tables.hashVal32. */
  def sqlHash32(s: String): String =
    (1 to 8).map { i =>
      s"(instr('0123456789abcdef', substring(md5($s), $i, 1)) - 1) * ${math.pow(16, 8 - i).toLong}"
    }.mkString("(", " + ", ")")
}
