package graft

/** Dev-only: print query/oracle inventory. */
object ListQueries {
  def main(args: Array[String]): Unit = {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    println("NQUERIES=" + q.size + " NORACLES=" + o.size)
    println("ROWSONLY:" + (q -- o).toSeq.sorted.mkString(","))
  }
}
