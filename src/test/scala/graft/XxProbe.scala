package graft

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.Platform

/** Dev probe: prints Spark's xxhash64(utf8(s), seed=42) for sample strings.
  * Ground truth for the DuckDB pure-SQL xxh64 macro in SqlBridge /
  * tools/compare.py (DedupSpec pins the macro against these).
  */
object XxProbe {
  def h(s: String, seed: Long = 42L): Long = {
    val b = s.getBytes("UTF-8")
    XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET, b.length, seed)
  }
  def main(a: Array[String]): Unit = {
    val samples = Seq("", "a", "ab", "abc", "abcd", "abcde", "abcdefg",
      "abcdefgh", "abcdefghi", "abcdefghijkl", "hello world",
      "the quick brown fox", "0123456789012345678901234567890",
      "01234567890123456789012345678901",
      "the quick brown fox jumps over the lazy dog and keeps running far",
      "naïve café ünïcode ✓ test")
    samples.foreach(s => println(s.getBytes("UTF-8").length + "\t" + h(s) + "\t" + s))
  }
}
