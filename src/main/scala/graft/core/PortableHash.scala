package graft.core

/** Driver-side md5-derived constants (same construction as
  * Tables.hashVal32 / SqlGen.sqlHash32, but evaluated in Scala) — used to
  * bake deterministic pseudo-random constants (LSH hyperplanes, seeds)
  * into BOTH the Spark plan and the oracle SQL as plain literals. */
object PortableHash {
  def md5Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
    d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }
  /** First 8 hex chars of md5 as unsigned 32-bit value. */
  def hash32(s: String): Long =
    java.lang.Long.parseLong(md5Hex(s).substring(0, 8), 16)
  /** Deterministic ±1 from the hash parity. */
  def signOf(s: String): Double = if (hash32(s) % 2 == 0) -1.0 else 1.0
}
