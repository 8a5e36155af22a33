package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform

/** Positional n-gram hash kernel for exact-substring dedup (the
  * deduplicate-text-datasets pass, Lee et al. 2022 — flag any
  * `minRun`-token window occurring more than once in the corpus).
  *
  * One kernel call per row turns the token array into the array of
  * 64-bit XXH64 hashes of its n-token windows, index = 0-based start
  * position. The window STRINGS are never materialized (a reused
  * thread-local byte buffer, the [[MinhashHash.tokenSigs]] assembly
  * loop): at 100 TB the positional gram table is ~token-count rows, and
  * an 8 B key beats the ~n·5 B window text by an order of magnitude in
  * the duplicate-detection shuffle. Two seeds (two kernel passes over
  * the same projected token array) give callers a 128-bit composite
  * key — at 10¹³ windows a single 64-bit space WOULD collide
  * (birthday bound ≈ 2⁶⁵ ≪ 10²⁶ pairs), a 128-bit one never does.
  *
  * Hash bytes ≡ `concat_ws(" ", window tokens)` UTF-8, so seed 42
  * equals Spark's builtin `xxhash64(gram_string)` exactly
  * (spec-pinned), keeping the string-equality DuckDB oracle faithful.
  */
object GramHash {

  private val buf = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](1 << 10)
  }

  /** XXH64(seed) of each n-token window of `ts`; empty for short rows. */
  def gramHashes(ts: ArrayData, n: Int, seed: Long): Array[Long] = {
    val m = ts.numElements()
    if (m < n) return Array.emptyLongArray
    val out = new Array[Long](m - n + 1)
    var w = 0
    while (w <= m - n) {
      var len = 0
      var t = 0
      var emitted = 0
      var b = buf.get()
      while (t < n) {
        // null-token and growth handling identical to MinhashHash
        val s = ts.getUTF8String(w + t)
        if (s != null) {
          val sb = s.numBytes
          val need = len + sb + 1
          if (need > b.length) {
            val nb = new Array[Byte](Integer.highestOneBit(need) << 1)
            System.arraycopy(b, 0, nb, 0, len)
            buf.set(nb); b = nb
          }
          if (emitted > 0) { b(len) = ' '; len += 1 }
          Platform.copyMemory(s.getBaseObject, s.getBaseOffset, b,
            Platform.BYTE_ARRAY_OFFSET + len, sb)
          len += sb
          emitted += 1
        }
        t += 1
      }
      out(w) = XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET, len, seed)
      w += 1
    }
    out
  }
}

/** array<long> of positional n-gram hashes over a token-array column. */
case class GramHashes(child: Expression, n: Int, seed: Long)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1, s"gram size $n must be >= 1")
  override def inputTypes: Seq[ArrayType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_gram_hashes"

  override protected def nullSafeEval(a: Any): Any =
    new GenericArrayData(
      GramHash.gramHashes(a.asInstanceOf[ArrayData], n, seed))

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.GramHash.gramHashes($x, $n, ${seed}L));""".stripMargin)

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object GramHashExpr {
  /** Column wrapper over a TOKEN-array column (project the array into a
    * real column first — the shinglesFromTokens interpreted-lambda rule). */
  def gramHashes(tokens: Column, n: Int, seed: Long): Column =
    SqlBridge.column(GramHashes(SqlBridge.expression(tokens), n, seed))
}
