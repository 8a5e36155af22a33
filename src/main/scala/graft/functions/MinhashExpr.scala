package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Shared per-row kernel, callable from generated code (Scala top-level
  * objects emit static forwarders, so codegen references
  * `graft.functions.MinhashHash.tokenSigs(...)` directly). */
object MinhashHash {

  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val buf = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](1 << 10)
  }

  /** All k MinHash permutation minima for the n-token shingles of a
    * token array, hashing each shingle's "t1 t2 … tn" UTF-8 bytes in a
    * reused buffer — the shingle STRINGS are never materialized.
    * `xx = true`: Spark `pmod(xxhash64(s), 2^32)` (catalyst XXH64, seed
    * 42). `xx = false`: `Tables.hashVal32` (first 4 md5 digest bytes
    * big-endian as unsigned 32-bit). Fewer than n tokens → Long.MaxValue
    * sentinels (callers filter short docs upstream). */
  def tokenSigs(ts: ArrayData, n: Int, as: Array[Long], bs: Array[Long],
                p: Long, xx: Boolean): Array[Long] = {
    val k = as.length
    val out = Array.fill(k)(Long.MaxValue)
    val m = ts.numElements()
    if (m < n) return out
    val dg = if (xx) null else md.get()
    var w = 0
    while (w <= m - n) {
      // assemble "t_w t_{w+1} … t_{w+n-1}" into the reused buffer
      var len = 0
      var t = 0
      var emitted = 0
      var b = buf.get()
      while (t < n) {
        // null token → skipped entirely (no separator), matching
        // concat_ws(" ", ...) semantics byte-for-byte: the declared input
        // type is ArrayType(StringType) with containsNull = true, so a
        // caller-built array may carry nulls even though split() never
        // produces them; without the null check getUTF8String NPEs inside
        // whole-stage codegen
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
      val h =
        if (xx)
          java.lang.Math.floorMod(
            XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET, len, 42L),
            4294967296L)
        else {
          dg.reset()
          dg.update(b, 0, len)
          val d = dg.digest()
          ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
            ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        }
      var j = 0
      while (j < k) {
        val v = (h * as(j) + bs(j)) % p
        if (v < out(j)) out(j) = v
        j += 1
      }
      w += 1
    }
    out
  }
}

/** Full MinHash signature — shingle assembly, hashing, AND all k
  * permutation minima — in ONE per-row kernel over the token array
  * (reference near-dup pipeline; Broder '97 permutation scheme as in
  * text/DedupOps.MinhashParams).
  *
  * Why one expression instead of `shinglesFromTokens` +
  * `transform(sh, hasher)` + k `array_min(transform(...))`: higher-order
  * functions evaluate their lambdas INTERPRETED with a frame per
  * element, every operator boundary re-evaluates the un-CSE'd shingle
  * array, and the shingle strings round-trip through unsafe row format.
  * Measured on sf0.1 documents: the shingle ARRAY alone cost ~2.8 s
  * where the whole exploded-aggregation pipeline cost ~0.9 s. This
  * kernel touches each token's bytes in place (no string allocation, a
  * reused thread-local buffer) and runs as one static call inside
  * whole-stage codegen — the build plan's preference order: native
  * Expression > built-in composition > UDF. The signature stage becomes
  * a pure narrow map: no explode, no groupBy, no shuffle, at any corpus
  * size; the only exchange left in LSH dedup is the banded candidate
  * self-join.
  *
  * Semantics: out[j] = min over n-token shingles s of
  * (hash(s)·a_j + b_j) mod p, hash ∈ [0, 2³²), a_j < 2³⁰ — products
  * < 2⁶², exact 64-bit math, bit-identical to the previous composition
  * and the DuckDB oracle (MIN over the shingle multiset ≡ MIN over the
  * distinct set it aggregates; hash input bytes ≡ concat_ws(" ", …)).
  * Fewer than n tokens → Long.MaxValue sentinels; null array → null. */
case class MinhashSigs(child: Expression, n: Int, as: Seq[Long],
                       bs: Seq[Long], p: Long, xx: Boolean)
    extends UnaryExpression with ExpectsInputTypes {
  require(as.length == bs.length, "permutation param arity mismatch")
  override def inputTypes: Seq[ArrayType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sigs"

  @transient private lazy val aArr: Array[Long] = as.toArray
  @transient private lazy val bArr: Array[Long] = bs.toArray

  override protected def nullSafeEval(a: Any): Any =
    new GenericArrayData(MinhashHash.tokenSigs(
      a.asInstanceOf[ArrayData], n, aArr, bArr, p, xx))

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val aRef = ctx.addReferenceObj("mhAs", aArr, "long[]")
      val bRef = ctx.addReferenceObj("mhBs", bArr, "long[]")
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.MinhashHash.tokenSigs($x, $n, $aRef, $bRef,
         |    ${p}L, $xx));
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object MinhashExpr {
  /** Column wrapper: the full signature (all permutation mins) for a
    * TOKEN-array column with n-token shingles. `xx = true` →
    * codegen-native xxhash64 scale path; false → oracle-portable md5
    * (Tables.hashVal32 twin). */
  def minhashSigs(tokens: Column, n: Int, params: Seq[(Long, Long)],
                  p: Long, xx: Boolean): Column =
    SqlBridge.column(MinhashSigs(SqlBridge.expression(tokens), n,
      params.map(_._1), params.map(_._2), p, xx))
}
