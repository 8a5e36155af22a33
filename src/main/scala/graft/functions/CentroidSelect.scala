package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Fused literal-centroid top-r selection — the hot kernel of every
  * IVF/PQ coarse assignment (SimilarityOps.assignTopR call sites).
  *
  * Why a native Expression: the first zero-expansion rewrite built an
  * `array(struct(score, id), …)` per row and picked with
  * array_min/array_max/array_sort. That removed the crossJoin+window
  * Exchange but paid a CreateNamedStruct + GenericInternalRow
  * allocation PER CENTROID PER ROW plus an interpreted struct ordering —
  * measured 1.75× (ann_ivf) to 3.9× (ann_ivf_pq) SLOWER than the old
  * join at sf10. This kernel scores all centroids in one tight loop over
  * the row's ArrayData (no allocation until the top-r id array) inside
  * whole-stage codegen (standalone objects emit static forwarders, so
  * codegen calls `graft.functions.CentroidSelect.topIds(...)` directly).
  *
  * Bit-identity with the Column formulas it replaces (and the window
  * ordering before them):
  *  - dot accumulates `s = 0.0; s += v(i)·c(i)` ascending — the EXACT
  *    loop of [[VectorExprs.DotProductD]];
  *  - norms are `sqrt(Σx²)` with the same loop as [[VectorExprs.Norm2D]];
  *    centroid norms are precomputed once at plan build (what Catalyst's
  *    ConstantFolding did to `norm2D(lit(cent))`);
  *  - Cos score = `dot / (nv · nc)`; L2 score =
  *    `(na·na + nb·nb) − 2.0·dot` (the PQ l2sq shape, sqrt-then-square
  *    preserved); D2 score = `Σ (x−c)²` left-assoc (the kNN chain —
  *    squares are ≥ +0.0, so the 0.0 seed is exact);
  *  - selection compares with `java.lang.Double.compare`, which is
  *    Spark's double ordering (NaN greatest, −0.0 < 0.0): ties keep the
  *    earlier centroid, and ids are required ascending, so the result
  *    is exactly the old `(score asc|desc, id asc)` window order.
  */
object CentroidSelect {

  final val Cos = 0
  final val L2 = 1
  final val D2 = 2

  /** Score one row vector against centroid k. */
  private def score(v: ArrayData, c: Array[Double], nv: Double,
                    nc: Double, mode: Int): Double = mode match {
    case Cos =>
      val d = math.min(v.numElements(), c.length)
      var dot = 0.0; var i = 0
      while (i < d) { dot += v.getDouble(i) * c(i); i += 1 }
      dot / (nv * nc)
    case L2 =>
      val d = math.min(v.numElements(), c.length)
      var dot = 0.0; var i = 0
      while (i < d) { dot += v.getDouble(i) * c(i); i += 1 }
      (nv * nv + nc * nc) - 2.0 * dot
    case _ =>
      // same min-length bound as Cos/L2: a row vector shorter than the
      // centroid dimension must not read past its ArrayData
      val d = math.min(v.numElements(), c.length)
      var s = 0.0; var i = 0
      while (i < d) {
        val t = v.getDouble(i) - c(i); s += t * t; i += 1
      }
      s
  }

  /** ids of the top `rank` centroids under (score asc|desc, id asc);
    * `norms` holds the precomputed centroid L2 norms (Cos/L2 modes). */
  def topIds(v: ArrayData, cents: Array[Array[Double]],
             norms: Array[Double], ids: Array[Long], mode: Int,
             asc: Boolean, rank: Int): Array[Long] = {
    val n = cents.length
    var nv = 0.0
    if (mode != D2) {
      var s = 0.0; var i = 0; val d = v.numElements()
      while (i < d) { val x = v.getDouble(i); s += x * x; i += 1 }
      nv = math.sqrt(s)
    }
    val scores = new Array[Double](n)
    var k = 0
    while (k < n) {
      scores(k) = score(v, cents(k), nv, norms(k), mode); k += 1
    }
    val taken = new Array[Boolean](n)
    val out = new Array[Long](rank)
    var r = 0
    while (r < rank) {
      var best = -1
      var k = 0
      while (k < n) {
        if (!taken(k)) {
          if (best < 0) best = k
          else {
            val cmp = java.lang.Double.compare(scores(k), scores(best))
            // strict improvement only: ties keep the earlier (smaller)
            // id, matching the window's `id asc` tie-break
            if (if (asc) cmp < 0 else cmp > 0) best = k
          }
        }
        k += 1
      }
      taken(best) = true
      out(r) = ids(best)
      r += 1
    }
    out
  }

  /** rank = 1 fast path (no boolean array, returns the id directly). */
  def topId(v: ArrayData, cents: Array[Array[Double]],
            norms: Array[Double], ids: Array[Long], mode: Int,
            asc: Boolean): Long = {
    val n = cents.length
    var nv = 0.0
    if (mode != D2) {
      var s = 0.0; var i = 0; val d = v.numElements()
      while (i < d) { val x = v.getDouble(i); s += x * x; i += 1 }
      nv = math.sqrt(s)
    }
    var best = 0
    var bestScore = score(v, cents(0), nv, norms(0), mode)
    var k = 1
    while (k < n) {
      val s = score(v, cents(k), nv, norms(k), mode)
      val cmp = java.lang.Double.compare(s, bestScore)
      if (if (asc) cmp < 0 else cmp > 0) { best = k; bestScore = s }
      k += 1
    }
    ids(best)
  }

  /** Argmin/argmax-to-top-r expression over an array<double> column
    * against a literal centroid matrix. rank = 1 → long; else
    * array<long> (explode for one row per probe). */
  case class CentroidArgTop(child: Expression, cents: Seq[Seq[Double]],
                            ids: Seq[Long], mode: Int, asc: Boolean,
                            rank: Int)
      extends UnaryExpression with ExpectsInputTypes {
    require(rank >= 1, s"rank $rank must be >= 1")
    require(cents.nonEmpty, "need at least one centroid")
    require(ids == ids.sorted,
      "centroid ids must be ascending (the tie-break contract)")
    // Lloyd refinement can shrink the centroid list below the requested
    // nprobe (an emptied list); the old crossJoin+row_number<=rank form
    // returned all surviving lists there — clamp rather than crash. The
    // declared dataType keeps the REQUESTED arity (rank==1 ⇒ long).
    private val effRank = math.min(rank, cents.size)
    override def inputTypes = Seq(ArrayType(DoubleType))
    override def dataType: DataType =
      if (rank == 1) LongType else ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_centroid_argtop"

    @transient private lazy val centsArr = cents.map(_.toArray).toArray
    @transient private lazy val idsArr = ids.toArray
    // same loop as Norm2D.eval, run once at plan build — what
    // ConstantFolding produced for norm2D(lit(cent))
    @transient private lazy val normsArr = centsArr.map { c =>
      var s = 0.0; var i = 0
      while (i < c.length) { s += c(i) * c(i); i += 1 }
      math.sqrt(s)
    }

    override protected def nullSafeEval(a: Any): Any = {
      val v = a.asInstanceOf[ArrayData]
      if (rank == 1) topId(v, centsArr, normsArr, idsArr, mode, asc)
      else new GenericArrayData(
        topIds(v, centsArr, normsArr, idsArr, mode, asc, effRank))
    }

    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, x => {
        val cRef = ctx.addReferenceObj("ctCents", centsArr, "double[][]")
        val nRef = ctx.addReferenceObj("ctNorms", normsArr, "double[]")
        val iRef = ctx.addReferenceObj("ctIds", idsArr, "long[]")
        if (rank == 1)
          s"""${ev.value} = graft.functions.CentroidSelect.topId(
             |  $x, $cRef, $nRef, $iRef, $mode, $asc);""".stripMargin
        else
          s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
             |  graft.functions.CentroidSelect.topIds(
             |    $x, $cRef, $nRef, $iRef, $mode, $asc, $effRank));""".stripMargin
      })

    override protected def withNewChildInternal(
        newChild: Expression): Expression = copy(child = newChild)
  }

  /** Column wrapper. */
  def argTop(v: Column, cents: Seq[(Long, Seq[Double])], mode: Int,
             asc: Boolean, rank: Int): Column =
    SqlBridge.column(CentroidArgTop(SqlBridge.expression(v),
      cents.map(_._2), cents.map(_._1), mode, asc, rank))

  /** Score one row vector against an ArrayData centroid — the exact
    * loops of [[score]] re-stated over a runtime (non-literal) centroid:
    * ascending left-to-right dot, same Cos/L2/D2 shapes. */
  private def scoreAD(v: ArrayData, c: ArrayData, nv: Double,
                      nc: Double, mode: Int): Double = mode match {
    case Cos =>
      val d = math.min(v.numElements(), c.numElements())
      var dot = 0.0; var i = 0
      while (i < d) { dot += v.getDouble(i) * c.getDouble(i); i += 1 }
      dot / (nv * nc)
    case L2 =>
      val d = math.min(v.numElements(), c.numElements())
      var dot = 0.0; var i = 0
      while (i < d) { dot += v.getDouble(i) * c.getDouble(i); i += 1 }
      (nv * nv + nc * nc) - 2.0 * dot
    case _ =>
      val d = math.min(v.numElements(), c.numElements())
      var s = 0.0; var i = 0
      while (i < d) {
        val t = v.getDouble(i) - c.getDouble(i); s += t * t; i += 1
      }
      s
  }

  /** Best child id under (score asc|desc, id asc) over a RUNTIME children
    * array — kids is array<struct<id: long, cent: array<double>,
    * norm: double>>, typically one broadcast-joined cell of a two-level
    * coarse quantizer (the IMI device, Jégou TPAMI'11 §V). Unlike
    * [[topId]] the centroids are per-row data, not plan literals, so
    * norms arrive precomputed in the struct (computed once per child in
    * the centroid table, with the same sqrt(Σx²) ascending loop).
    * Tie-break compares ids, NOT array order — collect_list packing
    * order never matters. */
  def bestChild(v: ArrayData, kids: ArrayData, mode: Int,
                asc: Boolean): Long = {
    val n = kids.numElements()
    var nv = 0.0
    if (mode != D2) {
      var s = 0.0; var i = 0; val d = v.numElements()
      while (i < d) { val x = v.getDouble(i); s += x * x; i += 1 }
      nv = math.sqrt(s)
    }
    var bestId = Long.MinValue
    var bestScore = 0.0
    var first = true
    var k = 0
    while (k < n) {
      val row = kids.getStruct(k, 3)
      val cid = row.getLong(0)
      val s = scoreAD(v, row.getArray(1), nv, row.getDouble(2), mode)
      if (first) { bestId = cid; bestScore = s; first = false }
      else {
        val cmp = java.lang.Double.compare(s, bestScore)
        val better = if (asc) cmp < 0 else cmp > 0
        // exact ties keep the SMALLER id regardless of packing order —
        // the same `(score, id asc)` window contract as CentroidArgTop
        if (better || (cmp == 0 && cid < bestId)) {
          bestId = cid; bestScore = s
        }
      }
      k += 1
    }
    bestId
  }

  /** Argmin/argmax over a runtime children array (one quantizer cell) —
    * rank-1 only; the two-level assignment's second stage. Null on a
    * null/empty cell (callers join cells by construction non-empty). */
  case class ChildArgTop(vec: Expression, kids: Expression, mode: Int,
                         asc: Boolean)
      extends BinaryExpression with ExpectsInputTypes {
    override def left: Expression = vec
    override def right: Expression = kids
    override def inputTypes = Seq(ArrayType(DoubleType), ArrayType)
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def prettyName: String = "graft_child_argtop"

    override protected def nullSafeEval(v: Any, k: Any): Any = {
      val kids = k.asInstanceOf[ArrayData]
      if (kids.numElements() == 0) null
      else bestChild(v.asInstanceOf[ArrayData], kids, mode, asc)
    }

    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (v, k) =>
        s"""if ($k.numElements() == 0) { ${ev.isNull} = true; }
           |else { ${ev.value} =
           |  graft.functions.CentroidSelect.bestChild($v, $k, $mode, $asc); }
           |""".stripMargin)

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(vec = newLeft, kids = newRight)
  }

  /** Column wrapper: best child within a runtime cell. `kids` must be
    * array<struct<list_id: long, cent: array<double>, norm: double>>. */
  def childArg(v: Column, kids: Column, mode: Int, asc: Boolean): Column =
    SqlBridge.column(ChildArgTop(SqlBridge.expression(v),
      SqlBridge.expression(kids), mode, asc))
}
