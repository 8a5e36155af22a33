package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expressions for embedding math over `array<float>`
  * columns — the hot inner loop of every ANN / near-dup / centroid
  * operator (SURVEY §2.9 + the LLM-pipeline similarity family).
  *
  * Why an Expression and not `element_at` chains or `zip_with`: the
  * 64-term `element_at` chain re-checks bounds and nullability per
  * element and bloats the codegen'd method; higher-order functions
  * (`zip_with`/`aggregate`) allocate a lambda frame per element. This
  * compiles to a single tight `for` loop over the two ArrayData buffers
  * inside whole-stage codegen — the preference order the build plan
  * mandates: native Expression > built-in composition > UDF.
  *
  * Determinism: the loop accumulates left-to-right in ascending index
  * order — the SAME fixed order as SimilarityOps.dotFixed's explicit
  * chain, so swapping one for the other cannot change a single bit of
  * any oracle-compared result.
  *
  * Null semantics: null array → null result (nullSafeEval / codegen's
  * null guard); null ELEMENTS inside the arrays are treated as 0.0
  * (ArrayData.getFloat on a null slot), matching how the fixtures and
  * parquet embeddings are produced (never-null elements).
  */
object VectorExprs {

  /** Σ aᵢ·bᵢ over the common prefix of two float arrays, as double. */
  case class DotProductF(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes =
      Seq(ArrayType(FloatType), ArrayType(FloatType))
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_dot_f"

    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var s = 0.0; var i = 0
      while (i < n) {
        s += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1
      }
      s
    }

    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (x, y) => {
        val i = ctx.freshName("i"); val n = ctx.freshName("n")
        val s = ctx.freshName("s")
        s"""
           |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $s += (double) $x.getFloat($i) * (double) $y.getFloat($i);
           |}
           |${ev.value} = $s;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** √(Σ aᵢ²) of a float array, as double — same loop device. */
  case class Norm2F(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(ArrayType(FloatType))
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_norm2_f"

    override protected def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val n = x.numElements()
      var s = 0.0; var i = 0
      while (i < n) {
        val v = x.getFloat(i).toDouble; s += v * v; i += 1
      }
      math.sqrt(s)
    }

    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, x => {
        val i = ctx.freshName("i"); val n = ctx.freshName("n")
        val s = ctx.freshName("s"); val v = ctx.freshName("v")
        s"""
           |int $n = $x.numElements();
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $v = (double) $x.getFloat($i);
           |  $s += $v * $v;
           |}
           |${ev.value} = java.lang.Math.sqrt($s);
         """.stripMargin
      })

    override protected def withNewChildInternal(
        newChild: Expression): Expression = copy(child = newChild)
  }

  /** Σ aᵢ·bᵢ over two double arrays (the centroid/IVF path, where
    * vectors are cast to array&lt;double&gt; for exact mean updates). */
  case class DotProductD(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes =
      Seq(ArrayType(DoubleType), ArrayType(DoubleType))
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_dot_d"

    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var s = 0.0; var i = 0
      while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
      s
    }

    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (x, y) => {
        val i = ctx.freshName("i"); val n = ctx.freshName("n")
        val s = ctx.freshName("s")
        s"""
           |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $s += $x.getDouble($i) * $y.getDouble($i);
           |}
           |${ev.value} = $s;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** √(Σ aᵢ²) of a double array. */
  case class Norm2D(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(ArrayType(DoubleType))
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_norm2_d"

    override protected def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val n = x.numElements()
      var s = 0.0; var i = 0
      while (i < n) { val v = x.getDouble(i); s += v * v; i += 1 }
      math.sqrt(s)
    }

    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, x => {
        val i = ctx.freshName("i"); val n = ctx.freshName("n")
        val s = ctx.freshName("s"); val v = ctx.freshName("v")
        s"""
           |int $n = $x.numElements();
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $v = $x.getDouble($i);
           |  $s += $v * $v;
           |}
           |${ev.value} = java.lang.Math.sqrt($s);
         """.stripMargin
      })

    override protected def withNewChildInternal(
        newChild: Expression): Expression = copy(child = newChild)
  }

  // --- Column-level API --------------------------------------------------

  /** dot(a, b) over array<float> columns (codegen'd tight loop). */
  def dotF(a: Column, b: Column): Column =
    SqlBridge.column(DotProductF(
      SqlBridge.expression(a), SqlBridge.expression(b)))

  /** ‖a‖₂ over an array<float> column (codegen'd tight loop). */
  def norm2F(a: Column): Column =
    SqlBridge.column(Norm2F(SqlBridge.expression(a)))

  /** Cosine similarity from the native kernels. */
  def cosineF(a: Column, b: Column): Column =
    dotF(a, b) / (norm2F(a) * norm2F(b))

  /** dot(a, b) over array<double> columns. */
  def dotD(a: Column, b: Column): Column =
    SqlBridge.column(DotProductD(
      SqlBridge.expression(a), SqlBridge.expression(b)))

  /** ‖a‖₂ over an array<double> column. */
  def norm2D(a: Column): Column =
    SqlBridge.column(Norm2D(SqlBridge.expression(a)))
}
