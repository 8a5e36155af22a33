package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types.DataType

/** Evaluation barrier for EXPENSIVE projections: a pass-through that
  * reports itself nondeterministic so Catalyst will neither push
  * predicates through the projection that computes it nor inline the
  * expression into downstream operators.
  *
  * Why it exists (measured on the sf1 mutated-replica rehearsal,
  * dedup_edit_distance): `select(dp.as("d")).filter($"d" >= 0)` is
  * rewritten by predicate pushdown into a JOIN post-condition carrying
  * the whole banded-Levenshtein DP — the O(len·threshold) kernel then
  * runs per candidate row on the join's slow path (and again in the
  * projection), turning a 1.4 s scoring pass into a 46 s one. Wrapping
  * the projection in [[EvalOnce]] pins the plan to
  * Filter(attribute) ↑ Project(DP): the kernel runs exactly once per
  * row, inside whole-stage codegen.
  *
  * The wrapped expression MUST itself be pure (same input → same
  * output); the nondeterminism flag is a plan-shape device, not a
  * semantics change — results are bit-identical to the unwrapped form
  * (DedupSpec pins this). Use only on projections whose recomputation
  * or relocation is the dominant cost; for everything else Catalyst's
  * freedom to move expressions is the optimization, not the bug. */
case class EvalOnce(child: Expression) extends UnaryExpression {
  override lazy val deterministic: Boolean = false
  override def nullable: Boolean = child.nullable
  override def dataType: DataType = child.dataType
  override def eval(input: InternalRow): Any = child.eval(input)
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }
  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
  override def prettyName: String = "graft_eval_once"
}

object BarrierExpr {
  /** Wrap a pure-but-expensive column so its evaluation happens exactly
    * once, where it is projected (see [[EvalOnce]]). */
  def evalOnce(c: Column): Column =
    SqlBridge.column(EvalOnce(SqlBridge.expression(c)))
}
