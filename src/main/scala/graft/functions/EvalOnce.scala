package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.types.DataType

/** Optimizer fence for an EXPENSIVE projected expression (round 6): the
  * identity function, evaluated exactly where it is written.
  *
  * Catalyst inlines projected expressions into downstream filters and
  * pushes those filters through joins — for a cheap expression that is
  * free, but for something like `size(array_intersect(a, b))` referenced
  * by both a keep-predicate and the output projection it multiplies the
  * per-row cost (measured: the SetJoin verify evaluated the intersection
  * up to three times per candidate — twice inlined into the join
  * condition, once in the output project). Marking the wrapper
  * non-deterministic forbids exactly those rewrites (the guide §4.4
  * asNondeterministic trick, expression-level): the child is computed
  * ONCE per row in its Project, and filters reference the resulting
  * attribute. Semantically the child IS deterministic — the flag only
  * narrows optimizer freedom, never changes values.
  */
case class EvalOnce(child: Expression) extends UnaryExpression {
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override lazy val deterministic: Boolean = false
  override def foldable: Boolean = false
  override def prettyName: String = "eval_once"
  override def eval(input: InternalRow): Any = child.eval(input)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }
  override protected def withNewChildInternal(newChild: Expression): EvalOnce =
    copy(child = newChild)
}

object EvalOnce {
  def column(c: Column): Column =
    ExpressionUtils.column(EvalOnce(ExpressionUtils.expression(c)))
}
