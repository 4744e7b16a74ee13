package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.DataType

/** Evaluation barrier: a zero-cost pass-through expression that reports
  * itself non-deterministic so the optimizer will neither push a filter
  * through the projection that computes it nor collapse that projection
  * into a consumer.
  *
  * Use case: `select(expensive.as("x")).filter($"x" >= k)`. Catalyst's
  * `PushPredicateThroughNonJoin` substitutes the alias into the pushed
  * condition, so the expensive tree evaluates TWICE per surviving row —
  * once in the Filter, once again in the Project above it. There is no
  * cross-operator common-subexpression elimination to save it (CSE is
  * per-operator, even inside one whole-stage-codegen stage). Wrapping the
  * projected expression in `EvalOnce.once` pins it in place: the Project
  * runs once over the scan and the Filter tests the materialized
  * attribute. Pushdown of OTHER predicates through the same projection is
  * also blocked, so wrap only genuinely expensive trees and keep cheap
  * pushdown-worthy columns unwrapped.
  *
  * Runtime cost is zero: eval and codegen delegate straight to the child
  * (the same shape as Spark's own `TaggingExpression`s, e.g.
  * `KnownNotNull`), so the child stays inside whole-stage codegen.
  */
case class EvalOnce(child: Expression) extends UnaryExpression {
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "eval_once"
  // The entire point: make the optimizer treat this projection as a
  // barrier. The child IS deterministic; only plan placement changes.
  override lazy val deterministic: Boolean = false
  override def eval(input: InternalRow): Any = child.eval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.genCode(ctx)
  override protected def withNewChildInternal(newChild: Expression): EvalOnce =
    copy(child = newChild)
}

object EvalOnce {
  /** Column-API surface: pin `c`'s evaluation to the projection it appears
    * in (see [[EvalOnce]]).
    */
  def once(c: Column): Column = Bridge.column(EvalOnce(Bridge.expression(c)))
}
