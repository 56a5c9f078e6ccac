package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Longest run of consecutive integers in an ASCENDING array<bigint> —
  * the gaps-and-islands kernel of the substring-span dedup. Replaces the
  * former per-row window formulation (grp = i - row_number() partitioned
  * by doc, then two grouped aggregations): collecting each document's
  * duplicated gram positions into one sorted array and scanning it in a
  * codegen loop needs one hash aggregation instead of a full
  * exchange+sort of every gram row plus two more aggregations.
  * Empty array -> 0.
  */
case class MaxConsecRun(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "max_consec_run"

  override def nullSafeEval(a: Any): Any =
    MaxConsecRun.maxRun(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val module = "graft.plans.MaxConsecRun$.MODULE$"
    defineCodeGen(ctx, ev, c => s"$module.maxRun($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MaxConsecRun {
  def maxRun(a: ArrayData): Long = {
    val n = a.numElements()
    if (n == 0) return 0L
    var best = 1L
    var cur = 1L
    var prev = a.getLong(0)
    var t = 1
    while (t < n) {
      val x = a.getLong(t)
      cur = if (x == prev + 1) cur + 1 else 1L
      if (cur > best) best = cur
      prev = x
      t += 1
    }
    best
  }

  def apply(sortedPositions: Column): Column =
    GraftColumnBridge.column(MaxConsecRun(GraftColumnBridge.expression(sortedPositions)))
}
