package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.DataType

/** Pig's bincond `(cond ? t : f)` with the condition evaluated exactly
  * ONCE per row and three-valued null handling (reference:
  * POBinCond.getNextBoolean null guard — a NULL condition yields NULL,
  * not the false branch).
  *
  * The deterministic case compiles to `when(c, t).when(!c, f)` (two
  * references, deduped by codegen subexpression elimination). This
  * expression exists for the NONDETERMINISTIC case — RANDOM() in the
  * condition — where a second reference would be a second draw,
  * routing ~P(t)·P(f) of rows through NEITHER branch, and where
  * `when/otherwise` would send a null condition down the false branch.
  * Branches evaluate lazily: only the taken side runs.
  */
case class EvalOnceBincond(cond: Expression, trueVal: Expression,
                           falseVal: Expression) extends Expression {

  override def children: Seq[Expression] = Seq(cond, trueVal, falseVal)
  override def nullable: Boolean = true
  override def dataType: DataType = trueVal.dataType
  override def prettyName: String = "bincond_once"

  // the analyzer's If/CaseWhen coercion rules don't know this
  // expression, so branch types must already agree — fail LOUDLY on a
  // mismatch instead of mis-typing the false branch
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (cond.dataType != org.apache.spark.sql.types.BooleanType)
      TypeCheckFailure("bincond condition must be boolean, got " +
        cond.dataType.sql)
    else if (!DataType.equalsStructurally(trueVal.dataType,
        falseVal.dataType, ignoreNullability = true))
      TypeCheckFailure("bincond branches with a nondeterministic " +
        s"condition must have one type: ${trueVal.dataType.sql} vs " +
        s"${falseVal.dataType.sql} — cast one branch")
    else TypeCheckSuccess
  }

  override def eval(input: InternalRow): Any = {
    val c = cond.eval(input)
    if (c == null) null
    else if (c.asInstanceOf[Boolean]) trueVal.eval(input)
    else falseVal.eval(input)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val c = cond.genCode(ctx)
    val t = trueVal.genCode(ctx)
    val f = falseVal.genCode(ctx)
    val jt = CodeGenerator.javaType(dataType)
    ev.copy(code =
      code"""
        ${c.code}
        boolean ${ev.isNull} = true;
        $jt ${ev.value} = ${CodeGenerator.defaultValue(dataType)};
        if (!${c.isNull}) {
          if (${c.value}) {
            ${t.code}
            ${ev.isNull} = ${t.isNull};
            if (!${ev.isNull}) ${ev.value} = ${t.value};
          } else {
            ${f.code}
            ${ev.isNull} = ${f.isNull};
            if (!${ev.isNull}) ${ev.value} = ${f.value};
          }
        }""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(newChildren(0), newChildren(1), newChildren(2))
}

object ControlExpressions {
  import org.apache.spark.sql.graft.bridge

  def bincondOnce(cond: Column, t: Column, f: Column): Column =
    bridge.column(EvalOnceBincond(bridge.expression(cond),
      bridge.expression(t), bridge.expression(f)))

  /** Nondeterminism test on the UNRESOLVED column tree, done at the
    * ColumnNode layer (see bridge.isNondeterministic — Spark 4 Columns
    * are lazy node trees; resolved-side `deterministic` lies until the
    * plan is analyzed). No analyzer pass (the old probe analyzed the
    * whole upstream plan per bincond — quadratic in script size). */
  def isNondeterministic(c: Column): Boolean =
    bridge.isNondeterministic(c)
}
