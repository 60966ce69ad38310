package graft.functions

import org.apache.spark.SparkContext
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType
import org.apache.spark.util.LongAccumulator

/** Pig's aggregated-warning surface (reference: PigWarning.java +
  * CompilationMessageCollector.java:152 — `Encountered Warning <kind>
  * <n> time(s).` at job end; cmdline.conf Warning group pins the
  * format and counts).
  *
  * Two classes of warning, matching the reference's split:
  *  - COMPILE-time (IMPLICIT_CAST_TO_*): counted by the front end once
  *    per script occurrence while type-checking, driver-side only.
  *  - RUNTIME (DIVIDE_BY_ZERO, FIELD_DISCARDED_TYPE_CONVERSION_FAILED):
  *    counted per ROW on the executors. The reference rides MR/Tez
  *    counters; the Spark-native analog is a [[LongAccumulator]]
  *    incremented from inside whole-stage codegen by [[WarnIf]] — the
  *    increment sits on the (rare) failure branch, so the hot path pays
  *    one branch per row and codegen stays intact.
  */
final class WarningCollector(spark: SparkSession) extends Serializable {

  @transient private val runtime =
    scala.collection.concurrent.TrieMap.empty[String, LongAccumulator]
  @transient private val compiled =
    scala.collection.concurrent.TrieMap.empty[String, Long]
  // one count per AST occurrence: the same node may be re-compiled
  // (schema derivation, auto-naming) but Pig counts script occurrences
  @transient private val seenNodes =
    java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[AnyRef, java.lang.Boolean])

  /** Executor-side counter for a runtime warning kind. */
  def acc(kind: String): LongAccumulator =
    runtime.getOrElseUpdate(kind,
      spark.sparkContext.longAccumulator(s"pig.warning.$kind"))

  /** Count a compile-time warning once per distinct AST node. */
  def compileWarn(kind: String, node: AnyRef): Unit =
    seenNodes.synchronized {
      if (seenNodes.add(node))
        compiled.updateWith(kind) { c => Some(c.getOrElse(0L) + 1L) }
    }

  /** All non-zero warning counts, compile-time and runtime merged. */
  def counts: Map[String, Long] =
    (compiled.toMap ++ runtime.map { case (k, a) =>
      k -> a.value.longValue() }).filter(_._2 > 0L)

  /** Print the reference's aggregate lines to stderr
    * (CompilationMessageCollector.logAggregate format). */
  def report(): Unit =
    counts.toSeq.sortBy(_._1).foreach { case (k, n) =>
      System.err.println(s"Encountered Warning $k $n time(s).")
    }

  /** EvalFunc.warn analog (reference: EvalFunc.java:186 — `warn(msg,
    * PigWarning.UDF_WARNING_n)` routed to PigLogger and aggregated per
    * kind; exercised by cmdline.conf Warning/4's TestWarningFunc). A
    * UDF closure captures the returned handle — only the accumulator
    * serializes to executors, never this collector. */
  def warner(kind: String): UdfWarner = new UdfWarner(acc(kind))
}

/** Serializable per-kind warn handle for UDF bodies; each `warn` bumps
  * the kind's count on the executor, aggregated at job end like the
  * reference's PigLogger counters. The message is advisory (the
  * reference logs it once, counts every call) — the pinned surface is
  * the aggregate count. */
final class UdfWarner private[functions] (acc: LongAccumulator)
    extends Serializable {
  def warn(): Unit = acc.add(1L)
  def warn(msg: String): Unit = { val _ = msg; acc.add(1L) }
}

/** Returns `child`; when `flag` evaluates true, bumps `acc`. Pure
  * pass-through in the plan (dataType/nullable delegate to `child`), so
  * Catalyst treats it as the wrapped value; the side effect is the
  * per-row warning counter. Codegen keeps the increment on the flag's
  * true-branch only. */
case class WarnIf(child: Expression, flag: Expression, acc: LongAccumulator)
    extends Expression {

  override def children: Seq[Expression] = Seq(child, flag)
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "warn_if"
  // the side effect must not be collapsed with an identical-looking
  // subtree or constant-folded away
  override lazy val deterministic: Boolean = false

  override def eval(input: InternalRow): Any = {
    val f = flag.eval(input)
    if (f != null && f.asInstanceOf[Boolean]) acc.add(1L)
    child.eval(input)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val accRef = ctx.addReferenceObj("warnAcc", acc,
      classOf[LongAccumulator].getName)
    val childCode = child.genCode(ctx)
    val flagCode = flag.genCode(ctx)
    ev.copy(code =
      code"""
        ${flagCode.code}
        if (!${flagCode.isNull} && ${flagCode.value}) { $accRef.add(1L); }
        ${childCode.code}
      """,
      isNull = childCode.isNull, value = childCode.value)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), flag = newChildren(1))
}

object Warnings {
  import org.apache.spark.sql.graft.bridge

  /** `result`, bumping `acc` on rows where `flag` is true. */
  def warnIf(result: Column, flag: Column, acc: LongAccumulator): Column =
    bridge.column(WarnIf(bridge.expression(result),
      bridge.expression(flag), acc))

  // -------------------------------------------------------------------
  // Driver-side advisory warnings — scale-cliff notices the library
  // emits when a silent degradation threshold is crossed (e.g. the
  // IVF/SemDedup auto-k cap). Printed as `[graft] WARN:` lines; a
  // bounded recent-message ring keeps them observable to harnesses and
  // specs without log scraping.
  private val driverRing =
    new java.util.concurrent.ConcurrentLinkedQueue[String]()

  /** Emit a driver-side advisory warning (stderr + recent ring). */
  def driverWarn(msg: String): Unit = {
    driverRing.add(msg)
    while (driverRing.size > 64) driverRing.poll()
    System.err.println(s"[graft] WARN: $msg")
  }

  /** The most recent [[driverWarn]] messages, oldest first (≤ 64). */
  def recentDriverWarnings: Seq[String] = {
    val b = Seq.newBuilder[String]
    driverRing.forEach(m => b += m)
    b.result()
  }
}
