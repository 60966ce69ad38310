package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Generate, LogicalPlan, Project, UnaryNode}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.execution.SparkStrategy

import graft.functions.PyUdfs

/** Batched evaluation for streaming-python UDFs (SURVEY §2.7) — the
  * same design Spark itself uses for its Python UDFs (its
  * ExtractPythonUDFs rule + BatchEvalPython operator), re-built here
  * for graft's external-interpreter protocol:
  *
  * A `ns.fn(args)` call site registers as a scalar Spark udf
  * (`graft_py_*`), which costs ONE pipe round-trip (two flushes + a
  * JSON parse on each side) PER ROW — the honest per-row cost the r12
  * bench measured as 8.9× growth at 10× data on q97. The scalar form
  * cannot batch: Spark's row-at-a-time evaluation demands each result
  * before the next row arrives.
  *
  * So [[ExtractBatchPyUdfs]] (an optimizer rule, registered with
  * the strategy in GraftSession.tune) pulls `graft_py_*` ScalaUDF
  * calls out of Project/Filter nodes into a dedicated
  * [[BatchPyEvalNode]], planned by [[BatchPyEvalStrategy]] as
  * [[BatchPyEvalExec]]: per partition, rows buffer into bounded
  * batches and each UDF's whole batch travels in ONE wire round-trip
  * (`{"f":…,"b":[[args…]…]}` → `{"r":[results…]}`). Per-row wire cost
  * drops by the batch factor; the interpreter process, value
  * conversion, and result types are exactly the scalar path's.
  *
  * Scalar evaluation remains for call sites the rule leaves alone
  * (join conditions, aggregate expressions — rare in Pig scripts,
  * where UDFs live in FOREACH/FILTER) — correctness never depends on
  * extraction. Calls sitting in a CONDITIONALLY-evaluated branch
  * (bincond/CASE WHEN values, coalesce tails, AND/OR right operands)
  * are also left scalar: batching would evaluate them on rows the
  * guard excludes, turning `(x is not null ? f(x) : …)` — or
  * `x IS NULL OR f(x)` — into an unconditional f(null) call. The
  * AND/OR treatment is deliberately MORE conservative than Spark's
  * own Python-UDF rule (which batches them, relying on conjunct
  * reorder being fair game): a udf that raises on the guarded value
  * would turn a working scalar query into a failing batched one.
  * FILTER conjunctions don't lose batching to this: the Filter case
  * splits top-level conjuncts first, so each udf-bearing conjunct is
  * its own unguarded root.
  */
object BatchPyEval {
  /** Rows per wire round-trip. Amortizes round-trip latency ~batch×
    * while bounding request size (a batch of wide text rows stays in
    * the tens of MB). */
  val BatchRows = 128

  /** Byte bound per wire round-trip: a batch also closes once its
    * accumulated ARGUMENT payload (the values that actually serialize
    * into the JSON request) reaches this, so 128 multi-MB documents
    * never build a several-hundred-MB request. */
  val MaxBatchBytes: Long = 8L << 20

  /** Approximate serialized size of one external argument value —
    * an upper-bound-ish proxy for its JSON wire footprint. */
  private[plans] def approxBytes(v: AnyRef): Long = v match {
    case null => 4L
    case s: String => 8L + s.length
    case a: scala.collection.Seq[_] =>
      8L + a.iterator.map(x => approxBytes(x.asInstanceOf[AnyRef])).sum
    case a: Array[_] =>
      8L + a.iterator.map(x => approxBytes(x.asInstanceOf[AnyRef])).sum
    case m: scala.collection.Map[_, _] =>
      8L + m.iterator.map { case (k, w) =>
        approxBytes(k.asInstanceOf[AnyRef]) +
          approxBytes(w.asInstanceOf[AnyRef])
      }.sum
    case r: org.apache.spark.sql.Row =>
      8L + r.toSeq.iterator.map(x => approxBytes(x.asInstanceOf[AnyRef])).sum
    case _ => 8L
  }

  private[plans] def isPyUdf(e: Expression): Boolean = e match {
    case u: ScalaUDF => u.udfName.exists(_.startsWith("graft_py_"))
    case _ => false
  }

  /** Extractable: a py-udf call whose own arguments contain no nested
    * py-udf (inner calls extract first; the fixpoint batch picks up
    * outer ones on the next pass). */
  private[plans] def extractable(e: Expression): Boolean =
    isPyUdf(e) && e.children.forall(c => !c.exists(isPyUdf))
}

/** One extracted call: the ScalaUDF (kept whole — its children are the
  * argument expressions, its udfName keys the PyUdfs spec) and the
  * attribute its batched result binds to. */
case class PyCall(udf: ScalaUDF, resultAttr: Attribute)

case class BatchPyEvalNode(calls: Seq[PyCall], child: LogicalPlan)
    extends UnaryNode {
  override def output: Seq[Attribute] = child.output ++ calls.map(_.resultAttr)
  override def producedAttributes: AttributeSet =
    AttributeSet(calls.map(_.resultAttr))
  override protected def withNewChildInternal(
      newChild: LogicalPlan): BatchPyEvalNode = copy(child = newChild)
}

object ExtractBatchPyUdfs extends Rule[LogicalPlan] with PredicateHelper {

  import BatchPyEval._

  private def hasExtractable(e: Expression): Boolean = e.exists(extractable)

  /** Canonical forms of py-udf calls that sit in a conditionally-
    * evaluated position somewhere under `e` — a bincond/CASE value
    * branch, a coalesce tail, or an AND/OR right operand (whose eval
    * short-circuits on the left). These must not batch: the original
    * expression only evaluates them on rows the guard admits. */
  private def guardedCalls(e: Expression): Set[Expression] = {
    val out = scala.collection.mutable.Set.empty[Expression]
    def walk(ex: Expression, g: Boolean): Unit = {
      if (g && isPyUdf(ex)) out += ex.canonicalized
      val condKids: Set[Expression] = ex match {
        case i: If => Set(i.trueValue, i.falseValue)
        case cw: CaseWhen =>
          (cw.branches.map(_._2) ++ cw.branches.drop(1).map(_._1) ++
            cw.elseValue).toSet
        case c: Coalesce => c.children.drop(1).toSet
        case a: And => Set(a.right)
        case o: Or => Set(o.right)
        case _ => Set.empty
      }
      ex.children.foreach(ch => walk(ch, g || condKids.contains(ch)))
    }
    walk(e, g = false)
    out.toSet
  }

  /** Shared call registry for one rewrite: duplicate calls (same
    * canonical expression) share one batch-computed attribute. */
  private class Calls {
    val buf = scala.collection.mutable.ArrayBuffer.empty[PyCall]
    def attrFor(u: ScalaUDF): Attribute =
      buf.find(_.udf.canonicalized == u.canonicalized) match {
        case Some(c) => c.resultAttr
        case None =>
          val a = AttributeReference(
            s"__pybatch_${buf.length}", u.dataType, nullable = true)()
          buf += PyCall(u, a)
          a
      }
  }

  /** Replace every extractable py-udf call in `exprs` with a reference
    * to a batch-computed attribute. */
  private def pullOut(exprs: Seq[Expression])
      : (Seq[Expression], Seq[PyCall]) = {
    val guarded: Set[Expression] = exprs.flatMap(guardedCalls).toSet
    val calls = new Calls
    val rewritten = exprs.map(_.transformUp {
      case u: ScalaUDF if extractable(u) &&
          !guarded.contains(u.canonicalized) &&
          PyUdfs.specFor(u.udfName.get).isDefined => calls.attrFor(u)
    })
    (rewritten, calls.buf.toSeq)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(list, child) if list.exists(hasExtractable) =>
      val (newList, calls) = pullOut(list)
      if (calls.isEmpty) p
      else {
        // column pruning already ran, and FileSourceStrategy's scan
        // pruning can't see THROUGH the new node — re-prune explicitly
        // below it (project only the columns the rewritten list and the
        // udf arguments still need) so a parquet scan under a py-udf
        // projection keeps its narrow ReadSchema
        val produced = AttributeSet(calls.map(_.resultAttr))
        val needed =
          AttributeSet(newList.flatMap(_.references)) -- produced ++
            AttributeSet(calls.flatMap(_.udf.references))
        val pruned =
          if (child.outputSet.subsetOf(needed)) child
          else Project(child.output.filter(needed.contains), child)
        Project(newList.map(_.asInstanceOf[NamedExpression]),
          BatchPyEvalNode(calls, pruned))
      }
    case f @ Filter(cond, child) if hasExtractable(cond) =>
      // SPLIT the conjunction first: non-udf conjuncts (null guards,
      // cheap predicates) stay BELOW the batch node, so (a) they keep
      // short-circuiting rows away from the python fn — `text IS NOT
      // NULL AND f.up(text)` must never call up(None) — and (b) they
      // remain adjacent to the relation for filter pushdown. Only the
      // udf-bearing conjuncts move above the node. (Spark's own
      // ExtractPythonUDFs does the same trySplitFilter.)
      val (udfConjs, plainConjs) =
        splitConjunctivePredicates(cond).partition(_.exists(isPyUdf))
      // …but only DETERMINISTIC plain conjuncts move below (Spark's
      // own trySplitFilter makes the same cut): a rand()-style conjunct
      // pushed under the batch node would see a different row set than
      // the original single Filter evaluated it over
      val (detConjs, nondetConjs) = plainConjs.partition(_.deterministic)
      val below =
        if (detConjs.isEmpty) child
        else Filter(detConjs.reduce(And), child)
      // pull out per-conjunct (NOT from the reduced And) so each
      // udf-bearing conjunct is its own root — the Or/And right-operand
      // guard must not silence sibling conjuncts
      val (newConds, calls) = pullOut(udfConjs)
      if (calls.isEmpty) f
      // project back to the child's columns so the extra batch column
      // doesn't leak into the filter's output schema
      else Project(child.output,
        Filter((newConds ++ nondetConjs).reduce(And),
          BatchPyEvalNode(calls, below)))
    // GROUP d BY ns.fn(x) (and SUM(ns.fn(x))-style agg inputs): the
    // call is ROW-level — it feeds the grouping key or an aggregate
    // function's input — so it batches below the Aggregate. In the
    // OUTPUT list only two positions are row-level AND bindable after
    // the rewrite: a call strictly inside an AggregateExpression's
    // input, and a call canonically equal to a grouping expression
    // (its shared batch attribute then IS a grouping expression).
    // Everything else stays scalar: f(SUM(x)) is post-aggregation, and
    // f(k) over a grouping column k would rewrite to an attribute that
    // is neither a grouping attribute nor an aggregate result —
    // physical aggregation could not bind it.
    case agg: org.apache.spark.sql.catalyst.plans.logical.Aggregate
        if (agg.groupingExpressions ++ agg.aggregateExpressions)
          .exists(e => e.exists(extractable)) =>
      import org.apache.spark.sql.catalyst.expressions.aggregate
        .AggregateExpression
      val all = agg.groupingExpressions ++ agg.aggregateExpressions
      val guarded: Set[Expression] = all.flatMap(guardedCalls).toSet
      def ok(u: ScalaUDF): Boolean =
        extractable(u) && !guarded.contains(u.canonicalized) &&
          PyUdfs.specFor(u.udfName.get).isDefined
      val groupingCanon = agg.groupingExpressions.map(_.canonicalized).toSet
      val calls = new Calls
      val newGrouping = agg.groupingExpressions.map(_.transformUp {
        case u: ScalaUDF if ok(u) => calls.attrFor(u)
      })
      def rewriteOut(e: Expression, insideAgg: Boolean): Expression =
        e match {
          case u: ScalaUDF if ok(u) &&
              (insideAgg || groupingCanon.contains(u.canonicalized)) =>
            calls.attrFor(u)
          case ae: AggregateExpression =>
            ae.mapChildren(c => rewriteOut(c, insideAgg = true))
          case other => other.mapChildren(c => rewriteOut(c, insideAgg))
        }
      val newOutput = agg.aggregateExpressions.map(e =>
        rewriteOut(e, insideAgg = false).asInstanceOf[NamedExpression])
      if (calls.buf.isEmpty) agg
      else agg.copy(
        groupingExpressions = newGrouping,
        aggregateExpressions = newOutput,
        child = BatchPyEvalNode(calls.buf.toSeq, agg.child))
    // FLATTEN(ns.fn(x)) — a bag-returning python UDF under explode:
    // batch the udf below the Generate, explode the result attribute
    case g: Generate if hasExtractable(g.generator) =>
      val (newGens, calls) = pullOut(Seq(g.generator))
      if (calls.isEmpty) g
      else {
        val node = BatchPyEvalNode(calls, g.child)
        // the appended batch columns are generator inputs only — mark
        // them unrequired so the Generate's own output is unchanged
        val extraIdx =
          g.child.output.length until node.output.length
        g.copy(
          generator =
            newGens.head.asInstanceOf[org.apache.spark.sql.catalyst
              .expressions.Generator],
          unrequiredChildIndex = g.unrequiredChildIndex ++ extraIdx,
          child = node)
      }
  }
}

object BatchPyEvalStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case BatchPyEvalNode(calls, child) =>
      BatchPyEvalExec(calls, planLater(child)) :: Nil
    case _ => Nil
  }
}

/** Appends one column per extracted call. Evaluation per partition:
  * copy up to [[BatchPyEval.BatchRows]] rows, evaluate each call's
  * argument expressions row-wise (codegen'd child values, internal →
  * external conversion identical to ScalaUDF's), one wire round-trip
  * per call per batch, convert results back, emit joined rows. */
case class BatchPyEvalExec(calls: Seq[PyCall], child: SparkPlan)
    extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output ++ calls.map(_.resultAttr)
  override def outputPartitioning = child.outputPartitioning
  override def outputOrdering = child.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    // serializable per-call state: the function record + bound args
    val specs = calls.map { c =>
      val rec = PyUdfs.specFor(c.udf.udfName.get).getOrElse(
        throw new IllegalStateException(
          s"no python UDF spec for ${c.udf.udfName}"))
      val bound = c.udf.children.map(
        BindReferences.bindReference(_, child.output))
      val argTypes = c.udf.children.map(_.dataType)
      (rec, bound, argTypes, c.udf.dataType)
    }
    // capture plain values, never `this`: referencing the `output`
    // method (or a constructor field) inside the closure would drag the
    // whole operator — child SparkPlan subtree included — into every
    // task's serialized closure
    val out: Seq[Attribute] = output
    child.execute().mapPartitions({ iter =>
      val toExternal = specs.map { case (_, _, argTypes, _) =>
        argTypes.map(CatalystTypeConverters.createToScalaConverter)
      }
      val toInternal = specs.map { case (_, _, _, dt) =>
        CatalystTypeConverters.createToCatalystConverter(dt)
      }
      val joined = new JoinedRow
      val project = UnsafeProjection.create(out, out)
      // Batches close at BatchRows rows OR MaxBatchBytes of argument
      // payload, whichever comes first — the byte bound keeps a batch
      // of multi-MB documents from building a several-hundred-MB JSON
      // request. Arguments are evaluated as rows buffer (they are
      // needed for the size measure anyway) and carried to the wire
      // step. Rows are copied BEFORE buffering: the child iterator
      // reuses one mutable row object.
      val batches =
        new Iterator[IndexedSeq[(InternalRow, IndexedSeq[Seq[AnyRef]])]] {
          override def hasNext: Boolean = iter.hasNext
          override def next()
              : IndexedSeq[(InternalRow, IndexedSeq[Seq[AnyRef]])] = {
            val buf = scala.collection.mutable.ArrayBuffer
              .empty[(InternalRow, IndexedSeq[Seq[AnyRef]])]
            var bytes = 0L
            while (iter.hasNext && buf.length < BatchPyEval.BatchRows &&
                bytes < BatchPyEval.MaxBatchBytes) {
              val row = iter.next().copy()
              val args: IndexedSeq[Seq[AnyRef]] = specs.indices.map { ci =>
                val (_, bound, _, _) = specs(ci)
                val ext = toExternal(ci)
                bound.zipWithIndex.map { case (b, ai) =>
                  val v = ext(ai)(b.eval(row)).asInstanceOf[AnyRef]
                  bytes += BatchPyEval.approxBytes(v)
                  v
                }
              }
              buf += ((row, args))
            }
            buf.toIndexedSeq
          }
        }
      batches.flatMap { batch =>
        // one wire round-trip per call for the whole batch
        val results: Seq[Seq[AnyRef]] = specs.zipWithIndex.map {
          case ((rec, _, _, _), ci) =>
            PyUdfs.callBatch(rec, batch.map(_._2(ci)))
        }
        // LAZY iterator: the projection's output buffer is reused, so
        // each row must be consumed downstream before the next is built
        // (an eager map would alias every row to the last one)
        batch.iterator.zipWithIndex.map { case ((row, _), ri) =>
          val extra = InternalRow.fromSeq(
            results.indices.map(ci => toInternal(ci)(results(ci)(ri))))
          project(joined(row, extra))
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(
      newChild: SparkPlan): BatchPyEvalExec = copy(child = newChild)
}
