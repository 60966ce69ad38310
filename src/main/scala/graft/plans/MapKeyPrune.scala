package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Map-key pruning into the JSON parse (SURVEY §4.1 — the reference's
  * `ColumnMapKeyPrune` rule, `P/newplan/logical/rules/ColumnMapKeyPrune
  * .java`, re-expressed for Spark): the reference walks the plan, collects
  * the literal keys used on each map-typed field, and hands the per-field
  * required-key sets to the LoadFunc. Here the map-producing "loader" is
  * `from_json(col, MAP<STRING, V>)`; when EVERY use of one such parse is a
  * lookup with a LITERAL key, building the whole map is wasted work — the
  * parse is rewritten to a STRUCT schema holding exactly the accessed
  * keys, so Jackson skips every other field while scanning instead of
  * materializing them.
  *
  * Sound because a struct field absent from the JSON reads as null,
  * exactly like a missing map key under non-ANSI `element_at`/`[]`; any
  * non-literal key or a use of the whole map disqualifies that parse
  * (detected by comparing lookup-uses vs total uses of the canonicalized
  * expression). Registered via `spark.experimental.extraOptimizations`
  * (GraftSession.tune), after the main optimizer batches — CollapseProject
  * has already folded projections, so matches are expression-local.
  */
object PruneJsonMapKeys extends Rule[LogicalPlan] {

  private def mapValueType(j: JsonToStructs): Option[DataType] =
    j.schema match {
      case MapType(StringType, vt, _) => Some(vt)
      case _ => None
    }

  private def litKey(e: Expression): Option[String] = e match {
    case Literal(s: UTF8String, StringType) if s != null => Some(s.toString)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    import scala.collection.mutable
    val keys = mutable.Map.empty[Expression, mutable.SortedSet[String]]
    val lookupUses = mutable.Map.empty[Expression, Int].withDefaultValue(0)
    val totalUses = mutable.Map.empty[Expression, Int].withDefaultValue(0)
    def record(j: JsonToStructs, k: String): Unit = {
      val c = j.canonicalized
      keys.getOrElseUpdate(c, mutable.SortedSet.empty[String]) += k
      lookupUses(c) += 1
    }
    plan.foreach { node =>
      node.expressions.foreach { root =>
        root.foreach {
          case GetMapValue(j: JsonToStructs, k)
              if mapValueType(j).isDefined && litKey(k).isDefined =>
            record(j, litKey(k).get)
          case ElementAt(j: JsonToStructs, k, None, _)
              if mapValueType(j).isDefined && litKey(k).isDefined =>
            record(j, litKey(k).get)
          case j: JsonToStructs if mapValueType(j).isDefined =>
            totalUses(j.canonicalized) += 1
          case _ =>
        }
      }
    }
    // a parse qualifies only when every one of its uses is a literal
    // lookup (each lookup also counts once as a bare child visit)
    val ok = keys.collect {
      case (c, ks) if totalUses(c) == lookupUses(c) => c -> ks.toIndexedSeq
    }
    if (ok.isEmpty) plan
    else plan.transformAllExpressions {
      case GetMapValue(j: JsonToStructs, k)
          if mapValueType(j).isDefined && litKey(k).isDefined &&
             ok.contains(j.canonicalized) =>
        pruned(j, litKey(k).get, ok(j.canonicalized))
      case ElementAt(j: JsonToStructs, k, None, _)
          if mapValueType(j).isDefined && litKey(k).isDefined &&
             ok.contains(j.canonicalized) =>
        pruned(j, litKey(k).get, ok(j.canonicalized))
    }
  }

  private def pruned(j: JsonToStructs, key: String,
                     allKeys: Seq[String]): Expression = {
    val vt = mapValueType(j).get
    val st = StructType(allKeys.map(StructField(_, vt, nullable = true)))
    // identical parses of the pruned struct are de-duplicated by
    // subexpression elimination, same as the map form was
    GetStructField(j.copy(schema = st), allKeys.indexOf(key), Some(key))
  }
}
