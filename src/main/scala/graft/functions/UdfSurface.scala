package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** UDF extension points, mirroring the reference's contracts (SURVEY §2.7):
  *
  * | Pig                    | here                                        |
  * |------------------------|---------------------------------------------|
  * | EvalFunc<T>.exec       | `spark.udf.register(name, f)` (Scala fn)    |
  * | FilterFunc             | Boolean udf                                 |
  * | Algebraic (init/intermed/final) | [[AlgebraicAggregator]] (zero/reduce/merge/finish — Catalyst splits partial/final automatically, which is exactly Pig's combiner contract) |
  * | Accumulator<T>         | `Aggregator.reduce` already streams groups — no bag materialization |
  * | EvalFunc<DataBag>+FLATTEN (UDTF) | udf returning Seq + `explode`     |
  *
  * Prefer native `functions._` / Catalyst expressions over any of these in
  * hot paths — a Scala udf is a codegen boundary.
  */
object UdfSurface {

  /** Algebraic UDAF base: subclasses supply the monoid. Pig's
    * getInitial/getIntermed/getFinal triple maps onto
    * zero+reduce / merge / finish. */
  abstract class AlgebraicAggregator[IN, BUF, OUT] extends Aggregator[IN, BUF, OUT]

  /** Example algebraic aggregate with Pig COUNT's null rule (skip nulls). */
  class CountNonNull extends AlgebraicAggregator[java.lang.Long, Long, Long] {
    def zero: Long = 0L
    def reduce(b: Long, a: java.lang.Long): Long = if (a == null) b else b + 1
    def merge(l: Long, r: Long): Long = l + r
    def finish(b: Long): Long = b
    def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Accumulator-style grouped top-k (Pig TOP as an agg that never
    * materializes the group bag): bounded buffer of size k, streamed. */
  class TopKLongs(k: Int) extends AlgebraicAggregator[java.lang.Long, Seq[Long], Seq[Long]] {
    def zero: Seq[Long] = Vector.empty
    def reduce(buf: Seq[Long], a: java.lang.Long): Seq[Long] =
      if (a == null) buf else trim(buf :+ a.longValue())
    def merge(l: Seq[Long], r: Seq[Long]): Seq[Long] = trim(l ++ r)
    def finish(b: Seq[Long]): Seq[Long] = b.sorted(Ordering[Long].reverse)
    private def trim(s: Seq[Long]): Seq[Long] =
      if (s.size <= k) s else s.sorted(Ordering[Long].reverse).take(k)
    def bufferEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
    def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** Names registered through the ENGINE's registration surface.
    * Pig Latin function dispatch excludes Spark builtins from the
    * session-UDF fallback (an unmapped Pig builtin must fail loudly, not
    * silently run with Spark's same-named semantics) — but a user who
    * deliberately registers a UDF that shadows a Spark builtin gets the
    * session registry's override at lookup time, so those names are
    * tracked here and allowed explicitly. */
  private val userRegistered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  def isUserRegistered(name: String): Boolean =
    userRegistered.contains(name.toLowerCase)
  /** Record a user registration done directly via `spark.udf.register`. */
  def track(name: String): Unit = { userRegistered.add(name.toLowerCase); () }

  /** DEFINE alias f — session-level registration (Pig's function registry;
    * reference: QueryParser.g DEFINE, P/PigServer registerFunction). */
  def defineCountNonNull(spark: SparkSession, name: String): Unit = {
    track(name); spark.udf.register(name, udaf(new CountNonNull, Encoders.LONG))
  }
  def defineTopK(spark: SparkSession, name: String, k: Int): Unit = {
    track(name); spark.udf.register(name, udaf(new TopKLongs(k), Encoders.LONG))
  }
}
