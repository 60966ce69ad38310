package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._

import graft.dsl.Relation
import graft.functions.Builtins._

/** Driver contract: one `queries` entry per implemented operator from
  * SURVEY.md §2, with the DuckDB-equivalent SQL in `oracleSql`.
  *
  * Conventions (driver hash-compares values after sorting columns by name):
  *  - every computed column is aliased identically on both sides;
  *  - computed doubles that involve order-dependent aggregation are
  *    `round`ed the same way on both sides (float tolerance policy mirrors
  *    the reference's e2e floatpostprocess — SURVEY §5);
  *  - integer-ish computed outputs are cast to BIGINT on both sides
  *    (DuckDB widens to BIGINT/HUGEINT where Spark keeps int/long);
  *  - top-k queries carry explicit tiebreakers so results are deterministic.
  */
object SparkEntry {

  private def T(s: SparkSession, dir: String, n: String): Relation = {
    GraftSession.tune(s)
    Relation.loadTable(s, dir, n)
  }

  /** Flagship query on sf=0.001 (driver smoke-checks rows>0): TPC-H-Q3-ish
    * customer ⋈ orders ⋈ lineitem with broadcast dim, fused group-agg,
    * total-order sort + top-k — the Slice-0 shape from SURVEY §7.2. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val cust = T(spark, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val ord  = T(spark, dir, "orders")
    val li   = T(spark, dir, "lineitem")
    ord.joinOn(cust, col("o_custkey"), col("c_custkey"), strategy = "replicated")
      .joinOn(li, col("o_orderkey"), col("l_orderkey"))
      .as("t")
      .groupBy("o_orderkey" -> col("o_orderkey"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
             .as("revenue"),
           COUNT_STAR().as("n_items"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10).df
  }

  // =====================================================================
  // Relational operators (SURVEY §2.1)
  // =====================================================================

  private val relationalQueries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // FILTER r BY cond (#3)
    "q01_filter" -> ((s, d) =>
      T(s, d, "lineitem")
        .filter(col("l_quantity") > 45 && col("l_returnflag") === "R")
        .foreach(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
                 col("l_extendedprice")).df),

    // FOREACH r GENERATE exprs (#4): arithmetic + bincond (c ? a : b)
    "q02_foreach" -> ((s, d) =>
      T(s, d, "lineitem").foreach(
        col("l_orderkey"), col("l_linenumber"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
        when(col("l_quantity") > 25, lit("big")).otherwise(lit("small"))
          .as("qty_class")).df),

    // GROUP BY + fused aggregation (combiner path; #6 + §2.3)
    "q03_group_agg" -> ((s, d) =>
      T(s, d, "lineitem")
        .groupBy("l_returnflag" -> col("l_returnflag"),
                 "l_linestatus" -> col("l_linestatus"))
        .agg(round(SUM(col("l_quantity")), 2).as("sum_qty"),
             round(SUM(col("l_extendedprice")), 2).as("sum_price"),
             round(AVG(col("l_discount")), 6).as("avg_disc"),
             COUNT_STAR().as("cnt")).df),

    // GROUP ALL (#6): global aggregate, single group
    "q04_group_all" -> ((s, d) =>
      T(s, d, "lineitem").groupAll
        .agg(COUNT_STAR().as("cnt"),
             round(SUM(col("l_extendedprice")), 2).as("total_price"),
             round(MIN(col("l_quantity")), 2).as("min_qty"),
             round(MAX(col("l_quantity")), 2).as("max_qty")).df),

    // GROUP producing a real bag column, consumed via SIZE (#6 bag path)
    "q05_group_bag" -> ((s, d) =>
      T(s, d, "orders")
        .groupBy("o_custkey" -> col("o_custkey")).bag()
        .foreach(col("o_custkey"), SIZE(col("orders")).as("n_orders")).df),

    // nested FOREACH { ORDER …; LIMIT …; GENERATE FLATTEN } (#5):
    // per-group sort + top-2, no global shuffle beyond the group
    "q06_nested_foreach" -> ((s, d) =>
      T(s, d, "lineitem")
        .foreach(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        .as("items")
        .groupBy("okey" -> col("l_orderkey"))
        .bagSorted2("l_quantity", asc1 = false, "l_linenumber", asc2 = true)
        .foreach(slice(col("items"), 1, 2).as("items"))
        .flatten("items")
        .foreach(col("l_orderkey"), col("l_linenumber"), col("l_quantity")).df),

    // JOIN default hash strategy (#7, §2.2)
    "q07_join" -> ((s, d) =>
      T(s, d, "orders")
        .joinOn(T(s, d, "customer"), col("o_custkey"), col("c_custkey"))
        .as("oc")
        .groupBy("c_mktsegment" -> col("c_mktsegment"),
                 "o_orderstatus" -> col("o_orderstatus"))
        .agg(COUNT_STAR().as("n"),
             round(SUM(col("o_totalprice")), 2).as("volume")).df),

    // JOIN USING 'replicated' → broadcast (#7, POFRJoin analog)
    "q08_join_broadcast" -> ((s, d) =>
      T(s, d, "lineitem")
        .joinOn(T(s, d, "part"), col("l_partkey"), col("p_partkey"),
                strategy = "replicated")
        .as("lp")
        .groupBy("p_brand" -> col("p_brand"))
        .agg(COUNT_STAR().as("n"),
             round(SUM(col("l_quantity")), 2).as("qty")).df),

    // LEFT OUTER JOIN (#7): customers keep row even with no orders
    "q09_join_left" -> ((s, d) =>
      T(s, d, "customer")
        .joinOn(T(s, d, "orders"), col("c_custkey"), col("o_custkey"),
                joinType = "left")
        .as("co")
        .groupBy("c_custkey" -> col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders")).df),

    // FULL OUTER JOIN (#7) of two aggregated sides
    "q10_join_full" -> ((s, d) => {
      val c = T(s, d, "customer")
        .groupBy("nk" -> col("c_nationkey")).agg(COUNT_STAR().as("n_cust"))
      val sup = T(s, d, "supplier")
        .groupBy("nk" -> col("s_nationkey")).agg(COUNT_STAR().as("n_supp"))
      c.joinOn(sup, col("nk"), col("supplier__nk"), joinType = "full")
        .foreach(coalesce(col("nk"), col("supplier__nk")).as("nationkey"),
                 coalesce(col("n_cust"), lit(0L)).as("n_cust"),
                 coalesce(col("n_supp"), lit(0L)).as("n_supp")).df
    }),

    // CROSS (#8)
    "q11_cross" -> ((s, d) =>
      T(s, d, "region").cross(T(s, d, "nation"))
        .foreach(col("r_name"), col("n_name")).df),

    // COGROUP two relations BY key (#6): (group, bag, bag), empty bags
    "q12_cogroup" -> ((s, d) =>
      T(s, d, "customer")
        .cogroup(col("c_nationkey"), T(s, d, "supplier"), col("s_nationkey"))
        .foreach(col("group").as("nationkey"),
                 SIZE(col("customer")).as("n_cust"),
                 SIZE(col("supplier")).as("n_supp")).df),

    // ORDER BY + LIMIT (#9/#11): Catalyst plans TakeOrderedAndProject
    "q13_order_limit" -> ((s, d) =>
      T(s, d, "lineitem")
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"),
                 col("l_linenumber"))
        .limit(10)
        .foreach(col("l_orderkey"), col("l_linenumber"),
                 col("l_extendedprice")).df),

    // RANK r BY col (#10): ties share rank
    "q14_rank" -> ((s, d) =>
      T(s, d, "customer")
        .rank(Seq(col("c_acctbal").desc), rankName = "rnk")
        .foreach(col("c_custkey"), col("c_acctbal"), col("rnk")).df),

    // RANK … DENSE (#10)
    "q15_rank_dense" -> ((s, d) =>
      T(s, d, "orders")
        .rank(Seq(col("o_orderpriority")), dense = true, rankName = "rnk")
        .foreach(col("o_orderkey"), col("o_orderpriority"), col("rnk")).df),

    // RANK r (row numbers, no BY) — scalable 2-pass design (#10)
    "q16_rank_rownum" -> ((s, d) =>
      T(s, d, "customer")
        .foreach(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
        .rankScalable("rn").df),

    // DISTINCT (#12)
    "q17_distinct" -> ((s, d) =>
      T(s, d, "lineitem")
        .foreach(col("l_returnflag"), col("l_linestatus")).distinct.df),

    // UNION (bag union, NO dedup) (#13)
    "q18_union" -> ((s, d) =>
      T(s, d, "customer").foreach(col("c_custkey").as("k"))
        .union(T(s, d, "supplier").foreach(col("s_suppkey").as("k")))
        .groupBy("k" -> col("k")).agg(COUNT_STAR().as("n")).df),

    // UNION ONSCHEMA (align by name, null-pad) (#13)
    "q19_union_onschema" -> ((s, d) =>
      T(s, d, "customer")
        .foreach(col("c_custkey").as("key"), col("c_acctbal").as("bal"))
        .unionOnSchema(
          T(s, d, "supplier")
            .foreach(col("s_suppkey").as("key"), col("s_name").as("sname"))).df),

    // SPLIT INTO … IF … OTHERWISE (#14): branches unioned with labels so
    // one DataFrame exercises all three outputs (input persisted once)
    "q20_split" -> ((s, d) => {
      val o = T(s, d, "orders")
      val hi = col("o_totalprice") > 200000
      val lo = col("o_totalprice") < 50000
      val parts = o.split("hi" -> hi, "lo" -> lo,
                          "mid" -> o.splitOtherwise(hi, lo))
      parts("hi").foreach(lit("hi").as("branch"), col("o_orderkey"))
        .union(parts("lo").foreach(lit("lo").as("branch"), col("o_orderkey")))
        .union(parts("mid").foreach(lit("mid").as("branch"), col("o_orderkey")))
        .groupBy("branch" -> col("branch")).agg(COUNT_STAR().as("n")).df
    }),

    // SAMPLE (#15) — nondeterministic vs oracle; rows-only check
    "q21_sample" -> ((s, d) =>
      T(s, d, "lineitem").sample(0.1).foreach(col("l_orderkey")).df),

    // CUBE (#16)
    "q22_cube" -> ((s, d) =>
      T(s, d, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))(
          round(SUM(col("l_quantity")), 2).as("sum_qty"),
          COUNT_STAR().as("n")).df),

    // ROLLUP (#16)
    "q23_rollup" -> ((s, d) =>
      T(s, d, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))(
          COUNT_STAR().as("n"),
          round(SUM(col("o_totalprice")), 2).as("volume")).df),

    // FLATTEN(bag) round-trip (#4 FLATTEN; empty bags disappear)
    "q24_flatten" -> ((s, d) =>
      T(s, d, "lineitem")
        .foreach(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        .as("items")
        .groupBy("okey" -> col("l_orderkey")).bag()
        .foreach(col("items"))
        .flatten("items")
        .foreach(col("l_orderkey"), col("l_linenumber"), col("l_quantity")).df),

    // semi-join (COGROUP+IsEmpty==false idiom → native left_semi, §2.2)
    "q25_semijoin" -> ((s, d) =>
      T(s, d, "customer")
        .semiJoin(T(s, d, "orders").as("o")
                    .foreach(col("o_custkey").as("c_custkey")),
                  Seq("c_custkey"))
        .groupBy("c_mktsegment" -> col("c_mktsegment"))
        .agg(COUNT_STAR().as("n")).df),

    // anti-join (PigMix L5: COGROUP + IsEmpty → native left_anti):
    // customers with no URGENT order
    "q26_antijoin" -> ((s, d) =>
      T(s, d, "customer")
        .antiJoin(T(s, d, "orders")
                    .filter(col("o_orderpriority") === "1-URGENT").as("o")
                    .foreach(col("o_custkey").as("c_custkey")),
                  Seq("c_custkey"))
        .foreach(col("c_custkey"), col("c_name")).df),

    // scalar projection (1-row relation as scalar; ScalarExpression)
    "q27_scalar" -> ((s, d) =>
      T(s, d, "customer")
        .withScalar("avg_bal", avg(col("c_acctbal")))
        .filter(col("c_acctbal") > col("avg_bal"))
        .groupBy("c_nationkey" -> col("c_nationkey"))
        .agg(COUNT_STAR().as("n")).df),

    // STREAM r THROUGH 'cat' (#17): per-partition external process pipe
    "q28_stream" -> ((s, d) =>
      T(s, d, "lineitem")
        .foreach(col("l_returnflag"), col("l_quantity"))
        .streamThrough(Seq("cat"), StructType(Seq(
          StructField("l_returnflag", StringType),
          StructField("l_quantity", DoubleType))))
        .groupBy("l_returnflag" -> col("l_returnflag"))
        .agg(round(SUM(col("l_quantity")), 2).as("sum_qty"),
             COUNT_STAR().as("n")).df),

    // ASSERT r BY cond (#19) — holds on this data, so acts as a pass-through
    "q29_assert" -> ((s, d) =>
      T(s, d, "lineitem")
        .assertBy(col("l_quantity") >= 0, "negative quantity")
        .groupBy("l_returnflag" -> col("l_returnflag"))
        .agg(COUNT_STAR().as("n")).df),

    // TOP(n, field, bag) (§2.6) — grouped top-k via in-bag sort, with
    // an embedded tiebreaker for determinism
    "q30_top" -> ((s, d) =>
      T(s, d, "orders")
        .foreach(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
        .as("ob")
        .groupBy("ck" -> col("o_custkey"))
        .bagSorted2("o_totalprice", asc1 = false, "o_orderkey", asc2 = true)
        .foreach(slice(col("ob"), 1, 2).as("ob"))
        .flatten("ob")
        .foreach(col("o_custkey"), col("o_orderkey"), col("o_totalprice")).df)
  )

  private val relationalOracles: Map[String, String] = Map(
    "q01_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
         FROM lineitem WHERE l_quantity > 45 AND l_returnflag = 'R'""",
    "q02_foreach" ->
      """SELECT l_orderkey, l_linenumber,
                l_extendedprice * (1 - l_discount) AS revenue,
                CASE WHEN l_quantity > 25 THEN 'big' ELSE 'small' END AS qty_class
         FROM lineitem""",
    "q03_group_agg" ->
      """SELECT l_returnflag, l_linestatus,
                round(sum(l_quantity), 2) AS sum_qty,
                round(sum(l_extendedprice), 2) AS sum_price,
                round(avg(l_discount), 6) AS avg_disc,
                count(*) AS cnt
         FROM lineitem GROUP BY l_returnflag, l_linestatus""",
    "q04_group_all" ->
      """SELECT count(*) AS cnt, round(sum(l_extendedprice), 2) AS total_price,
                round(min(l_quantity), 2) AS min_qty,
                round(max(l_quantity), 2) AS max_qty
         FROM lineitem""",
    "q05_group_bag" ->
      """SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey""",
    "q06_nested_foreach" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM (
           SELECT l_orderkey, l_linenumber, l_quantity,
                  row_number() OVER (PARTITION BY l_orderkey
                    ORDER BY l_quantity DESC, l_linenumber) AS rn
           FROM lineitem) WHERE rn <= 2""",
    "q07_join" ->
      """SELECT c_mktsegment, o_orderstatus, count(*) AS n,
                round(sum(o_totalprice), 2) AS volume
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_mktsegment, o_orderstatus""",
    "q08_join_broadcast" ->
      """SELECT p_brand, count(*) AS n, round(sum(l_quantity), 2) AS qty
         FROM lineitem JOIN part ON l_partkey = p_partkey
         GROUP BY p_brand""",
    "q09_join_left" ->
      """SELECT c_custkey, count(o_orderkey) AS n_orders
         FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         GROUP BY c_custkey""",
    "q10_join_full" ->
      """SELECT coalesce(c.nk, s.nk) AS nationkey,
                coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp
         FROM (SELECT c_nationkey AS nk, count(*) AS n_cust
               FROM customer GROUP BY 1) c
         FULL OUTER JOIN (SELECT s_nationkey AS nk, count(*) AS n_supp
               FROM supplier GROUP BY 1) s ON c.nk = s.nk""",
    "q11_cross" ->
      """SELECT r_name, n_name FROM region CROSS JOIN nation""",
    "q12_cogroup" ->
      """SELECT coalesce(c.nk, s.nk) AS nationkey,
                coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp
         FROM (SELECT c_nationkey AS nk, count(*) AS n_cust
               FROM customer GROUP BY 1) c
         FULL OUTER JOIN (SELECT s_nationkey AS nk, count(*) AS n_supp
               FROM supplier GROUP BY 1) s ON c.nk = s.nk""",
    "q13_order_limit" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
         ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 10""",
    "q14_rank" ->
      """SELECT c_custkey, c_acctbal,
                rank() OVER (ORDER BY c_acctbal DESC) AS rnk
         FROM customer""",
    "q15_rank_dense" ->
      """SELECT o_orderkey, o_orderpriority,
                dense_rank() OVER (ORDER BY o_orderpriority) AS rnk
         FROM orders""",
    "q16_rank_rownum" ->
      """SELECT row_number() OVER (ORDER BY c_custkey) AS rn,
                c_custkey, c_name FROM customer""",
    "q17_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem""",
    "q18_union" ->
      """SELECT k, count(*) AS n FROM (
           SELECT c_custkey AS k FROM customer
           UNION ALL SELECT s_suppkey AS k FROM supplier) GROUP BY k""",
    "q19_union_onschema" ->
      """SELECT c_custkey AS key, c_acctbal AS bal, CAST(NULL AS VARCHAR) AS sname
         FROM customer
         UNION ALL
         SELECT s_suppkey, CAST(NULL AS DOUBLE), s_name FROM supplier""",
    "q20_split" ->
      """SELECT branch, count(*) AS n FROM (
           SELECT CASE WHEN o_totalprice > 200000 THEN 'hi'
                       WHEN o_totalprice < 50000 THEN 'lo'
                       ELSE 'mid' END AS branch
           FROM orders) GROUP BY branch""",
    "q22_cube" ->
      """SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty,
                count(*) AS n
         FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)""",
    "q23_rollup" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
                round(sum(o_totalprice), 2) AS volume
         FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""",
    "q24_flatten" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem""",
    "q25_semijoin" ->
      """SELECT c_mktsegment, count(*) AS n FROM customer
         WHERE c_custkey IN (SELECT o_custkey FROM orders)
         GROUP BY c_mktsegment""",
    "q26_antijoin" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE c_custkey NOT IN
           (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')""",
    "q27_scalar" ->
      """SELECT c_nationkey, count(*) AS n FROM customer
         WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
         GROUP BY c_nationkey""",
    "q28_stream" ->
      """SELECT l_returnflag, round(sum(l_quantity), 2) AS sum_qty,
                count(*) AS n
         FROM lineitem GROUP BY l_returnflag""",
    "q29_assert" ->
      """SELECT l_returnflag, count(*) AS n FROM lineitem GROUP BY l_returnflag""",
    "q30_top" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
                  row_number() OVER (PARTITION BY o_custkey
                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
           FROM orders) WHERE rn <= 2"""
  )

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    relationalQueries

  def oracleSql: Map[String, String] = relationalOracles
}
