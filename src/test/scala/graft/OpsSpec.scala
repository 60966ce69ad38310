package graft

import org.apache.spark.sql.functions._
import graft.operators.{MultiQuery, Skew}
import graft.dsl.Relation

/** Skew mitigation + multi-store planning. */
class OpsSpec extends SparkSpec {

  test("saltedAggregate matches plain groupBy aggregation") {
    val li = sf("lineitem")
    val expect = li.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
      .collect().map(r => (r.getString(0), (r.getLong(1),
        math.round(r.getDouble(2) * 100)))).toMap
    val got = Skew.saltedAggregate(li, Seq("l_returnflag"), numSalts = 8,
        Seq(("n", count(lit(1)), (c: org.apache.spark.sql.Column) => sum(c)),
            ("q", sum(col("l_quantity")), (c: org.apache.spark.sql.Column) => sum(c))))
      .collect().map(r => (r.getString(0), (r.getLong(1),
        math.round(r.getDouble(2) * 100)))).toMap
    assert(got == expect)
  }

  test("saltedJoin matches plain join") {
    val o = sf("orders")
    val c = sf("customer")
    val expect = o.join(c, o("o_custkey") === c("c_custkey")).count()
    val got = Skew.saltedJoin(o, c.withColumnRenamed("c_custkey", "o_custkey"),
      Seq("o_custkey"), numSalts = 4).count()
    assert(got == expect)
  }

  test("merge-sparse join strategy: probe keys SEEK into the right scan " +
       "(In pushdown); forced above-threshold falls back to bloom; " +
       "inner-only") {
    val o = Relation(sf("orders"), "o")
    val c = Relation(sf("customer").filter(col("c_custkey") < 10), "c")
    val oc = o.df.withColumnRenamed("o_custkey", "custkey")
    val cc = c.df.withColumnRenamed("c_custkey", "custkey")
    val j = Relation(oc, "o").join(Relation(cc, "c"), Seq("custkey"),
      strategy = "merge-sparse")
    // seek regime: the probe keys land on the right side as a literal
    // In/InSet predicate (pushable to the scan), no bloom
    val plan = j.df.queryExecution.optimizedPlan.toString
    assert(plan.contains("INSET") || plan.contains(" IN ("), plan.take(2000))
    assert(!plan.contains("might_contain"))
    val expected = oc.join(cc, "custkey").count()
    assert(j.df.count() == expected && expected > 0)
    // forced bloom regime (conf 0): same result, bloom probe in plan
    spark.conf.set("graft.sparsejoin.maxKeys", "0")
    try {
      val jb = Relation(oc, "o").join(Relation(cc, "c"), Seq("custkey"),
        strategy = "merge-sparse")
      assert(jb.df.queryExecution.optimizedPlan.toString
        .contains("might_contain"))
      assert(jb.df.count() == expected)
    } finally spark.conf.unset("graft.sparsejoin.maxKeys")
    intercept[IllegalArgumentException] {
      Relation(oc, "o").join(Relation(cc, "c"), Seq("custkey"),
        joinType = "left", strategy = "merge-sparse")
    }
  }

  test("hotKeys surfaces the heavy hitters") {
    val hot = Skew.hotKeys(sf("lineitem"), Seq("l_returnflag"),
      topN = 3, sampleFraction = 0.5).collect()
    assert(hot.nonEmpty && hot.map(_.getString(0)).toSet.subsetOf(Set("A", "N", "R")))
  }

  test("MultiQuery.storeAll writes every branch from one cached scan") {
    val tmp = java.nio.file.Files.createTempDirectory("mq").toString
    val shared = Relation(sf("orders"), "o")
      .foreach(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
    val hi = shared.filter(col("o_totalprice") > 200000)
    val lo = shared.filter(col("o_totalprice") <= 200000)
    MultiQuery.storeAll(Seq(shared), Seq(
      MultiQuery.Store(hi, s"$tmp/hi"), MultiQuery.Store(lo, s"$tmp/lo")))
    val n = spark.read.parquet(s"$tmp/hi").count() +
            spark.read.parquet(s"$tmp/lo").count()
    assert(n == sf("orders").count())
  }

  test("bucketed tables join without a shuffle (merge-join equivalence)") {
    import org.apache.spark.sql.functions._
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    Relation(sf("orders"), "orders")
      .storeBucketed("b_orders", 8, Seq("o_custkey"), Seq("o_custkey"))
    Relation(sf("customer"), "customer")
      .storeBucketed("b_customer", 8, Seq("c_custkey"), Seq("c_custkey"))
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = Relation.fromTable(spark, "b_orders").df.join(
        Relation.fromTable(spark, "b_customer").df,
        col("o_custkey") === col("c_custkey"))
      val plan = j.queryExecution.executedPlan.toString
      // co-located: neither side shuffles (Pig merge join on pre-sorted
      // bucketed inputs — POMergeJoin equivalence)
      assert(!plan.contains("Exchange hashpartitioning"))
      assert(j.count() == sf("orders").count())
      // GROUP BY the bucket key is exchange-free too — Pig's
      // `GROUP … USING 'collected'` contract (map-side grouping over
      // co-located loads)
      val g = Relation.fromTable(spark, "b_orders").df
        .groupBy("o_custkey").count()
      assert(!g.queryExecution.executedPlan.toString
        .contains("Exchange hashpartitioning"))
      assert(g.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }

  test("pluck projects by column prefix (PluckTuple)") {
    val j = Relation(sf("customer"), "c")
      .joinOn(Relation(sf("orders"), "o"), col("c_custkey"), col("o_custkey"))
      .pluck("o_")
    assert(j.df.columns.forall(_.startsWith("o_")))
    assert(j.df.columns.length == 6)
  }
}
