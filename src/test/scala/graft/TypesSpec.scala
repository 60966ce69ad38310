package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Type-system semantics lifted from the reference's Types_* e2e groups
  * and §1 of SURVEY.md: null propagation, bytearray gradual typing,
  * cross-type aggregation, datetime handling. */
class TypesSpec extends SparkSpec {
  import spark.implicits._

  test("arithmetic null propagation (null + x = null)") {
    val r = Seq((Some(1), None: Option[Int])).toDF("a", "b")
      .select(($"a" + $"b").as("s"), ($"a" * $"b").as("p"),
              ($"a" - $"b").as("d")).head()
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
  }

  test("comparisons with null are null → filter drops them both ways") {
    val df = Seq((Some(1), None: Option[Int])).toDF("a", "b")
    assert(df.filter($"a" > $"b").count() == 0)
    assert(df.filter(!($"a" > $"b")).count() == 0) // NOT null = null
  }

  test("bytearray arithmetic: untyped strings cast then compute as double") {
    // Pig: arithmetic on two bytearrays infers double
    // (AlgebraicByteArrayMathBase) — model: cast both to double
    val r = Seq(("3", "4.5")).toDF("a", "b")
      .select(($"a".cast(DoubleType) + $"b".cast(DoubleType)).as("s")).head()
    assert(r.getDouble(0) == 7.5)
  }

  test("aggregates skip nulls; avg denominator excludes nulls") {
    val df = Seq(Some(2.0), None, Some(4.0)).toDF("v")
    val r = df.agg(sum($"v"), avg($"v"), count($"v"), min($"v"), max($"v")).head()
    assert(r.getDouble(0) == 6.0 && r.getDouble(1) == 3.0 && r.getLong(2) == 2)
    assert(r.getDouble(3) == 2.0 && r.getDouble(4) == 4.0)
  }

  test("all-null group: SUM/MIN/MAX null, COUNT 0 (Pig agg rules)") {
    val df = Seq.fill(3)(None: Option[Double]).toDF("v")
    val r = df.agg(sum($"v"), count($"v"), max($"v")).head()
    assert(r.isNullAt(0) && r.getLong(1) == 0 && r.isNullAt(2))
  }

  test("MIN/MAX order strings lexically and timestamps chronologically") {
    val r = Seq("b", "a", "c").toDF("s").agg(min($"s"), max($"s")).head()
    assert(r.getString(0) == "a" && r.getString(1) == "c")
    val t = Seq("2020-03-01", "2020-01-01").toDF("d")
      .select($"d".cast(TimestampType).as("t"))
      .agg(min($"t").cast(DateType).cast(StringType)).head()
    assert(t.getString(0) == "2020-01-01")
  }

  test("cast chain: string → double → int truncates (POCast semantics)") {
    val r = Seq("3.9").toDF("s")
      .select($"s".cast(DoubleType).cast(IntegerType)).head()
    assert(r.getInt(0) == 3)
  }

  test("invalid datetime parse yields null (LoadCaster contract)") {
    val r = Seq("not-a-date").toDF("s")
      .select($"s".cast(TimestampType)).head()
    assert(r.isNullAt(0))
  }

  test("map value access on absent key is null (MapLookup)") {
    val r = Seq(Map("a" -> 1)).toDF("m")
      .select($"m".getItem("zzz")).head()
    assert(r.isNullAt(0))
  }

  test("bloom join rejects outer/anti join types (would drop rows)") {
    val ex = intercept[IllegalArgumentException] {
      graft.operators.BloomJoin.joinLongKey(sf("orders"), sf("customer"),
        "o_custkey", "c_custkey", joinType = "left_outer")
    }
    assert(ex.getMessage.contains("bloom"))
  }

  test("salted join rejects right-preserving join types") {
    val ex = intercept[IllegalArgumentException] {
      graft.operators.Skew.saltedJoin(sf("orders"),
        sf("customer").withColumnRenamed("c_custkey", "o_custkey"),
        Seq("o_custkey"), 4, joinType = "full_outer")
    }
    assert(ex.getMessage.contains("left-preserving"))
  }

  test("bloom join equals plain join (BuildBloom/Bloom pair)") {
    val o = sf("orders")
    val c = sf("customer").filter($"c_acctbal" > 5000)
    val plain = o.join(c, o("o_custkey") === c("c_custkey")).count()
    val bloom = graft.operators.BloomJoin.joinLongKey(
      o, c, "o_custkey", "c_custkey", expectedItems = 10000).count()
    assert(bloom == plain)
  }

  test("bloom join probes with a native predicate — no UDF in the plan") {
    val joined = graft.operators.BloomJoin.joinStringKey(
      sf("orders"), sf("customer").limit(100).withColumn("ck",
        $"c_custkey".cast("string")),
      "o_orderstatus", "ck", expectedItems = 1000)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"native probe missing:\n$plan")
    assert(!plan.contains("UDF"), s"UDF on the probe side:\n$plan")
  }

  test("bloom pre-filter pushes the build-key min/max envelope into " +
       "the parquet scan (row-group skip — the merge-sparse seek analog)") {
    val o = sf("orders")
    // a NARROW build-key range: the envelope should reach PushedFilters
    val c = sf("customer")
      .filter($"c_custkey" >= 100 && $"c_custkey" <= 120)
    val filtered = graft.operators.BloomJoin.preFilter(
      o, Seq($"o_custkey"), c, Seq($"c_custkey"), expectedItems = 1000)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThanOrEqual(o_custkey,") &&
           plan.contains("LessThanOrEqual(o_custkey,"),
      s"envelope not pushed to the scan:\n${plan.take(2000)}")
    // and it is exactly the plain-join row set (envelope + bloom are
    // both supersets of the true match set; the join stays exact)
    val joined = filtered.join(c, $"o_custkey" === $"c_custkey").count()
    val plain = o.join(c, $"o_custkey" === $"c_custkey").count()
    assert(joined == plain && plain > 0)
  }

  test("bloom join string keys equal plain join") {
    val o = sf("orders")
    val c = sf("customer").filter($"c_acctbal" > 5000)
      .withColumn("ck", $"c_custkey".cast("string"))
    val oo = o.withColumn("ok", $"o_custkey".cast("string"))
    val plain = oo.join(c, $"ok" === $"ck").count()
    val bloom = graft.operators.BloomJoin.joinStringKey(
      oo, c, "ok", "ck", expectedItems = 10000).count()
    assert(bloom == plain)
  }
}
