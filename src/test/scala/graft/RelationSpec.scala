package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.dsl.Relation

/** Pig-semantics edge cases lifted from the reference's test catalog
  * (SURVEY §5: Types_*, studentnulltab groups): null propagation, empty
  * bags, FLATTEN row-disappearance, union-onschema padding, split overlap.
  */
class RelationSpec extends SparkSpec {
  import spark.implicits._

  private def students = Relation(Seq(
    ("alice", Some(20), Some(3.5)),
    ("bob", None, Some(2.0)),
    ("carol", Some(22), None),
    (null, Some(25), Some(1.0))
  ).toDF("name", "age", "gpa"), "students")

  test("filter drops null-comparison rows (Pig: null predicate = false)") {
    // age > 21: bob (null age) must NOT pass
    val out = students.filter(col("age") > 21).df.collect()
    assert(out.map(_.getString(0)).toSet == Set("carol", null))
  }

  test("group with null key: nulls form ONE group (Pig GROUP semantics)") {
    val r = Relation(Seq(("x", 1), (null, 2), (null, 3)).toDF("k", "v"), "r")
    val groups = r.groupBy("k" -> col("k")).agg(sum(col("v")).as("s"))
      .df.collect().map(row => (row.getString(0), row.getLong(1))).toMap
    assert(groups(null) == 5L && groups("x") == 1L)
  }

  test("join drops null keys (Pig JOIN: nulls do not match)") {
    val l = Relation(Seq(("a", 1), (null, 2)).toDF("k", "lv"), "l")
    val r = Relation(Seq(("a", 10), (null, 20)).toDF("k", "rv"), "r")
    assert(l.join(r, Seq("k")).df.count() == 1)
  }

  test("COUNT skips nulls, COUNT_STAR does not (COUNT.java:54)") {
    import graft.functions.Builtins._
    val out = students.groupAll
      .agg(COUNT(col("age")).as("c"), COUNT_STAR().as("cs")).df.head()
    assert(out.getLong(0) == 3 && out.getLong(1) == 4)
  }

  test("FLATTEN: empty-bag rows disappear (POForEach flatten semantics)") {
    val df = Seq(
      (1, Seq("a", "b")),
      (2, Seq.empty[String])
    ).toDF("id", "bag")
    val out = Relation(df, "r").flatten("bag").df.collect()
    assert(out.length == 2 && out.forall(_.getInt(0) == 1))
  }

  test("flattenMap explodes to key/value pairs") {
    val df = Seq((1, Map("a" -> 1, "b" -> 2))).toDF("id", "m")
    val out = Relation(df, "r").flattenMap("m").df
    assert(out.columns.toSeq == Seq("id", "key", "value"))
    assert(out.count() == 2)
  }

  test("flattenTuple expands struct fields") {
    val df = Seq((1, ("x", 9))).toDF("id", "t")
    val out = Relation(df, "r").flattenTuple("t").df
    assert(out.columns.toSeq == Seq("id", "_1", "_2"))
    assert(out.head().getString(1) == "x")
  }

  test("cogroup yields EMPTY bags (not null) for missing side") {
    val l = Relation(Seq((1, "a")).toDF("k", "v"), "l")
    val r = Relation(Seq((2, "b")).toDF("k", "w"), "r")
    val out = l.cogroup(col("k"), r, col("k")).df
      .orderBy("group").collect()
    assert(out.length == 2)
    assert(out(0).getSeq[Row](1).nonEmpty && out(0).getSeq[Row](2).isEmpty)
    assert(out(1).getSeq[Row](1).isEmpty && out(1).getSeq[Row](2).nonEmpty)
  }

  test("n-ary cogroup: three inputs, empty bags on missing sides") {
    val a = Relation(Seq((1, "a")).toDF("k", "v"), "a")
    val b = Relation(Seq((2, "b")).toDF("k", "w"), "b")
    val c = Relation(Seq((1, "c"), (2, "c")).toDF("k", "x"), "c")
    val out = Relation.cogroupAll((a, col("k")), (b, col("k")), (c, col("k")))
      .df.orderBy("group").collect()
    assert(out.length == 2)
    assert(out(0).getSeq[Row](1).nonEmpty && out(0).getSeq[Row](2).isEmpty &&
           out(0).getSeq[Row](3).nonEmpty) // key 1: a+c, b empty
    assert(out(1).getSeq[Row](1).isEmpty && out(1).getSeq[Row](2).nonEmpty &&
           out(1).getSeq[Row](3).nonEmpty) // key 2: b+c, a empty
  }

  test("union keeps duplicates; unionOnSchema aligns by name and pads") {
    val a = Relation(Seq((1, "x")).toDF("id", "s"), "a")
    val b = Relation(Seq((1, "x")).toDF("id", "s"), "b")
    assert(a.union(b).df.count() == 2)
    val c = Relation(Seq((2, 3.5)).toDF("id", "d"), "c")
    val u = a.unionOnSchema(c).df
    assert(u.columns.toSet == Set("id", "s", "d"))
    assert(u.filter(col("d").isNull).count() == 1)
  }

  test("unionOnSchema promotes numeric types (Pig schema merge)") {
    val a = Relation(Seq((1, 10)).toDF("id", "v"), "a")        // v: int
    val b = Relation(Seq((2L, 2.5)).toDF("id", "v"), "b")      // v: double
    val u = a.unionOnSchema(b).df
    assert(u.schema("v").dataType == DoubleType)
    assert(u.schema("id").dataType == LongType)
    assert(u.agg(sum(col("v"))).head().getDouble(0) == 12.5)
  }

  test("split: overlapping conditions route rows to BOTH branches") {
    val r = Relation(Seq(1, 5, 10).toDF("v"), "r")
    val parts = r.split("big" -> (col("v") > 3), "odd" -> (col("v") % 2 === 1),
      "rest" -> r.splitOtherwise(col("v") > 3, col("v") % 2 === 1))
    assert(parts("big").df.count() == 2)   // 5, 10
    assert(parts("odd").df.count() == 2)   // 1, 5 — 5 routed to BOTH
    assert(parts("rest").df.count() == 0)
  }

  test("bagSorted orders within groups (secondary-sort analog)") {
    val r = Relation(Seq((1, 3), (1, 1), (1, 2)).toDF("k", "v"), "r")
    val out = r.groupBy("k" -> col("k")).bagSorted("v", asc = true)
      .df.head().getSeq[Row](1).map(_.getInt(1))
    assert(out == Seq(1, 2, 3))
  }

  test("rankScalable matches window row_number") {
    val base = Relation(sf("customer"), "c")
      .foreach(col("c_custkey")).orderBy(col("c_custkey"))
    val ranked = base.rankScalable("rn").df
      .select("rn", "c_custkey").collect()
    // row numbers are 1..n in c_custkey order
    ranked.sortBy(_.getLong(1)).zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(0) == i + 1L)
    }
  }

  test("rankBy dense at scale matches dense_rank") {
    import org.apache.spark.sql.expressions.Window
    val df = sf("orders").select("o_orderkey", "o_orderpriority")
    val expect = df.withColumn("rank",
        dense_rank().over(Window.orderBy("o_orderpriority")).cast("long"))
      .groupBy("o_orderpriority").agg(max("rank").as("rank"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val got = graft.operators.Rank.rankBy(df,
        Seq(col("o_orderpriority") -> true), dense = true)
      .groupBy("o_orderpriority").agg(max("rank").as("rank"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == expect)
  }

  test("rankBy matches window rank incl. desc direction and null keys") {
    import org.apache.spark.sql.expressions.Window
    val df = Seq(Some(3.0), Some(1.0), None, Some(3.0), Some(2.0), None)
      .toDF("v")
    for (dense <- Seq(false, true); asc <- Seq(true, false)) {
      val w = Window.orderBy(if (asc) col("v").asc else col("v").desc)
      val r = if (dense) dense_rank() else
        org.apache.spark.sql.functions.rank()
      val expect = df.withColumn("rank", r.over(w).cast("long"))
        .collect().map(x => (Option(x.get(0)), x.getLong(1))).toSet
      val got = graft.operators.Rank.rankBy(df, Seq(col("v") -> asc), dense)
        .collect().map(x => (Option(x.get(0)), x.getLong(1))).toSet
      assert(got == expect, s"dense=$dense asc=$asc")
    }
  }

  test("rankBy non-dense on a hot low-cardinality key matches rank()") {
    import org.apache.spark.sql.expressions.Window
    // 3 distinct flags over the whole table — every key is hot; the
    // distinct-key prefix-sum path must not funnel a key to one task
    val df = sf("lineitem").select("l_orderkey", "l_returnflag")
    val expect = df.withColumn("rank",
        org.apache.spark.sql.functions.rank()
          .over(Window.orderBy("l_returnflag")).cast("long"))
      .select("l_returnflag", "rank").distinct()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val got = graft.operators.Rank.rankBy(df,
        Seq(col("l_returnflag") -> true), dense = false)
      .select("l_returnflag", "rank").distinct()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == expect)
  }

  test("rankBy with computed key expression") {
    val df = sf("customer").select("c_custkey", "c_acctbal")
    val got = graft.operators.Rank.rankBy(df,
      Seq((col("c_acctbal") * -1) -> true, col("c_custkey") -> true),
      dense = false)
    assert(got.columns.toSeq ==
      Seq("c_custkey", "c_acctbal", "rank")) // temp key cols dropped
    val top = got.orderBy("rank").head()
    val expTop = df.orderBy(col("c_acctbal").desc, col("c_custkey")).head()
    assert(top.getLong(0) == expTop.getLong(0))
  }

  test("splitOtherwise drops rows whose conditions are all null (Pig)") {
    val r = Relation(Seq(Some(1), Some(10), None).toDF("v"), "r")
    val parts = r.split("big" -> (col("v") > 5),
      "rest" -> r.splitOtherwise(col("v") > 5))
    assert(parts("big").df.count() == 1)   // 10
    assert(parts("rest").df.count() == 1)  // 1; the null row goes NOWHERE
  }

  test("streamThrough writes nulls as empty fields (no column shift)") {
    val df = Seq((1, Some("x"), 7), (2, None, 9))
      .toDF("id", "name", "qty")
    val out = Relation(df, "r").streamThrough(Seq("cat"),
      StructType(Seq(StructField("id", IntegerType),
        StructField("name", StringType), StructField("qty", IntegerType))))
      .df.orderBy("id").collect()
    assert(out(1).getInt(0) == 2 && out(1).getInt(2) == 9) // qty NOT shifted
  }

  test("streamThrough quotes regex-metachar separators") {
    val df = Seq((1, "a")).toDF("id", "s")
    val out = Relation(df, "r").streamThrough(Seq("cat"),
      StructType(Seq(StructField("id", IntegerType),
        StructField("s", StringType))), sep = "|")
      .df.head()
    assert(out.getInt(0) == 1 && out.getString(1) == "a")
  }

  test("streamThrough pipes rows and re-applies schema with lazy casts") {
    val out = Relation(sf("nation"), "nation")
      .foreach(col("n_nationkey"), col("n_name"))
      .streamThrough(Seq("cat"), StructType(Seq(
        StructField("n_nationkey", IntegerType),
        StructField("n_name", StringType))))
      .df
    assert(out.count() == 25)
    assert(out.schema("n_nationkey").dataType == IntegerType)
  }

  test("assertBy raises on violation (Assert.java contract)") {
    val r = Relation(Seq(1, -2).toDF("v"), "r")
    val ex = intercept[Exception] {
      r.assertBy(col("v") > 0, "neg!").df.collect()
    }
    assert(ex.getMessage.contains("neg!") ||
      ex.getCause != null && ex.getCause.getMessage.contains("neg!"))
  }

  test("loadDelimited: PigStorage analog with use-site cast-to-null") {
    val tmp = java.nio.file.Files.createTempDirectory("pigstore").toFile
    val p = new java.io.File(tmp, "data.tsv")
    val w = new java.io.PrintWriter(p)
    w.println("alice\t20"); w.println("bob\tnotanum"); w.close()
    val r = Relation.loadDelimited(spark, p.getAbsolutePath, "s")
      .foreach(col("_c0").as("name"), col("_c1").cast(IntegerType).as("age"))
    val rows = r.df.orderBy("name").collect()
    assert(rows(0).getInt(1) == 20 && rows(1).isNullAt(1)) // cast fail → null
  }

  test("sortByComputedKey: comparator-as-key total order, keys dropped") {
    // comparator "order by last char of name, then key desc" re-expressed
    // as computed keys (the ORDER … USING migration recipe)
    val r = Relation(sf("nation"), "n").sortByComputedKey(
      (substring(col("n_name"), -1, 1), true),
      (col("n_nationkey"), false))
    val got = r.df.select("n_nationkey").collect().map(_.get(0)).toSeq
    val exp = sf("nation")
      .orderBy(substring(col("n_name"), -1, 1).asc, col("n_nationkey").desc)
      .select("n_nationkey").collect().map(_.get(0)).toSeq
    assert(got == exp)
    assert(!r.df.columns.exists(_.startsWith("__sortkey")))
  }
}
