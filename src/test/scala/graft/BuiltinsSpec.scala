package graft

import org.apache.spark.sql.functions._
import graft.functions.Builtins
import graft.functions.Builtins._

/** Builtin semantics vs the reference (TestBuiltin.java patterns). */
class BuiltinsSpec extends SparkSpec {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): Any =
    Seq(1).toDF("x").select(c).head().get(0)

  test("MATCHES anchors the whole string (RegexExpression)") {
    assert(one(MATCHES(lit("PROMO BRASS"), "PROMO.*")) == true)
    assert(one(MATCHES(lit("XPROMO"), "PROMO.*")) == false)  // not anchored-prefix
    assert(one(MATCHES(lit("PROMO"), "PRO")) == false)        // whole-string
  }

  test("REGEX_EXTRACT: null on no-match (not empty string)") {
    assert(one(REGEX_EXTRACT(lit("ab12"), "([0-9]+)", 1)) == "12")
    assert(one(REGEX_EXTRACT(lit("abcd"), "([0-9]+)", 1)) == null)
  }

  test("INDEXOF/LAST_INDEX_OF are 0-based with -1 absent") {
    assert(one(INDEXOF(lit("ab#cd"), "#")) == 2)
    assert(one(INDEXOF(lit("abcd"), "#")) == -1)
    assert(one(LAST_INDEX_OF(lit("a#b#c"), "#")) == 3)
    assert(one(LAST_INDEX_OF(lit("abc"), "#")) == -1)
  }

  test("SUBSTRING is 0-based [start, stop)") {
    assert(one(SUBSTRING(lit("hello"), 1, 3)) == "el")
  }

  test("TOKENIZE splits on pig delimiters and drops empties") {
    val toks = one(TOKENIZE(lit("""hi "there" (you)*star,x""")))
      .asInstanceOf[scala.collection.Seq[String]].toSeq
    assert(toks == Seq("hi", "there", "you", "star", "x"))
  }

  test("LCFIRST/UCFIRST") {
    assert(one(LCFIRST(lit("Hello"))) == "hello")
    assert(one(UCFIRST(lit("hello"))) == "Hello")
  }

  test("bag builtins: SIZE/IsEmpty/SUBTRACT/DIFF/BagToString/TOP") {
    val df = Seq((Seq(1, 2, 3), Seq(2, 3, 4))).toDF("a", "b")
    val r = df.select(
      SIZE(col("a")).as("s"), IsEmpty(col("a")).as("e"),
      SUBTRACT(col("a"), col("b")).as("sub"),
      array_sort(DIFF(col("a"), col("b"))).as("d"),
      BagToString(col("a"), "_").as("bs")).head()
    assert(r.getLong(0) == 3 && !r.getBoolean(1))
    assert(r.getSeq[Int](2) == Seq(1))
    assert(r.getSeq[Int](3) == Seq(1, 4))
    assert(r.getString(4) == "1_2_3")
  }

  test("TOP(n) picks largest by field") {
    val df = Seq(Tuple1(Seq((1, "a"), (5, "b"), (3, "c")))).toDF("bag")
      .select(col("bag").cast("array<struct<v:int,s:string>>").as("bag"))
    val top = df.select(TOP(2, "v", col("bag"))).head().getSeq[org.apache.spark.sql.Row](0)
    assert(top.map(_.getInt(0)) == Seq(5, 3))
  }

  test("AddDuration ISO-8601 (incl. months/years/weeks + mixed)") {
    val df = Seq("2020-01-01 00:00:00").toDF("s")
      .select(AddDuration(col("s").cast("timestamp"), "P1D").as("t"),
              AddDuration(col("s").cast("timestamp"), "PT2H30M").as("t2"),
              AddDuration(col("s").cast("timestamp"), "P1M").as("t3"),
              AddDuration(col("s").cast("timestamp"), "P1Y2M3DT4H").as("t4"),
              SubtractDuration(col("s").cast("timestamp"), "P1W").as("t5"))
    val r = df.select(df.columns.map(c => col(c).cast("string")): _*).head()
    assert(r.getString(0) == "2020-01-02 00:00:00")
    assert(r.getString(1) == "2020-01-01 02:30:00")
    assert(r.getString(2) == "2020-02-01 00:00:00")
    assert(r.getString(3) == "2021-03-04 04:00:00")
    assert(r.getString(4) == "2019-12-25 00:00:00")
  }

  test("ToString and the *Between family") {
    val df = Seq(("2020-03-15 10:30:00", "2020-01-01 00:00:00")).toDF("a", "b")
      .select(col("a").cast("timestamp").as("a"),
              col("b").cast("timestamp").as("b"))
    val r = df.select(
      Builtins.ToString(col("a"), "yyyy-MM-dd"),
      SecondsBetween(col("a"), col("b")),
      HoursBetween(col("a"), col("b")),
      DaysBetween(col("a"), col("b")),
      MonthsBetween(col("a"), col("b")),
      WeeksBetween(col("a"), col("b"))).head()
    assert(r.getString(0) == "2020-03-15")
    assert(r.getLong(1) == 74L * 86400 + 10 * 3600 + 30 * 60)
    assert(r.getLong(2) == 74L * 24 + 10)
    assert(r.getLong(3) == 74L)
    assert(r.getLong(4) == 2L)
    assert(r.getLong(5) == 10L)
  }

  test("*Between joda parity: negative intervals truncate toward zero") {
    val df = Seq(1).toDF("x")
    def ts(s: String) = lit(s).cast("timestamp")
    val r = df.select(
      // sub-second span: joda millis diff → 0 whole seconds (not -1)
      SecondsBetween(ts("2020-01-01 00:00:00.400"), ts("2020-01-01 00:00:01")),
      // -2 months 15 days → -2 (floor would give -3)
      MonthsBetween(ts("2020-01-10 00:00:00"), ts("2020-03-25 00:00:00")),
      // 11 months → 0 years (ADVICE case: year(a)-year(b) gave 1)
      YearsBetween(ts("2022-06-01 00:00:00"), ts("2021-07-01 00:00:00")),
      // millisecond accuracy
      MilliSecondsBetween(ts("2020-01-01 00:00:00.750"),
                          ts("2020-01-01 00:00:00.250")),
      // -36h → -1 day toward zero (floor would give -2)
      DaysBetween(ts("2020-01-01 00:00:00"), ts("2020-01-02 12:00:00")),
      HoursBetween(ts("2020-01-01 00:00:00"), ts("2020-01-01 01:30:00")),
      MinutesBetween(ts("2020-01-01 00:00:00"), ts("2020-01-01 00:01:30"))
    ).head()
    assert(r.getLong(0) == 0L)
    assert(r.getLong(1) == -2L)
    assert(r.getLong(2) == 0L)
    assert(r.getLong(3) == 500L)
    assert(r.getLong(4) == -1L)
    assert(r.getLong(5) == -1L)
    assert(r.getLong(6) == -1L)
  }

  test("ToMilliSeconds/ToUnixTime/GetMilliSecond/GetWeekYear joda parity") {
    val df = Seq(1).toDF("x")
    def ts(s: String) = lit(s).cast("timestamp")
    val r = df.select(
      Builtins.ToMilliSeconds(ts("1970-01-01 00:00:01.5")),
      Builtins.ToUnixTime(ts("1969-12-31 23:59:59.5")), // joda: -500/1000 = 0
      Builtins.GetMilliSecond(ts("2020-01-01 00:00:00.250")),
      Builtins.GetWeekYear(ts("2021-01-01 00:00:00"))   // ISO week year
    ).head()
    assert(r.getLong(0) == 1500L)
    assert(r.getLong(1) == 0L)
    assert(r.getInt(2) == 250)
    assert(r.getInt(3) == 2020)
  }

  test("ROUND matches Math.round on negative .5 (toward +inf)") {
    val r = Seq((-2.5, 2.5, -2.4)).toDF("a", "b", "c")
      .select(ROUND(col("a")), ROUND(col("b")), ROUND(col("c"))).head()
    assert(r.getLong(0) == -2L && r.getLong(1) == 3L && r.getLong(2) == -2L)
  }

  test("algebraic UDAF surface: CountNonNull and TopK (SURVEY §2.7)") {
    graft.functions.UdfSurface.defineCountNonNull(spark, "count_nn")
    graft.functions.UdfSurface.defineTopK(spark, "top3", 3)
    val df = Seq(Some(5L), None, Some(9L), Some(1L), Some(7L))
      .toDF("v")
    df.createOrReplaceTempView("t_udaf")
    val r = spark.sql("SELECT count_nn(v), top3(v) FROM t_udaf").head()
    assert(r.getLong(0) == 4L)
    assert(r.getSeq[Long](1) == Seq(9L, 7L, 5L))
  }

  test("cast-failure yields null under graft session (ansi off, §1.4)") {
    val r = Seq("12", "x").toDF("s").select(col("s").cast("int")).collect()
    assert(r(0).getInt(0) == 12 && r(1).isNullAt(0))
  }

  test("int/int is Java division in scripts (truncating, int result)") {
    // reference Divide.java:72: (Integer) a / (Integer) b
    val out = graft.frontend.PigRunner(spark).run(s"""
      n = LOAD '/root/testdata/sf0.001/nation.parquet';
      d = FOREACH n GENERATE n_nationkey,
            7 / 2 AS q1, -7 / 2 AS q2, 7 / 2.0 AS q3,
            n_nationkey / 4 AS q4, n_nationkey / 0 AS q5;
    """).apply("d").df.filter(col("n_nationkey") === 9).head()
    assert(out.getInt(1) == 3)            // truncation, int type
    assert(out.getInt(2) == -3)           // toward zero, not floor
    assert(out.getDouble(3) == 3.5)       // mixed types stay double
    assert(out.getInt(4) == 2)            // int column / int -> int
    assert(out.isNullAt(5))               // /0 -> null (ansi off)
  }

  test("int division by zero yields null, not error") {
    val r = Seq((1, 0)).toDF("a", "b").select(col("a") / col("b")).head()
    assert(r.isNullAt(0))
  }
}
