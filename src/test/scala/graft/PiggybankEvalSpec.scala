package graft

import java.nio.file.{Files, Paths}
import graft.frontend.PigRunner

/** Piggybank evaluation-function parity (reference: contrib/piggybank/
  * java/src/main/java/org/apache/pig/piggybank/evaluation/...): callable
  * through `DEFINE alias org.apache.pig.piggybank.evaluation.<pkg>.<N>()`
  * exactly as reference users write them. Expected values are computed
  * from the reference's own Java semantics. */
class PiggybankEvalSpec extends SparkSpec {

  private def dir(): String = Files.createTempDirectory("pbank").toString

  private def run1(script: String, alias: String) =
    PigRunner(spark).run(script).apply(alias).df.collect()

  test("string: Reverse, LENGTH, Stuff, REPLACE_MULTI via DEFINE") {
    val d = dir()
    Files.write(Paths.get(d, "t.tsv"), "hello world\n".getBytes("UTF-8"))
    val rows = run1(s"""
      DEFINE Rev org.apache.pig.piggybank.evaluation.string.Reverse();
      DEFINE Len org.apache.pig.piggybank.evaluation.string.LENGTH();
      DEFINE St  org.apache.pig.piggybank.evaluation.string.Stuff();
      DEFINE RM  org.apache.pig.piggybank.evaluation.string.REPLACE_MULTI();
      a = LOAD '$d/t.tsv' AS (s:chararray);
      b = FOREACH a GENERATE Rev(s) AS r, Len(s) AS n,
            St(s, 0, 5, 'howdy') AS st,
            RM(s, ['l'#'L', 'o'#'0']) AS rm;
    """, "b")
    val r = rows.head
    assert(r.getString(0) == "dlrow olleh")
    assert(r.getInt(1) == 11)
    assert(r.getString(2) == "howdy world")   // Stuff.java: delete+insert
    assert(r.getString(3) == "heLL0 w0rLd")   // sequential replaceAll
  }

  test("HashFNV matches the reference's 32-bit FNV-1 with Pig's init") {
    // reference HashFNV.java: hval=33554467; hval*=0x01000193; hval^=b
    def fnv(s: String): Long = {
      var h = 33554467
      s.getBytes("UTF-8").foreach { b => h *= 0x01000193; h ^= b }
      h.toLong
    }
    val d = dir()
    Files.write(Paths.get(d, "t.tsv"), "abc\nzpig\n".getBytes("UTF-8"))
    val rows = run1(s"""
      DEFINE H org.apache.pig.piggybank.evaluation.string.HashFNV();
      a = LOAD '$d/t.tsv' AS (s:chararray);
      b = FOREACH a GENERATE s, H(s) AS h, H(s, 1000) AS hm;
    """, "b").map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    for (s <- Seq("abc", "zpig")) {
      assert(rows(s)._1 == fnv(s), s"fnv($s)")
      assert(rows(s)._2 == (if (1000 > 0) fnv(s) % 1000 else fnv(s)))
    }
  }

  test("Is* family: Java parse acceptance, false on junk/null") {
    val d = dir()
    Files.write(Paths.get(d, "t.tsv"),
      "42\n-7\n2147483648\n3.14\n1.5f\nNaN\nabc\n\n".getBytes("UTF-8"))
    val rows = run1(s"""
      DEFINE II org.apache.pig.piggybank.evaluation.IsInt();
      DEFINE IL org.apache.pig.piggybank.evaluation.IsLong();
      DEFINE IF org.apache.pig.piggybank.evaluation.IsFloat();
      DEFINE ID org.apache.pig.piggybank.evaluation.IsDouble();
      DEFINE IN org.apache.pig.piggybank.evaluation.IsNumeric();
      a = LOAD '$d/t.tsv' AS (s:chararray);
      b = FOREACH a GENERATE s, II(s), IL(s), IF(s), ID(s), IN(s);
    """, "b").map(r => Option(r.getString(0)).getOrElse("NULL") ->
      (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3), r.getBoolean(4),
       r.getBoolean(5))).toMap
    assert(rows("42") == (true, true, true, true, true))
    assert(rows("-7") == (true, true, true, true, true))
    // int overflow: parseInt fails, parseLong succeeds (IsInt.java)
    assert(rows("2147483648") == (false, true, true, true, true))
    assert(rows("3.14") == (false, false, true, true, true))
    // Java Float.parseFloat accepts the f suffix; IsNumeric's regex not
    assert(rows("1.5f") == (false, false, true, true, false))
    assert(rows("NaN") == (false, false, true, true, false))
    assert(rows("abc") == (false, false, false, false, false))
  }

  test("Decode and Bin (decode/Decode.java, decode/Bin.java)") {
    val d = dir()
    Files.write(Paths.get(d, "t.tsv"),
      "a\t1\nb\t15\nc\t99\n".getBytes("UTF-8"))
    val rows = run1(s"""
      DEFINE Dec org.apache.pig.piggybank.evaluation.decode.Decode();
      DEFINE B   org.apache.pig.piggybank.evaluation.decode.Bin();
      a = LOAD '$d/t.tsv' AS (k:chararray, v:int);
      b = FOREACH a GENERATE k, Dec(k, 'a', 'alpha', 'b', 'beta', 'other') AS dk,
            B(v, 'low', 10, 'mid', 50, 'high') AS bv;
    """, "b").map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    assert(rows("a") == ("alpha", "low"))   // 1 <= 10
    assert(rows("b") == ("beta", "mid"))    // 15 <= 50
    assert(rows("c") == ("other", "high"))  // falls through to last label
  }

  test("datetime converters and ISO truncation/diff family") {
    val d = dir()
    Files.write(Paths.get(d, "t.tsv"),
      "2010-04-15T08:11:33.020Z\t20100420\t20100415\n".getBytes("UTF-8"))
    val rows = run1(s"""
      DEFINE U  org.apache.pig.piggybank.evaluation.datetime.convert.ISOToUnix();
      DEFINE I  org.apache.pig.piggybank.evaluation.datetime.convert.UnixToISO();
      DEFINE TD org.apache.pig.piggybank.evaluation.datetime.truncate.ISOToDay();
      DEFINE TM org.apache.pig.piggybank.evaluation.datetime.truncate.ISOToMonth();
      DEFINE DD org.apache.pig.piggybank.evaluation.datetime.DiffDate();
      DEFINE DB org.apache.pig.piggybank.evaluation.datetime.diff.ISODaysBetween();
      a = LOAD '$d/t.tsv' AS (iso:chararray, d1:chararray, d2:chararray);
      b = FOREACH a GENERATE U(iso) AS millis, I(U(iso)) AS round_trip,
            TD(iso) AS day, TM(iso) AS month, DD(d1, d2) AS dd,
            DB('2010-04-18T00:00:00.000Z', iso) AS db;
    """, "b")
    val r = rows.head
    assert(r.getLong(0) == 1271319093020L)
    assert(r.getString(1) == "2010-04-15T08:11:33.020Z")
    assert(r.getString(2) == "2010-04-15T00:00:00.000Z")
    assert(r.getString(3) == "2010-04-01T00:00:00.000Z")
    assert(r.getInt(4) == 5)   // DiffDate: date1 - date2 in days
    assert(r.getLong(5) == 2L) // whole days between (joda Days.daysBetween)
  }

  test("regex family and math twins (RegexMatch full-match, type-suffixed)") {
    val d = dir()
    Files.write(Paths.get(d, "t.tsv"), "ab12\t-3.5\nxy\t2.0\n".getBytes("UTF-8"))
    val rows = run1(s"""
      DEFINE RMch org.apache.pig.piggybank.evaluation.string.RegexMatch();
      DEFINE RExt org.apache.pig.piggybank.evaluation.string.RegexExtract();
      DEFINE LIO  org.apache.pig.piggybank.evaluation.string.LASTINDEXOF();
      DEFINE DAbs org.apache.pig.piggybank.evaluation.math.DoubleAbs();
      DEFINE DMax org.apache.pig.piggybank.evaluation.math.DoubleMax();
      DEFINE Pw   org.apache.pig.piggybank.evaluation.math.POW();
      a = LOAD '$d/t.tsv' AS (s:chararray, v:double);
      b = FOREACH a GENERATE s,
            RMch(s, '[a-z]+') AS full_alpha,
            RMch(s, '[a-z]+\\\\d+') AS alpha_num,
            RExt(s, '([a-z]+)', 1) AS first_alpha,
            LIO(s, 'b') AS lio,
            DAbs(v) AS av, DMax(v, 0.0) AS mx, Pw(v, 2) AS sq;
    """, "b").map(r => r.getString(0) ->
      (r.getInt(1), r.getInt(2), r.getString(3), r.getInt(4),
       r.getDouble(5), r.getDouble(6), r.getDouble(7))).toMap
    // matches() is a FULL match: 'ab12' vs [a-z]+ fails, [a-z]+\d+ hits
    assert(rows("ab12") == (0, 1, "ab", 1, 3.5, 0.0, 12.25))
    assert(rows("xy") == (1, 0, "xy", -1, 2.0, 2.0, 4.0))
  }

  test("MaxTupleBy1stField and ExtremalTupleByNthField over grouped bags") {
    val d = dir()
    Files.write(Paths.get(d, "t.tsv"),
      "g1\t3\tc\ng1\t9\ta\ng1\t5\tb\ng2\t1\tz\n".getBytes("UTF-8"))
    val rows = run1(s"""
      DEFINE MaxT org.apache.pig.piggybank.evaluation.MaxTupleBy1stField();
      DEFINE MinBy2 org.apache.pig.piggybank.evaluation.ExtremalTupleByNthField('2', 'min');
      a = LOAD '$d/t.tsv' AS (g:chararray, n:int, s:chararray);
      grp = GROUP a BY g;
      b = FOREACH grp GENERATE group,
            MaxT(a.(n, s)) AS mx, MinBy2(a) AS mn;
    """, "b").map { r =>
      val mx = r.getStruct(1); val mn = r.getStruct(2)
      r.getString(0) -> ((mx.getInt(0), mx.getString(1)),
        (mn.getString(0), mn.getInt(1), mn.getString(2)))
    }.toMap
    assert(rows("g1") == ((9, "a"), ("g1", 3, "c"))) // max by n; min by n
    assert(rows("g2") == ((1, "z"), ("g2", 1, "z")))
  }
}
