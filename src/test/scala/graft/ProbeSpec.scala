package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.frontend.PigRunner
import graft.tools.GruntShell

/** Round-9 probe battery over the r8 surface (VERDICT item 2): nested
  * sidecar round-trips through re-LOAD, grunt fs path corners, DUMP
  * format corners, degenerate simhash inputs, struct-packed Invoke with
  * nulls, and STREAM redirection corners. Each probe pins the behavior a
  * reference user would observe. */
class ProbeSpec extends SparkSpec {

  private def tmp(): String =
    Files.createTempDirectory("probe9").toString

  private def runner() = PigRunner(spark)

  test("sidecar round-trip: bag-of-bag survives STORE -schema + re-LOAD") {
    val dir = tmp()
    val d = sf("nation").limit(6)
    // nation → group by region → group the GROUPS again ⇒ bag of tuples
    // whose field is itself a bag (bag-of-bag)
    val r = runner()
    r.run(s"""
      n = LOAD '/root/testdata/sf0.001/nation.parquet';
      p = FOREACH n GENERATE n_regionkey, n_nationkey, n_name;
      g = GROUP p BY n_regionkey;
      h = GROUP g BY (group % 2);
      STORE h INTO '$dir/out' USING PigStorage('\\t', '-schema');
    """)
    assert(Files.exists(Paths.get(dir, "out", ".pig_schema")))
    val back = runner().run(s"b = LOAD '$dir/out' USING PigStorage('\\t');")
      .apply("b")
    // schema came from the sidecar: bag → bag → tuple, not chararray
    val st = back.df.schema
    assert(st.fields.length == 2)
    import org.apache.spark.sql.types._
    val bagT = st.fields(1).dataType
    assert(bagT.isInstanceOf[ArrayType], s"outer bag lost: $bagT")
    val inner = bagT.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[StructType]
    assert(inner.fields.exists(_.dataType.isInstanceOf[ArrayType]),
      s"inner bag lost: $inner")
    // the DATA survives too: 5 regions in 2 parity groups
    val rows = back.df.collect()
    assert(rows.length == 2)
    val bags = rows.map(_.getSeq[Any](1).size).sum
    assert(bags == 5, s"expected 5 region groups across parities, got $bags")
  }

  test("sidecar round-trip: map-of-tuple value schema survives re-LOAD") {
    val dir = tmp()
    runner().run(s"""
      n = LOAD '/root/testdata/sf0.001/region.parquet';
      m = FOREACH n GENERATE r_regionkey,
            TOMAP('r', TOTUPLE(r_name, r_regionkey)) AS meta;
      STORE m INTO '$dir/out' USING PigStorage('\\t', '-schema');
    """)
    val back = runner().run(s"b = LOAD '$dir/out' USING PigStorage('\\t');")
      .apply("b")
    import org.apache.spark.sql.types._
    val mt = back.df.schema.fields(1).dataType
    assert(mt.isInstanceOf[MapType], s"map lost: $mt")
    assert(mt.asInstanceOf[MapType].valueType.isInstanceOf[StructType],
      s"map value tuple lost: $mt")
    val vals = back.df.orderBy(col(back.df.columns.head)).collect()
    assert(vals.length == 5)
    val m0 = vals(0).getMap[String, Any](1)
    assert(m0.contains("r"), s"map key lost: $m0")
  }

  test("grunt fs: relative paths after cd, and CJK directory names") {
    val base = tmp()
    val sh = new GruntShell(runner())
    sh.execute(s"cd $base")
    sh.execute("mkdir 数据目录")
    sh.execute("mkdir 数据目录/sub")
    assert(sh.execute("ls 数据目录").contains("sub"))
    // relative cp + cat resolve against the grunt cwd
    Files.write(Paths.get(base, "数据目录", "файл.txt"),
      "早上好 мир\n".getBytes("UTF-8"))
    sh.execute("cp 数据目录/файл.txt copy.txt")
    assert(sh.execute("cat copy.txt").contains("早上好 мир"))
    sh.execute("cd 数据目录")
    assert(sh.execute("pwd").endsWith("数据目录"))
    assert(sh.execute("ls").contains("sub"))
  }

  test("DUMP corners: nulls in nested tuples, empty bags, multi-key maps") {
    val dir = tmp()
    Files.write(Paths.get(dir, "rows.tsv"),
      "1\tx\n2\t\n".getBytes("UTF-8"))
    val r = runner().run(s"""
      a = LOAD '$dir/rows.tsv' AS (id:int, s:chararray);
      g = GROUP a BY id;
      f = FOREACH a GENERATE id, TOTUPLE(s, id) AS t,
            TOMAP('k1', s, 'k2', id) AS m;
    """)
    val lines = r.apply("f").dumpLines().toSeq.sorted
    // null inside a tuple renders EMPTY (Pig: null → nothing), map as
    // [k#v] pairs joined by ','
    assert(lines.contains("(1,(x,1),[k1#x,k2#1])"), lines.mkString("|"))
    assert(lines.contains("(2,(,2),[k1#,k2#2])"), lines.mkString("|"))
    // an empty bag renders {} — not blank
    val eb = runner().run(s"""
      a = LOAD '$dir/rows.tsv' AS (id:int, s:chararray);
      g = GROUP a BY id;
      h = FOREACH g { kept = FILTER a BY id > 99; GENERATE group, kept; }
    """).apply("h").dumpLines().toSeq.sorted
    assert(eb == Seq("(1,{})", "(2,{})"), eb.mkString("|"))
  }

  test("simhash/simhash128 degenerate docs: empty and 1-token") {
    import graft.text.Dedup
    val df = spark.createDataFrame(Seq(
      (1L, "solo"), (2L, ""), (3L, "   "), (4L, "solo"),
      (5L, "a b c"))).toDF("id", "text")
    val s64 = Dedup.simhash(df, "id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val s128 = Dedup.simhash128(df, "id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // empty/whitespace docs have NO tokens ⇒ no signature row (the
    // pipeline's documented contract: nothing to near-dup on)
    assert(!s64.contains(2L) && !s64.contains(3L))
    assert(!s128.contains(2L) && !s128.contains(3L))
    // 1-token docs hash deterministically; identical docs identical sigs
    assert(s64(1L) == s64(4L) && s128(1L) == s128(4L))
    assert(s64.contains(5L) && s128.contains(5L))
    // and the near-dup pass over a corpus CONTAINING empties must not
    // throw — ids 1 and 4 are the only d=0 pair
    val nd = Dedup.simhashNearDups128(Dedup.simhash128(df, "id", "text"),
      "id", maxDistance = 3, maxBucket = 100).collect()
    assert(nd.length == 1 &&
      Set(nd(0).getLong(0), nd(0).getLong(1)) == Set(1L, 4L))
  }

  test("Invoke with null arguments: null-safe, no NPE (struct-packed path)") {
    val dir = tmp()
    Files.write(Paths.get(dir, "v.tsv"), "7\tx\n\ty\n".getBytes("UTF-8"))
    // Integer.parseInt(null) would NPE inside the JVM — Pig's Invoke
    // yields null for null inputs (EvalFunc null contract)
    val r = runner().run(s"""
      DEFINE ParseI InvokeForInt('java.lang.Integer.parseInt', 'String');
      a = LOAD '$dir/v.tsv' AS (n:chararray, s:chararray);
      b = FOREACH a GENERATE ParseI(n) AS v, s;
    """)
    val rows = r.apply("b").df.orderBy(col("s")).collect()
    assert(rows.length == 2)
    assert(rows(0).getInt(0) == 7)
    assert(rows(1).isNullAt(0), "null arg must give null, not NPE/crash")
    // 5-arg struct-packed path with an embedded null arg
    val r5 = runner().run(s"""
      DEFINE Rep InvokeForString('java.lang.String.replace',
        'String String String', 'false');
      a = LOAD '$dir/v.tsv' AS (n:chararray, s:chararray);
      c = FOREACH a GENERATE Rep(s, 'x', n) AS out;
    """)
    val got = r5.apply("c").df.collect().map(r2 =>
      Option(r2.getString(0)).getOrElse("NULL")).sorted
    assert(got.contains("7") || got.contains("NULL"),
      s"unexpected: ${got.mkString(",")}")
  }

  test("STREAM output() redirection: empty output file = empty relation") {
    val dir = tmp()
    Files.write(Paths.get(dir, "in.tsv"), "1\n2\n".getBytes("UTF-8"))
    // the command writes NOTHING to its output file handle — Pig treats
    // the (existing, empty) file as an empty relation, not an error
    val r = runner().run(s"""
      DEFINE CMD `sh -c 'cat > /dev/null; touch out.txt'`
        input(stdin) output('out.txt');
      a = LOAD '$dir/in.tsv' AS (n:int);
      b = STREAM a THROUGH CMD;
    """)
    assert(r.apply("b").df.count() == 0L)
  }

  test("STREAM with BOTH file handles: input('f') and output('g')") {
    val dir = tmp()
    Files.write(Paths.get(dir, "in.tsv"), "5\n6\n7\n".getBytes("UTF-8"))
    val r = runner().run(s"""
      DEFINE CMD `sh -c 'tr -d "\\r" < fin > fout'`
        input('fin') output('fout');
      a = LOAD '$dir/in.tsv' AS (n:int);
      b = STREAM a THROUGH CMD AS (n:int);
      c = ORDER b BY n;
    """)
    assert(r.apply("c").df.collect().map(_.getInt(0)).toSeq == Seq(5, 6, 7))
  }

  test("ILLUSTRATE corners: bag column from GROUP and an empty alias") {
    val dir = tmp()
    Files.write(Paths.get(dir, "t.tsv"), "1\ta\n1\tb\n2\tc\n".getBytes("UTF-8"))
    val r = runner()
    r.run(s"""
      a = LOAD '$dir/t.tsv' AS (k:int, v:chararray);
      g = GROUP a BY k;
      e = FILTER a BY k > 99;
    """)
    val bagOut = r.illustrateText("g")
    // header renders the Pig schema of the bag column; sample rows print
    assert(bagOut.contains("| g    ") && bagOut.contains("group:int"))
    // bag schema renders in Pig Schema.toString form: a:{(k: int,...)}
    assert(bagOut.contains("a:{(k: int,v: chararray)}"))
    assert(bagOut.contains("{(1,a),(1,b)}")) // bag cells in Pig format
    // empty intermediate: headers only, no fabricated rows, no crash
    val emptyOut = r.illustrateText("e")
    assert(emptyOut.contains("k:int") && emptyOut.contains("v:chararray"))
  }

  test("ILLUSTRATE examples are lineage-coupled: aggregates reflect the " +
       "shared base sample; a selective filter grows it or falls back") {
    val dir = tmp()
    Files.write(Paths.get(dir, "big.tsv"),
      (1 to 10000).map(i => s"$i\tv$i").mkString("", "\n", "\n")
        .getBytes("UTF-8"))
    val r = runner()
    r.run(s"""
      a = LOAD '$dir/big.tsv' AS (k:int, v:chararray);
      g = GROUP a ALL;
      c = FOREACH g GENERATE COUNT(a) AS n;
      f = FILTER a BY k > 25;
      deep = FILTER a BY k > 9990;
    """)
    // the COUNT example is computed over the ~20-row base sample the
    // whole chain shares (ExampleGenerator's downstream pass), not the
    // full 10000-row input
    val cOut = r.illustrateText("c")
    assert(cOut.contains("| 20 "), cOut.linesIterator.toSeq.takeRight(3)
      .mkString("\n"))
    // k > 25 is empty on a 20-row sample: the base sample must GROW
    // until the filter yields examples (augmentation without synthesis)
    val fOut = r.illustrateText("f")
    assert(fOut.linesIterator.exists(l => l.contains("| 26 ")), fOut)
    // selective beyond any sample tier: real full-data rows, never an
    // empty table for a nonempty alias
    val dOut = r.illustrateText("deep")
    assert(dOut.linesIterator.exists(l => l.contains("| 9991 ")), dOut)
  }

  // ---- round-9b battery: BuildBloom/Bloom pair, exec barrier, cache()
  private val sfdir = "/root/testdata/sf0.001"
test("P1: BuildBloom/Bloom over a COMPOUND key") {
    val r = PigRunner(spark).run(s"""
      DEFINE bb BuildBloom('Hash.JENKINS_HASH', 'fixed', '4096', '3');
      n = LOAD '$sfdir/nation.parquet';
      k = FILTER n BY n_regionkey == 2;
      g = GROUP k ALL;
      f = FOREACH g GENERATE bb(k.n_name, k.n_nationkey) AS bf;
      a = LOAD '$sfdir/nation.parquet';
      hits = FILTER a BY Bloom(f.bf, n_name, n_nationkey);
    """)
    val hits = r.apply("hits").df.count()
    val exact = sf("nation").filter(org.apache.spark.sql.functions
      .col("n_regionkey") === 2).count()
    info(s"compound: hits=$hits exact=$exact")
    assert(hits >= exact)
  }

  test("P2: BuildBloom bad ctor errors loudly") {
    val e = intercept[Exception] {
      PigRunner(spark).run(s"""
        DEFINE bb BuildBloom('Hash.JENKINS_HASH');
        n = LOAD '$sfdir/nation.parquet';
        g = GROUP n ALL;
        f = FOREACH g GENERATE bb(n.n_name);
        DUMP f;
      """)
    }
    info(s"P2 msg: ${e.getMessage}")
    assert(String.valueOf(e.getMessage).toLowerCase.contains("buildbloom"))
  }

  test("P3: Bloom over a missing path errors loudly") {
    val e = intercept[Exception] {
      PigRunner(spark).run(s"""
        DEFINE probe Bloom('/tmp/definitely_missing_bloom_filter_xyz');
        n = LOAD '$sfdir/nation.parquet';
        h = FILTER n BY probe(n_name);
        DUMP h;
      """)
    }
    info(s"P3 msg: ${String.valueOf(e.getMessage).take(200)}")
  }

  test("P4: alias named exec still works; trailing exec without semicolon") {
    val r = PigRunner(spark).run(s"""
      a = LOAD '$sfdir/nation.parquet';
      exec = FILTER a BY n_regionkey == 0;
      b = FOREACH exec GENERATE n_name;
      exec;
    """)
    assert(r.apply("b").df.count() > 0)
    val r2 = PigRunner(spark).run("a = LOAD '" + sfdir + "/nation.parquet';\nexec")
    assert(r2.apply("a").df.count() == 25)
  }

  test("P5: cache() with a missing source fails with reference text") {
    val e = intercept[Exception] {
      PigRunner(spark).run(s"""
        DEFINE CMD `cat` cache('/tmp/no_such_cache_file_zzz#link');
        n = LOAD '$sfdir/nation.parquet';
        s = STREAM n THROUGH CMD;
        DUMP s;
      """)
    }
    info(s"P5 msg: ${e.getMessage}")
    assert(String.valueOf(e.getMessage).contains("Invalid cache specification"))
  }

  test("P6: BuildBloom non-fused path (bag also consumed)") {
    // COUNT(k) next to bb(k.n_name) still fuses; force the bag path by
    // consuming the bag itself
    val r = PigRunner(spark).run(s"""
      DEFINE bb BuildBloom('Hash.JENKINS_HASH', 'fixed', '4096', '3');
      n = LOAD '$sfdir/nation.parquet';
      k = FILTER n BY n_regionkey == 2;
      g = GROUP k ALL;
      f = FOREACH g GENERATE bb(k.n_name) AS bf, SIZE(k) AS sz;
      a = LOAD '$sfdir/nation.parquet';
      hits = FILTER a BY Bloom(f.bf, n_name);
    """)
    val hits = r.apply("hits").df.count()
    val exact = sf("nation").filter(org.apache.spark.sql.functions
      .col("n_regionkey") === 2).count()
    info(s"nonfused: hits=$hits exact=$exact")
    assert(hits >= exact, "false negatives in non-fused build")
  }

  test("review pins: banding misconfiguration fails loudly; intervalJoin " +
       "requires an equality key; top-gram ratio uses the most FREQUENT " +
       "gram, not the heaviest") {
    import graft.text.Dedup
    // numBands > numHashes → rowsPerBand 0 would put every doc in one
    // bucket and then silently drop it via the size cap
    val df = spark.createDataFrame(Seq((1L, "a b c d e")))
      .toDF("id", "text")
    intercept[IllegalArgumentException] {
      Dedup.minhashNearDupsByWords(df, "id", "text",
        numHashes = 64, numBands = 100)
    }
    intercept[IllegalArgumentException] {
      Dedup.lshCandidatePairs(df, "id", "text", numBands = 100,
        rowsPerBand = 0)
    }
    intercept[IllegalArgumentException] {
      graft.streaming.Streams.intervalJoin(df, "text", df, "text",
        Seq.empty, "10 minutes", "1 hour")
    }
    // Gopher top-gram: "a b" x3 (9 chars) beats "wonderful delightful"
    // x2 (40 chars) on frequency — the ratio must use 9, not 40
    val doc = spark.createDataFrame(Seq((1L,
      "a b a b a b wonderful delightful wonderful delightful")))
      .toDF("id", "text")
    val r = graft.text.TextAnalysis.repetitionStats(doc, "id", "text")
      .head()
    val nChars = 53.0
    assert(math.abs(r.getDouble(3) - 3 * 3 / nChars) < 1e-4,
      s"top2gram used char mass, not top frequency: ${r.getDouble(3)}")
  }

  test("cappedCandidatePairs: the r18 streaming generator emits exactly " +
       "the sorted (i<j) pair set per in-cap bucket — cap boundary " +
       "kept, over-cap dropped, cross-bucket repeats collapsed, " +
       "degenerate duplicate ids preserved") {
    import graft.text.Dedup
    val maxBucket = 4
    val data = Seq(
      // band 0 bucket 0: exactly AT the cap — kept, all 6 pairs
      (1L, 0, 0L), (4L, 0, 0L), (2L, 0, 0L), (3L, 0, 0L),
      // band 0 bucket 1: one over the cap — dropped entirely
      (10L, 0, 1L), (11L, 0, 1L), (12L, 0, 1L), (13L, 0, 1L), (14L, 0, 1L),
      // band 1 bucket 0: repeats the (1,2) pair (distinct collapses it)
      (2L, 1, 0L), (1L, 1, 0L), (9L, 1, 0L),
      // band 1 bucket 1: singleton — no pairs
      (7L, 1, 1L),
      // band 2 bucket 5: duplicate id in one bucket (degenerate) —
      // sorted [6,8,8] yields (6,8) twice and the equal pair (8,8)
      (8L, 2, 5L), (8L, 2, 5L), (6L, 2, 5L))
    val buckets = spark.createDataFrame(data).toDF("id", "band", "bucket")
    val got = Dedup.cappedCandidatePairs(buckets, "id", maxBucket)
      .collect().map(r2 => (r2.getLong(0), r2.getLong(1))).toSet
    // brute-force reference over the same grouping rule
    val ref = data.groupBy(t => (t._2, t._3)).values
      .filter(g => g.size >= 2 && g.size <= maxBucket)
      .flatMap { g =>
        val ids = g.map(_._1).sorted
        for (i <- ids.indices; j <- i + 1 until ids.length)
          yield (ids(i), ids(j))
      }.toSet
    assert(got == ref, s"got $got\nref $ref")
    assert(got.contains((8L, 8L)) && !got.contains((10L, 11L)) &&
      got.contains((1L, 2L)))
  }
}
