package graft

import java.nio.file.{Files, Paths, StandardOpenOption}
import org.apache.spark.sql.functions._
import graft.frontend.PigRunner

/** The reference's ENTIRE PigMix perf suite — L1..L17 from
  * test/perf/pigmix/src/pig/ — run VERBATIM through the frontend
  * (only the jar `register` line is stripped; $params substituted like
  * runpigmix.pl does) against a miniature deterministic page_views
  * corpus in the suite's own wire format (^A fields, ^C/^D maps,
  * ^B-tagged bags — datagen/DataGenerator.java:writeCol). The derived
  * tables (page_views_sorted, users_sorted, power_users_samples,
  * widegroupbydata) are produced by the same Pig statements
  * bin/generate_data.sh uses — run through this engine.
  *
  * L3, L8 and L12 are additionally oracle-checked against hand-written
  * Spark twins computed from the same files.
  */
class PigMixE2eSpec extends SparkSpec {

  private val FS = "\u0001" // field sep
  private val ES = "\u0002" // bag element sep
  private val MS = "\u0003" // map entry sep
  private val KV = "\u0004" // map key-value sep

  private def writeLines(path: String, lines: Seq[String]): Unit = {
    val p = Paths.get(path)
    Files.createDirectories(p.getParent)
    Files.write(p, lines.mkString("", "\n", "\n").getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
  }

  /** Deterministic mini page_views in the PigMix wire format. */
  private def pageViewRows(n: Int): Seq[String] = {
    val rnd = new java.util.Random(20260814L)
    (0 until n).map { _ =>
      val user = if (rnd.nextInt(100) < 5) ""
                 else "user" + rnd.nextInt(800)
      val action = (1 + rnd.nextInt(2)).toString
      val timespent = rnd.nextInt(100).toString
      val queryTerm = if (rnd.nextInt(100) < 3) ""
                      else "term" + rnd.nextInt(50)
      val ip = s"10.0.${rnd.nextInt(8)}.${rnd.nextInt(256)}"
      val ts = rnd.nextInt(86400).toString
      val rev = f"${rnd.nextInt(100000) / 100.0}%.2f"
      val pageInfo = ('a' to 'f')
        .map(k => s"$k$KV" + "v" + rnd.nextInt(10)).mkString(MS)
      val pageLinks = (0 until 2 + rnd.nextInt(2)).map { _ =>
        "m" + ('a' to 'c')
          .map(k => s"$k$KV" + "w" + rnd.nextInt(10)).mkString(MS)
      }.mkString(ES)
      Seq(user, action, timespent, queryTerm, ip, ts, rev,
        pageInfo, pageLinks).mkString(FS)
    }
  }

  private def userRow(name: String, rnd: java.util.Random): String =
    Seq(name, f"555-${rnd.nextInt(10000)}%04d", s"${rnd.nextInt(99)} Main St",
      "city" + rnd.nextInt(20), "st" + rnd.nextInt(8),
      f"${rnd.nextInt(100000)}%05d").mkString(FS)

  /** Generate raw tables, then derive the sorted/sampled/wide ones via
    * the same Pig statements generate_data.sh runs. */
  private lazy val base: String = {
    val dir = Files.createTempDirectory("pigmix").toString
    val pv = pageViewRows(6000)
    writeLines(s"$dir/page_views/part-00000", pv)
    val names = pv.map(_.split(FS)(0)).filter(_.nonEmpty).distinct.sorted
    val rnd = new java.util.Random(7L)
    // users = every page_views user (generate_data skims them) + a few
    // ghosts so L5's anti-join has hits
    writeLines(s"$dir/users/part-00000",
      (names ++ (1 to 5).map("ghost" + _)).map(userRow(_, rnd)))
    writeLines(s"$dir/power_users/part-00000",
      names.take(500).map(userRow(_, rnd)))
    val wrnd = new java.util.Random(11L)
    writeLines(s"$dir/widerow/part-00000",
      (0 until 200).map { i =>
        ("wuser" + wrnd.nextInt(150)) + FS +
          (0 until 500).map(_ => wrnd.nextInt(10000)).mkString(FS)
      })
    // derived tables — generate_data.sh's own pig, verbatim shapes
    PigRunner(spark).run(
      raw"""
      A = load '$dir/page_views' using org.apache.pig.test.pigmix.udf.PigPerformanceLoader()
          as (user, action, timespent, query_term, ip_addr, timestamp, estimated_revenue, page_info, page_links);
      B = order A by user parallel 4;
      store B into '$dir/page_views_sorted' using PigStorage('');
      alpha = load '$dir/users' using PigStorage('') as (name, phone, address, city, state, zip);
      a1 = order alpha by name parallel 4;
      store a1 into '$dir/users_sorted' using PigStorage('');
      a = load '$dir/power_users' using PigStorage('') as (name, phone, address, city, state, zip);
      b = sample a 0.5;
      store b into '$dir/power_users_samples' using PigStorage('');
      A2 = load '$dir/page_views' using org.apache.pig.test.pigmix.udf.PigPerformanceLoader()
          as (user, action, timespent, query_term, ip_addr, timestamp, estimated_revenue, page_info, page_links);
      B2 = foreach A2 generate user, action, timespent, query_term, ip_addr, timestamp, estimated_revenue, page_info, page_links,
           user as user1, action as action1, timespent as timespent1, query_term as query_term1, ip_addr as ip_addr1, timestamp as timestamp1, estimated_revenue as estimated_revenue1, page_info as page_info1, page_links as page_links1,
           user as user2, action as action2, timespent as timespent2, query_term as query_term2, ip_addr as ip_addr2, timestamp as timestamp2, estimated_revenue as estimated_revenue2, page_info as page_info2, page_links as page_links2;
      store B2 into '$dir/widegroupbydata' using PigStorage('');
      """)
    dir
  }

  private def runScript(i: Int, out: String): PigRunner = {
    val raw = new String(Files.readAllBytes(
      Paths.get(s"/root/reference/test/perf/pigmix/src/pig/L$i.pig")),
      "UTF-8")
    val script = raw.replaceAll("(?m)^register .*$", "")
    PigRunner(spark).run(script, Map(
      "HDFS_ROOT" -> base, "PIGMIX_OUTPUT" -> out, "PARALLEL" -> "4"))
  }

  private def outRows(path: String): Long =
    spark.read.text(path).count()

  test("PigMix L1-L17 run verbatim; all stores materialize") {
    val out = Files.createTempDirectory("pigmix_out").toString
    val expected: Map[Int, Seq[String]] = Map(
      1 -> Seq("L1out"), 2 -> Seq("L2out"), 3 -> Seq("L3out"),
      4 -> Seq("L4out"), 5 -> Seq("L5out"), 6 -> Seq("L6out"),
      7 -> Seq("L7out"), 8 -> Seq("L8out"), 9 -> Seq("L9out"),
      10 -> Seq("L10out"), 11 -> Seq("L11out"),
      12 -> Seq("highest_value_page_per_user",
                "total_timespent_per_term", "queries_per_action"),
      13 -> Seq("L13out"), 14 -> Seq("L14out"), 15 -> Seq("L15out"),
      16 -> Seq("L16out"), 17 -> Seq("L17out"))
    (1 to 17).foreach { i =>
      runScript(i, out)
      expected(i).foreach { o =>
        val n = outRows(s"$out/$o")
        assert(n > 0, s"L$i: $o is empty")
      }
    }
    info(s"all 17 PigMix scripts ran; outputs under $out")
  }

  test("L3 (join + group sum) matches a hand-written Spark twin") {
    val out = Files.createTempDirectory("pigmix_l3").toString
    val r = runScript(3, out)
    val got = r.apply("E").df
      .collect().map(x => (x.getString(0), math.round(x.getDouble(1) * 100)))
      .toSet
    val pvs = spark.read.option("sep", FS).csv(s"$base/page_views")
      .select(col("_c0").as("user"), col("_c6").cast("double").as("rev"))
    val us = spark.read.option("sep", FS).csv(s"$base/users")
      .select(col("_c0").as("name"))
    val want = us.join(pvs, us("name") === pvs("user"))
      .groupBy("name").agg(sum("rev").as("s"))
      .collect().map(x => (x.getString(0), math.round(x.getDouble(1) * 100)))
      .toSet
    assert(got == want)
  }

  test("L8 (group all, SUM + AVG) matches a hand-written Spark twin") {
    val out = Files.createTempDirectory("pigmix_l8").toString
    val r = runScript(8, out)
    val got = r.apply("D").df.collect().head
    val pvs = spark.read.option("sep", FS).csv(s"$base/page_views")
      .select(col("_c2").cast("int").as("timespent"),
              col("_c6").cast("double").as("rev"))
    val want = pvs.agg(sum("timespent"), avg("rev")).collect().head
    assert(got.getLong(0) == want.getLong(0))
    assert(math.abs(got.getDouble(1) - want.getDouble(1)) < 1e-9)
  }

  test("L12 (multi-store split) matches hand-written Spark twins") {
    val out = Files.createTempDirectory("pigmix_l12").toString
    val r = runScript(12, out)
    val pvs = spark.read.option("sep", FS).csv(s"$base/page_views")
      .select(col("_c0").as("user"), col("_c1").as("action"),
              col("_c2").cast("int").as("timespent"),
              col("_c3").as("query_term"),
              col("_c6").cast("double").as("rev"))
    // highest value page per user (user non-null branch)
    val gotF = r.apply("F").df.collect()
      .map(x => (x.getString(0), math.round(x.getDouble(1) * 100))).toSet
    val wantF = pvs.filter(col("user").isNotNull && col("query_term").isNotNull)
      .groupBy("user").agg(max("rev").as("m"))
      .collect().map(x => (x.getString(0), math.round(x.getDouble(1) * 100)))
      .toSet
    assert(gotF == wantF)
    // queries per action: aleph = user NOT null AND query_term null
    // (COUNT(aleph) counts all of them — first field `user` non-null)
    val gotG = r.apply("gimel").df.collect()
      .map(x => (x.getString(0), x.getLong(1))).toSet
    val wantG = pvs.filter(col("user").isNotNull && col("query_term").isNull)
      .groupBy("action").count()
      .collect().map(x => (x.getString(0), x.getLong(1))).toSet
    assert(gotG == wantG)
  }

  test("L1's complex casts decode the pigmix wire format") {
    val out = Files.createTempDirectory("pigmix_l1").toString
    val r = runScript(1, out)
    // B carries a decoded map and a flattened bag-of-maps element
    val b = r.apply("B").df
    assert(b.schema("page_info").dataType.typeName == "map")
    assert(b.schema("page_links").dataType.typeName == "map")
    val row = b.filter(col("user").isNotNull).select("page_info").head
    val m = row.getMap[String, String](0)
    assert(m.contains("a") && m("a").startsWith("v"))
  }
}
