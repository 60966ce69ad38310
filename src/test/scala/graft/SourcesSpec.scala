package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.dsl.Relation
import graft.frontend.PigRunner

/** Source/sink coverage (SURVEY §2.8): PigStorage-style delimited text,
  * TextLoader, JsonLoader/JsonStorage, OrcStorage, AvroStorage (via the
  * Hadoop formats — spark-avro is not shipped here), piggybank
  * CSVExcelStorage/XMLLoader, parquet — write with one engine path, read
  * back with another, assert row/schema parity. */
class SourcesSpec extends SparkSpec {

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("src").toString

  test("default STORE round-trips through a bare LOAD (parquet sniff)") {
    val d = tmp()
    graft.frontend.PigRunner(spark).run(s"""
      n = LOAD '/root/testdata/sf0.001/nation.parquet';
      STORE n INTO '$d/inter';
    """)
    // no USING, no '.parquet' in the path: the PAR1 magic routes the
    // read to parquet instead of mis-reading the binaries as TSV
    val back = graft.frontend.PigRunner(spark).run(s"""
      r = LOAD '$d/inter';
      f = FILTER r BY n_nationkey > 20;
    """).apply("f").df
    assert(back.count() == sf("nation").filter(col("n_nationkey") > 20).count())
    assert(back.schema("n_nationkey").dataType ==
      sf("nation").schema("n_nationkey").dataType)
  }

  test("text load casts Pig complex literals (Utf8StorageConverter)") {
    val d = tmp()
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$d/c.txt"),
      ("[name#alice allen,age#20]\t(bob,45,2.33)\t{(x,1,1.5),(y,2,2.5)}\n" +
       "\t(carol,30,3.00)\t{(z,9,0.5)}\n" +
       "[k#v]\tgarbage\t{broken").getBytes("UTF-8"))
    val out = graft.frontend.PigRunner(spark).run(s"""
      a = LOAD '$d/c.txt' USING PigStorage() AS (
            m:[], t:(name:chararray, age:int, gpa:double),
            b:{T:(name:chararray, age:int, gpa:double)});
      p = FOREACH a GENERATE m#'age' AS ma, t.age AS ta, SIZE(b) AS n,
            t.name AS tn;
    """).apply("p").df.collect()
    assert(out.length == 3)
    assert(out(0).getString(0) == "20" && out(0).getInt(1) == 45 &&
           out(0).getLong(2) == 2 && out(0).getString(3) == "bob")
    assert(out(1).isNullAt(0) && out(1).getInt(1) == 30 &&
           out(1).getLong(2) == 1)
    // malformed tuple/bag text -> null (LoadCaster contract)
    assert(out(2).isNullAt(1) && out(2).isNullAt(2))
  }

  test("complex AS schema: bag/tuple/map types parse and type the load") {
    val d = tmp()
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$d/x.json"),
      ("""{"id":1,"tags":[{"t":"a"},{"t":"b"}],"props":{"k":"v"},""" +
       """"loc":{"lat":1.5,"lon":2.5}}""" + "\n" +
       """{"id":2,"tags":[{"t":"c"}],"props":{"k":"w"},""" +
       """"loc":{"lat":3.0,"lon":4.0}}""").getBytes("UTF-8"))
    val out = graft.frontend.PigRunner(spark).run(s"""
      j = LOAD '$d/x.json' USING JsonLoader()
          AS (id:int, tags:{T:(t:chararray)}, props:map[chararray],
              loc:tuple(lat:double, lon:double));
      f = FOREACH j GENERATE id, SIZE(tags) AS n_tags, props#'k' AS k,
            loc.lat AS lat;
    """).apply("f").df.orderBy("id").collect()
    assert(out.map(_.getInt(0)).toSeq == Seq(1, 2))
    assert(out.map(_.getLong(1)).toSeq == Seq(2L, 1L))
    assert(out.map(_.getString(2)).toSeq == Seq("v", "w"))
    assert(out.map(_.getDouble(3)).toSeq == Seq(1.5, 3.0))
  }

  test("PigStorage -schema sidecar: schemaless re-LOAD recovers types") {
    val d = tmp()
    graft.frontend.PigRunner(spark).run(s"""
      n = LOAD '/root/testdata/sf0.001/nation.parquet';
      p = FOREACH n GENERATE n_nationkey, n_name;
      STORE p INTO '$d/out' USING PigStorage(',', '-schema');
    """)
    val back = graft.frontend.PigRunner(spark).run(s"""
      r = LOAD '$d/out' USING PigStorage(',');
      f = FILTER r BY n_nationkey > 20;
    """).apply("f").df
    assert(back.schema("n_nationkey").dataType ==
      sf("nation").schema("n_nationkey").dataType) // typed, not string
    assert(back.count() ==
      sf("nation").filter(col("n_nationkey") > 20).count())
    // AS clause still wins over the sidecar
    val renamed = graft.frontend.PigRunner(spark).run(s"""
      r = LOAD '$d/out' USING PigStorage(',') AS (k:int, nm:chararray);
    """).apply("r").df
    assert(renamed.columns.toSeq == Seq("k", "nm"))
  }

  test("-schema sidecar round-trips COMPLEX types through Pig-literal text") {
    val d = tmp()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(d, "cplx.txt"),
      Seq("[k1#1,k2#2]\t(a,1)\t{(x,1),(y,2)}",
          "[k3#3]\t(b,2)\t{(z,3)}").mkString("\n").getBytes("UTF-8"))
    val back = graft.frontend.PigRunner(spark).run(s"""
      a = LOAD '$d/cplx.txt' AS (m:map[int],
            t:tuple(n:chararray, v:int),
            b:bag{x:tuple(s:chararray, v:int)});
      STORE a INTO '$d/side' USING PigStorage('\\t', '-schema');
      c = LOAD '$d/side' USING PigStorage('\\t', '-schema');
      e = FOREACH c GENERATE m#'k1' AS k1, t.n AS tn, SIZE(b) AS nb;
    """).apply("e").df.orderBy("tn").collect()
    assert(back.map(_.get(1)).toSeq == Seq("a", "b"))
    assert(back.head.getInt(0) == 1)   // map value typed int by sidecar
    assert(back.map(_.getLong(2)).toSeq == Seq(2L, 1L)) // bag sizes
  }

  test("STORE USING OrcStorage writes orc, not the parquet default") {
    val d = tmp()
    graft.frontend.PigRunner(spark).run(s"""
      n = LOAD '/root/testdata/sf0.001/nation.parquet';
      STORE n INTO '$d/out' USING OrcStorage();
    """)
    val back = spark.read.orc(s"$d/out")
    assert(back.count() == sf("nation").count())
    assert(back.columns.toSeq == sf("nation").columns.toSeq)
  }

  test("orc roundtrip with predicate pushdown") {
    val d = tmp()
    sf("orders").write.orc(s"$d/orc")
    val back = spark.read.orc(s"$d/orc").filter(col("o_totalprice") > 200000)
    assert(back.count() ==
      sf("orders").filter(col("o_totalprice") > 200000).count())
    val scan = back.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") && scan.contains("o_totalprice"))
  }

  test("json roundtrip with explicit schema (JsonLoader contract)") {
    val d = tmp()
    sf("nation").write.json(s"$d/json")
    val schema = StructType(Seq(
      StructField("n_nationkey", IntegerType),
      StructField("n_name", StringType),
      StructField("n_regionkey", IntegerType)))
    val back = spark.read.schema(schema).json(s"$d/json")
    assert(back.count() == 25)
    assert(back.schema == schema)
  }

  test("text source (TextLoader: line → one chararray column)") {
    val d = tmp()
    val f = new java.io.PrintWriter(s"$d/lines.txt")
    f.println("alpha"); f.println("beta"); f.close()
    val r = spark.read.text(s"$d/lines.txt")
    assert(r.columns.toSeq == Seq("value") && r.count() == 2)
  }

  test("csv with glob paths (PigStorage glob loading)") {
    val d = tmp()
    sf("region").select("r_regionkey", "r_name")
      .write.option("sep", "|").csv(s"$d/a")
    sf("region").select("r_regionkey", "r_name")
      .write.option("sep", "|").csv(s"$d/b")
    val r = Relation.loadDelimited(spark, s"$d/{a,b}", "r", sep = "|")
    assert(r.df.count() == 10)
  }

  test("compression is transparent (gzip text, TestBZip analog)") {
    val d = tmp()
    sf("nation").select("n_name")
      .write.option("compression", "gzip").csv(s"$d/gz")
    assert(spark.read.csv(s"$d/gz").count() == 25)
  }

  test("frontend JsonLoader/JsonStorage end-to-end") {
    val d = tmp()
    PigRunner(spark).run(s"""
      n = LOAD '/root/testdata/sf0.001/nation.parquet';
      p = FOREACH n GENERATE n_nationkey, n_name;
      STORE p INTO '$d/j' USING JsonStorage;
    """)
    val back = PigRunner(spark).run(s"""
      x = LOAD '$d/j' USING JsonLoader AS (n_nationkey:long, n_name:chararray);
      f = FILTER x BY n_nationkey < 10;
    """).apply("f").df
    assert(back.count() == 10)
  }

  test("avro roundtrip: atomics, nulls, timestamp, array, map, struct") {
    import spark.implicits._
    val d = tmp()
    val df = spark.createDataFrame(Seq(
      (1L, "a", Some(1.5), Seq(1, 2), Map("k" -> 10L),
        java.sql.Timestamp.valueOf("2024-03-01 10:30:00.123456")),
      (2L, null.asInstanceOf[String], None, Seq.empty[Int],
        Map.empty[String, Long],
        java.sql.Timestamp.valueOf("1999-12-31 23:59:59.5"))
    )).toDF("id", "s", "opt", "arr", "m", "ts")
      .withColumn("nested", struct(col("id").as("i"), col("s").as("t")))
    graft.sources.Avro.write(df, s"$d/avro")
    val back = graft.sources.Avro.read(spark, s"$d/avro")
    assert(back.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType)
    val a = df.orderBy("id").collect().map(_.toSeq).toSeq
    val b = back.select(df.columns.map(col).toIndexedSeq: _*)
      .orderBy("id").collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("avro timestamp-millis logical type decodes as millis, not micros") {
    import org.apache.avro.{LogicalTypes, Schema => AS, SchemaBuilder}
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val d = tmp()
    val tsMillis = LogicalTypes.timestampMillis()
      .addToSchema(AS.create(AS.Type.LONG))
    val schema = SchemaBuilder.record("r").fields()
      .requiredLong("id")
      .name("ts").`type`(tsMillis).noDefault()
      .endRecord()
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    new java.io.File(s"$d/ms").mkdirs()
    w.create(schema, new java.io.File(s"$d/ms/part-0.avro"))
    val rec = new GenericData.Record(schema)
    rec.put("id", 1L); rec.put("ts", 1709288100123L) // 2024-03-01T10:15:00.123Z
    w.append(rec); w.close()
    val back = graft.sources.Avro.read(spark, s"$d/ms")
    val inst = back.selectExpr("CAST(ts AS STRING) AS s", "unix_millis(ts) AS ms")
      .head()
    assert(inst.getLong(1) == 1709288100123L, "millis must not be read as micros")
  }

  test("avro evolved schemas across files resolve by field name") {
    import org.apache.avro.{Schema => AS, SchemaBuilder}
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val d = tmp()
    new java.io.File(s"$d/ev").mkdirs()
    // file A (read first → reader schema): (id long, name string)
    val sa = SchemaBuilder.record("r").fields()
      .requiredLong("id").requiredString("name").endRecord()
    // file B: same fields, REVERSED order — positional decode would swap
    val sb = SchemaBuilder.record("r").fields()
      .requiredString("name").requiredLong("id").endRecord()
    def writeOne(s: AS, f: String, vals: (Long, String)): Unit = {
      val w = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](s))
      w.create(s, new java.io.File(f))
      val rec = new GenericData.Record(s)
      rec.put("id", vals._1); rec.put("name", vals._2)
      w.append(rec); w.close()
    }
    writeOne(sa, s"$d/ev/a.avro", (1L, "alpha"))
    writeOne(sb, s"$d/ev/b.avro", (2L, "beta"))
    val back = graft.sources.Avro.read(spark, s"$d/ev")
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(back == Seq((1L, "alpha"), (2L, "beta")))
  }

  test("frontend AvroStorage store + load round-trip") {
    val d = tmp()
    PigRunner(spark).run(s"""
      n = LOAD '/root/testdata/sf0.001/nation.parquet';
      p = FOREACH n GENERATE n_nationkey, n_name;
      STORE p INTO '$d/av' USING AvroStorage;
    """)
    val back = PigRunner(spark).run(s"""
      x = LOAD '$d/av' USING AvroStorage;
      f = FILTER x BY n_nationkey < 10;
    """).apply("f").df
    assert(back.count() == 10)
    assert(back.columns.toSeq == Seq("n_nationkey", "n_name"))
  }

  test("avro column pruning: reader schema cut to the projection") {
    val d = tmp()
    graft.sources.Avro.write(
      sf("customer").select("c_custkey", "c_name", "c_acctbal",
        "c_mktsegment", "c_nationkey"), s"$d/av")
    // direct API: only the requested fields come back, in request order
    val pruned = graft.sources.Avro.read(spark, s"$d/av",
      Some(Seq("c_name", "c_custkey")))
    assert(pruned.columns.toSeq == Seq("c_name", "c_custkey"))
    assert(pruned.count() == sf("customer").count())
    // frontend: the AS schema drives the pruned read
    val fe = PigRunner(spark).run(s"""
      x = LOAD '$d/av' USING AvroStorage AS (c_custkey:long, c_name:chararray);
    """).apply("x").df
    assert(fe.columns.toSeq == Seq("c_custkey", "c_name"))
    val a = fe.orderBy("c_custkey").collect().map(_.toSeq).toSeq
    val b = sf("customer").select(col("c_custkey").cast("long"), col("c_name"))
      .orderBy("c_custkey").collect().map(_.toSeq).toSeq
    assert(a == b)
    // unknown column errors loudly instead of decoding garbage
    val e = intercept[IllegalArgumentException] {
      graft.sources.Avro.read(spark, s"$d/av", Some(Seq("nope")))
    }
    assert(e.getMessage.contains("not in the Avro schema"))
  }

  test("CSVExcelStorage: quoted fields with embedded delimiter round-trip") {
    val d = tmp()
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$d/in"))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$d/in/x.csv"),
      "1,\"a,b\",\"say \"\"hi\"\"\"\n2,plain,ok\n".getBytes)
    val r = PigRunner(spark).run(s"""
      x = LOAD '$d/in' USING CSVExcelStorage(',')
          AS (id:int, a:chararray, b:chararray);
    """).apply("x").df.orderBy("id").collect()
    assert(r(0).getString(1) == "a,b")
    assert(r(0).getString(2) == "say \"hi\"")
    assert(r(1).getString(1) == "plain")
  }

  test("XMLLoader: one row per element, elements may span lines") {
    val d = tmp()
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$d/in"))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$d/in/x.xml"),
      ("<root>\n<doc id=\"1\"><t>alpha</t></doc>\n" +
       "<doc id=\"2\">\n  <t>beta\n  gamma</t>\n</doc>\n</root>\n").getBytes)
    val rows = PigRunner(spark).run(s"""
      x = LOAD '$d/in' USING XMLLoader('doc');
    """).apply("x").df.collect().map(_.getString(0))
    assert(rows.length == 2)
    assert(rows.forall(s => s.startsWith("<doc") && s.endsWith("</doc>")))
    assert(rows.exists(_.contains("beta")))
  }

  test("FixedWidthLoader: 1-indexed inclusive ranges, AS schema casts") {
    val d = tmp()
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$d/in"))
    // cols: id [1-3], name [5-10], qty [12-14]
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$d/in/w.txt"),
      ("  1 alpha   42\n 22 beta     7\n333 gamma  100\n").getBytes)
    val r = PigRunner(spark).run(s"""
      x = LOAD '$d/in' USING FixedWidthLoader('-3, 5-10, 12-14')
          AS (id:int, name:chararray, qty:int);
    """).apply("x").df.orderBy("id").collect()
    assert(r.length == 3)
    assert(r(0).getInt(0) == 1 && r(0).getString(1) == "alpha" &&
           r(0).getInt(2) == 42)
    assert(r(2).getInt(0) == 333 && r(2).getInt(2) == 100)
  }

  test("FixedWidthLoader: SKIP_HEADER drops each file's first line; " +
       "short lines null-pad") {
    val d = tmp()
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$d/in"))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$d/in/a.txt"),
      "ID  NAME\n 1  ab\n 2\n".getBytes)
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$d/in/b.txt"),
      "ID  NAME\n 3  cd\n".getBytes)
    val r = graft.sources.Piggybank.fixedWidthLoad(spark, s"$d/in",
      "-2, 5-6", skipHeader = true)
    val rows = r.collect().map(x => (x.getString(0), x.getString(1))).sorted
    assert(rows.toSeq == Seq(("1", "ab"), ("2", null), ("3", "cd")))
  }

  test("MyRegExLoader: capture groups become columns, misses are skipped") {
    val d = tmp()
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$d/in"))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$d/in/log.txt"),
      ("GET /index.html 200\njunk line\nPOST /api/v1 404\n").getBytes)
    val r = PigRunner(spark).run(s"""
      x = LOAD '$d/in' USING MyRegExLoader('(\\\\w+) (\\\\S+) (\\\\d+)')
          AS (verb:chararray, path:chararray, code:int);
    """).apply("x").df.orderBy("code").collect()
    assert(r.length == 2)
    assert(r(0).getString(0) == "GET" && r(0).getInt(2) == 200)
    assert(r(1).getString(1) == "/api/v1")
  }

  test("FixedWidthLoader: single-column specs are 1-indexed ('0' rejected)") {
    intercept[IllegalArgumentException] {
      graft.sources.Piggybank.parseColumnSpec("0")
    }
    val f = graft.sources.Piggybank.parseColumnSpec("3").head
    assert(f.start == 2 && f.end == 3)
  }

  test("MyRegExLoader: non-participating optional group is null, not ''") {
    val d = tmp()
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$d/in"))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$d/in/kv.txt"),
      "key=alpha;extra=9\nkey=beta\n".getBytes)
    val r = graft.sources.Piggybank
      .regexLoad(spark, s"$d/in", "key=(\\w+)(?:;extra=(\\d+))?")
      .orderBy("f1").collect()
    assert(r.length == 2)
    assert(r(0).getString(0) == "alpha" && r(0).getString(1) == "9")
    assert(r(1).getString(0) == "beta" && r(1).isNullAt(1))
  }

  test("MultiStorage: one directory per split-field value, read restores") {
    val d = tmp()
    val nation = sf("nation").select("n_name", "n_regionkey")
    graft.sources.Piggybank.multiStore(nation, s"$d/out", "n_regionkey",
      fieldDel = "|")
    val dirs = new java.io.File(s"$d/out").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.length == 5 && dirs.forall(_.startsWith("n_regionkey=")))
    val back = spark.read.option("sep", "|").option("basePath", s"$d/out")
      .csv(s"$d/out")
    assert(back.count() == 25)
    assert(back.select("n_regionkey").distinct().count() == 5)
  }

  test("SequenceFileLoader: Text/LongWritable pairs load with real types") {
    import org.apache.hadoop.io.{LongWritable, Text}
    val d = tmp()
    spark.sparkContext
      .parallelize(Seq(("alpha", 1L), ("beta", 2L), ("gamma", 3L)), 2)
      .map { case (k, v) => (new Text(k), new LongWritable(v)) }
      .saveAsHadoopFile(s"$d/seq", classOf[Text], classOf[LongWritable],
        classOf[org.apache.hadoop.mapred.SequenceFileOutputFormat[Text, LongWritable]])
    val r = graft.sources.Piggybank.sequenceFileLoad(spark, s"$d/seq")
    assert(r.schema.map(_.dataType) ==
      Seq(org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.LongType))
    val rows = r.collect().map(x => (x.getString(0), x.getLong(1))).sorted
    assert(rows.toSeq == Seq(("alpha", 1L), ("beta", 2L), ("gamma", 3L)))
    // frontend dispatch reaches the same reader
    val fe = PigRunner(spark).run(s"""
      x = LOAD '$d/seq' USING SequenceFileLoader();
    """).apply("x").df
    assert(fe.count() == 3)
  }

  test("DBStorage: STORE executes the INSERT against embedded Derby " +
       "(batched per partition) and the read twin loads it back") {
    val dbDir = tmp()
    val url = s"jdbc:derby:$dbDir/graftdb;create=true"
    val driver = "org.apache.derby.jdbc.EmbeddedDriver"
    // create the target table the way a DBStorage user would have
    Class.forName(driver)
    val conn = java.sql.DriverManager.getConnection(url)
    conn.createStatement().executeUpdate(
      "CREATE TABLE nations (nkey BIGINT, nname VARCHAR(64))")
    conn.close()
    PigRunner(spark).run(s"""
      n = LOAD '/root/testdata/sf0.001/nation.parquet';
      r = FOREACH n GENERATE n_nationkey, n_name;
      STORE r INTO 'ignored' USING DBStorage('$driver', '$url',
        'INSERT INTO nations (nkey, nname) VALUES (?, ?)');
    """)
    // read back twice: raw JDBC (ground truth) and the LOAD twin
    val want = sf("nation").select("n_nationkey", "n_name").collect()
      .map(r => (r.getAs[Number](0).longValue(), r.getString(1))).toSet
    val back = PigRunner(spark).run(s"""
      x = LOAD 'ignored' USING DBStorage('$driver', '$url',
        'SELECT nkey, nname FROM nations');
    """).apply("x").df
    val got = back.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == want && got.size == 25)
    // the LOAD twin prunes+pushes: a filtered count only ships what
    // the DB already filtered (plan shows the JDBC relation, no fs scan)
    val one = back.filter(col("nkey") === 7L).collect()
    assert(one.length == 1 && one(0).getString(1) == got.find(_._1 == 7L).get._2)
  }

  test("DBStorage: nulls round-trip and a 5-arg (user/pass) spec works") {
    import spark.implicits._
    val dbDir = tmp()
    val url = s"jdbc:derby:$dbDir/nulldb;create=true"
    val driver = "org.apache.derby.jdbc.EmbeddedDriver"
    Class.forName(driver)
    val conn = java.sql.DriverManager.getConnection(url)
    conn.createStatement().executeUpdate(
      "CREATE TABLE t (id BIGINT, v VARCHAR(16))")
    conn.close()
    val df = Seq((1L, Some("a")), (2L, None), (3L, Some("c")))
      .toDF("id", "v")
    // Derby's embedded driver ignores credentials by default but makes
    // the username the default schema — qualify APP to exercise the
    // 5-arg (user, pass) plumbing end to end
    graft.sources.DbStorage.store(df, driver, url,
      "INSERT INTO APP.t (id, v) VALUES (?, ?)",
      user = Some("u"), pass = Some("p"))
    val got = graft.sources.DbStorage.load(spark, driver, url, "APP.t",
        user = Some("u"), pass = Some("p"))
      .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    assert(got == Set((1L, Some("a")), (2L, None), (3L, Some("c"))))
    // complex columns refuse loudly (the reference StoreFunc contract)
    val bad = Seq((1L, Seq("x"))).toDF("id", "arr")
    val e = intercept[IllegalArgumentException] {
      graft.sources.DbStorage.store(bad, driver, url,
        "INSERT INTO t (id, v) VALUES (?, ?)")
    }
    assert(e.getMessage.contains("scalar"))
  }

  test("HiveColumnarStorage/HiveColumnarLoader: RCFile columnar " +
       "round-trip with nulls and type casts") {
    val d = tmp()
    import spark.implicits._
    val df = Seq(
      (1L, "alpha", 1.5, true),
      (2L, null.asInstanceOf[String], -2.25, false),
      (3L, "with,comma and\ttab", 0.0, true))
      .toDF("id", "name", "score", "flag")
    graft.frontend.PigRunner(spark).run(s"""
      x = LOAD '${writeTmpParquet(df, d)}';
      STORE x INTO '$d/rc' USING HiveColumnarStorage();
    """)
    // plain scala read twin
    val back = graft.sources.Piggybank.hiveColumnarLoad(spark, s"$d/rc",
      "id bigint, name string, score double, flag boolean")
      .orderBy("id").collect()
    assert(back.length == 3)
    assert(back(0).getLong(0) == 1L && back(0).getString(1) == "alpha" &&
      back(0).getDouble(2) == 1.5 && back(0).getBoolean(3))
    assert(back(1).isNullAt(1) && back(1).getDouble(2) == -2.25)
    assert(back(2).getString(1) == "with,comma and\ttab")
    // frontend LOAD twin (RCFile is format-framed: embedded delimiters
    // survive because columns are length-prefixed, not delimited)
    val viaPig = graft.frontend.PigRunner(spark).run(s"""
      y = LOAD '$d/rc' USING HiveColumnarLoader('id bigint, name string, score double, flag boolean');
      z = FILTER y BY flag;
    """).apply("z").df.orderBy("id").collect()
    assert(viaPig.map(_.getLong(0)).toSeq == Seq(1L, 3L))
  }

  private def writeTmpParquet(df: org.apache.spark.sql.DataFrame,
                              d: String): String = {
    val p = s"$d/in_parquet"
    df.write.mode("overwrite").parquet(p)
    p
  }

  test("AllLoader: a mixed-format folder dispatches loaders by " +
       "extension and unions under one AS schema") {
    val in = s"${tmp()}/mixed"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$in/a.csv"),
      "1,alpha\n2,beta\n".getBytes)
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$in/b.tsv"),
      "3\tgamma\n".getBytes)
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$in/c.json"),
      "{\"id\":4,\"name\":\"delta\"}\n".getBytes)
    // the reference's own property name, as a session conf (the
    // AllLoader() constructor-arg form takes the same string)
    spark.conf.set("file.extension.loaders",
      "csv:PigStorage(','), tsv:PigStorage(), json:JsonLoader")
    try {
      val r = PigRunner(spark).run(s"""
        x = LOAD '$in' USING AllLoader() AS (id:int, name:chararray);
      """).apply("x").df.orderBy("id").collect()
      assert(r.map(x => (x.getInt(0), x.getString(1))).toSeq ==
        Seq((1, "alpha"), (2, "beta"), (3, "gamma"), (4, "delta")))
    } finally spark.conf.unset("file.extension.loaders")
  }

  test("AllLoader: unmapped extensions fail loudly; mapping parser " +
       "handles commas inside func-spec parens") {
    val m = graft.sources.Piggybank.parseExtensionLoaders(
      "csv:PigStorage(','), .json : JsonLoader, gz:PigStorage()")
    assert(m("csv") == (("PigStorage", Seq(","))))
    assert(m("json") == (("JsonLoader", Seq.empty)))
    assert(m("gz") == (("PigStorage", Seq.empty)))
    // an escaped quote inside an arg must not flip the splitter's
    // quote state, and args unescape like the main Pig lexer (\' → ')
    val esc = graft.sources.Piggybank.parseExtensionLoaders(
      "csv:PigStorage('it\\'s'), json:JsonLoader")
    assert(esc("csv") == (("PigStorage", Seq("it's"))))
    assert(esc("json") == (("JsonLoader", Seq.empty)))
    val in = s"${tmp()}/bad"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$in/a.xyz"),
      "1\n".getBytes)
    val e = intercept[Exception] {
      PigRunner(spark).run(s"""
        x = LOAD '$in' USING AllLoader('csv:PigStorage()');
        y = FOREACH x GENERATE $$0;
      """).apply("y").df.collect()
    }
    assert(e.getMessage.contains("xyz"), e.getMessage)
    // extension-LESS files fail loudly too — silently skipping them
    // would lose rows (the reference content-sniffs these)
    val in2 = s"${tmp()}/bare"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(in2))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$in2/a.csv"),
      "1\n".getBytes)
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$in2/data"),
      "2\n".getBytes)
    val e2 = intercept[Exception] {
      PigRunner(spark).run(s"""
        x = LOAD '$in2' USING AllLoader('csv:PigStorage()');
        y = FOREACH x GENERATE $$0;
      """).apply("y").df.collect()
    }
    assert(e2.getMessage.contains("data"), e2.getMessage)
    // nested DIRECTORIES are WALKED (r16): the reference AllLoader
    // recurses into partition dirs, so a partitioned layout must load
    // as the flat union of its files, never error or silently drop
    val in3 = s"${tmp()}/nested"
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$in3/part=1/deeper"))
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$in3/_hidden"))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$in3/a.csv"),
      "1\n".getBytes)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$in3/part=1/b.csv"), "2\n".getBytes)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$in3/part=1/deeper/c.csv"), "3\n".getBytes)
    java.nio.file.Files.write( // hidden dirs stay skipped
      java.nio.file.Paths.get(s"$in3/_hidden/d.csv"), "99\n".getBytes)
    val nested = PigRunner(spark).run(s"""
        x = LOAD '$in3' USING AllLoader('csv:PigStorage()')
            AS (id:int);
      """).apply("x").df.collect().map(_.getInt(0)).sorted
    assert(nested.toSeq == Seq(1, 2, 3))
    // a bare file inside a walked subdir still fails loudly
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$in3/part=1/noext"), "4\n".getBytes)
    val e3 = intercept[Exception] {
      PigRunner(spark).run(s"""
        x = LOAD '$in3' USING AllLoader('csv:PigStorage()');
        y = FOREACH x GENERATE $$0;
      """).apply("y").df.collect()
    }
    assert(e3.getMessage.contains("noext"), e3.getMessage)
  }
}
