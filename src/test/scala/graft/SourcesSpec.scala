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
}
