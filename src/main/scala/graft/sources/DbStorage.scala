package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Piggybank DBStorage analog (reference:
  * contrib/piggybank/java/src/main/java/org/apache/pig/piggybank/storage/DBStorage.java)
  * plus the read twin the reference never grew.
  *
  * The reference contract is an arbitrary parameterized INSERT
  * (`INSERT INTO t VALUES (?,?)`) executed once per tuple, batched.
  * Spark's own `df.write.jdbc` can't run a user statement (it writes a
  * whole table by name), so [[store]] keeps the reference contract the
  * distributed way: one connection per PARTITION, rows bound
  * positionally to the statement's parameters and flushed in
  * `batchSize` chunks (the reference batches per 100 via
  * executeBatch too — DBStorage.java:88). Writes scale with
  * partitions; the DB is the throughput ceiling, as with any JDBC sink.
  *
  * [[load]] is the read twin over Spark's native JDBC source —
  * predicate pushdown and column pruning reach the database, and a
  * `partitionColumn` + bounds turns the read into numPartitions
  * parallel range scans (the standard Spark JDBC parallel-read form).
  */
object DbStorage {

  private def sqlTypeFor(dt: DataType): Int = dt match {
    case IntegerType => java.sql.Types.INTEGER
    case LongType => java.sql.Types.BIGINT
    case FloatType => java.sql.Types.FLOAT
    case DoubleType => java.sql.Types.DOUBLE
    case BooleanType => java.sql.Types.BOOLEAN
    case DateType => java.sql.Types.DATE
    case TimestampType => java.sql.Types.TIMESTAMP
    case _: DecimalType => java.sql.Types.DECIMAL
    case BinaryType => java.sql.Types.BINARY
    case _ => java.sql.Types.VARCHAR
  }

  /** Execute `insert` once per row (parameters bound positionally from
    * the row's columns), batched. Scalar columns only — the reference
    * StoreFunc has the same restriction (bags/maps throw). */
  def store(df: DataFrame, driver: String, url: String, insert: String,
            user: Option[String] = None, pass: Option[String] = None,
            batchSize: Int = 1000): Unit = {
    val schema = df.schema
    schema.fields.foreach { f =>
      require(!f.dataType.isInstanceOf[ArrayType] &&
        !f.dataType.isInstanceOf[MapType] &&
        !f.dataType.isInstanceOf[StructType],
        s"DBStorage stores scalar columns only (got ${f.name}: " +
          s"${f.dataType.simpleString}), like the reference StoreFunc")
    }
    val sqlTypes = schema.fields.map(f => sqlTypeFor(f.dataType))
    df.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) {
        Class.forName(driver)
        val conn = (user, pass) match {
          case (Some(u), Some(p)) =>
            java.sql.DriverManager.getConnection(url, u, p)
          case _ => java.sql.DriverManager.getConnection(url)
        }
        try {
          conn.setAutoCommit(false)
          val ps = conn.prepareStatement(insert)
          var n = 0
          rows.foreach { row =>
            var i = 0
            while (i < sqlTypes.length) {
              val v = row.get(i)
              if (v == null) ps.setNull(i + 1, sqlTypes(i))
              else ps.setObject(i + 1, v)
              i += 1
            }
            ps.addBatch()
            n += 1
            if (n % batchSize == 0) { ps.executeBatch(); conn.commit() }
          }
          ps.executeBatch()
          conn.commit()
          ps.close()
        } finally conn.close()
      }
    }
  }

  /** Read twin: a table name or a parenthesizable SELECT. Pass
    * `partitionColumn` (+ bounds) for a parallel range-partitioned
    * read; without it the read is a single partition, which is Spark's
    * own JDBC default. */
  def load(spark: SparkSession, driver: String, url: String,
           tableOrQuery: String,
           user: Option[String] = None, pass: Option[String] = None,
           partitionColumn: Option[String] = None,
           lowerBound: Long = 0L, upperBound: Long = 0L,
           numPartitions: Int = 0): DataFrame = {
    val trimmed = tableOrQuery.trim
    val dbtable =
      // alias must not start with '_': Derby (and other ANSI-strict
      // engines) reject leading-underscore identifiers
      if (trimmed.toLowerCase.startsWith("select")) s"($trimmed) graft_q"
      else trimmed
    var r = spark.read.format("jdbc")
      .option("driver", driver).option("url", url)
      .option("dbtable", dbtable)
    user.foreach(u => r = r.option("user", u))
    pass.foreach(p => r = r.option("password", p))
    partitionColumn.foreach { c =>
      r = r.option("partitionColumn", c)
        .option("lowerBound", lowerBound).option("upperBound", upperBound)
        .option("numPartitions", math.max(1, numPartitions))
    }
    r.load()
  }
}
