// sbt "runMain graft.tools.SmokeEntry" — driver-style smoke of SparkEntry.entry
package graft.tools
object SmokeEntry {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(8, 8)
    val df = graft.SparkEntry.entry(spark)
    val n = df.count()
    df.show(5, truncate = false)
    println(s"ENTRY_ROWS=$n")
    spark.stop()
  }
}
