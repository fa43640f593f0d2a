package graft

import org.apache.spark.sql.SparkSession

/** Scratch smoke main: read every fixture table, print schema + count. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    for (t <- tables) {
      try {
        // Tables loaders, not raw reads: events needs the nanos-as-long
        // conf (TIMESTAMP(NANOS) is rejected by the vanilla reader)
        val df = if (t == "events") Tables.events(spark, "/root/testdata/sf0.001")
          else spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet")
        println(s"== $t rows=${df.count()} schema=${df.schema.simpleString}")
      } catch {
        case e: Throwable => println(s"== $t FAILED: ${e.toString.take(300)}")
      }
    }
    val entry = SparkEntry.entry(spark)
    println(s"== entry rows=${entry.count()} (driver smoke contract)")
    spark.stop()
  }
}
