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
        val df = spark.read.parquet(s"/root/testdata/sf0.001/$t.parquet")
        println(s"== $t rows=${df.count()} schema=${df.schema.simpleString}")
      } catch {
        case e: Throwable => println(s"== $t FAILED: ${e.toString.take(300)}")
      }
    }
    spark.stop()
  }
}
