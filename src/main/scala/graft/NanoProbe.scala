package graft
object NanoProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkEnv.session(cores = 2, appName = "probe")
    println("conf=" + spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong"))
    val sch = spark.read.parquet("/root/testdata/sf0.001/events.parquet").schema
    println("batch schema: " + sch.map(f => f.name + ":" + f.dataType.simpleString).mkString(", "))
    val st = spark.readStream.schema(sch).parquet("/tmp/doesnotmatter_nonexistent_ok")
    println("stream ok (lazy)")
    spark.stop()
  }
}
