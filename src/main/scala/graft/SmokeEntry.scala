package graft
object SmokeEntry {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.get("smoke")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    println(s"SMOKE_ENTRY_ROWS=$n")
    df.show(3)
    spark.stop()
  }
}
