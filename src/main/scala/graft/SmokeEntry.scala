package graft
object SmokeEntry {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.get("smoke")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    println(s"SMOKE_ENTRY_ROWS=$n")
    df.show(3)
    // scale-ops drive: salted aggregation equals plain on a skewed key
    import org.apache.spark.sql.functions._
    val li = graft.core.Tables(spark, "/root/testdata/sf0.001").lineitem
    val plain = li.groupBy(col("l_returnflag")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = graft.core.ScaleOps.saltedSumCount(li, col("l_returnflag"),
      col("l_quantity")).collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    println(s"SMOKE_SALTED_MATCH=${plain == salted}")
    spark.stop()
  }
}
