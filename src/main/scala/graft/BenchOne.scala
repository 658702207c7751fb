package graft
object BenchOne {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.get("bench-one")
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    args.headOption.toSeq.flatMap(n => SparkEntry.queries.get(n).map(n -> _)).foreach {
      case (n, fn) =>
        (1 to 3).foreach { i =>
          val t0 = System.nanoTime()
          fn(spark, dir).write.format("noop").mode("overwrite").save()
          println(s"BENCH_ONE $n run$i ${(System.nanoTime()-t0)/1e9}s")
        }
    }
    spark.stop()
  }
}
