package graft

/** Library usage sample for the §2.11 param-compiler surface. */
object ApiDemo {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.get("api-demo")
    import spark.implicits._
    val jobs = Seq(
      graft.model.EtlJob("j1", "EXTRACT", "RUNNING", "s", "t",
        java.sql.Timestamp.valueOf("2025-09-01 10:00:00"),
        Some(java.sql.Timestamp.valueOf("2025-09-01 10:00:01"))),
      graft.model.EtlJob("j2", "LOAD", "COMPLETED", "s", "t",
        java.sql.Timestamp.valueOf("2025-09-02 10:00:00"),
        Some(java.sql.Timestamp.valueOf("2025-09-02 10:00:01")),
        Some(java.sql.Timestamp.valueOf("2025-09-02 10:30:01")))).toDF()
    graft.api.QueryApi.monitorJobs(jobs, "status=COMPLETED&limit=5") match {
      case Right(df) => println("API_OK " + df.collect().map(_.getString(0)).mkString("|"))
      case Left(e) => println("API_ERR " + e)
    }
    graft.api.QueryApi.monitorJobs(jobs, "status=COMPLETED&limit=") match {
      case Right(_) => println("API_EMPTYLIMIT accepted")
      case Left(e) => println("API_EMPTYLIMIT rejected: " + e)
    }
    graft.api.QueryApi.monitorJobs(jobs, "status=&limit=5") match {
      case Right(df) => println("API_EMPTYSTATUS rows=" + df.count())
      case Left(e) => println("API_EMPTYSTATUS rejected: " + e)
    }
    val h = graft.api.QueryApi.health(spark, Some(jobs)).collect().head
    println(s"API_HEALTH status=${h.getBoolean(0)} active_jobs=${h.getLong(6)} spark_alive=${h.getBoolean(7)}")
    val hNoJobs = graft.api.QueryApi.health(spark).collect().head
    println(s"API_HEALTH_NOJOBS active_jobs=${hNoJobs.getLong(6)}")
    spark.stop()
  }
}
