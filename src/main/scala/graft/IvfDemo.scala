package graft

import org.apache.spark.sql.functions._

/** Library usage sample: build an IVF index and probe it. */
object IvfDemo {
  def main(args: Array[String]): Unit = {
    implicit val spark = graft.core.GraftSession.get("ivf-demo")
    val corpus = graft.core.Tables(spark, "/root/testdata/sf0.01").embeddings
    val queries = corpus.filter(col("vec_id") < 3)
    val index = graft.operators.IvfAnn.build(corpus, nlist = 16)
    val sizes = index.assignments.groupBy("list_id").count()
      .orderBy(col("count").desc).collect()
    println(s"IVF_LISTS n=${sizes.length} biggest=${sizes.head.getLong(1)} smallest=${sizes.last.getLong(1)}")
    val hits = graft.operators.IvfAnn.topK(queries, index, k = 3, nprobe = 4).collect()
    println("IVF_TOPK " + hits.map(r => s"${r.getLong(0)}->${r.getLong(1)}@${"%.4f".format(r.getDouble(2))}").mkString(" "))
    // probe: nprobe larger than nlist must not crash, just scans everything
    val all = graft.operators.IvfAnn.topK(queries, index, k = 3, nprobe = 99)
    println("IVF_OVERPROBE rows=" + all.count())
    spark.stop()
  }
}
