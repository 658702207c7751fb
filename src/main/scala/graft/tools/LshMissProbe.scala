package graft.tools

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Search for the q205 PLANTED PAIR: two synthetic documents whose
  * exact 3-shingle Jaccard sits just over the 0.5 dedup threshold but
  * whose 12-hash / 4-band md5-seeded MinHash-LSH banding shares NO
  * band — i.e. a true near-dup pair the LSH stage deterministically
  * MISSES. Planted into the dupDocs fixture, such a pair makes q205's
  * residual exact stage return a NON-EMPTY set, so the composition's
  * final hash compare carries weight instead of matching vacuously on
  * zero rows (round-16 verdict, What's wrong #1).
  *
  * Construction: A = 30 unique salted tokens (28 distinct 3-shingles),
  * B = A's first 21 tokens + 9 fresh tokens (28 shingles, 19 shared) →
  * J = 19/37 ≈ 0.5135 for EVERY salt; the salt only re-rolls the md5
  * minhashes until all 4 bands differ (P≈0.59 per salt at this J).
  * Signatures and band keys come from the production
  * [[Dedup.minhashed]] expressions, so what this probe certifies is
  * exactly what the engine (and the DuckDB oracle's mirrored integer
  * math) computes.
  *
  * Usage: runMain graft.tools.LshMissProbe [maxSalt]
  * Prints the first qualifying salt, the two texts, the Jaccard, and
  * the band keys; exit 1 if no salt under maxSalt qualifies. */
object LshMissProbe {
  def texts(salt: Int): (String, String) = {
    val shared = (0 until 21).map(i => s"pp${salt}t$i")
    val tailA = (21 until 30).map(i => s"pp${salt}t$i")
    val tailB = (0 until 9).map(j => s"qq${salt}u$j")
    ((shared ++ tailA).mkString(" "), (shared ++ tailB).mkString(" "))
  }

  def main(args: Array[String]): Unit = {
    val maxSalt = if (args.nonEmpty) args(0).toInt else 200
    val spark = graft.core.GraftSession.builder("lsh-miss-probe", "4")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val hit = (0 until maxSalt).iterator.map { salt =>
      val (a, b) = texts(salt)
      val mh = Dedup.minhashed(
        Seq((1L, a), (2L, b)).toDF("doc_id", "text"),
        "doc_id", "text", shingleSize = 3, numHashes = 12, rowsPerBand = 3)
      val rows = mh.select(col("id"), col("shingles"), col("band_keys"))
        .collect().sortBy(_.getLong(0))
      val shA = rows(0).getSeq[String](1).toSet
      val shB = rows(1).getSeq[String](1).toSet
      val bkA = rows(0).getSeq[String](2).toSet
      val bkB = rows(1).getSeq[String](2).toSet
      val inter = (shA & shB).size
      val union = (shA | shB).size
      val jMilli = 1000L * inter / union
      val sharedBands = (bkA & bkB).size
      (salt, a, b, inter, union, jMilli, sharedBands)
    }.find { case (_, _, _, _, _, jMilli, sharedBands) =>
      jMilli >= 500 && sharedBands == 0
    }
    hit match {
      case Some((salt, a, b, inter, union, jMilli, _)) =>
        println(s"""{"salt": $salt, "inter": $inter, "union": $union, """ +
          s""""jacc_milli": $jMilli, "shared_bands": 0}""")
        println(s"TEXT_A=$a")
        println(s"TEXT_B=$b")
      case None =>
        System.err.println(s"no qualifying salt under $maxSalt")
        sys.exit(1)
    }
    spark.stop()
  }
}
