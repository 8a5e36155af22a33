package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only BPE delta-recount ladder on a REALISTIC vocabulary — the
  * fixture corpus has 31 distinct words, far too few to exercise the
  * incremental pair statistics (Sennrich §3) at production shape, so
  * this timer synthesizes a syllable-structured Zipf corpus:
  * `nWords` distinct words (default 150k), each 2–5 syllables from a
  * 400-syllable inventory (seeded, deterministic), with frequency
  * f(rank) = 1 + 50000/(rank+5). Syllables give BPE real merge
  * structure; Zipf gives rounds realistically skewed affected slices.
  *
  * Prints per-round (round, affected words, ms) sampled every
  * `sample` rounds plus bucket medians — the claim under test is
  * per-round cost ∝ affected words (the delta recount touches only
  * words containing the winning pair; the residual constant is the
  * top-1 collect + hash merge over the distinct-pair table).
  *
  * Usage:
  *   Test/runMain graft.BpeVocabScale <nWords> <rounds> [sample]
  */
object BpeVocabScale {
  def main(args: Array[String]): Unit = {
    val nWords = if (args.length > 0) args(0).toInt else 150000
    val rounds = if (args.length > 1) args(1).toInt else 1024
    val sample = if (args.length > 2) args(2).toInt else 32
    val sp = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.local.dir", "/tmp/spark-bpevocab")
      .getOrCreate()
    sp.sparkContext.setLogLevel("ERROR")
    import sp.implicits._

    val syllables = (0 until 400).map { i =>
      val r = new scala.util.Random(i * 104729L)
      (0 until (2 + r.nextInt(2))).map(_ => ('a' + r.nextInt(26)).toChar)
        .mkString
    }
    val wordRows = (0 until nWords).map { v =>
      val r = new scala.util.Random(v * 2654435761L)
      val w = (0 until (2 + r.nextInt(4)))
        .map(_ => syllables(r.nextInt(400))).mkString
      (v.toLong, w, 1L + 50000L / (v + 5))
    }
    val docs = wordRows.toDF("rank", "w", "freq")
      .withColumn("rep", explode(sequence(lit(1L), col("freq"))))
      .select((col("rank") * 1000 + col("rep")).as("doc_id"),
        col("w").as("text"))
      .repartition(32)
      .localCheckpoint()
    val distinct = docs.select(countDistinct(col("text"))).head.getLong(0)
    println(s"BPEVOCAB docRows=${docs.count()} distinctWords=$distinct " +
      s"rounds=$rounds")

    // counterfactual: the OLD per-round price was a full pairCounts
    // top-1 over the whole word table, every round — time it once
    for (i <- 1 to 3) {
      val f0 = System.nanoTime
      text.BpeOps.pairCounts(text.BpeOps.bpeWordTable(docs, "text"))
        .orderBy(col("n_occ").desc, col("pair").asc).limit(1).collect()
      println(f"FULLRECOUNT run$i ${(System.nanoTime - f0) / 1e6}%.0f ms " +
        "(the pre-delta per-round cost)")
    }

    val t0 = System.nanoTime
    val (merges, stats) = text.BpeOps.trainBpeWithStats(docs, "text", rounds)
    val total = (System.nanoTime - t0) / 1e9
    println(f"TIMED total $total%.1f s merges=${merges.size} " +
      f"(${total / math.max(merges.size, 1) * 1000}%.0f ms/round incl. measurement)")
    stats.zipWithIndex.foreach { case ((r, aff, ns), idx) =>
      if (r == 1 || r % sample == 0 || idx == stats.size - 1)
        println(f"ROUND $r%5d affected=$aff%7d ms=${ns / 1e6}%.0f")
    }
    // bucket medians: per-round ms grouped by affected-count decade
    val buckets = stats.groupBy { case (_, aff, _) =>
      if (aff <= 0) 0 else math.log10(aff.toDouble).toInt
    }
    buckets.toSeq.sortBy(_._1).foreach { case (dec, xs) =>
      val ms = xs.map(_._3 / 1e6).sorted
      println(f"BUCKET 10^$dec..10^${dec + 1} rounds=${xs.size} " +
        f"medianMs=${ms(ms.size / 2)}%.0f " +
        f"medianAffected=${xs.map(_._2).sorted.apply(xs.size / 2)}")
    }
    sp.stop()
  }
}
