package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.nio.file.{Files, Paths}

/** Spec-local stateful-pipeline row types (top-level so Spark encoders
  * don't capture the suite). */
case class RecEv(user_id: Long, value: Double)
case class RecState(n: Long, total: BigDecimal)
case class RecAgg(user_id: Long, n: Long, total: Double)

/** Streaming checkpoint recovery (r8/r9 verdict ask — "the one
  * production property with zero evidence"): a stream is stopped after
  * consuming PART of its input, then restarted from the SAME
  * checkpoint; the resumed run must produce exactly what an
  * uninterrupted run produces — i.e. dedup state and
  * mapGroupsWithState state survive the restart instead of resetting.
  *
  * Drive: the file source delivers deterministically (the fixture split
  * into 4 parquet files); phase 1 starts with 2 files present, drains,
  * and STOPS the query (the crash point — a kill between triggers);
  * phase 2 drops the remaining files in and restarts the same
  * query/checkpoint/sink. If recovery were broken, phase-2 state would
  * restart from zero: band buckets already seen would re-emit
  * (duplicate rows in the append sink) and per-user totals would count
  * only phase-2 events — both asserted against an uninterrupted control
  * run AND the batch twin. */
class RecoverySpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String): String =
    Files.createTempDirectory(s"graft_rec_$tag").toString

  /** Split the sf0.001 fixture table into 4 single-file parquet parts
    * under a fresh dir-of-files layout the file source can tail. */
  private def splitInput(table: String, key: String): (String, Seq[java.nio.file.Path]) = {
    val src = spark.read.parquet(s"$sf/$table.parquet")
    val stage = freshDir(s"stage_$table")
    val parts = (0 until 4).map { i =>
      val dir = s"$stage/p$i"
      src.filter(pmod(col(key), lit(4)) === i).coalesce(1)
        .write.mode("overwrite").parquet(dir)
      val f = Files.list(Paths.get(dir)).toArray.map(_.toString)
        .filter(_.endsWith(".parquet")).head
      Paths.get(f)
    }
    (stage, parts)
  }

  private def copyIn(inDir: String, part: java.nio.file.Path, i: Int): Unit =
    Files.copy(part, Paths.get(inDir, s"part$i.parquet"))

  test("dropDuplicates dedup state survives a checkpoint restart") {
    val (_, parts) = splitInput("documents", "doc_id")
    val schema = spark.read.parquet(parts.head.toString).schema

    // band-dedup shape (streamingMinhashBandDedup's stateful core) in
    // Append mode to a file sink — exactly-once across restarts
    def run(interrupted: Boolean): Seq[(Int, String)] = {
      val inDir = freshDir("in"); val ckpt = freshDir("ckpt")
      val outDir = freshDir("out")
      import graft.text.{DedupOps, TextOps}
      def start() = {
        val withSig = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(inDir)
          .withColumn("__ts", TextOps.tokens(col("text")))
          .filter(size(col("__ts")) >= 3)
          .withColumn("__mins", graft.functions.MinhashExpr.minhashSigs(
            col("__ts"), 3, DedupOps.MinhashParams.take(8),
            DedupOps.MinhashP, xx = true))
        val bandStructs = (0 until 4).map { b =>
          val mins = (0 until 2).map(r => element_at(col("__mins"), b * 2 + r + 1))
          struct(lit(b).as("band"), concat_ws("_", mins: _*).as("sig"))
        }
        withSig.select(explode(array(bandStructs: _*)).as("bs"))
          .select(col("bs.band").as("band"), col("bs.sig").as("sig"))
          .dropDuplicates("band", "sig")
          .writeStream.format("parquet")
          .option("path", outDir).option("checkpointLocation", ckpt)
          .outputMode(OutputMode.Append()).start()
      }
      if (interrupted) {
        parts.take(2).zipWithIndex.foreach { case (p, i) => copyIn(inDir, p, i) }
        val q1 = start()
        q1.processAllAvailable(); q1.stop() // crash point
        parts.drop(2).zipWithIndex.foreach { case (p, i) => copyIn(inDir, p, i + 2) }
        val q2 = start() // resume from the same checkpoint
        q2.processAllAvailable(); q2.stop()
      } else {
        parts.zipWithIndex.foreach { case (p, i) => copyIn(inDir, p, i) }
        val q = start()
        q.processAllAvailable(); q.stop()
      }
      spark.read.parquet(outDir).as[(Int, String)].collect().toSeq
    }

    val resumed = run(interrupted = true)
    val control = run(interrupted = false)
    // no re-emission: the append sink holds each (band, sig) ONCE even
    // though both phases saw members of the same buckets
    assert(resumed.size == resumed.distinct.size)
    assert(resumed.sorted == control.sorted)
  }

  test("mapGroupsWithState state survives a checkpoint restart") {
    val (_, parts) = splitInput("events", "event_id")
    val schema = spark.read.parquet(parts.head.toString).schema

    def run(interrupted: Boolean): Map[Long, (Long, Double)] = {
      val inDir = freshDir("in"); val ckpt = freshDir("ckpt")
      val outDir = freshDir("out")
      def start() = {
        val evs = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1").parquet(inDir)
          .select(col("user_id").cast("long").as("user_id"),
            col("value").cast("double").as("value"))
          .as[RecEv]
        val agg = evs.groupByKey(_.user_id)
          .mapGroupsWithState[RecState, RecAgg](GroupStateTimeout.NoTimeout) {
            (uid, rows, state: GroupState[RecState]) =>
              val prev = state.getOption.getOrElse(RecState(0L, BigDecimal(0)))
              var n = prev.n; var tot = prev.total
              rows.foreach { e =>
                n += 1
                tot += BigDecimal(e.value)
                  .setScale(6, BigDecimal.RoundingMode.HALF_UP)
              }
              state.update(RecState(n, tot))
              RecAgg(uid, n, tot.toDouble)
          }
        // Update-mode emissions land through foreachBatch with their
        // batch id; the LATEST row per key is the recovered state's view
        agg.toDF().writeStream
          .outputMode(OutputMode.Update())
          .option("checkpointLocation", ckpt)
          .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
            b.withColumn("batch_id", lit(id))
              .write.mode("append").parquet(outDir)
          }
          .start()
      }
      if (interrupted) {
        parts.take(2).zipWithIndex.foreach { case (p, i) => copyIn(inDir, p, i) }
        val q1 = start()
        q1.processAllAvailable(); q1.stop() // crash point
        parts.drop(2).zipWithIndex.foreach { case (p, i) => copyIn(inDir, p, i + 2) }
        val q2 = start()
        q2.processAllAvailable(); q2.stop()
      } else {
        parts.zipWithIndex.foreach { case (p, i) => copyIn(inDir, p, i) }
        val q = start()
        q.processAllAvailable(); q.stop()
      }
      val out = spark.read.parquet(outDir)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("batch_id").desc)
      out.withColumn("__r", row_number().over(w)).filter(col("__r") === 1)
        .select(col("user_id"), col("n"), col("total"))
        .as[(Long, Long, Double)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
    }

    val resumed = run(interrupted = true)
    val control = run(interrupted = false)
    assert(resumed == control)
    // and both equal the batch twin — counts AND decimal-path totals:
    // a state reset would leave phase-1 events out of resumed totals
    val twin = spark.read.parquet(s"$sf/events.parquet")
      .groupBy(col("user_id").cast("long").as("user_id"))
      .agg(count(lit(1)).as("n"),
        graft.core.Tables.exactSum(col("value").cast("double")).as("total"))
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(resumed == twin)
  }
}
