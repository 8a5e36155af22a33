package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-rehearsal data generator (test scope, not part of the library):
  * replicates an existing sf directory K times with key offsets into a
  * new directory, preserving distributions while growing join
  * cardinalities — an sf1-equivalent from sf0.1 without touching the
  * read-only driver data.
  *
  * Replicas of `documents.text` and `embeddings.embedding` are MUTATED,
  * not copied verbatim: a verbatim replica gives every document K-1
  * exact twins, so near-dup pair volume grows ×K(K-1)/2 and the dedup
  * family's scale numbers measure the fixture pathology, not the
  * operator (round-8/9 verdicts). Instead each (row, replica) draws a
  * deterministic mutation intensity from xxhash64 keyed by structural
  * position (id, replica, token index — never a sequential RNG stream,
  * matching the repo's hash-driven-RNG convention):
  *   - text: per-token substitution from the corpus vocab with
  *     probability r ∈ {0, 1/32, …, 15/32} drawn per (doc, replica) —
  *     3-shingle Jaccard vs the base doc then spans ≈1.0 down to ≈0.1,
  *     so SOME replicas stay above each dedup threshold (near-dups,
  *     found), some fall below (distinct, correctly not found), and
  *     r = 0 replicas (1/16) remain exact duplicates for the exact-dedup
  *     paths. n_chars is recomputed from the mutated text.
  *   - embeddings: per-element uniform noise with amplitude
  *     s ∈ {0, 0.01, …, 0.31} drawn per (vec, replica) — expected noise
  *     norm ≈ 4.6·s against unit-norm signal, so cosine similarity to
  *     the base vector spans ≈1.0 down to ≈0.6 across the ANN/near-dup
  *     thresholds.
  * Replica 0 is always the untouched base fixture.
  *
  * A fourth argument selects the replica mode:
  *   - `mutate` (default): the r10 mutated-twin scheme above. Pair-query
  *     volumes still grow ∝ K²/2 because every replica is related to its
  *     base doc — the right fixture for measuring dedup RECALL machinery
  *     at scale, the wrong one for extrapolating pair-bound runtimes.
  *   - `grow`: replicas i > 0 are FRESH documents/embeddings — every
  *     token (resp. vector element) is hash-drawn from the corpus vocab
  *     (resp. uniform [−1,1]) keyed by (id, replica, position), reusing
  *     only the base row's length so the length distribution holds.
  *     Unique docs grow ∝ K and near-dup pairs stay ∝ the base corpus's
  *     own natural duplicates — honest pair scaling for
  *     dedup_simhash_pairs / dedup_edit_distance (r11 ask #5).
  *
  * Usage:
  *   Test/runMain graft.GenScale /root/testdata/sf0.1 /tmp/sf1 10 [mutate|grow]
  */
object GenScale {

  /** Fresh uniform-[−1,1] vector per (vec, replica) — cosine ranking
    * is scale-invariant, so no normalization is needed. Same 1/8
    * exact-duplicate device as `growText` for ∝K cosine-near-dup
    * pair volume. Object-level (not inside `main`) because EmbedScale
    * replicates embeddings with the SAME hash keys — a drifting copy
    * there would silently diverge from the full-table-family replicas
    * it stands in for (r13 ADVICE). */
  def growEmbedding(df: DataFrame, i: Int): DataFrame = {
    if (i == 0) return df
    def freshVec(jc: Column): Column = transform(col("embedding"),
      (_, j) =>
        ((pmod(xxhash64(lit("growemb"), col("vec_id"), jc, j),
          lit(2001)).cast("double") - lit(1000.0)) / lit(1000.0))
          .cast("float"))
    val isDup =
      pmod(xxhash64(lit("edupflag"), col("vec_id"), lit(i)), lit(8)) === 0
    val partner =
      pmod(xxhash64(lit("eduppick"), col("vec_id"), lit(i)), lit(i))
    val dupVec = when(partner === 0, col("embedding"))
      .otherwise(freshVec(partner))
    df.withColumn("embedding",
      when(isDup, dupVec).otherwise(freshVec(lit(i))))
  }

  /** CLUSTERED corpus device (r13 verdict ask #1): uniform replicas are
    * the adversarial geometry for IVF (every list boundary cuts true
    * neighborhoods — Jégou et al., TPAMI 2011 §V report recall on
    * real/structured corpora, not uniform noise), so the production
    * guidance "clustered corpora → IVF-PQ+re-rank ≥ 0.9" needs a
    * generator with real cluster structure at replica scale.
    *
    * Every vector is (center + amp·noise), all hash-drawn from vec_id:
    *   center c = pmod(xxh64("clpick", vec_id), nCenters)
    *   center[j] = u(xxh64("clcenter", c, j))            ∈ [−1,1]
    *   noise[j]  = u(xxh64("clnoise", vec_id, j)) · amp, amp = noisePermille/1000
    * With dim d the center norm ≈ √(d/3) and the noise norm ≈ amp·√(d/3),
    * so cos(v, center) ≈ 1/√(1+amp²) regardless of d (amp = 0.25 → ≈0.97),
    * while two random centers have E[cos] = 0 ± 1/√d — well-separated
    * clusters whose membership Lloyd recovers. Purely keyed by vec_id:
    * replica splitting does not change any vector. */
  def clusteredEmbedding(df: DataFrame, nCenters: Int = 256,
                         noisePermille: Int = 250): DataFrame = {
    def u(h: Column): Column =
      (pmod(h, lit(2001)).cast("double") - lit(1000.0)) / lit(1000.0)
    val cid = pmod(xxhash64(lit("clpick"), col("vec_id")), lit(nCenters))
    val amp = lit(noisePermille.toDouble / 1000.0)
    val vec = transform(col("embedding"), (_, j) =>
      (u(xxhash64(lit("clcenter"), cid, j)) +
        amp * u(xxhash64(lit("clnoise"), col("vec_id"), j))).cast("float"))
    df.withColumn("embedding", vec)
  }

  def main(args: Array[String]): Unit = {
    val src = args(0); val dst = args(1); val k = args(2).toInt
    val mode = if (args.length > 3) args(3) else "mutate"
    require(mode == "mutate" || mode == "grow", s"unknown mode $mode")
    // optional 5th arg: comma-list of tables to emit (e.g. "documents")
    // — a docs-only ×1000 replica shouldn't pay for 600M lineitem rows
    val only: Option[Set[String]] =
      if (args.length > 4) Some(args(4).split(",").map(_.trim).toSet)
      else None
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val OFF = 100000000L

    // which columns shift per replica (keys only; values keep their
    // distributions so plans and selectivities stay comparable)
    val keyCols: Map[String, Seq[String]] = Map(
      "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
      "orders" -> Seq("o_orderkey", "o_custkey"),
      "customer" -> Seq("c_custkey"),
      "supplier" -> Seq("s_suppkey"),
      "part" -> Seq("p_partkey"),
      "events" -> Seq("event_id", "user_id"),
      "documents" -> Seq("doc_id"),
      "embeddings" -> Seq("vec_id"),
      "nation" -> Nil, "region" -> Nil)

    // corpus vocab for substitutions (tiny — the synthetic corpus draws
    // from a few dozen tokens; sorted so the array literal is stable)
    lazy val vocab: Seq[String] = {
      import spark.implicits._
      spark.read.parquet(s"$src/documents.parquet")
        .select(explode(split(col("text"), " ")).as("t"))
        .distinct().as[String].collect().sorted.toSeq
    }

    /** Seeded token swaps for replica i (identity for i = 0). */
    def mutateText(df: DataFrame, i: Int): DataFrame = {
      if (i == 0) return df
      val rate = pmod(xxhash64(lit("mutrate"), col("doc_id"), lit(i)), lit(16))
      val vlen = vocab.length
      val vlit = typedLit(vocab)
      val mutated = transform(split(col("text"), " "), (tok, p) =>
        when(pmod(xxhash64(lit("muttok"), col("doc_id"), lit(i), p),
          lit(32)) < rate,
          element_at(vlit,
            (pmod(xxhash64(lit("mutpick"), col("doc_id"), lit(i), p),
              lit(vlen)) + 1).cast("int")))
          .otherwise(tok))
      df.withColumn("text", array_join(mutated, " "))
        .withColumn("n_chars", length(col("text")).cast("long"))
    }

    /** Seeded ε-noise for replica i (identity for i = 0). */
    def mutateEmbedding(df: DataFrame, i: Int): DataFrame = {
      if (i == 0) return df
      val scale = pmod(xxhash64(lit("embscale"), col("vec_id"), lit(i)),
        lit(32)).cast("double") / lit(100.0)
      val noised = transform(col("embedding"), (x, j) => {
        val u = (pmod(xxhash64(lit("embnoise"), col("vec_id"), lit(i), j),
          lit(2001)).cast("double") - lit(1000.0)) / lit(1000.0)
        (x + scale * u).cast("float")
      })
      df.withColumn("embedding", noised)
    }

    /** Fresh token sequence per (doc, replica) — only the base doc's
      * token COUNT is reused (length distribution). Tokens are
      * base-vocab words with a hash suffix: the raw ~40-token synthetic
      * vocab makes any two "random" docs share most of their shingles
      * (measured: 80× simhash-pair growth for 10× docs — a worse
      * artifact than mutate mode), while the ~40·997 effective vocab
      * makes fresh docs mutually distinct. 1/8 of replica docs are
      * EXACT duplicates of an earlier replica's grown text (or of the
      * base doc when the partner draw lands on 0) — computable because
      * fresh text is a pure hash of (doc, replica, pos) — so near-dup
      * pair volume grows ∝ K like a real ingest, not ∝ K². */
    def growText(df: DataFrame, i: Int): DataFrame = {
      if (i == 0) return df
      val vlen = vocab.length
      val vlit = typedLit(vocab)
      def freshText(jc: Column): Column = array_join(
        transform(split(col("text"), " "), (_, p) => concat(
          element_at(vlit,
            (pmod(xxhash64(lit("growtok"), col("doc_id"), jc, p),
              lit(vlen)) + 1).cast("int")),
          lit("x"),
          pmod(xxhash64(lit("growsuf"), col("doc_id"), jc, p), lit(997))
            .cast("string"))), " ")
      val isDup =
        pmod(xxhash64(lit("dupflag"), col("doc_id"), lit(i)), lit(8)) === 0
      val partner =
        pmod(xxhash64(lit("duppick"), col("doc_id"), lit(i)), lit(i))
      val dupText = when(partner === 0, col("text"))
        .otherwise(freshText(partner))
      df.withColumn("text",
          when(isDup, dupText).otherwise(freshText(lit(i))))
        .withColumn("n_chars", length(col("text")).cast("long"))
    }

    keyCols.filter(kv => only.forall(_.contains(kv._1)))
      .foreach { case (t, keys) =>
      val base = spark.read.parquet(s"$src/$t.parquet")
      val out: DataFrame =
        if (keys.isEmpty) base // dimension tables stay single-copy
        else (0 until k).map { i =>
          val shifted = keys.foldLeft(base) { (df, c) =>
            df.withColumn(c, col(c) + lit(i * OFF)) }
          t match {
            case "documents" =>
              if (mode == "grow") growText(shifted, i)
              else mutateText(shifted, i)
            case "embeddings" =>
              if (mode == "grow") growEmbedding(shifted, i)
              else mutateEmbedding(shifted, i)
            case _ => shifted
          }
        }.reduce(_.unionByName(_))
      if (t == "events" || t == "documents") {
        // StreamOps sources readStream from the sf DIR with
        // pathGlobFilter "<table>.parquet" — a FILE name, matching the
        // driver's single-file layout. A directory-style write here made
        // every stream_* query see zero files at the replica, so emit
        // the streamed tables as one literal file like the fixture.
        val tmp = s"$dst/_${t}_tmp"
        out.coalesce(1).write.mode("overwrite").parquet(tmp)
        import org.apache.hadoop.fs.Path
        val fs = new Path(dst).getFileSystem(
          spark.sparkContext.hadoopConfiguration)
        val part = fs.globStatus(new Path(s"$tmp/part-*.parquet"))(0).getPath
        val target = new Path(s"$dst/$t.parquet")
        fs.delete(target, true)
        fs.rename(part, target)
        fs.delete(new Path(tmp), true)
      } else {
        out.write.mode("overwrite").parquet(s"$dst/$t.parquet")
      }
      println(s"[genscale] $t: ${out.count()} rows")
    }
    spark.stop()
  }
}
