package graft

import org.apache.spark.sql.functions._
import graft.text.DedupOps

/** SimHash banding semantics: the banded equi-join candidate path must
  * return exactly the naive all-pairs result for Hamming ≤ 3. */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("streaming minhash band dedup equals batch signature aggregation") {
    import org.apache.spark.sql.functions.{col, concat_ws}
    val stream = graft.streaming.StreamOps
      .streamingMinhashBandDedup(spark, sf, "mh_band_spec_sink")
      .orderBy(col("band")).collect().map(_.getLong(1)).toSeq
    val sig = graft.text.DedupOps.minhashSignatures(
      spark.read.parquet(s"$sf/documents.parquet"), "doc_id", "text", 3)
      .cache()
    val batch = (0 until 8).map { b =>
      sig.select(concat_ws("_",
        col(s"m${b * 2}"), col(s"m${b * 2 + 1}")).as("s"))
        .distinct().count()
    }
    sig.unpersist()
    assert(stream == batch, s"stream $stream vs batch $batch")
  }

  test("fast (xxhash64) streaming band dedup equals fast batch aggregation") {
    import org.apache.spark.sql.functions.{col, concat_ws}
    val stream = graft.streaming.StreamOps
      .streamingMinhashBandDedup(spark, sf, "mh_band_fast_spec_sink",
        fastHash = true)
      .orderBy(col("band")).collect().map(_.getLong(1)).toSeq
    val sig = graft.text.DedupOps.minhashSignaturesFast(
      spark.read.parquet(s"$sf/documents.parquet"), "doc_id", "text", 3)
      .cache()
    val batch = (0 until 8).map { b =>
      sig.select(concat_ws("_",
        col(s"m${b * 2}"), col(s"m${b * 2 + 1}")).as("s"))
        .distinct().count()
    }
    sig.unpersist()
    assert(stream == batch, s"fast stream $stream vs fast batch $batch")
  }

  test("jaccardPairs fails fast past the pair-volume guard, naming the scale paths") {
    // 6 docs sharing one hot shingle → Σ df·(df−1)/2 = 15 candidate pairs
    val docs = (0 until 6).map(i =>
      (i.toLong, s"common hot shingle unique$i tail$i end$i")).toDF("doc_id", "text")
    spark.conf.set("graft.dedup.maxJaccardPairs", "10")
    try {
      val e = intercept[IllegalStateException] {
        DedupOps.jaccardPairs(docs, "doc_id", "text", 3, 0.1)
      }
      assert(e.getMessage.contains("maxDocFreq") &&
        e.getMessage.contains("MinHash-LSH") &&
        e.getMessage.contains("graft.dedup.maxJaccardPairs"),
        s"guard message must name the scale alternatives: ${e.getMessage}")
      // a maxDocFreq cap that drops the hot shingle passes the same guard
      val capped = DedupOps.jaccardPairs(docs, "doc_id", "text", 3, 0.1,
        maxDocFreq = Some(3))
      assert(capped.collect() != null)
    } finally spark.conf.unset("graft.dedup.maxJaccardPairs")
    // default threshold admits the fixture unchanged
    assert(DedupOps.jaccardPairs(docs, "doc_id", "text", 3, 0.1)
      .count() >= 0)
  }

  test("cosineNearDupPairs fails fast past the bucket-occupancy guard") {
    // 40 identical-bucket vectors → 8 bands × C(40,2) = 6240 candidates
    val vecs = (0 until 40).map(i =>
      (i.toLong, Array.tabulate(8)(d => 0.5f + d * 0.01f + i * 1e-6f)))
      .toDF("vec_id", "embedding")
    spark.conf.set("graft.dedup.maxCosinePairs", "100")
    try {
      val e = intercept[IllegalStateException] {
        graft.similarity.SimilarityOps.cosineNearDupPairs(
          vecs, "vec_id", "embedding", 8, 0.9, bands = 8, planesPerBand = 2)
      }
      assert(e.getMessage.contains("planesPerBand") &&
        e.getMessage.contains("graft.dedup.maxCosinePairs"),
        s"guard message must name the scale knob: ${e.getMessage}")
    } finally spark.conf.unset("graft.dedup.maxCosinePairs")
    // default threshold admits the fixture unchanged
    assert(graft.similarity.SimilarityOps.cosineNearDupPairs(
      vecs, "vec_id", "embedding", 8, 0.9, bands = 8,
      planesPerBand = 2).count() >= 0)
  }

  test("banded simhash pairs == naive all-pairs at Hamming <= 3") {
    // hand-built signatures: dup pairs at distance 0/1/2/3, a near-miss
    // at 4, and signatures differing in every band
    val sigs = Seq(
      (1L, 0x12345678L), (2L, 0x12345678L),            // d=0
      (3L, 0x12345679L),                               // d(1,3)=1
      (4L, 0x1234567BL),                               // d(3,4)=1, d(1,4)=2
      (5L, 0x92345678L),                               // d(1,5)=1 (top bit)
      (6L, 0x0F0F0F0FL), (7L, 0xF0F0F0F0L),            // d=32
      (8L, 0x12305678L),                               // d(1,8)=2 (mid band)
      (9L, 0xFFFFFFFFL)
    ).toDF("doc_id", "simhash")
    val banded = DedupOps.simhashPairs(sigs, "doc_id", 3)
      .as[(Long, Long, Int)].collect().toSet
    // maxHamming=32 takes the quadratic fallback; post-filter to <= 3
    val naive = DedupOps.simhashPairs(sigs, "doc_id", 32)
      .filter(col("hamming") <= 3)
      .as[(Long, Long, Int)].collect().toSet
    assert(banded == naive)
    assert(banded.contains((1L, 2L, 0)) && banded.contains((1L, 3L, 1)))
    assert(!banded.exists { case (a, b, _) => a == 6L && b == 7L })
  }

  test("canonicalize: components collapse to the smallest doc id") {
    val docs = (1L to 8L).toDF("doc_id")
    // chain 1-2-3 (transitive component), pair 5-7, singletons 4,6,8
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 7L)).toDF("id1", "id2")
    val m = graft.text.DedupOps.canonicalize(docs, pairs, "doc_id")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(m(1L) == (1L, 1) && m(2L) == (1L, 0) && m(3L) == (1L, 0))
    assert(m(5L) == (5L, 1) && m(7L) == (5L, 0))
    assert(Seq(4L, 6L, 8L).forall(i => m(i) == (i, 1)))
  }

  test("canonicalize CC (large-star/small-star) matches union-find on " +
       "long chains and random graphs") {
    // a 64-node chain (diameter 63 — min-label propagation would need 63
    // rounds; LSS converges in O(log n)), a star, and a dense clique
    val chain = (100L until 163L).map(i => (i, i + 1))
    val star  = (201L to 208L).map(i => (200L, i))
    val clique = for (a <- 300L to 305L; b <- (a + 1) to 305L) yield (a, b)
    val edges = chain ++ star ++ clique
    val ids = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val docs = ids.toDF("doc_id")
    val pairs = edges.toDF("id1", "id2")
    val got = DedupOps.canonicalize(docs, pairs, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // driver-side union-find ground truth
    val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    edges.foreach { case (u, v) =>
      val (ru, rv) = (find(u), find(v))
      if (ru != rv) parent(math.max(ru, rv)) = math.min(ru, rv)
    }
    val want = ids.map(i => i -> find(i)).toMap
    assert(got == want)
  }

  test("EvalOnce barrier: identical rows, and the DP stays out of join conditions") {
    // the dedup_edit_distance scoring shape with and without the
    // barrier must agree row-for-row (EvalOnce is a plan-shape device,
    // not semantics), and the barriered plan must carry NO levenshtein
    // inside a join condition — that pushdown is the 30× regression the
    // sf1 mutated-replica rehearsal exposed
    import org.apache.spark.sql.graftbridge.SqlBridge
    val dd = spark.read.parquet(s"$sf/documents.parquet")
    val cand = DedupOps.minhashCandidates(
      DedupOps.minhashSignatures(dd, "doc_id", "text", 3),
      "doc_id", bands = 8, rows = 2)
    def scored(barrier: Boolean) = {
      val maxLen = greatest(length(col("t1")), length(col("t2")))
      val banded = SqlBridge.column(
        org.apache.spark.sql.catalyst.expressions.Levenshtein(
          SqlBridge.expression(col("t1")), SqlBridge.expression(col("t2")),
          Some(SqlBridge.expression((maxLen / 5).cast("int")))))
      val raw = when(col("t1") === col("t2"), 0).otherwise(banded)
      val d = if (barrier) graft.functions.BarrierExpr.evalOnce(raw) else raw
      cand
        .join(dd.select(col("doc_id").as("id1"), col("text").as("t1")), "id1")
        .join(dd.select(col("doc_id").as("id2"), col("text").as("t2")), "id2")
        .select(col("id1"), col("id2"), d.as("edit_dist"),
          maxLen.as("max_len"))
        .filter(col("edit_dist") >= 0 &&
          col("edit_dist") * 5 <= col("max_len"))
    }
    val want = scored(barrier = false)
      .as[(Long, Long, Int, Int)].collect().toSet
    val got = scored(barrier = true)
    assert(got.as[(Long, Long, Int, Int)].collect().toSet == want)
    val plan = got.queryExecution.executedPlan.toString
    val joinLines = plan.split("\n").filter(_.contains("HashJoin"))
    assert(joinLines.nonEmpty)
    assert(!joinLines.exists(_.toLowerCase.contains("levenshtein")),
      "banded DP leaked into a join condition despite EvalOnce")
  }

  test("banded simhash pairs match the fallback on real document data") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val sig = DedupOps.simhash(docs, "doc_id", "text").cache()
    val banded = DedupOps.simhashPairs(sig, "doc_id", 3)
      .as[(Long, Long, Int)].collect().toSet
    val naive = DedupOps.simhashPairs(sig, "doc_id", 32)
      .filter(col("hamming") <= 3)
      .as[(Long, Long, Int)].collect().toSet
    assert(banded == naive)
    sig.unpersist()
  }

  test("GramHash kernel == xxhash64 over materialized shingle strings") {
    // seed-42 kernel output must equal Spark's builtin xxhash64 of the
    // space-joined window string (the oracle-faithfulness contract of
    // GramHashExpr), positionally aligned
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(50)
    val n = 7
    val both = docs
      .select(col("doc_id"), graft.text.TextOps.tokens(col("text")).as("__ts"))
      .select(col("doc_id"),
        graft.functions.GramHashExpr.gramHashes(col("__ts"), n, 42L).as("k"),
        transform(graft.text.TextOps.shinglesFromTokens(col("__ts"), n),
          s => xxhash64(s)).as("c"))
    val bad = both.filter(size(col("k")) =!= size(col("c")) ||
      exists(arrays_zip(col("k"), col("c")),
        z => z("k") =!= z("c"))).count()
    assert(bad == 0)
    // short docs yield empty arrays, not nulls
    val shorty = Seq((1L, "a b c")).toDF("doc_id", "text")
      .select(graft.functions.GramHashExpr.gramHashes(
        graft.text.TextOps.tokens(col("text")), 10, 42L).as("k"))
      .select(size(col("k"))).as[Int].head()
    assert(shorty == 0)
  }

  test("exactSubstringSpans: flagged positions coalesce; trim removes exactly them") {
    // hand-built corpus: docs 1 and 2 share tokens r0..r9 (one 10-run);
    // doc 3 repeats its own 10-run twice in-document; doc 4 is clean
    val run = (0 until 10).map(i => s"r$i").mkString(" ")
    val mk = (p: String, q: String) => s"$p $run $q"
    val docs = Seq(
      (1L, mk("a1 a2 a3", "z1 z2")),
      (2L, mk("b1", "y1 y2 y3")),
      (3L, s"c1 $run c2 c3 $run c4"),
      (4L, (0 until 30).map(i => s"u$i").mkString(" "))
    ).toDF("doc_id", "text")
    val spans = graft.text.DedupOps
      .exactSubstringSpans(docs, "doc_id", "text", 10)
      .orderBy("doc_id", "span_start")
      .as[(Long, Int, Int)].collect().toSeq
    assert(spans == Seq((1L, 3, 12), (2L, 1, 10), (3L, 1, 10), (3L, 13, 22)))
    val trimmed = graft.text.DedupOps
      .trimExactSubstrings(docs, "doc_id", "text", 10)
      .orderBy("doc_id").as[(Long, String, Int)].collect().toSeq
    assert(trimmed(0) == ((1L, "a1 a2 a3 z1 z2", 5)))
    assert(trimmed(1) == ((2L, "b1 y1 y2 y3", 4)))
    assert(trimmed(2) == ((3L, "c1 c2 c3 c4", 4)))
    assert(trimmed(3)._3 == 30 && trimmed(3)._2.startsWith("u0 u1"))
    // pairs: docs 1/2/3 all share the run, longest shared run exactly 10
    val pairs = graft.text.DedupOps
      .exactSubstringPairs(docs, "doc_id", "text", 10)
      .orderBy("id_a", "id_b")
      .as[(Long, Long, Long)].collect().toSeq
    assert(pairs == Seq((1L, 2L, 10L), (1L, 3L, 10L), (2L, 3L, 10L)))
  }

  test("exactSubstringPairs fails fast past the matched-pair guard") {
    val boiler = (0 until 12).map(i => s"w$i").mkString(" ")
    val docs = (1L to 40L).map(i => (i, s"pre$i $boiler post$i"))
      .toDF("doc_id", "text")
    spark.conf.set("graft.dedup.maxSubstringPairs", "100")
    try {
      val e = intercept[IllegalStateException] {
        graft.text.DedupOps
          .exactSubstringPairs(docs, "doc_id", "text", 10).count()
      }
      assert(e.getMessage.contains("exactSubstringSpans"))
      // the linear flag path handles the same corpus fine
      val flagged = graft.text.DedupOps
        .exactSubstringSpans(docs, "doc_id", "text", 10).count()
      assert(flagged == 40)
    } finally spark.conf.unset("graft.dedup.maxSubstringPairs")
  }
}
