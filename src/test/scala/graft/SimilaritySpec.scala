package graft

import org.apache.spark.sql.functions._
import graft.similarity.SimilarityOps

/** IVF ANN semantics: exactness at full probe, recall trade-off below. */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def embeddings = {
    spark.read.parquet(s"$sf/embeddings.parquet")
  }

  test("IVF with nprobe = nlist equals brute force exactly") {
    val e = embeddings
    val q = e.filter(col("vec_id") < 10)
    val bf = SimilarityOps.topKCosine(q, e, "vec_id", "embedding", 64, 3)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    val ivf = SimilarityOps.ivfTopKCosine(q, e, "vec_id", "embedding", 64,
        3, nlist = 8, nprobe = 8)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(ivf == bf)
  }

  test("IVF with small nprobe keeps reasonable recall at bounded scan") {
    val e = embeddings
    val q = e.filter(col("vec_id") < 20)
    val bf = SimilarityOps.topKCosine(q, e, "vec_id", "embedding", 64, 3)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    val ivf = SimilarityOps.ivfTopKCosine(q, e, "vec_id", "embedding", 64,
        3, nlist = 8, nprobe = 3)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    val recall = (ivf intersect bf).size.toDouble / bf.size
    assert(recall >= 0.5, s"recall $recall")
    // every result still carries a valid rank per query
    assert(ivf.size <= bf.size)
  }

  test("cosine near-dup pairs: threshold enforced, deduped, subset of brute force") {
    val e = embeddings
    val got = SimilarityOps.cosineNearDupPairs(e, "vec_id", "embedding", 64,
        threshold = 0.3, bands = 4, planesPerBand = 4)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got.forall(_._3 >= 0.3))
    assert(got.forall(p => p._1 < p._2))
    assert(got.map(p => (p._1, p._2)).distinct.length == got.length)
    val all = e.select(col("vec_id").as("ida"), col("embedding").as("ea"))
      .join(e.select(col("vec_id").as("idb"), col("embedding").as("eb")),
        col("ida") < col("idb"))
      .withColumn("c", SimilarityOps.cosineFixed(col("ea"), col("eb"), 64))
      .filter(col("c") >= 0.3)
      .select("ida", "idb").as[(Long, Long)].collect().toSet
    assert(got.forall(p => all.contains((p._1, p._2))),
      "reported pair missing from brute-force ground truth")
  }

  test("cosine near-dup pairs deterministic across partitionings") {
    val e = embeddings
    val a = SimilarityOps.cosineNearDupPairs(e, "vec_id", "embedding", 64,
        0.3, 4, 4).orderBy("id_a", "id_b")
      .as[(Long, Long, Double)].collect().toSeq
    val b = SimilarityOps.cosineNearDupPairs(e.repartition(7), "vec_id",
        "embedding", 64, 0.3, 4, 4).orderBy("id_a", "id_b")
      .as[(Long, Long, Double)].collect().toSeq
    assert(a.nonEmpty && a == b)
  }

  test("near-dup pairs identical on the broadcast and shuffle-join branches") {
    // the vector re-join broadcasts the id+vector side below the
    // heap-aware ceiling; force the shuffle fallback by setting the
    // ceiling to 0 and pin branch-invariant results (r13 ask #1)
    val e = embeddings
    val bcast = SimilarityOps.cosineNearDupPairs(e, "vec_id", "embedding",
        64, 0.3, 4, 4).orderBy("id_a", "id_b")
      .as[(Long, Long, Double)].collect().toSeq
    spark.conf.set("graft.dedup.broadcastVecBytes", "0")
    try {
      val shuffle = SimilarityOps.cosineNearDupPairs(e, "vec_id",
          "embedding", 64, 0.3, 4, 4).orderBy("id_a", "id_b")
        .as[(Long, Long, Double)].collect().toSeq
      assert(bcast.nonEmpty && bcast == shuffle)
    } finally spark.conf.unset("graft.dedup.broadcastVecBytes")
  }

  test("CentroidArgTop clamps rank to surviving centroids (Lloyd-emptied list)") {
    // rank > cents.size used to throw at plan build where the old
    // crossJoin+row_number form returned all surviving lists
    val cents = Seq((0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0)))
    val df = Seq((10L, Seq(1.0, 0.1)), (11L, Seq(0.1, 1.0)))
      .toDF("id", "v")
    val got = SimilarityOps.assignTopR(df, cents, col("v"),
        graft.functions.CentroidSelect.Cos, asc = false, rank = 5,
        out = "list_id")
      .groupBy("id").agg(sort_array(collect_list("list_id")).as("ls"))
      .orderBy("id").as[(Long, Seq[Long])].collect().toSeq
    // every row probes ALL surviving lists, none crash
    assert(got == Seq((10L, Seq(0L, 1L)), (11L, Seq(0L, 1L))))
  }

  test("D2 scoring bounds the loop to the row vector's length") {
    // a row vector SHORTER than the centroid dim must not read past
    // its ArrayData (UnsafeArrayData would return garbage, not throw)
    val cents = Seq((0L, Seq(0.0, 0.0, 100.0)), (1L, Seq(5.0, 5.0, 0.0)))
    val df = Seq((1L, Seq(0.1, 0.2))).toDF("id", "v")
    val got = SimilarityOps.assignTopR(df, cents, col("v"),
        graft.functions.CentroidSelect.D2, asc = true, rank = 1,
        out = "list_id")
      .select("list_id").as[Long].collect().toSeq
    // over the SHARED 2 dims, centroid 0 is nearer (0.05 vs 47.05);
    // an unguarded read of dim 3 would have flipped this via the 100
    assert(got == Seq(0L))
  }

  test("IVF is deterministic across partitionings") {
    val e = embeddings
    val q = e.filter(col("vec_id") < 5)
    val a = SimilarityOps.ivfTopKCosine(q, e, "vec_id", "embedding", 64,
        3, 8, 2).orderBy("query_id", "rank")
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSeq
    val b = SimilarityOps.ivfTopKCosine(q.repartition(5), e.repartition(7),
        "vec_id", "embedding", 64, 3, 8, 2).orderBy("query_id", "rank")
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSeq
    assert(a == b)
  }

  test("PQ-ADC shortlist + exact re-rank recovers recall vs brute force") {
    val e = embeddings
    val q = e.filter(col("vec_id") < 20)
    val bf = SimilarityOps.topKCosine(q, e, "vec_id", "embedding", 64, 5)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    // raw ADC at 16× compression: far above chance (~1%) on this
    // weak-structure synthetic corpus, but distorted — that's PQ
    val raw = SimilarityOps.pqTopKCosine(q, e, "vec_id", "embedding", 64,
        k = 5).select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    val rawRecall = (bf intersect raw).size.toDouble / bf.size
    assert(rawRecall >= 0.10, s"raw ADC recall@5 $rawRecall")
    assert(raw.size == bf.size)
    // production contract: ADC shortlist (10% of corpus) + exact re-rank
    val rr = SimilarityOps.pqRerankTopKCosine(q, e, "vec_id", "embedding",
        64, k = 5, shortlist = 50)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    val rrRecall = (bf intersect rr).size.toDouble / bf.size
    assert(rrRecall >= 0.5, s"re-ranked recall@5 $rrRecall")
    assert(rrRecall >= rawRecall, "re-rank must not hurt recall")
  }

  test("IVF-PQ with nprobe = nlist equals the plain PQ-ADC scan exactly") {
    val e = embeddings
    val q = e.filter(col("vec_id") < 10)
    val pq = SimilarityOps.pqTopKCosine(q, e, "vec_id", "embedding", 64, 5)
      .select("query_id", "neighbor_id", "adc", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    val ivfpq = SimilarityOps.ivfPqTopKCosine(q, e, "vec_id", "embedding",
        64, 5, nlist = 8, nprobe = 8)
      .select("query_id", "neighbor_id", "adc", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(ivfpq == pq)
  }

  test("IVF-PQ with small nprobe returns a per-query subset of probed lists") {
    val e = embeddings
    val q = e.filter(col("vec_id") < 10)
    val r = SimilarityOps.ivfPqTopKCosine(q, e, "vec_id", "embedding",
        64, 5, nlist = 8, nprobe = 2)
    val perQuery = r.groupBy(col("query_id")).count().collect()
    assert(perQuery.nonEmpty && perQuery.forall(_.getLong(1) <= 5))
    // candidate shrink: results must come from the PQ ranking, so every
    // (query, neighbor) must also rank within plain PQ's full scan
    val full = SimilarityOps.pqTopKCosine(q, e, "vec_id", "embedding", 64,
        k = Int.MaxValue).select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    val got = r.select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    assert(got.subsetOf(full))
  }

  // Second recall fixture: strongly CLUSTERED corpus (8 well-separated
  // centroids × 40 points, deterministic perturbations). The sf corpus
  // is weak-structure, so its recall floors are loose; here quantization
  // aligns with real cluster geometry and regressions in the PQ/IVF
  // paths show up as hard recall drops instead of hiding under the
  // determinism pins.
  private lazy val clustered = {
    val dim = 16
    val pts = for {
      j <- 0 until 8; i <- 0 until 40
    } yield {
      val v = (0 until dim).map { kk =>
        ((j * 31 + kk * 17) % 13 - 6) / 3.0 +
          (((j * 40 + i) * 7 + kk * 3) % 11 - 5) / 50.0
      }
      ((j * 40 + i).toLong, v)
    }
    pts.toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
  }

  test("clustered fixture: IVF recall@10 is monotone in nprobe, exact at full probe") {
    val e = clustered
    val q = e.filter(col("vec_id") % 40 === 0) // one query per cluster
    val bf = SimilarityOps.topKCosine(q, e, "vec_id", "embedding", 16, 10)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    val recalls = Seq(1, 2, 4, 8).map { np =>
      val r = SimilarityOps.ivfTopKCosine(q, e, "vec_id", "embedding", 16,
          10, nlist = 8, nprobe = np)
        .select("query_id", "neighbor_id")
        .as[(Long, Long)].collect().toSet
      (bf intersect r).size.toDouble / bf.size
    }
    assert(recalls.sliding(2).forall(p => p(0) <= p(1) + 1e-12),
      s"recall not monotone in nprobe: $recalls")
    assert(recalls.head >= 0.6, s"recall@10 nprobe=1 too low: ${recalls.head}")
    assert(recalls.last == 1.0, s"full probe not exact: ${recalls.last}")
  }

  test("clustered fixture: PQ-ADC re-rank holds a hard recall@10 floor") {
    val e = clustered
    val q = e.filter(col("vec_id") % 40 === 0)
    val bf = SimilarityOps.topKCosine(q, e, "vec_id", "embedding", 16, 10)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    val raw = SimilarityOps.pqTopKCosine(q, e, "vec_id", "embedding", 16,
        k = 10).select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    val rawRecall = (bf intersect raw).size.toDouble / bf.size
    val rr = SimilarityOps.pqRerankTopKCosine(q, e, "vec_id", "embedding",
        16, k = 10, shortlist = 64)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    val rrRecall = (bf intersect rr).size.toDouble / bf.size
    // raw ADC on 16-dim/16× compression measures 0.3125 here — well
    // above the ~0.03 chance floor; the hard contract is the re-rank
    assert(rawRecall >= 0.25, s"clustered raw ADC recall@10 $rawRecall")
    assert(rrRecall >= 0.9, s"clustered re-ranked recall@10 $rrRecall")
  }

  test("GenScale clustered generator: IVF-PQ re-rank recall@10 ≥ 0.9 at nprobe ≪ nlist") {
    // pins the production guidance ("clustered corpora → IVF-PQ+re-rank
    // ≥ 0.9 recall") on the SAME generator the scale replicas use
    // (GenScale.clusteredEmbedding), not the 320-row arithmetic fixture —
    // the r13 verdict's missing link between the spec floor and the
    // sf1g/sf10g BASELINE tables
    val dim = 32
    val base = (0L until 4000L).map(id => (id, Seq.fill(dim)(0.0f)))
      .toDF("vec_id", "embedding")
    val e = GenScale.clusteredEmbedding(base, nCenters = 32,
      noisePermille = 250)
    val q = e.filter(col("vec_id") % 125 === 0) // 32 queries
    val bf = SimilarityOps.topKCosine(q, e, "vec_id", "embedding", dim, 10)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    // shortlist sizing rule this fixture exposed: inside a tight cluster
    // PQ resolution saturates — all ~125 members of a cluster share one
    // code, so ADC ties and the shortlist samples the cohort arbitrarily.
    // recall caps at shortlist/cohort (measured 0.79 at shortlist=100 vs
    // 125-member cohorts; 0.997 at 150). Production rule: shortlist must
    // exceed the largest ADC-tie cohort the probed lists can contain.
    val rr = SimilarityOps.ivfPqRerankTopKCosine(q, e, "vec_id",
        "embedding", dim, k = 10, nlist = 32, nprobe = 4, shortlist = 150)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    val recall = (bf intersect rr).size.toDouble / bf.size
    assert(recall >= 0.9,
      s"generator-clustered IVF-PQ re-rank recall@10 $recall < 0.9")
    // and the IVF (exact-score) path recovers the generator's clusters
    // outright: nprobe=2 of 32 lists is already lossless here
    val ivf = SimilarityOps.ivfTopKCosine(q, e, "vec_id", "embedding",
        dim, 10, nlist = 32, nprobe = 2)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    val ivfRecall = (bf intersect ivf).size.toDouble / bf.size
    assert(ivfRecall >= 0.95,
      s"generator-clustered IVF recall@10 at nprobe=2 $ivfRecall < 0.95")
  }

  test("clustered fixture: IVF-PQ re-rank restores recall to the IVF ceiling") {
    // raw 16-bit ADC codes are quantization-bound (~0.01 recall@10 on
    // uniform growth replicas); the composed IVFPQ+refine contract must
    // recover recall up to what the probed lists contain
    val e = clustered
    val q = e.filter(col("vec_id") % 40 === 0)
    val bf = SimilarityOps.topKCosine(q, e, "vec_id", "embedding", 16, 10)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select("query_id", "neighbor_id")
        .as[(Long, Long)].collect().toSet
      (bf intersect got).size.toDouble / bf.size
    }
    for (np <- Seq(4, 8)) {
      val raw = recallOf(SimilarityOps.ivfPqTopKCosine(
        q, e, "vec_id", "embedding", 16, 10, nlist = 8, nprobe = np))
      val rr = recallOf(SimilarityOps.ivfPqRerankTopKCosine(
        q, e, "vec_id", "embedding", 16, 10, nlist = 8, nprobe = np,
        shortlist = 64))
      assert(rr >= raw - 1e-12, s"nprobe=$np rerank $rr below raw $raw")
      assert(rr >= 0.6, s"nprobe=$np re-ranked recall@10 $rr")
    }
  }

  test("semanticDedup: groups are within-cluster, labels are min ids, keep = least central") {
    val e = embeddings
    val got = SimilarityOps.semanticDedup(e, "vec_id", "embedding", 64,
        nlist = 8, eps = 0.4)
      .as[(Long, Long, Double, Long, Int)].collect().toSeq
    assert(got.length == e.count())
    val byGroup = got.groupBy(_._4)
    // exactly one keep per duplicate group, and it is the member with
    // the smallest (cent_sim, id)
    byGroup.foreach { case (g, ms) =>
      assert(ms.count(_._5 == 1) == 1, s"group $g keeps != 1")
      val kept = ms.find(_._5 == 1).get
      val best = ms.minBy(m => (m._3, m._1))
      assert(kept._1 == best._1, s"group $g kept ${kept._1}, want ${best._1}")
      assert(g == ms.map(_._1).min, s"group $g label is not the min id")
      assert(ms.map(_._2).distinct.length == 1,
        s"group $g spans clusters ${ms.map(_._2).distinct}")
    }
    // every within-cluster pair above eps landed in one group
    val lists = got.map(m => m._1 -> m._2).toMap
    val groups = got.map(m => m._1 -> m._4).toMap
    val dupEdges = e.select(col("vec_id").as("ida"), col("embedding").as("ea"))
      .join(e.select(col("vec_id").as("idb"), col("embedding").as("eb")),
        col("ida") < col("idb"))
      .withColumn("c", SimilarityOps.cosineFixed(col("ea"), col("eb"), 64))
      .filter(col("c") >= 0.4)
      .select("ida", "idb").as[(Long, Long)].collect()
      .filter { case (x, y) => lists(x) == lists(y) }
    assert(dupEdges.nonEmpty, "fixture produced no semantic duplicates")
    dupEdges.foreach { case (x, y) =>
      assert(groups(x) == groups(y), s"edge ($x,$y) split across groups")
    }
  }

  test("semanticDedup guard refuses hot-cluster pair blowups by estimate") {
    val e = embeddings
    try {
      spark.conf.set("graft.dedup.maxSemanticPairs", "10")
      val ex = intercept[IllegalStateException] {
        SimilarityOps.semanticDedup(e, "vec_id", "embedding", 64,
          nlist = 2, eps = 0.4).count()
      }
      assert(ex.getMessage.contains("maxSemanticPairs"))
      assert(ex.getMessage.contains("nlist"),
        "message must name the scale alternative")
    } finally spark.conf.unset("graft.dedup.maxSemanticPairs")
  }

  test("two-level IVF at nprobe = nlist equals brute force exactly") {
    // at full probe the routing is a no-op (every list is scanned), so
    // the hierarchical quantizer must be output-identical to brute
    // force even though its list ASSIGNMENTS differ from the flat path
    val e = embeddings
    val q = e.filter(col("vec_id") < 10)
    val bf = SimilarityOps.topKCosine(q, e, "vec_id", "embedding", 64, 3)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    val hier = SimilarityOps.ivfTopKCosine(q, e, "vec_id", "embedding", 64,
        3, nlist = 8, nprobe = 8, ntop = 3)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(hier == bf)
  }

  test("two-level IVF at small nprobe keeps reasonable recall") {
    val e = embeddings
    val q = e.filter(col("vec_id") < 20)
    val bf = SimilarityOps.topKCosine(q, e, "vec_id", "embedding", 64, 3)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    val hier = SimilarityOps.ivfTopKCosine(q, e, "vec_id", "embedding", 64,
        3, nlist = 8, nprobe = 3, ntop = 3)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    val recall = (hier intersect bf).size.toDouble / bf.size
    assert(recall >= 0.5, s"recall $recall")
  }

  test("two-level semanticDedup holds the flat invariants and is partition-stable") {
    val e = embeddings
    def run(df: org.apache.spark.sql.DataFrame) =
      SimilarityOps.semanticDedup(df, "vec_id", "embedding", 64,
          nlist = 8, eps = 0.4, ntop = 3)
        .orderBy("vec_id")
        .as[(Long, Long, Double, Long, Int)].collect().toSeq
    val got = run(e)
    assert(got.length == e.count())
    val byGroup = got.groupBy(_._4)
    byGroup.foreach { case (g, ms) =>
      assert(ms.count(_._5 == 1) == 1, s"group $g keeps != 1")
      val best = ms.minBy(m => (m._3, m._1))
      assert(ms.find(_._5 == 1).get._1 == best._1, s"group $g wrong keep")
      assert(g == ms.map(_._1).min, s"group $g label is not the min id")
      assert(ms.map(_._2).distinct.length == 1, s"group $g spans clusters")
    }
    // every within-cluster pair above eps landed in one group
    val lists = got.map(m => m._1 -> m._2).toMap
    val groups = got.map(m => m._1 -> m._4).toMap
    e.select(col("vec_id").as("ida"), col("embedding").as("ea"))
      .join(e.select(col("vec_id").as("idb"), col("embedding").as("eb")),
        col("ida") < col("idb"))
      .withColumn("c", SimilarityOps.cosineFixed(col("ea"), col("eb"), 64))
      .filter(col("c") >= 0.4)
      .select("ida", "idb").as[(Long, Long)].collect()
      .filter { case (x, y) => lists(x) == lists(y) }
      .foreach { case (x, y) =>
        assert(groups(x) == groups(y), s"edge ($x,$y) split across groups")
      }
    assert(run(e.repartition(13)) == got, "partitioning changed the result")
  }

  test("clustered fixture: two-stage probe routing recall@10 is monotone, exact at full probe") {
    // nprobe < nlist with ntop forced exercises the TWO-STAGE query
    // path (rank √nlist tops → rank children only in matched cells);
    // nprobe = nlist falls back to the exhaustive identity path. The
    // clustered geometry turns routing mistakes into hard recall drops.
    val e = clustered
    val q = e.filter(col("vec_id") % 40 === 0) // one query per cluster
    val bf = SimilarityOps.topKCosine(q, e, "vec_id", "embedding", 16, 10)
      .select("query_id", "neighbor_id")
      .as[(Long, Long)].collect().toSet
    val recalls = Seq(2, 4, 8).map { np =>
      val r = SimilarityOps.ivfTopKCosine(q, e, "vec_id", "embedding", 16,
          10, nlist = 8, nprobe = np, ntop = 3)
        .select("query_id", "neighbor_id")
        .as[(Long, Long)].collect().toSet
      (bf intersect r).size.toDouble / bf.size
    }
    assert(recalls.sliding(2).forall(p => p(0) <= p(1) + 1e-12),
      s"two-stage recall not monotone in nprobe: $recalls")
    assert(recalls.head >= 0.5, s"recall@10 nprobe=2 too low: ${recalls.head}")
    assert(recalls.last == 1.0, s"full probe not exact: ${recalls.last}")
  }

  test("ChildArgTop: tie-break by id, independent of cell packing order") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val kidT = ArrayType(StructType(Seq(
      StructField("list_id", LongType), StructField("cent", ArrayType(DoubleType)),
      StructField("norm", DoubleType))))
    val schema = StructType(Seq(StructField("v", ArrayType(DoubleType)),
      StructField("kids", kidT)))
    // two children with IDENTICAL centroids (exact score tie) plus a
    // worse third; both packings must return the smaller id 3
    val c = Seq(1.0, 0.0)
    val kids = Seq(Row(7L, c, 1.0), Row(3L, c, 1.0),
      Row(9L, Seq(0.0, 1.0), 1.0))
    for (perm <- kids.permutations) {
      val df = spark.createDataFrame(
        java.util.Arrays.asList(Row(Seq(1.0, 0.0), perm)), schema)
      val out = df.select(graft.functions.CentroidSelect.childArg(
        col("v"), col("kids"), graft.functions.CentroidSelect.Cos,
        asc = false).as("best")).head.getLong(0)
      assert(out == 3L, s"packing $perm picked $out")
    }
  }

  test("PQ-ADC is deterministic across partitionings") {
    val e = embeddings
    val q = e.filter(col("vec_id") < 5)
    val a = SimilarityOps.pqTopKCosine(q, e, "vec_id", "embedding", 64, 5)
      .orderBy("query_id", "rank")
      .select("query_id", "neighbor_id", "adc")
      .as[(Long, Long, Double)].collect().toSeq
    val b = SimilarityOps.pqTopKCosine(
        q.repartition(5), e.repartition(7), "vec_id", "embedding", 64, 5)
      .orderBy("query_id", "rank")
      .select("query_id", "neighbor_id", "adc")
      .as[(Long, Long, Double)].collect().toSeq
    assert(a.nonEmpty && a == b)
  }
}
