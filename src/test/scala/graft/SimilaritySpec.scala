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
}
