package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** k-nearest-neighbor classification and regression (reference
  * Orange/classification/knn.py and Orange/regression/knn.py — sklearn
  * KNeighborsClassifier/Regressor with uniform weights, euclidean
  * metric).
  *
  * Scale shapes:
  *  - exact path: test × train candidate join with the TEST side
  *    broadcast (prediction workloads score a small batch against a big
  *    reference corpus; the corpus never shuffles), then one window per
  *    test row ranked by (distance, train id) — fully deterministic,
  *    oracle-verifiable.
  *  - LSH path (embeddings): candidates restricted to the query's
  *    random-hyperplane bucket (SimilarityOps.lshTopKCosine) — an
  *    equi-join on bucket id, no all-pairs scan; vote/mean on top. The
  *    standard approximate trade: cross-bucket neighbors are missed.
  *
  * Determinism: squared distance is a fixed left-assoc chain over the
  * feature list (identical IEEE result in both engines); ties at the
  * k-boundary break by train id; vote ties break by smallest label.
  */
object KNN {

  private def dist2(fs: Seq[String]): Column =
    fs.map(f => (col(s"__t_$f") - col(s"__r_$f")) * (col(s"__t_$f") - col(s"__r_$f")))
      .reduce(_ + _)

  /** (test id, train id) candidate table: the k nearest train rows per
    * test row. `test` is broadcast — keep it the small side. The top-k
    * cut runs through the bounded TopKPairs aggregate (map-side k-entry
    * heaps per test id), NOT a row_number window: the window form
    * shuffled and sorted the whole |test|·|train| candidate table, which
    * is the quadratic term the sf1 rehearsal exposed (ml_knn_class 50 s
    * at the 10× replica; the aggregate form ships ≤ k·partitions rows
    * per test id). Selection is identical — k smallest by (d2, rid)
    * lexicographic, boundary ties by train id. */
  private def neighbors(test: DataFrame, train: DataFrame, id: String,
                        features: Seq[String], k: Int): DataFrame = {
    // TopKPairs carries the train id as a long through the aggregate; a
    // non-integral id column (e.g. string keys) would cast to null and
    // silently drop every neighbor where the old row_number window kept
    // any id type — fail loudly instead
    val idType = train.schema(id).dataType
    require(Seq("byte", "short", "integer", "long").contains(idType.typeName),
      s"kNN requires an integral id column; '$id' is ${idType.typeName}")
    val t = test.select(col(id).as("__tid") +:
      features.map(f => col(f).cast("double").as(s"__t_$f")): _*)
    val r = train.select(col(id).as("__rid") +:
      features.map(f => col(f).cast("double").as(s"__r_$f")): _*)
    broadcast(t).join(r, col("__tid") =!= col("__rid"))
      .withColumn("__d2", dist2(features))
      .groupBy(col("__tid"))
      .agg(graft.functions.TopKAgg.topKPairs(
        col("__d2"), col("__rid").cast("long"), k).as("__nn"))
      .select(col("__tid"), explode(col("__nn")).as("__e"))
      .select(col("__tid"), col("__e.id").as("__rid"))
  }

  /** kNN classification: majority vote of the k nearest train rows,
    * ties → smallest label. Returns (id, prediction) per test row. */
  def classify(test: DataFrame, train: DataFrame, id: String,
               features: Seq[String], target: String, k: Int): DataFrame = {
    val nn = neighbors(test, train, id, features, k)
    val nnWithCls = nn.join(
      train.select(col(id).as("__rid"), col(target).as("__cls")), "__rid")
    val vw = Window.partitionBy(col("__tid"))
      .orderBy(col("__n").desc, col("__cls").asc)
    nnWithCls.groupBy(col("__tid"), col("__cls"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__vr", row_number().over(vw))
      .filter(col("__vr") === 1)
      .select(col("__tid").as(id), col("__cls").as("prediction"))
  }

  /** kNN regression: mean target of the k nearest train rows (uniform
    * weights), summed through the deterministic decimal path. */
  def regress(test: DataFrame, train: DataFrame, id: String,
              features: Seq[String], target: String, k: Int): DataFrame = {
    val nn = neighbors(test, train, id, features, k)
    val nnWithY = nn.join(
      train.select(col(id).as("__rid"), col(target).cast("double").as("__y")),
      "__rid")
    nnWithY.groupBy(col("__tid"))
      .agg((sum(col("__y").cast(DecimalType(38, 6))).cast(DoubleType) /
        count(lit(1))).as("prediction"))
      .select(col("__tid").as(id), col("prediction"))
  }

  /** Learner-facade wrappers (Orange base.py Learner/Model contract). */
  final case class KNNClassifier(idCol: String, features: Seq[String],
                                 target: String, k: Int)
      extends Learners.Learner {
    def fit(train: DataFrame): Learners.Model = new Learners.Model {
      def predict(df: DataFrame): DataFrame =
        df.join(classify(df, train, idCol, features, target, k), idCol)
    }
  }
  final case class KNNRegressor(idCol: String, features: Seq[String],
                                target: String, k: Int)
      extends Learners.Learner {
    def fit(train: DataFrame): Learners.Model = new Learners.Model {
      def predict(df: DataFrame): DataFrame =
        df.join(regress(df, train, idCol, features, target, k), idCol)
    }
  }

  /** LSH-bucketed kNN classification over an embedding column — the
    * 100 TB path: candidates come from the query's hyperplane bucket
    * (equi-join, no all-pairs), exact cosine + vote within the bucket.
    * Approximate (cross-bucket neighbors missed); spec-pinned
    * differentially against the exact vote on bucket-mates. */
  def classifyEmbeddingsLSH(test: DataFrame, train: DataFrame, id: String,
                            vec: String, dim: Int, target: String, k: Int,
                            nPlanes: Int): DataFrame = {
    val nn = graft.similarity.SimilarityOps.lshTopKCosine(
      test, train, id, vec, dim, k, nPlanes)
    val vw = Window.partitionBy(col("query_id"))
      .orderBy(col("__n").desc, col("__cls").asc)
    nn.join(train.select(col(id).as("neighbor_id"),
        col(target).as("__cls")), "neighbor_id")
      .groupBy(col("query_id"), col("__cls"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__vr", row_number().over(vw))
      .filter(col("__vr") === 1)
      .select(col("query_id").as(id), col("__cls").as("prediction"))
  }
}
