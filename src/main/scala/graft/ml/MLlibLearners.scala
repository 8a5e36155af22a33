package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.feature.{PCA, StandardScaler}
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.linalg.Vector

/** MLlib adapters for the reference's learner inventory (SURVEY §2.11):
  * distributed training equivalents of Orange's sklearn-backed learners.
  * Embedding columns (Array[Float]) are converted with array_to_vector —
  * a zero-copy expression, no UDF.
  *
  * Seeds are fixed for reproducibility; results are still iterative-
  * algorithm outputs, so their driver checks are rows-only (no SQL
  * oracle), as allowed by the contract. */
object MLlibLearners {

  private def withFeatures(df: DataFrame, arrayCol: String): DataFrame =
    df.withColumn("features",
      array_to_vector(col(arrayCol).cast("array<double>")))

  /** Multinomial logistic regression on an embedding column; returns
    * per-class prediction counts + training accuracy. */
  def logisticOnEmbeddings(df: DataFrame, arrayCol: String,
                           labelCol: String): DataFrame = {
    val data = withFeatures(df, arrayCol)
      .withColumn("label", col(labelCol).cast("double"))
    val model = new LogisticRegression()
      .setMaxIter(50).setRegParam(0.01).setTol(1e-6)
      .fit(data)
    model.transform(data)
      .groupBy(col("label"), col("prediction"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("label"), col("prediction"))
  }

  /** Seeded KMeans over embeddings → cluster sizes + WSSD. */
  def kmeansOnEmbeddings(df: DataFrame, arrayCol: String, k: Int,
                         seed: Long = 42L): DataFrame = {
    val data = withFeatures(df, arrayCol)
    val model = new KMeans().setK(k).setSeed(seed).setMaxIter(20).fit(data)
    model.transform(data)
      .groupBy(col("prediction").as("cluster"))
      .agg(count(lit(1)).as("size"))
      .orderBy(col("cluster"))
  }

  /** PCA: top-k explained variance (projection family, SURVEY §2.11). */
  def pcaExplainedVariance(df: DataFrame, arrayCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val data = withFeatures(df, arrayCol)
    val model = new PCA().setK(k).setInputCol("features")
      .setOutputCol("pca").fit(data)
    model.explainedVariance.toArray.toSeq.zipWithIndex
      .map { case (v, i) => (i, v) }
      .toDF("component", "explained_variance")
  }
}
