package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Stacked ensemble (reference Orange/ensembles/stack.py:40
  * StackedLearner): out-of-fold predictions of the base learners become
  * the features of a meta learner, so the aggregator is fit on
  * predictions the bases never trained on — stack.py does exactly this
  * via CrossValidation before fitting the aggregate model.
  *
  * Base learners here are the aggregation-based ones (Majority,
  * NaiveBayes — both distributed, deterministic); the meta learner is
  * the deterministic full-batch logistic GD from [[SGD]]. Folds come
  * from the same hash-mod device as Learners.foldOf, so the whole fit is
  * k·(a few aggregations) + the GD iterations — every stage is a
  * map-side-combined scan, nothing driver-bound grows with the data.
  *
  * The fit is deterministic end-to-end but its SQL twin would require
  * NB-within-fold unrolled per fold crossed with the GD CTE chain —
  * registered rows-only, pinned by StackingSpec.
  */
object Stacking {

  /** Fit the stack; returns one row: meta weights over the base
    * predictions (w_nb, w_maj), intercept, and the out-of-fold stacked
    * accuracy (the logistic GD's training metric on the stacked table).
    * @param nbFeatures discrete feature columns for the NaiveBayes base
    * @param target     discrete target column name
    * @param posClass   class mapped to y=1 for the meta logistic
    * @param foldKey    integer column hashed into k folds */
  def fitCA(df: DataFrame, nbFeatures: Seq[String], target: String,
            posClass: String, foldKey: Column, k: Int,
            iterations: Int = 8, lr: Double = 4.0): DataFrame = {
    val withFold = df.withColumn("__fold", Learners.foldOf(foldKey, k))
    // out-of-fold base predictions, fold by fold (k is small and fixed;
    // each fold fit is a couple of broadcast-sized aggregations)
    val stacked = (0 until k).map { f =>
      val train = withFold.filter(col("__fold") =!= f)
      val test = withFold.filter(col("__fold") === f)
      val nb = Learners.NaiveBayes(nbFeatures, target).fit(train)
      val maj = Learners.Majority(target).fit(train)
      val withNb = nb.predict(test).withColumnRenamed("prediction", "__nb")
      maj.predict(withNb).withColumnRenamed("prediction", "__maj")
    }.reduce(_.unionByName(_))
    // meta features: base-prediction indicators for the positive class
    SGD.logRegGD(
      stacked,
      Seq(("nb", when(col("__nb") === posClass, 1.0).otherwise(0.0)),
          ("maj", when(col("__maj") === posClass, 1.0).otherwise(0.0))),
      when(col(target) === posClass, 1).otherwise(0),
      iterations, lr)
  }
}
