package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._
import graft.core.Schema
import graft.core.Schema.VarKind
import Learners.{Learner, Model}

/** Problem-type dispatch (reference Orange/modelling/base.py:8-127
  * `Fitter` + the per-algorithm fitters in Orange/modelling/
  * {constant,knn,linear,tree}.py): one learner object usable on ANY
  * table — `fit` infers whether the target variable is discrete or
  * continuous and delegates to the matching member learner, mirroring
  * Orange's `__fits__ = {classification: …, regression: …}` dict.
  *
  * Kind inference follows `Domain.has_discrete_class` /
  * `has_continuous_class`: the Schema metadata VarKind when the table
  * carries an Orange domain (tab/basket/xlsx-loaded), else the Spark
  * DataType (string/boolean → discrete target, numeric/timestamp →
  * continuous). Dispatch is a driver-side schema decision — zero data
  * movement; the delegated learners keep their own distributed shapes.
  */
final case class Fitter(name: String,
                        classification: String => Learner,
                        regression: String => Learner) {
  import Fitter._

  /** The inferred problem type for `target` in `df`. */
  def problemOf(df: DataFrame, target: String): Problem = {
    val field = df.schema(target)
    val kind = Schema.domainOf(df)(target).kind
    (kind, field.dataType) match {
      case (VarKind.Continuous, _) | (VarKind.Time, _) => Regression
      case (_, BooleanType)                            => Classification
      case _                                           => Classification
    }
  }

  /** The member learner that handles `df`'s target — Orange's
    * `get_learner`. */
  def learnerFor(df: DataFrame, target: String): Learner =
    problemOf(df, target) match {
      case Classification => classification(target)
      case Regression     => regression(target)
    }

  def fit(train: DataFrame, target: String): Model =
    learnerFor(train, target).fit(train)
}

object Fitter {
  sealed trait Problem { def name: String }
  case object Classification extends Problem { val name = "classification" }
  case object Regression extends Problem { val name = "regression" }

  /** ConstantLearner (modelling/constant.py): Majority / MeanRegressor. */
  val Constant: Fitter =
    Fitter("constant", Learners.Majority(_), Learners.MeanRegressor(_))

  /** KNNLearner (modelling/knn.py): kNN vote / kNN mean. */
  def knn(idCol: String, features: Seq[String], k: Int = 5): Fitter =
    Fitter("knn",
      t => KNN.KNNClassifier(idCol, features, t, k),
      t => KNN.KNNRegressor(idCol, features, t, k))

  /** SGDLearner (modelling/linear.py SGD family): hinge-loss linear SVC
    * for discrete targets (labels must be ±1-encodable by the caller's
    * target expression), squared-loss linear regression otherwise. Both
    * ride the deterministic full-batch GD machinery. */
  def sgdLinear(features: Seq[(String, org.apache.spark.sql.Column)],
                iterations: Int = 20, lr: Double = 0.5): Fitter =
    Fitter("sgd",
      t => (train: DataFrame) => {
        val fitted = SGD.linearGD(train, features,
          org.apache.spark.sql.functions.col(t), iterations, lr,
          SGD.HingeLoss)
        (df: DataFrame) => df.crossJoin(
          org.apache.spark.sql.functions.broadcast(fitted))
      },
      t => (train: DataFrame) => {
        val fitted = SGD.linearGD(train, features,
          org.apache.spark.sql.functions.col(t), iterations, lr,
          SGD.SquaredLoss)
        (df: DataFrame) => df.crossJoin(
          org.apache.spark.sql.functions.broadcast(fitted))
      })
}
