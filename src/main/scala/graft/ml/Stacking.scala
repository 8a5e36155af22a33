package graft.ml

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}

/** Stacked ensemble (reference Orange/ensembles/stack.py:40
  * StackedLearner): out-of-fold predictions of the base learners become
  * the features of a meta learner, so the aggregator is fit on
  * predictions the bases never trained on — stack.py does exactly this
  * via CrossValidation before fitting the aggregate model.
  *
  * Base learners are Majority and discrete NaiveBayes; the meta learner
  * is the deterministic full-batch logistic GD from [[SGD]].
  *
  * Distributed shape — the same (total − fold) count algebra the SQL
  * twin uses: ONE map-side-combined scan builds the joint
  * (fold, feature-values, class) contingency (tiny — folds × bins ×
  * classes rows, collected to the driver); every fold's train-side
  * statistic is total − fold on those exact integer counts, so the k
  * per-fold NaiveBayes fits cost ZERO extra scans (the previous
  * fold-by-fold formulation re-scanned the corpus ~7 times per fold).
  * Predictions depend only on (fold, feature values), so they broadcast
  * back as a lookup table; the meta GD then runs on its own cached
  * projection. Scoring uses the identical formula/operation order as
  * the per-fold learner (log(nc/n) + Σ log((nvc+1)/(nc+nv)), argmax
  * with ties to the smallest class), so the stacked table — and the
  * oracle-checked meta fit — are bit-unchanged.
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
    val stacked = stackedTable(df, nbFeatures, target, foldKey, k)
    // meta features: base-prediction indicators for the positive class
    SGD.logRegGD(
      stacked,
      Seq(("nb", when(col("__nb") === posClass, 1.0).otherwise(0.0)),
          ("maj", when(col("__maj") === posClass, 1.0).otherwise(0.0))),
      when(col(target) === posClass, 1).otherwise(0),
      iterations, lr)
  }

  /** The out-of-fold stacked table (rows + __nb/__maj base predictions)
    * — the distributed assembly [[fitCA]] feeds the meta GD; exposed so
    * PlanSpec can pin its broadcast-join shape. */
  private[graft] def stackedTable(df: DataFrame, nbFeatures: Seq[String],
      target: String, foldKey: Column, k: Int): DataFrame = {
    val spark = df.sparkSession
    val nf = nbFeatures.size
    val withFold = df.withColumn("__fold", Learners.foldOf(foldKey, k))

    // one scan: joint (fold, v_1..v_nf, class) counts — everything the
    // k out-of-fold base fits need, in exact integers
    val cont = withFold.groupBy(
        col("__fold").cast("int") +:
          nbFeatures.map(f => col(f).cast("string")) :+
          col(target).cast("string"): _*)
      .agg(count(lit(1)).as("__n")).collect()
      .map { r =>
        (r.getInt(0), (1 to nf).map(r.getString).toVector,
          r.getString(nf + 1), r.getLong(nf + 2))
      }

    val totalCls = cont.groupBy(_._3).view.mapValues(_.map(_._4).sum).toMap
    // per (feature index, value, class) and per (feature index, value)
    val totVC = cont.groupBy(c => (c._2, c._3)).view
      .mapValues(_.map(_._4).sum).toMap
    def byFold[A](sel: ((Int, Vector[String], String, Long)) => A)
        : Map[Int, Map[A, Long]] =
      cont.groupBy(_._1).view.mapValues(_.groupBy(sel).view
        .mapValues(_.map(_._4).sum).toMap).toMap
    val foldCls = byFold(_._3)
    // marginal per-feature-value counts, total and per fold
    val totFV: Map[(Int, String), Long] = cont
      .flatMap(c => (0 until nf).map(i => ((i, c._2(i)), c._4)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val foldFV: Map[Int, Map[(Int, String), Long]] = cont.groupBy(_._1)
      .view.mapValues(_.flatMap(c =>
        (0 until nf).map(i => ((i, c._2(i)), c._4)))
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap).toMap
    val totFVC: Map[(Int, String, String), Long] = cont
      .flatMap(c => (0 until nf).map(i => ((i, c._2(i), c._3), c._4)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val foldFVC: Map[Int, Map[(Int, String, String), Long]] =
      cont.groupBy(_._1).view.mapValues(_.flatMap(c =>
        (0 until nf).map(i => ((i, c._2(i), c._3), c._4)))
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap).toMap

    // per (fold, feature-value combo): the out-of-fold NB + Majority
    // predictions, exactly as the fold-trained learners would emit them
    val lookupRows = cont.map(c => (c._1, c._2)).distinct.map {
      case (f, vals) =>
        def tr[A](tot: Map[A, Long], fm: Map[Int, Map[A, Long]], key: A) =
          tot.getOrElse(key, 0L) - fm.getOrElse(f, Map.empty)
            .getOrElse(key, 0L)
        val clsCounts = totalCls.keys.toSeq.sorted
          .map(c => c -> tr(totalCls, foldCls, c)).filter(_._2 > 0)
        val n = clsCounts.map(_._2).sum.toDouble
        val nvs = (0 until nf).map { i =>
          totFV.keys.count { case (fi, v) =>
            fi == i && tr(totFV, foldFV, (fi, v)) > 0 }.toDouble
        }
        // score in the same operation order as Learners.NaiveBayes
        val scores = clsCounts.map { case (c, nc) =>
          var s = math.log(nc.toDouble / n)
          for (i <- 0 until nf) {
            val nvc = tr(totFVC, foldFVC, (i, vals(i), c))
            s += math.log((nvc.toDouble + 1.0) / (nc.toDouble + nvs(i)))
          }
          c -> s
        }
        val best = scores.map(_._2).max
        val nb = scores.collectFirst { case (c, s) if s == best => c }.get
        val maj = clsCounts.minBy { case (c, nc) => (-nc, c) }._1
        Row.fromSeq(f +: vals :+ nb :+ maj)
    }
    val lookupSchema = StructType(
      StructField("__fold", IntegerType, nullable = false) +:
        nbFeatures.indices.map(i =>
          StructField(s"__lv_$i", StringType, nullable = true)) ++:
        Seq(StructField("__nb", StringType, nullable = false),
          StructField("__maj", StringType, nullable = false)))
    val lookup = spark.createDataFrame(
      java.util.Arrays.asList(lookupRows: _*), lookupSchema)
    val joinCond = nbFeatures.zipWithIndex
      .map { case (fc, i) => withFold(fc).cast("string") === col(s"__lv_$i") }
      .foldLeft(withFold("__fold") === lookup("__fold"))(_ && _)
    withFold.join(broadcast(lookup), joinCond)
  }
}
