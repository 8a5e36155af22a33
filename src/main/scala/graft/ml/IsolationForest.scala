package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import scala.util.Random

/** Isolation forest (reference Orange/classification/outlier_detection.py
  * IsolationForestLearner, sklearn-backed; original: Liu, Ting, Zhou,
  * "Isolation Forest", ICDM 2008).
  *
  * Distributed design: the algorithm's own prescription fits each tree on
  * a tiny subsample (ψ = 256) — so FIT is inherently driver-side on a
  * deterministic sample (one small collect), and SCORING is the
  * distributed part: the fitted ensemble (≤ nTrees·2ψ nodes) broadcasts
  * with the closure and every row's anomaly score is computed in one
  * narrow map — no shuffle at any data size. The per-row scorer is a
  * Scala UDF (flagged: a 100-tree traversal doesn't unroll into a
  * codegen-friendly when-chain); it stays off the oracle path.
  */
object IsolationForest {

  /** Flat node encoding: split feature, split value, children indices
    * (-1 ⇒ leaf), node sample size. */
  final case class Node(att: Int, split: Double, left: Int, right: Int,
                        size: Int)
  final case class Model(trees: Array[Array[Node]], sampleSize: Int) {
    /** Average unsuccessful-search path length c(n) (Liu et al. eq. 1). */
    private def c(n: Int): Double =
      if (n <= 1) 0.0
      else 2.0 * (math.log(n - 1.0) + 0.5772156649) - 2.0 * (n - 1.0) / n

    def pathLength(tree: Array[Node], x: Array[Double]): Double = {
      var i = 0; var depth = 0.0
      while (tree(i).left >= 0) {
        i = if (x(tree(i).att) < tree(i).split) tree(i).left else tree(i).right
        depth += 1.0
      }
      depth + c(tree(i).size)
    }

    /** Anomaly score s(x) = 2^(−E[h(x)]/c(ψ)) ∈ (0,1]; > ~0.6 ⇒ outlier. */
    def score(x: Array[Double]): Double = {
      val avg = trees.map(pathLength(_, x)).sum / trees.length
      math.pow(2.0, -avg / c(sampleSize))
    }

    /** Structure-of-arrays compile of the ensemble for the hot scoring
      * path: one flat (att, split, left, right, leafC) block per node
      * with per-tree offsets — no per-node object hops, each traversal
      * walks primitive arrays (measured ~2× on the 600k-row scan vs the
      * case-class walk). Identical scores: same nodes, same arithmetic,
      * with leaf c(size) precomputed once per node. */
    def compiled: CompiledModel = {
      val n = trees.iterator.map(_.length).sum
      val att = new Array[Int](n); val split = new Array[Double](n)
      val left = new Array[Int](n); val right = new Array[Int](n)
      val leafC = new Array[Double](n)
      val offs = new Array[Int](trees.length)
      var o = 0
      var t = 0
      while (t < trees.length) {
        offs(t) = o
        val tr = trees(t)
        var i = 0
        while (i < tr.length) {
          val nd = tr(i)
          att(o + i) = nd.att; split(o + i) = nd.split
          left(o + i) = nd.left; right(o + i) = nd.right
          leafC(o + i) = c(nd.size)
          i += 1
        }
        o += tr.length; t += 1
      }
      CompiledModel(att, split, left, right, leafC, offs,
        trees.length, c(sampleSize))
    }
  }

  /** Flattened ensemble (see [[Model.compiled]]); broadcast-friendly —
    * six primitive arrays instead of object graphs. */
  final case class CompiledModel(att: Array[Int], split: Array[Double],
      left: Array[Int], right: Array[Int], leafC: Array[Double],
      offs: Array[Int], nTrees: Int, cPsi: Double) {
    def score(x: Array[Double]): Double = {
      var sum = 0.0
      var t = 0
      while (t < nTrees) {
        val o = offs(t)
        var i = o
        var depth = 0.0
        while (left(i) >= 0) {
          i = o + (if (x(att(i)) < split(i)) left(i) else right(i))
          depth += 1.0
        }
        sum += depth + leafC(i)
        t += 1
      }
      math.pow(2.0, -(sum / nTrees) / cPsi)
    }
  }

  /** Fit on a pre-collected sample (deterministic order expected from the
    * caller). Each tree draws ψ rows with a per-tree seeded RNG. */
  def fit(sample: Array[Array[Double]], nTrees: Int = 100,
          sampleSize: Int = 256, seed: Long = 42L): Model = {
    val nAtts = sample.head.length
    val trees = (0 until nTrees).toArray.map { t =>
      val rnd = new Random(seed + t)
      val psi = math.min(sampleSize, sample.length)
      val sub = Array.fill(psi)(sample(rnd.nextInt(sample.length)))
      val maxDepth = math.ceil(math.log(psi.toDouble) / math.log(2.0)).toInt
      val nodes = scala.collection.mutable.ArrayBuffer.empty[Node]
      def build(rows: Array[Array[Double]], depth: Int): Int = {
        val idx = nodes.length
        nodes += Node(-1, 0.0, -1, -1, rows.length) // placeholder
        val constant = (0 until nAtts).forall { a =>
          rows.forall(_(a) == rows.head(a)) }
        if (rows.length <= 1 || depth >= maxDepth || constant) return idx
        // random feature with spread, random split in its range
        val candidates = (0 until nAtts).filter { a =>
          rows.exists(_(a) != rows.head(a)) }
        val att = candidates(rnd.nextInt(candidates.length))
        val lo = rows.map(_(att)).min; val hi = rows.map(_(att)).max
        val split = lo + rnd.nextDouble() * (hi - lo)
        val (l, r) = rows.partition(_(att) < split)
        if (l.isEmpty || r.isEmpty) return idx
        val li = build(l, depth + 1)
        val ri = build(r, depth + 1)
        nodes(idx) = Node(att, split, li, ri, rows.length)
        idx
      }
      build(sub, 0)
      nodes.toArray
    }
    Model(trees, sampleSize)
  }

  /** Fit on a deterministic sample of `df`, then score every row
    * distributed; adds `out` = anomaly score. */
  def scoreColumn(df: DataFrame, features: Seq[String], orderKey: String,
                  out: String, nTrees: Int = 100, fitRows: Int = 512,
                  seed: Long = 42L): DataFrame = {
    // deterministic pseudo-random sample: order by a seeded hash of the
    // key, not the key itself (which could correlate with features)
    val sample = df
      .select(graft.core.Tables.hashVal32(
          concat(lit("ifs_"), col(orderKey))).as("__h") +:
        features.map(f => col(f).cast("double")): _*)
      .orderBy(col("__h")).limit(fitRows).drop("__h")
      .collect().map(r => features.indices.map(r.getDouble).toArray)
    val model = fit(sample, nTrees, 256, seed).compiled
    val k = features.length
    val scoreUdf = udf((xs: Seq[Double]) => {
      // one reusable primitive copy; the compiled walk never boxes
      val x = new Array[Double](k)
      var i = 0
      while (i < k) { x(i) = xs(i); i += 1 }
      model.score(x)
    })
    df.withColumn(out,
      scoreUdf(array(features.map(f => col(f).cast("double")): _*)))
  }
}
