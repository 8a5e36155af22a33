package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
  *
  * Every random draw is HASH-DRIVEN (md5-derived `PortableHash.hash32`
  * keyed by tree index + node path, the same portable-hash device the
  * other RNG-bound ops use) instead of a sequential `java.util.Random`
  * stream. That makes the induction a pure function of (sample, tag) and
  * therefore replayable level-by-level in the DuckDB oracle: the
  * `outliers_isolation_forest` oracle SQL rebuilds the identical forest
  * with md5 expressions and walks it in unrolled per-depth CTE rounds.
  */
object IsolationForest {
  import graft.core.PortableHash.hash32

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

    /** Walk directly over catalyst array storage — the expression path's
      * per-row entry (no Seq boxing, no copy; identical arithmetic). */
    def scoreArray(x: org.apache.spark.sql.catalyst.util.ArrayData): Double = {
      var sum = 0.0
      var t = 0
      while (t < nTrees) {
        val o = offs(t)
        var i = o
        var depth = 0.0
        while (left(i) >= 0) {
          i = o + (if (x.getDouble(att(i)) < split(i)) left(i) else right(i))
          depth += 1.0
        }
        sum += depth + leafC(i)
        t += 1
      }
      math.pow(2.0, -(sum / nTrees) / cPsi)
    }
  }

  /** Native scoring expression: one static-shaped call per row into the
    * broadcast-by-reference [[CompiledModel]] — replaces the Scala UDF,
    * whose per-row Seq[Double] conversion cost ~2× the tree walk itself.
    * Stays inside whole-stage codegen. */
  final case class ScoreExpr(
      child: org.apache.spark.sql.catalyst.expressions.Expression,
      model: CompiledModel)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
    import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
    override def dataType = org.apache.spark.sql.types.DoubleType
    override def prettyName: String = "graft_iforest_score"
    override protected def nullSafeEval(a: Any): Any =
      model.scoreArray(
        a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])
    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, x => {
        val m = ctx.addReferenceObj("ifModel", model,
          classOf[CompiledModel].getName)
        s"${ev.value} = $m.scoreArray($x);"
      })
    override protected def withNewChildInternal(
        newChild: org.apache.spark.sql.catalyst.expressions.Expression) =
      copy(child = newChild)
  }

  /** Fit on a pre-collected sample (deterministic order expected from the
    * caller). Hash-driven induction, a pure function of (sample, tag):
    *  - tree t's ψ-subsample draws row `hash32("<tag>_sub_<t>_<i>") % n`;
    *  - the split feature at node `path` (the "0"/"1" left-right string
    *    from the root) is `candidates[hash32("<tag>_att_<t>_<path>") % k]`
    *    over the spread features in index order;
    *  - the split point is `lo + u·(hi−lo)` with
    *    `u = hash32("<tag>_split_<t>_<path>") / 2^32`.
    * Leaves: singleton, depth ≥ ⌈log2 ψ⌉, all-constant rows, or an empty
    * left child (split ≤ lo, possible when u ≈ 0; an empty right child
    * cannot occur since split < hi by construction). */
  def fit(sample: Array[Array[Double]], nTrees: Int = 100,
          sampleSize: Int = 256, tag: String = "ifs"): Model = {
    val nAtts = sample.head.length
    val n = sample.length
    val trees = (0 until nTrees).toArray.map { t =>
      val psi = math.min(sampleSize, n)
      val sub = (0 until psi).toArray.map { i =>
        sample((hash32(s"${tag}_sub_${t}_$i") % n).toInt)
      }
      val maxDepth = math.ceil(math.log(psi.toDouble) / math.log(2.0)).toInt
      val nodes = scala.collection.mutable.ArrayBuffer.empty[Node]
      def build(rows: Array[Array[Double]], path: String, depth: Int): Int = {
        val idx = nodes.length
        nodes += Node(-1, 0.0, -1, -1, rows.length) // placeholder
        val candidates = (0 until nAtts).filter { a =>
          rows.exists(_(a) != rows.head(a)) }
        if (rows.length <= 1 || depth >= maxDepth || candidates.isEmpty)
          return idx
        val att = candidates(
          (hash32(s"${tag}_att_${t}_$path") % candidates.length).toInt)
        val lo = rows.map(_(att)).min; val hi = rows.map(_(att)).max
        val u = hash32(s"${tag}_split_${t}_$path").toDouble / 4294967296.0
        val split = lo + u * (hi - lo)
        val (l, r) = rows.partition(_(att) < split)
        if (l.isEmpty || r.isEmpty) return idx
        val li = build(l, path + "0", depth + 1)
        val ri = build(r, path + "1", depth + 1)
        nodes(idx) = Node(att, split, li, ri, rows.length)
        idx
      }
      build(sub, "", 0)
      nodes.toArray
    }
    Model(trees, sampleSize)
  }

  /** Fit on a deterministic sample of `df`, then score every row
    * distributed; adds `out` = anomaly score. `keys` must uniquely
    * identify rows — the fit sample is the first `fitRows` rows ordered
    * by (seeded key hash, keys), a total order both engines reproduce. */
  def scoreColumn(df: DataFrame, features: Seq[String], keys: Seq[String],
                  out: String, nTrees: Int = 100, fitRows: Int = 512,
                  tag: String = "ifs"): DataFrame = {
    // deterministic pseudo-random sample: order by a seeded hash of the
    // key tuple, not the keys themselves (which could correlate with
    // features); key columns break the (unlikely) 32-bit hash ties
    val keyConcat = concat(
      lit(tag + "_") +: keys.zipWithIndex.flatMap { case (k, i) =>
        (if (i == 0) Nil else Seq(lit("_"))) :+ col(k).cast("string")
      }: _*)
    // keys need not be unique in the input (synthetic lineitem repeats
    // (orderkey, linenumber)) — extend the sort to the feature values so
    // the 512-row cut is a total order on everything that matters
    val sample = df
      .select(graft.core.Tables.hashVal32(keyConcat).as("__h") +:
        (keys.map(col) ++ features.map(f => col(f).cast("double"))): _*)
      .orderBy(col("__h") +: (keys ++ features).map(col): _*).limit(fitRows)
      .drop("__h").drop(keys: _*)
      .collect().map(r => features.indices.map(r.getDouble).toArray)
    val model = fit(sample, nTrees, 256, tag).compiled
    import org.apache.spark.sql.graftbridge.SqlBridge
    df.withColumn(out, SqlBridge.column(ScoreExpr(
      SqlBridge.expression(
        array(features.map(f => col(f).cast("double")): _*)),
      model)))
  }
}
