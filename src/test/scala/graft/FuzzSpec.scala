package graft

import org.apache.spark.sql.functions._
import graft.operators.FilterOps
import graft.operators.FilterOps._
import graft.preprocess.PreprocessOps

/** Property-based differential fuzzing (r8/r9 verdict ask): seeded random
  * `Values` filter trees and impute→discretize→continuize chains are
  * evaluated by the engine (Catalyst predicates / DataFrame transforms)
  * AND by an INDEPENDENT driver-side interpreter written directly against
  * the SQL three-valued-logic and IEEE semantics the operators promise —
  * then compared case-by-case. Mirrors the coverage intent of
  * reference/Orange/tests/test_filter.py and test_transformation.py
  * (exhaustive enumerated cases there; seeded random structure here).
  *
  * The seed is FIXED: every run fuzzes the same ~200 cases, so a failure
  * is reproducible by case index. The interpreter is deliberately not a
  * call back into the operator code — it re-states the semantics (Kleene
  * AND/OR/NOT, null propagation, HALF_UP DECIMAL(38,6) sums, fixed IEEE
  * expression order) so a divergence means one side got the contract
  * wrong. */
class FuzzSpec extends SparkSpec {
  import spark.implicits._

  // --- fixture: nulls, ties, negatives, case variance ---------------------
  private case class FRow(id: Long, x: Option[Double], s: Option[String],
                          c: Option[String])
  private val vocab = Seq("Alpha", "beta", "GAMMA", "delta", "ALPHA", "be")
  private val cats = Seq("red", "green", "blue")
  private val fixture: Seq[FRow] = {
    val rnd = new scala.util.Random(20260814L)
    (0L until 300L).map { i =>
      FRow(i,
        if (rnd.nextInt(7) == 0) None
        else Some(math.rint((rnd.nextGaussian() * 5) * 4) / 4), // ties, negatives
        if (rnd.nextInt(9) == 0) None else Some(vocab(rnd.nextInt(vocab.size))),
        if (rnd.nextInt(11) == 0) None else Some(cats(rnd.nextInt(cats.size))))
    }
  }
  private lazy val df = fixture
    .map(r => (r.id, r.x.map(Double.box).orNull, r.s.orNull, r.c.orNull))
    .toDF("id", "x", "s", "c")
    .select(col("id"), col("x").cast("double"), col("s"), col("c"))
    .cache()

  // --- independent Kleene-logic interpreter -------------------------------
  private type TV = Option[Boolean] // None = SQL NULL
  private def not(v: TV): TV = v.map(!_)
  private def and(a: TV, b: TV): TV = (a, b) match {
    case (Some(false), _) | (_, Some(false)) => Some(false)
    case (Some(true), Some(true)) => Some(true)
    case _ => None
  }
  private def or(a: TV, b: TV): TV = (a, b) match {
    case (Some(true), _) | (_, Some(true)) => Some(true)
    case (Some(false), Some(false)) => Some(false)
    case _ => None
  }
  private def cmpD(v: Option[Double], f: Double => Boolean): TV = v.map(f)
  private def cmpS(v: Option[String], f: String => Boolean): TV = v.map(f)

  private def evalFilter(f: OFilter, r: FRow): TV = f match {
    case IsDefined(cs) => cs.map {
      case "x" => Some(r.x.isDefined): TV
      case "s" => Some(r.s.isDefined): TV
      case "c" => Some(r.c.isDefined): TV
    }.reduce(and)
    case SameValue("c", v, nullSafe) =>
      if (nullSafe) Some(r.c.contains(v.asInstanceOf[String]))
      else r.c.map(_ == v.asInstanceOf[String])
    case SameValue("x", v, nullSafe) =>
      if (nullSafe) Some(r.x.contains(v.asInstanceOf[Double]))
      else r.x.map(_ == v.asInstanceOf[Double])
    case FilterDiscrete("c", vs) => r.c.map(cv => vs.contains(cv))
    case FilterContinuous("x", op, ref, mx) => op match {
      case ContOp.Equal        => cmpD(r.x, _ == ref)
      case ContOp.NotEqual     => cmpD(r.x, _ != ref)
      case ContOp.Less         => cmpD(r.x, _ < ref)
      case ContOp.LessEqual    => cmpD(r.x, _ <= ref)
      case ContOp.Greater      => cmpD(r.x, _ > ref)
      case ContOp.GreaterEqual => cmpD(r.x, _ >= ref)
      case ContOp.Between      => cmpD(r.x, v => v >= ref && v <= mx)
      case ContOp.Outside      => not(cmpD(r.x, v => v >= ref && v <= mx))
      case ContOp.IsDefined    => Some(r.x.isDefined)
    }
    case FilterString("s", op, ref, mx, cs) =>
      val sv = if (cs) r.s else r.s.map(_.toLowerCase)
      val rv = if (cs) ref else ref.toLowerCase
      val mv = if (cs) mx else mx.toLowerCase
      op match {
        case StrOp.Equal         => cmpS(sv, _ == rv)
        case StrOp.NotEqual      => cmpS(sv, _ != rv)
        case StrOp.Less          => cmpS(sv, _ < rv)
        case StrOp.LessEqual     => cmpS(sv, _ <= rv)
        case StrOp.Greater       => cmpS(sv, _ > rv)
        case StrOp.GreaterEqual  => cmpS(sv, _ >= rv)
        case StrOp.Between       => cmpS(sv, v => v >= rv && v <= mv)
        case StrOp.Outside       => not(cmpS(sv, v => v >= rv && v <= mv))
        case StrOp.Contains      => cmpS(sv, _.contains(rv))
        case StrOp.NotContain    => not(cmpS(sv, _.contains(rv)))
        case StrOp.StartsWith    => cmpS(sv, _.startsWith(rv))
        case StrOp.NotStartsWith => not(cmpS(sv, _.startsWith(rv)))
        case StrOp.EndsWith      => cmpS(sv, _.endsWith(rv))
        case StrOp.NotEndsWith   => not(cmpS(sv, _.endsWith(rv)))
        case StrOp.IsDefined     => Some(r.s.isDefined)
        case StrOp.NotIsDefined  => Some(r.s.isEmpty)
      }
    case FilterStringList("s", vs, cs) =>
      if (cs) r.s.map(vs.contains)
      else r.s.map(v => vs.map(_.toLowerCase).contains(v.toLowerCase))
    case FilterRegex("s", p) =>
      r.s.map(v => p.r.findFirstIn(v).isDefined) // re.search semantics
    case Values(children, conj, neg) =>
      val comb = children.map(evalFilter(_, r))
        .reduce(if (conj) and else or)
      if (neg) not(comb) else comb
    case other => fail(s"interpreter hole: $other")
  }

  // --- seeded random tree generator ---------------------------------------
  private def genLeaf(rnd: scala.util.Random): OFilter = rnd.nextInt(8) match {
    case 0 => IsDefined(rnd.shuffle(Seq("x", "s", "c")).take(1 + rnd.nextInt(2)))
    case 1 =>
      if (rnd.nextBoolean()) SameValue("c", cats(rnd.nextInt(cats.size)), rnd.nextBoolean())
      else SameValue("x", math.rint(rnd.nextGaussian() * 20) / 4, rnd.nextBoolean())
    case 2 => FilterDiscrete("c", rnd.shuffle(cats).take(1 + rnd.nextInt(3)))
    case 3 =>
      val ops = Seq(ContOp.Equal, ContOp.NotEqual, ContOp.Less, ContOp.LessEqual,
        ContOp.Greater, ContOp.GreaterEqual, ContOp.Between, ContOp.Outside,
        ContOp.IsDefined)
      val a = math.rint(rnd.nextGaussian() * 20) / 4
      FilterContinuous("x", ops(rnd.nextInt(ops.size)), a, a + rnd.nextInt(5))
    case 4 =>
      val ops = Seq(StrOp.Equal, StrOp.NotEqual, StrOp.Less, StrOp.LessEqual,
        StrOp.Greater, StrOp.GreaterEqual, StrOp.Between, StrOp.Outside,
        StrOp.Contains, StrOp.NotContain, StrOp.StartsWith, StrOp.NotStartsWith,
        StrOp.EndsWith, StrOp.NotEndsWith, StrOp.IsDefined, StrOp.NotIsDefined)
      val refs = vocab ++ Seq("al", "A", "ta", "")
      FilterString("s", ops(rnd.nextInt(ops.size)),
        refs(rnd.nextInt(refs.size)), refs(rnd.nextInt(refs.size)),
        rnd.nextBoolean())
    case 5 => FilterStringList("s",
      rnd.shuffle(vocab).take(1 + rnd.nextInt(3)), rnd.nextBoolean())
    case 6 =>
      val pats = Seq("^Al", "a$", "[aeiou]{2}", "^..[mM]", "beta|delta", "A.*A")
      FilterRegex("s", pats(rnd.nextInt(pats.size)))
    case 7 => FilterContinuous("x", ContOp.IsDefined)
  }
  private def genTree(rnd: scala.util.Random, depth: Int): OFilter =
    if (depth <= 0 || rnd.nextInt(3) == 0) genLeaf(rnd)
    else Values(
      (1 to (1 + rnd.nextInt(3))).map(_ => genTree(rnd, depth - 1)),
      conjunction = rnd.nextBoolean(), negate = rnd.nextBoolean())

  test("120 random Values trees: engine filter equals the Kleene interpreter") {
    val rnd = new scala.util.Random(42424242L)
    val local = fixture
    (1 to 120).foreach { k =>
      val tree = genTree(rnd, 3)
      val got = FilterOps(df, tree).select("id").as[Long].collect().sorted.toSeq
      val want = local.filter(r => evalFilter(tree, r).contains(true))
        .map(_.id).sorted
      assert(got == want, s"case $k diverged: $tree")
    }
  }

  // --- transformation-chain fuzz ------------------------------------------
  // driver twins restate the documented arithmetic: DECIMAL(38,6) HALF_UP
  // per-term sums for means, the exact IEEE expression order of
  // equalWidth, the indicator/ordinal forms of continuize

  private def dec6(d: Double): java.math.BigDecimal =
    java.math.BigDecimal.valueOf(d).setScale(6, java.math.RoundingMode.HALF_UP)
  private def exactMeanLocal(vs: Seq[Double]): Double = {
    val s = vs.map(dec6).foldLeft(java.math.BigDecimal.ZERO)(_.add(_))
    s.doubleValue() / vs.length
  }
  private def equalWidthLocal(v: Double, mn: Double, mx: Double, k: Int): Int =
    math.min(math.floor((v - mn) / ((mx - mn) / k)), (k - 1).toDouble).toInt

  test("80 random impute→discretize→continuize chains match driver twins") {
    val rnd = new scala.util.Random(777000777L)
    val local = fixture
    (1 to 80).foreach { caze =>
      // step 1: impute x
      val mode = rnd.nextInt(2)
      val const = math.rint(rnd.nextGaussian() * 8) / 2
      val imputed =
        if (mode == 0) df.withColumn("v", PreprocessOps.imputeConst(col("x"), const))
        else PreprocessOps.imputeMean(df, "x", "v")
      val meanLocal = exactMeanLocal(local.flatMap(_.x))
      val vLocal: Map[Long, Double] = local.map(r =>
        r.id -> r.x.getOrElse(if (mode == 0) const else meanLocal)).toMap
      // step 2: discretize v
      val k = 2 + rnd.nextInt(6)
      val binned = PreprocessOps.equalWidth(imputed, "v", k, "bin")
      val mn = vLocal.values.min; val mx = vLocal.values.max
      val binLocal: Map[Long, Int] =
        vLocal.map { case (i, v) => i -> equalWidthLocal(v, mn, mx, k) }
      // step 3: continuize c (random treatment)
      import PreprocessOps.MultinomialTreatment._
      val treatments = Seq(Indicators, FirstAsBase, FrequentAsBase,
        AsOrdinal, AsNormalizedOrdinal, Remove, Leave)
      val tr = treatments(rnd.nextInt(treatments.size))
      val zero = rnd.nextBoolean()
      val outDf = PreprocessOps.continuize(
        binned.select("id", "bin", "c"), Seq(("c", cats)), tr, zero)
      // engine side: one row per id, all produced columns
      val prod = outDf.columns.filter(_ != "id").sorted
      val got = outDf.select(col("id") +: prod.map(col): _*)
        .collect().map(r => r.getLong(0) ->
          prod.indices.map(i => if (r.isNullAt(i + 1)) "∅"
            else r.get(i + 1).toString).mkString("|")).toMap
      // driver twin
      val modus: Int =
        if (tr == FrequentAsBase) {
          val counts = cats.map(v => local.count(_.c.contains(v)))
          counts.zipWithIndex.maxBy(_._1)._2
        } else if (tr == FirstAsBase) 0 else -1
      def contCols(cv: Option[String]): Seq[(String, String)] = tr match {
        case Leave => Seq("c" -> cv.map(_.toString).getOrElse("∅"))
        case Remove => Seq.empty
        case AsOrdinal => Seq("c" -> cv.map(v =>
          cats.indexOf(v).toDouble.toString).getOrElse("∅"))
        case AsNormalizedOrdinal => Seq("c" -> cv.map { v =>
          val o = cats.indexOf(v).toDouble
          val n = cats.size
          (if (zero) o / (n - 1) else (o - (n - 1) / 2.0) * 2.0 / (n - 1)).toString
        }.getOrElse("∅"))
        case _ =>
          val base = if (tr == Indicators) -1 else modus
          cats.zipWithIndex.filterNot(_._2 == base).map { case (v, _) =>
            s"c=$v" -> cv.map(c0 =>
              (if (c0 == v) 1.0 else if (zero) 0.0 else -1.0).toString)
              .getOrElse("∅")
          }
      }
      val want = local.map { r =>
        val cells = (Seq("bin" -> binLocal(r.id).toString) ++ contCols(r.c))
          .sortBy(_._1).map(_._2)
        r.id -> cells.mkString("|")
      }.toMap
      assert(got == want, s"chain case $caze diverged (mode=$mode k=$k tr=$tr zero=$zero)")
    }
  }
}
