package graft

import org.apache.spark.sql.functions._
import graft.ml.Rules

/** CN2 sequential covering (rules.py:896-1007): rule-list induction on a
  * fixture with known structure, plus ordered prediction on a holdout. */
class RulesSpec extends SparkSpec {
  import spark.implicits._

  // color perfectly predicts class "a" for red; shape predicts "b" for
  // square among the rest; leftover is mixed with majority "c"
  private def fixture = Seq(
    ("red", "circle", "a"), ("red", "square", "a"), ("red", "circle", "a"),
    ("red", "square", "a"), ("blue", "square", "b"), ("green", "square", "b"),
    ("blue", "circle", "c"), ("green", "circle", "c"), ("blue", "circle", "c"),
    ("green", "circle", "b")
  ).toDF("color", "shape", "cls")

  test("cn2Ordered induces the expected ordered rule list + default") {
    val rules = Rules.cn2Ordered(fixture, Seq("color", "shape"), "cls",
      maxRules = 3).collect()
    // first rule: color=red => a (4/4 covered, laplace 5/7)
    val r1 = rules.head
    assert(r1.getString(1) == "color" && r1.getString(2) == "red" &&
      r1.getString(3) == "a" && r1.getLong(4) == 4L && r1.getLong(5) == 4L)
    // covering removed the red rows: later rules never re-select red
    assert(!rules.tail.exists(r => r.getString(2) == "red"))
    // last row is the default majority rule over the ORIGINAL data
    val d = rules.last
    assert(d.getString(1) == "_default" && d.getLong(5) == 10L)
    assert(d.getString(3) == "a" || d.getString(3) == "b" ||
      d.getString(3) == "c")
    // rule_order is 1..n contiguous
    assert(rules.map(_.getInt(0)).toSeq == (1 to rules.length))
  }

  test("cn2Predict classifies a holdout by first-matching rule") {
    val rules = Rules.cn2Ordered(fixture, Seq("color", "shape"), "cls",
      maxRules = 3).collect()
      .map(r => (r.getString(1), r.getString(2), r.getString(3))).toSeq
    val holdout = Seq(("red", "square"), ("blue", "square"),
      ("yellow", "triangle")).toDF("color", "shape")
    val preds = Rules.cn2Predict(rules, holdout)
      .select("color", "prediction").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(preds("red") == "a")       // fires rule 1
    assert(preds("yellow") != null)   // unseen values fall to the default
    // every holdout row gets a prediction (default rule is total)
    assert(preds.values.forall(_ != null))
  }

  test("cn2Unordered induces per-class overlapping rules + default") {
    val rules = Rules.cn2Unordered(fixture, Seq("color", "shape"), "cls",
      maxPerClass = 2).collect()
    // class a gets color=red as its best rule (4/4 toward a)
    assert(rules.exists(r => r.getString(0) == "a" &&
      r.getString(2) == "color" && r.getString(3) == "red"))
    // every induced rule covers at least one positive
    assert(rules.forall(_.getLong(4) >= 1))
    // trailing default row present
    assert(rules.last.getString(0) == "_default")
    // per-class orders are 1..n contiguous
    val byCls = rules.dropRight(1).groupBy(_.getString(0))
    byCls.values.foreach { rs =>
      assert(rs.map(_.getInt(1)).sorted.toSeq == (1 to rs.length))
    }
  }

  test("cn2PredictUnordered votes coverage-weighted, default on no fire") {
    val induced = Rules.cn2Unordered(fixture, Seq("color", "shape"), "cls",
      maxPerClass = 2).collect()
    val rules = induced.dropRight(1)
      .map(r => (r.getString(0), r.getString(2), r.getString(3),
        r.getLong(4))).toSeq
    val default = induced.last.getString(3) // default row: value = majority
    val holdout = Seq(("red", "circle"), ("unseen", "unseen"))
      .toDF("color", "shape")
    val preds = Rules.cn2PredictUnordered(rules, default, holdout)
      .select("color", "prediction").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(preds("red") == "a")
    assert(preds("unseen") == "a") // nothing fires → default majority
  }

  test("cn2Ordered stops when data is exhausted (no phantom rules)") {
    val tiny = Seq(("x", "p"), ("y", "q")).toDF("f", "cls")
    val rules = Rules.cn2Ordered(tiny, Seq("f"), "cls", maxRules = 5)
      .collect()
    // 2 covering rules consume both rows, then the default: 3 total
    assert(rules.length == 3)
    assert(rules.last.getString(1) == "_default")
  }
}
