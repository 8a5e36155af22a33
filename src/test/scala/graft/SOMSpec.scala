package graft

import org.apache.spark.sql.functions._
import graft.ml.SOM

/** Batch SOM semantics (iterative → rows-only query; pinned here). */
class SOMSpec extends SparkSpec {
  import spark.implicits._

  private def twoBlobs = ((1 to 40).map(i =>
      (i.toLong, Array(0.0 + (i % 5) * 0.01, 0.0 + (i % 7) * 0.01))) ++
    (41 to 80).map(i =>
      (i.toLong, Array(10.0 + (i % 5) * 0.01, 10.0 + (i % 7) * 0.01))))
    .toDF("vec_id", "embedding")

  test("SOM separates two far blobs onto different units") {
    val units = SOM.fit(twoBlobs, "vec_id", "embedding", 2, 2, 5, 0.5)
      .collect()
    // every vector assigned; no unit holds both blobs (qerr would be ~7)
    assert(units.map(_.getLong(2)).sum == 80)
    assert(units.forall(_.getDouble(3) < 1.0))
  }

  test("SOM is deterministic across runs") {
    val a = SOM.fit(twoBlobs, "vec_id", "embedding", 2, 2, 3, 1.0)
      .collect().map(_.toSeq).toSeq
    val b = SOM.fit(twoBlobs, "vec_id", "embedding", 2, 2, 3, 1.0)
      .collect().map(_.toSeq).toSeq
    assert(a == b)
  }
}
