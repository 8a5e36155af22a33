package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.SqlBridge
import org.apache.spark.sql.types._

import scala.collection.mutable

/** Bounded top-k-smallest aggregate over (key double, id long) pairs —
  * the map-side-combining engine of exact kNN.
  *
  * `row_number().over(Window.partitionBy(tid).orderBy(d2, rid)) <= k`
  * shuffles and sorts the ENTIRE test×train candidate table before
  * discarding all but k rows per test id; this aggregate keeps a k-entry
  * max-heap per group instead, so partial aggregation reduces each map
  * partition to ≤ k entries per test id BEFORE the exchange — shuffle
  * volume drops from |test|·|train| to |test|·k·partitions, the sort
  * disappears, and the candidate scan itself stays inside whole-stage
  * codegen. Selection is identical to the window form: the k smallest by
  * (key, id) lexicographic, so boundary ties break by id exactly like
  * `ORDER BY d2 ASC, rid ASC`. NULL keys are skipped (the window form
  * sorted them FIRST in Spark but LAST in DuckDB — skipping makes the
  * semantics engine-independent; callers guarantee non-null features).
  *
  * Output: array<struct<key double, id long>> sorted ascending. */
case class TopKPairs(key: Expression, id: Expression, k: Int,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {
  require(k > 0, "k must be positive")

  // hoisted once: materializing Ordering.Tuple2 per update()/merge() call
  // was a per-input-row allocation on this kernel's hot path
  private val ord = Ordering.Tuple2[Double, Long]

  override def children: Seq[Expression] = Seq(key, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("key", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_topk_pairs"

  // max-first on (key, id): head is the current worst of the kept k
  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty[(Double, Long)](
      ord)

  override def update(buf: mutable.PriorityQueue[(Double, Long)],
                      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val kv = key.eval(input)
    val iv = id.eval(input)
    if (kv != null && iv != null) {
      val e = (kv.asInstanceOf[Double], iv.asInstanceOf[Long])
      if (buf.size < k) buf.enqueue(e)
      else if (ord.lt(e, buf.head)) {
        buf.dequeue(); buf.enqueue(e)
      }
    }
    buf
  }

  override def merge(b1: mutable.PriorityQueue[(Double, Long)],
                     b2: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    b2.foreach { e =>
      if (b1.size < k) b1.enqueue(e)
      else if (ord.lt(e, b1.head)) {
        b1.dequeue(); b1.enqueue(e)
      }
    }
    b1
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    val sorted = buf.toArray.sorted(ord)
    new GenericArrayData(sorted.map { case (d, i) =>
      InternalRow(d, i)
    }.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    buf.foreach { case (d, i) => bb.putDouble(d); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.enqueue((bb.getDouble, bb.getLong)); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(key = newChildren(0), id = newChildren(1))
}

object TopKAgg {
  /** Aggregate Column: the k smallest (key, id) pairs of the group as a
    * sorted array<struct<key, id>>. */
  def topKPairs(key: Column, id: Column, k: Int): Column =
    SqlBridge.column(
      TopKPairs(SqlBridge.expression(key), SqlBridge.expression(id), k)
        .toAggregateExpression())

  private val FallbackConf =
    "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
  /** TypedImperativeAggregate runs through ObjectHashAggregate, whose
    * hash map falls back to SORT-based aggregation after
    * `fallbackThreshold` distinct keys per task — default 128. For
    * TopKPairs that fallback re-creates exactly the pathology the
    * aggregate exists to avoid: every task SORTS its entire candidate
    * slice (|test|·|train| / tasks rows) before merging, which at the
    * sf10 rehearsal spilled the 22G-row kNN candidate stream to
    * disk-full. A k-entry heap costs ~400 B per group, so 2^18 groups
    * per task bound the map at ~100 MB — raise the threshold to that
    * when it is still at the Spark default, and leave any explicit user
    * setting alone. */
  def ensureHashAggCapacity(spark: org.apache.spark.sql.SparkSession): Unit =
    if (spark.conf.get(FallbackConf, "128") == "128")
      spark.conf.set(FallbackConf, (1 << 18).toString)
}
