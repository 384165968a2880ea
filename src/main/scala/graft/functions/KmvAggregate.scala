package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** KMV (k-minimum-values) distinct sketch as a true Catalyst
  * AGGREGATE — the `TypedImperativeAggregate` rung of the extension
  * ladder (native scalar Expression → optimizer Rule → LogicalPlan/
  * Exec → TVF → DataSource V2 → THIS), the same machinery Spark's own
  * DataSketches HLL functions use.
  *
  * Why it matters at 100 TB: the window formulation of bottom-k
  * ([[graft.warehouse.Sketched.kmvDistinct]]) must first shuffle the
  * DISTINCT (group, hash) pairs — O(distinct keys) over the wire.
  * This aggregate keeps a bounded sorted set of the k smallest
  * distinct hashes PER PARTITION (map-side partial aggregation) and
  * ships only k longs per group per partition; merge unions two
  * k-sets and re-trims. State O(k), wire O(groups × k × partitions),
  * and the answer is IDENTICAL — the same oracle grades both.
  *
  * Output: `array<long> [n_kept, kth_min]` — the estimator inputs
  * (estimate = (k−1)·2^48 div kth_min when saturated), kept integer
  * so grading is bit-exact.
  */
case class KmvSketchAgg(
    child: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[Long]] {

  override def prettyName: String = "graft_kmv"
  override def children: Seq[Expression] = Seq(child, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    InputChecks.firstFailure(
      InputChecks.expect(prettyName, 0, child,
        dt => dt == LongType, "a bigint hash column"),
      InputChecks.expect(prettyName, 1, kExpr,
        dt => dt == IntegerType && kExpr.foldable &&
          kExpr.eval(null).asInstanceOf[Int] >= 1,
        "a literal int k >= 1"))

  @transient private lazy val k: Int = kExpr.eval(null).asInstanceOf[Int]

  override def createAggregationBuffer(): java.util.TreeSet[Long] =
    new java.util.TreeSet[Long]()

  override def update(buf: java.util.TreeSet[Long],
      input: InternalRow): java.util.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) {
      buf.add(v.asInstanceOf[Long])
      if (buf.size > k) buf.pollLast()
    }
    buf
  }

  override def merge(buf: java.util.TreeSet[Long],
      other: java.util.TreeSet[Long]): java.util.TreeSet[Long] = {
    val it = other.iterator()
    while (it.hasNext) {
      buf.add(it.next())
      if (buf.size > k) buf.pollLast()
    }
    buf
  }

  override def eval(buf: java.util.TreeSet[Long]): Any =
    new GenericArrayData(Array(buf.size.toLong,
      if (buf.isEmpty) 0L else buf.last()))

  override def serialize(buf: java.util.TreeSet[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val set = new java.util.TreeSet[Long]()
    var i = 0
    while (i < n) { set.add(bb.getLong); i += 1 }
    set
  }

  override def withNewMutableAggBufferOffset(
      newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(
      newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression =
    copy(child = c(0), kExpr = c(1))
}
