package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, SparkSession}

/** Bounded top-k buffer: keeps the k largest (score, id) pairs, ordered by
  * score DESC then id ASC (total order ⇒ deterministic results).
  */
final class TopKBuffer(val k: Int) {
  // simple insertion into a sorted array — k is small (top-N per group)
  var scores = new Array[Double](0)
  var ids = new Array[Long](0)

  private def beats(s: Double, id: Long, i: Int): Boolean =
    s > scores(i) || (s == scores(i) && id < ids(i))

  def insert(s: Double, id: Long): Unit = {
    var pos = 0
    while (pos < scores.length && !beats(s, id, pos)) pos += 1
    if (pos >= k) return
    val n = math.min(scores.length + 1, k)
    val ns = new Array[Double](n); val ni = new Array[Long](n)
    var i = 0
    while (i < pos) { ns(i) = scores(i); ni(i) = ids(i); i += 1 }
    ns(pos) = s; ni(pos) = id
    i = pos
    while (i + 1 < n) { ns(i + 1) = scores(i); ni(i + 1) = ids(i); i += 1 }
    scores = ns; ids = ni
  }

  def mergeFrom(o: TopKBuffer): Unit = {
    var i = 0
    while (i < o.scores.length) { insert(o.scores(i), o.ids(i)); i += 1 }
  }
}

/** `bounded_topk(score, id, k)` — aggregate returning the k largest
  * (score, id) pairs per group as array<struct<score double, id long>>,
  * score DESC / id ASC.
  *
  * Vs. the window `row_number() <= k` formulation: the window shuffles and
  * sorts EVERY row of every group; this keeps a k-element buffer per key in
  * the partial (map-side) aggregate, so only `k × keys` rows cross the wire
  * regardless of input size — the difference between "sort 100 TB" and
  * "merge tiny heaps" for top-N-per-group.
  */
case class BoundedTopK(
    score: Expression,
    id: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[TopKBuffer] {

  private lazy val k: Int = kExpr.eval(InternalRow.empty).asInstanceOf[Number].intValue()

  override def children: Seq[Expression] = Seq(score, id, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType), StructField("id", LongType))),
    containsNull = false)
  override def prettyName: String = "bounded_topk"

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: TopKBuffer): Any = {
    val rows = new Array[Any](buf.scores.length)
    var i = 0
    while (i < rows.length) {
      rows(i) = InternalRow(buf.scores(i), buf.ids(i))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val n = buf.scores.length
    val bb = ByteBuffer.allocate(8 + n * 16)
    bb.putInt(buf.k); bb.putInt(n)
    var i = 0
    while (i < n) { bb.putDouble(buf.scores(i)); bb.putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new TopKBuffer(bb.getInt)
    val n = bb.getInt
    buf.scores = new Array[Double](n); buf.ids = new Array[Long](n)
    var i = 0
    while (i < n) { buf.scores(i) = bb.getDouble; buf.ids(i) = bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): BoundedTopK = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BoundedTopK = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(score = c(0), id = c(1), kExpr = c(2))
}

object BoundedTopK {
  /** Delegates to the shared `GraftExtensions` builder (same arity guard
    * and coercion as extension injection).
    */
  def register(spark: SparkSession): Unit =
    graft.GraftExtensions.registerTemp(spark, "bounded_topk")

  def boundedTopK(spark: SparkSession, score: Column, id: Column, k: Int): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function(
      "bounded_topk", score, id, org.apache.spark.sql.functions.lit(k))
  }
}
