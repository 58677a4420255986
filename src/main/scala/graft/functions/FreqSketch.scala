package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, SparkSession}

/** SpaceSaving frequent-items buffer: at most k (item → count, err)
  * counters. Tracked items increment; an unseen item arriving at capacity
  * evicts the minimum counter m and inherits (m.count + 1, err = m.count) —
  * the classic overestimate bookkeeping. Invariants (Metwally et al.):
  * for any tracked item, trueCount ≤ count and count − err ≤ trueCount;
  * any item with trueCount > n/k is tracked.
  */
final class FreqBuffer(val k: Int) {
  require(k > 0, s"freq_sketch needs a positive counter budget, got k=$k")
  val counts = scala.collection.mutable.HashMap.empty[String, Long]
  val errs = scala.collection.mutable.HashMap.empty[String, Long]
  // counters ordered by (count, item): head is the eviction victim — O(log k)
  // per touch instead of an O(k) scan per eviction, which matters because on
  // a long-tail stream MOST arrivals at capacity are untracked and evict.
  // The (count, item) order also makes eviction deterministic for a fixed
  // arrival order.
  private val byCount = scala.collection.mutable.TreeSet.empty[(Long, String)]
  var n: Long = 0L

  /** restore the order index after external mutation of `counts` (deserialize/merge) */
  private[functions] def reindex(): Unit = {
    byCount.clear()
    counts.foreach { case (it, c) => byCount.add((c, it)) }
  }

  def insert(item: String, w: Long = 1L): Unit = {
    n += w
    counts.get(item) match {
      case Some(c) =>
        byCount.remove((c, item))
        counts(item) = c + w
        byCount.add((c + w, item))
      case None if counts.size < k =>
        counts(item) = w; errs(item) = 0L
        byCount.add((w, item))
      case None =>
        val (mc, mi) = byCount.head
        byCount.remove((mc, mi))
        counts.remove(mi); errs.remove(mi)
        counts(item) = mc + w
        errs(item) = mc
        byCount.add((mc + w, item))
    }
  }

  /** Mergeable-summaries combine: an item absent from one side could have
    * occurred up to that side's min counter times there, so the absent side
    * contributes (min, err = min) — both invariants survive the sum. After
    * combining, only the k largest (count, item-asc) counters are kept;
    * dropped items were below every kept count, so the top-k report is
    * unaffected.
    */
  def mergeFrom(o: FreqBuffer): Unit = {
    val minSelf = if (counts.size >= k) byCount.head._1 else 0L
    val minOther = if (o.counts.size >= o.k) {
      var m = Long.MaxValue
      o.counts.values.foreach(c => if (c < m) m = c)
      m
    } else 0L
    val items = (counts.keySet ++ o.counts.keySet).toSeq
    val merged = items.map { it =>
      val cA = counts.getOrElse(it, minSelf)
      val eA = if (counts.contains(it)) errs(it) else minSelf
      val cB = o.counts.getOrElse(it, minOther)
      val eB = if (o.counts.contains(it)) o.errs(it) else minOther
      (it, cA + cB, eA + eB)
    }.sortBy { case (it, c, _) => (-c, it) }.take(k)
    counts.clear(); errs.clear()
    merged.foreach { case (it, c, e) => counts(it) = c; errs(it) = e }
    reindex()
    n += o.n
  }

  /** (item, est, err) sorted est DESC, item ASC — deterministic given the
    * final counter state.
    */
  def sorted: Seq[(String, Long, Long)] =
    counts.keysIterator.map(it => (it, counts(it), errs(it))).toSeq
      .sortBy { case (it, c, _) => (-c, it) }
}

/** `freq_sketch(item, k)` — mergeable SpaceSaving heavy-hitters aggregate
  * returning array<struct<item string, est long, err long>> (est DESC).
  *
  * The 100 TB shape for "top tokens/domains/users by frequency" over
  * high-cardinality keys: an exact groupBy shuffles one row per DISTINCT
  * key; this keeps k counters per partition and merges k-sized summaries,
  * so the shuffle is O(k × partitions) regardless of cardinality. Estimates
  * carry their error bound (true ∈ [est − err, est]); like the HLL and
  * quantile sketches, it is bound-checked in specs rather than
  * hash-oracled (counter contents depend on partition arrival order).
  */
case class FreqSketch(
    item: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[FreqBuffer] {

  private lazy val k: Int = {
    // check foldability BEFORE eval: a column reference for k would
    // otherwise surface as an opaque evaluation/cast error
    require(kExpr.foldable,
      "freq_sketch(item, k): k must be a non-null integer literal, " +
        s"got non-foldable expression ${kExpr.sql}")
    val v = kExpr.eval(InternalRow.empty)
    require(v != null, "freq_sketch(item, k): k must be a non-null integer literal")
    val ki = v.asInstanceOf[Number].intValue()
    require(ki > 0, s"freq_sketch(item, k): k must be positive, got $ki")
    ki
  }

  override def children: Seq[Expression] = Seq(item, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType),
      StructField("est", LongType),
      StructField("err", LongType))),
    containsNull = false)
  override def prettyName: String = "freq_sketch"

  override def createAggregationBuffer(): FreqBuffer = new FreqBuffer(k)

  override def update(buf: FreqBuffer, input: InternalRow): FreqBuffer = {
    val v = item.eval(input)
    if (v != null) buf.insert(v.toString)
    buf
  }

  override def merge(buf: FreqBuffer, other: FreqBuffer): FreqBuffer = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: FreqBuffer): Any = {
    val rows = buf.sorted.map { case (it, c, e) =>
      InternalRow(UTF8String.fromString(it), c, e)
    }
    new GenericArrayData(rows.toArray[Any])
  }

  override def serialize(buf: FreqBuffer): Array[Byte] = {
    val entries = buf.sorted.map { case (it, c, e) =>
      (it.getBytes(StandardCharsets.UTF_8), c, e)
    }
    val size = 16 + entries.map(_._1.length + 20).sum
    val bb = ByteBuffer.allocate(size)
    bb.putInt(buf.k); bb.putInt(entries.length); bb.putLong(buf.n)
    entries.foreach { case (b, c, e) =>
      bb.putInt(b.length); bb.put(b); bb.putLong(c); bb.putLong(e)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): FreqBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new FreqBuffer(bb.getInt)
    val m = bb.getInt
    buf.n = bb.getLong
    var i = 0
    while (i < m) {
      val len = bb.getInt
      val b = new Array[Byte](len); bb.get(b)
      val it = new String(b, StandardCharsets.UTF_8)
      buf.counts(it) = bb.getLong
      buf.errs(it) = bb.getLong
      i += 1
    }
    buf.reindex()
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): FreqSketch = copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqSketch = copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(item = c(0), kExpr = c(1))
}

object FreqSketch {
  /** Delegates to the shared `GraftExtensions` builder (same arity guard
    * and coercion as extension injection).
    */
  def register(spark: SparkSession): Unit =
    graft.GraftExtensions.registerTemp(spark, "freq_sketch")

  def freqSketch(spark: SparkSession, item: Column, k: Int): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function(
      "freq_sketch", item, org.apache.spark.sql.functions.lit(k))
  }
}
