package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Space-saving heavy hitters (Metwally, Agrawal, El Abbadi 2005) as a
  * MERGEABLE Spark aggregate — the missing piece between the exact top-k
  * shuffles (q59/q67) and the count-min sketch (q115): a fixed-`capacity`
  * summary that finds every item with frequency > N/capacity in one pass,
  * with per-item error ACCOUNTING (count-min gives a global bound; this
  * gives each reported item its own overestimate bound).
  *
  * Guarantees (the classic ones, pinned by SpaceSavingSpec):
  *   - `est ≥ true` — estimates never under-count;
  *   - `est − err ≤ true` — the error column bounds the overestimate;
  *   - any item with `true > N/capacity` is IN the summary;
  *   - `capacity ≥ distinct(items)` ⇒ no eviction ever happens, every
  *     `err` is 0 and every `est` is EXACT — the regime the q131 oracle
  *     verifies value-for-value against exact SQL counts.
  *
  * Scale shape: the state is O(capacity) regardless of input size, and
  * [[SpaceSavingState.mergeIn]] implements the mergeable-summaries union
  * (absent items substitute the other summary's min count when that
  * summary is saturated — keeping the overestimate invariant — then the
  * union trims back to capacity), so partial summaries combine map-side
  * and the shuffle carries kilobytes per group. Updates on present keys
  * are O(1); an eviction scans O(capacity) — heavy-hitter workloads are
  * dominated by present-key hits, and capacity is a constant.
  */
final case class SpaceSavingAgg(
    child: Expression,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSavingState] {

  require(capacity > 0, "capacity must be positive")

  override def children: Seq[Expression] = child :: Nil
  // fail at ANALYSIS time on a non-string item column, not with an
  // executor-side ClassCastException
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING item column, got ${child.dataType}")
  override def nullable: Boolean = false
  override def dataType: DataType = SpaceSavingAgg.ResultType
  override def prettyName: String = "space_saving_topk"

  override def createAggregationBuffer(): SpaceSavingState =
    new SpaceSavingState(capacity)

  override def update(buffer: SpaceSavingState, input: InternalRow): SpaceSavingState = {
    val v = child.eval(input)
    // copy out of the (reused) scan row before storing in the buffer
    if (v != null) buffer.offer(v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(buffer: SpaceSavingState, other: SpaceSavingState): SpaceSavingState = {
    buffer.mergeIn(other)
    buffer
  }

  override def eval(buffer: SpaceSavingState): Any = {
    val rows = buffer.sortedEntries.map { case (item, c, e) =>
      InternalRow(UTF8String.fromString(item), c, e)
    }
    new GenericArrayData(rows.toArray[Any])
  }

  override def serialize(buffer: SpaceSavingState): Array[Byte] = buffer.toBytes

  override def deserialize(bytes: Array[Byte]): SpaceSavingState =
    SpaceSavingState.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSavingAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSavingAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SpaceSavingAgg =
    copy(child = newChildren.head)
}

object SpaceSavingAgg {
  val ResultType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)

  /** The summary as a Column aggregate: array<struct<item,est,err>>,
    * sorted (est desc, err asc, item asc) — explode/posexplode for a
    * ranked top-k. */
  def topK(item: Column, capacity: Int): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(
      SpaceSavingAgg(Bridge.expression(item), capacity).toAggregateExpression())
  }
}

/** The O(capacity) summary state: item → (count, err). `saturated` marks
  * that an eviction has happened — equivalently that `min count over the
  * summary` is a live lower bound on what an absent item could have
  * counted (the merge substitution constant). */
final class SpaceSavingState(val capacity: Int) {
  import scala.collection.mutable
  private val counts = mutable.HashMap.empty[String, (Long, Long)]
  private var saturated = false

  /** All orderings use UTF-8 BINARY comparison ([[Utf8Order]]) so the
    * summary's rank/tie-break order is exactly what a Spark orderBy or
    * a DuckDB ROW_NUMBER produces, non-BMP items included. */
  private val evictOrd: Ordering[(String, (Long, Long))] =
    Ordering.by[(String, (Long, Long)), Long](_._2._1)
      .orElse(Ordering.by[(String, (Long, Long)), String](_._1)(
        Utf8Order.reverse))

  def offer(item: String): Unit = counts.get(item) match {
    case Some((c, e)) => counts(item) = (c + 1, e)
    case None if counts.size < capacity => counts(item) = (1L, 0L)
    case None =>
      saturated = true
      // evict the min-count entry (ties: binary-greatest key, so the
      // kept prefix is deterministic); the newcomer inherits the
      // evictee's count as its overestimate + error — the classic rule.
      val (mk, (mc, _)) = counts.min(evictOrd)
      counts.remove(mk)
      counts(item) = (mc + 1, mc)
  }

  private def minCount: Long =
    if (counts.isEmpty) 0L else counts.valuesIterator.map(_._1).min

  /** Mergeable-summaries union: for items absent from one side, that
    * side contributes its min count IF it is saturated (an absent item
    * could have counted up to that before eviction) — keeping
    * `est ≥ true` — and the substitution is pure overestimate, so it
    * also lands in `err`. Then trim back to capacity keeping the
    * largest estimates (est desc, item asc — deterministic). */
  def mergeIn(other: SpaceSavingState): Unit = {
    val m1 = if (saturated) minCount else 0L
    val m2 = if (other.saturated) other.minCount else 0L
    val union = mutable.HashMap.empty[String, (Long, Long)]
    for ((k, (c, e)) <- counts) {
      val (oc, oe) = other.counts.getOrElse(k, (m2, m2))
      union(k) = (c + oc, e + oe)
    }
    for ((k, (oc, oe)) <- other.counts if !counts.contains(k))
      union(k) = (oc + m1, oe + m1)
    saturated ||= other.saturated
    counts.clear()
    if (union.size <= capacity) counts ++= union
    else {
      saturated = true
      val kept = union.toSeq
        .sortBy { case (k, (c, _)) => (-c, k) }(
          Ordering.Tuple2(Ordering.Long, Utf8Order))
        .take(capacity)
      counts ++= kept
    }
  }

  /** Entries sorted (est desc, err asc, item asc in UTF-8 binary
    * order) — the deterministic ranked order the result array carries,
    * matching a DuckDB `ORDER BY n DESC, item ASC`. */
  def sortedEntries: Seq[(String, Long, Long)] =
    counts.toSeq.map { case (k, (c, e)) => (k, c, e) }
      .sortBy { case (k, c, e) => (-c, e, k) }(
        Ordering.Tuple3(Ordering.Long, Ordering.Long, Utf8Order))

  /** Deserialization hooks. */
  private[functions] def put(k: String, c: Long, e: Long): Unit =
    counts(k) = (c, e)
  private[functions] def markSaturated(): Unit = saturated = true

  def toBytes: Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(capacity)
    out.writeBoolean(saturated)
    out.writeInt(counts.size)
    for ((k, (c, e)) <- counts) {
      val kb = k.getBytes("UTF-8")
      out.writeInt(kb.length); out.write(kb)
      out.writeLong(c); out.writeLong(e)
    }
    out.flush()
    bos.toByteArray
  }
}

object SpaceSavingState {
  def fromBytes(bytes: Array[Byte]): SpaceSavingState = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val st = new SpaceSavingState(in.readInt())
    val sat = in.readBoolean()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](in.readInt()); in.readFully(kb)
      st.put(new String(kb, "UTF-8"), in.readLong(), in.readLong())
      i += 1
    }
    if (sat) st.markSaturated()
    st
  }
}

