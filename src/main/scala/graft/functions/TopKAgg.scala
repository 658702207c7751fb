package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Grouped top-k as a MERGEABLE bounded-heap aggregate — the scale
  * replacement for the `row_number() OVER (PARTITION BY g ORDER BY …)
  * WHERE rn <= k` shape. The window form materializes and SORTS every
  * group's full contents on the shuffle (a group with a billion rows
  * sorts a billion rows to keep 5); this aggregate keeps an O(k)
  * min-heap per group, combines map-side (partial aggregation), and
  * ships exactly k rows per group across the exchange — the classic
  * mergeable-summaries top-k (Ilyas, Beskales, Soliman 2008 survey
  * form), exact (not approximate) because top-k under a total order
  * is a mergeable summary.
  *
  * Total order (pinned, the repo's ranking convention): score DESC,
  * id ASC on ties — bit-identical to the window form's
  * `ORDER BY score DESC, id ASC`, which is what the q186 oracle
  * verifies value-for-value. Both inputs are LONGs: rankings here
  * follow the integer-exact score discipline (milli-scores, counts,
  * lengths), never cross-row float accumulation.
  *
  * Scale shape: state is O(k) regardless of group size; update is
  * O(log k) when the heap is full only if the candidate beats the
  * current weakest — on descending-ish data almost every row is a
  * single root comparison. Merge offers the smaller summary into the
  * larger. The exchange carries k (id, score) pairs per group. */
final case class TopKAgg(
    score: Expression,
    id: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKState] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = score :: id :: Nil
  override def checkInputDataTypes(): TypeCheckResult =
    if (score.dataType == LongType && id.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires LONG (score, id) columns, got " +
        s"(${score.dataType}, ${id.dataType})")
  override def nullable: Boolean = false
  override def dataType: DataType = TopKAgg.ResultType
  override def prettyName: String = "topk_heap"

  override def createAggregationBuffer(): TopKState = new TopKState(k)

  override def update(buffer: TopKState, input: InternalRow): TopKState = {
    val s = score.eval(input)
    val i = id.eval(input)
    // a null in either column is a non-row (the window form would sort
    // it NULLS LAST and k real rows would displace it anyway)
    if (s != null && i != null)
      buffer.offer(s.asInstanceOf[Long], i.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: TopKState, other: TopKState): TopKState = {
    buffer.mergeIn(other)
    buffer
  }

  override def eval(buffer: TopKState): Any =
    new GenericArrayData(buffer.sortedEntries.map { case (s, i) =>
      InternalRow(i, s)
    }.toArray[Any])

  override def serialize(buffer: TopKState): Array[Byte] = buffer.toBytes

  override def deserialize(bytes: Array[Byte]): TopKState =
    TopKState.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKAgg =
    copy(score = newChildren(0), id = newChildren(1))
}

object TopKAgg {
  val ResultType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("score", LongType, nullable = false))), containsNull = false)

  /** The top-k as a Column aggregate: array<struct<id,score>> already
    * in rank order (score desc, id asc) — posexplode for ranks. */
  def topK(score: Column, id: Column, k: Int): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(
      TopKAgg(Bridge.expression(score), Bridge.expression(id), k)
        .toAggregateExpression())
  }
}

/** O(k) heap state: a binary min-heap under the WEAKNESS order (score
  * asc, id desc) so the root is always the entry the next candidate
  * must beat. */
final class TopKState(val k: Int) {
  private var scores = new Array[Long](math.min(k, 16))
  private var ids = new Array[Long](math.min(k, 16))
  private var size = 0

  /** a strictly weaker than b under (score desc, id asc) ranking. */
  @inline private def weaker(as: Long, ai: Long, bs: Long, bi: Long): Boolean =
    as < bs || (as == bs && ai > bi)

  def offer(s: Long, i: Long): Unit = {
    if (size < k) {
      if (size == scores.length) grow()
      scores(size) = s; ids(size) = i
      siftUp(size)
      size += 1
    } else if (weaker(scores(0), ids(0), s, i)) {
      scores(0) = s; ids(0) = i
      siftDown(0)
    }
  }

  private def grow(): Unit = {
    val n = math.min(k, scores.length * 2)
    scores = java.util.Arrays.copyOf(scores, n)
    ids = java.util.Arrays.copyOf(ids, n)
  }

  private def siftUp(i0: Int): Unit = {
    var i = i0
    while (i > 0) {
      val p = (i - 1) >> 1
      if (weaker(scores(i), ids(i), scores(p), ids(p))) { swap(i, p); i = p }
      else return
    }
  }

  private def siftDown(i0: Int): Unit = {
    var i = i0
    while (true) {
      val l = 2 * i + 1
      val r = l + 1
      var m = i
      if (l < size && weaker(scores(l), ids(l), scores(m), ids(m))) m = l
      if (r < size && weaker(scores(r), ids(r), scores(m), ids(m))) m = r
      if (m == i) return
      swap(i, m); i = m
    }
  }

  @inline private def swap(a: Int, b: Int): Unit = {
    val ts = scores(a); scores(a) = scores(b); scores(b) = ts
    val ti = ids(a); ids(a) = ids(b); ids(b) = ti
  }

  def mergeIn(other: TopKState): Unit = {
    var i = 0
    while (i < other.size) { offer(other.scores(i), other.ids(i)); i += 1 }
  }

  /** Entries in rank order: (score desc, id asc). Comparator-based, not
    * negation-based: −Long.MinValue == Long.MinValue, so sortBy(−s)
    * would rank a MinValue score FIRST instead of last. */
  def sortedEntries: Seq[(Long, Long)] =
    (0 until size).map(i => (scores(i), ids(i)))
      .sortWith { case ((as, ai), (bs, bi)) =>
        as > bs || (as == bs && ai < bi)
      }

  def toBytes: Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(k); out.writeInt(size)
    var i = 0
    while (i < size) { out.writeLong(scores(i)); out.writeLong(ids(i)); i += 1 }
    out.flush(); bos.toByteArray
  }
}

object TopKState {
  def fromBytes(bytes: Array[Byte]): TopKState = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val st = new TopKState(in.readInt())
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val s = in.readLong(); val id = in.readLong()
      st.offer(s, id); i += 1
    }
    st
  }
}
