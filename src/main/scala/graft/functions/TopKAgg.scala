package graft.functions

import java.nio.ByteBuffer
import java.util.{Comparator, PriorityQueue}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k aggregate: keeps the k (id, score) pairs with the highest
  * score (ties broken by smaller id). A `TypedImperativeAggregate`, so
  * Spark runs it with map-side partial aggregation: each partition reduces
  * to ≤ k entries before the shuffle — the scalable way to do distributed
  * top-k (vs. collect_list + sort, which shuffles every scored row).
  *
  * Used by Similarity.bruteForceTopK / lshTopK: at 100 TB the shuffle
  * volume is numPartitions × numQueries × k rows, independent of corpus size.
  */
case class TopKAgg(
    left: Expression,   // id: long
    right: Expression,  // score: double
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[PriorityQueue[TopKAgg.Entry]]
    with BinaryLike[Expression] {

  import TopKAgg.Entry

  override def createAggregationBuffer(): PriorityQueue[Entry] =
    new PriorityQueue[Entry](k + 1, TopKAgg.WORST_FIRST)

  override def update(buf: PriorityQueue[Entry], input: InternalRow): PriorityQueue[Entry] = {
    val idVal = left.eval(input)
    val scoreVal = right.eval(input)
    if (idVal != null && scoreVal != null) {
      insert(buf, new Entry(idVal.asInstanceOf[Long], scoreVal.asInstanceOf[Double]))
    }
    buf
  }

  override def merge(buf: PriorityQueue[Entry], other: PriorityQueue[Entry]): PriorityQueue[Entry] = {
    val it = other.iterator()
    while (it.hasNext) insert(buf, it.next())
    buf
  }

  private def insert(buf: PriorityQueue[Entry], e: Entry): Unit = {
    if (buf.size < k) buf.add(e)
    else if (TopKAgg.WORST_FIRST.compare(e, buf.peek()) > 0) {
      buf.poll(); buf.add(e)
    }
  }

  override def eval(buf: PriorityQueue[Entry]): Any = {
    val arr = new Array[Entry](buf.size)
    buf.toArray(arr)
    // best first: score desc, id asc
    java.util.Arrays.sort(arr, TopKAgg.WORST_FIRST.reversed())
    new GenericArrayData(arr.map(e =>
      new GenericInternalRow(Array[Any](e.id, e.score))))
  }

  override def serialize(buf: PriorityQueue[Entry]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putLong(e.id); bb.putDouble(e.score)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): PriorityQueue[Entry] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      buf.add(new Entry(bb.getLong, bb.getDouble))
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("id", LongType), StructField("score", DoubleType))),
    containsNull = false)
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKAgg =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "graft_topk"
}

object TopKAgg {
  final class Entry(val id: Long, val score: Double)

  /** Orders worst-first: lower score first; on ties, larger id first
    * (so the retained set prefers smaller ids — deterministic).
    */
  val WORST_FIRST: Comparator[Entry] = new Comparator[Entry] {
    override def compare(a: Entry, b: Entry): Int = {
      val c = java.lang.Double.compare(a.score, b.score)
      if (c != 0) c else java.lang.Long.compare(b.id, a.id)
    }
  }
}
