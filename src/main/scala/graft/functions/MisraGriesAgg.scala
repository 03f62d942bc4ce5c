package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters sketch (Misra & Gries 1982; mergeable form
  * per Agarwal et al., "Mergeable Summaries", PODS 2012): at most `k`
  * (item, counter) pairs with the deterministic guarantee
  * `true − n/(k+1) ≤ est ≤ true` for EVERY item — so every item with
  * true frequency > n/(k+1) is guaranteed present, with n the total
  * number of aggregated values. A `TypedImperativeAggregate`, so Spark
  * runs it with map-side partial aggregation: each partition reduces to
  * ≤ k counters before the shuffle, and merges subtract the (k+1)-th
  * largest combined counter (the mergeable-summaries rule), preserving
  * the error bound. The 100 TB shape for "top items": shuffle volume is
  * numPartitions × k rows, independent of both data size and
  * cardinality — vs an exact groupBy count whose shuffle carries every
  * distinct item.
  *
  * Exact regime: while the number of DISTINCT items ever seen stays ≤ k,
  * no decrement ever fires and the counters are exact (and therefore
  * deterministic); beyond that, estimates depend on partition/merge
  * order within the guarantee band — contract rows should assert the
  * GUARANTEE, not raw estimates.
  */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.HashMap[String, Long]]
    with UnaryLike[Expression] {

  require(k >= 1, "MisraGriesAgg: k must be >= 1")

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long](k * 2)

  override def update(buf: java.util.HashMap[String, Long],
      input: InternalRow): java.util.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      // tolerate any input type (top error CODES are numeric): non-string
      // values key by toString instead of an executor ClassCastException
      val key = v match {
        case u: UTF8String => u.toString
        case other         => other.toString
      }
      val cur = buf.getOrDefault(key, 0L)
      if (cur != 0L) buf.put(key, cur + 1L)
      else if (buf.size < k) buf.put(key, 1L)
      else {
        // classic MG decrement: every counter −1, zeros evicted; the
        // arriving item is NOT inserted (its mass is absorbed by the
        // global decrement)
        val it = buf.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue <= 1L) it.remove() else e.setValue(e.getValue - 1L)
        }
      }
    }
    buf
  }

  override def merge(buf: java.util.HashMap[String, Long],
      other: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      buf.put(e.getKey, buf.getOrDefault(e.getKey, 0L) + e.getValue)
    }
    if (buf.size > k) {
      // mergeable-summaries reduction: subtract the (k+1)-th largest
      // counter from every counter, evict ≤ 0 — back to ≤ k entries with
      // the combined error bound intact
      val vals = new Array[Long](buf.size)
      var i = 0
      val vit = buf.values().iterator()
      while (vit.hasNext) { vals(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(vals)
      val cut = vals(vals.length - (k + 1)) // (k+1)-th largest
      val eit = buf.entrySet().iterator()
      while (eit.hasNext) {
        val e = eit.next()
        if (e.getValue <= cut) eit.remove() else e.setValue(e.getValue - cut)
      }
    }
    buf
  }

  override def eval(buf: java.util.HashMap[String, Long]): Any = {
    val entries = new Array[(String, Long)](buf.size)
    var i = 0
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next(); entries(i) = (e.getKey, e.getValue); i += 1
    }
    // deterministic representation: estimate desc, item asc
    val sorted = entries.sortBy { case (item, est) => (-est, item) }
    new GenericArrayData(sorted.map { case (item, est) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(item), est))
    })
  }

  override def serialize(buf: java.util.HashMap[String, Long]): Array[Byte] = {
    // encode each key ONCE — this runs per partial-aggregation shuffle row
    val keys = new Array[Array[Byte]](buf.size)
    val vals = new Array[Long](buf.size)
    var size = 4
    var i = 0
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      keys(i) = e.getKey.getBytes(StandardCharsets.UTF_8)
      vals(i) = e.getValue
      size += 4 + keys(i).length + 8
      i += 1
    }
    val bb = ByteBuffer.allocate(size)
    bb.putInt(buf.size)
    i = 0
    while (i < keys.length) {
      bb.putInt(keys(i).length); bb.put(keys(i)); bb.putLong(vals(i))
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val kb = new Array[Byte](len)
      bb.get(kb)
      buf.put(new String(kb, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("item", StringType),
      StructField("est_count", LongType))),
    containsNull = false)
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGriesAgg =
    copy(child = newChild)
  override def prettyName: String = "graft_heavy_hitters"
}
