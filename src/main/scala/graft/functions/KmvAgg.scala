package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded bottom-k DISTINCT accumulator: the k smallest distinct hash
  * values seen, with the dedup INSIDE the sketch — so the aggregate
  * consumes raw (duplicated) rows and never needs a key-grain distinct
  * exchange first. O(k) state, O(log k) insert; merge = insert-all
  * (bottom-k of a set union — KMV's closure property, idempotent and
  * commutative, so replayed or re-merged partials cannot move the
  * sketch). */
final class KmvBuffer(val k: Int) {
  val set = new java.util.TreeSet[java.lang.Long]()

  def insert(h: Long): Unit = {
    val boxed = java.lang.Long.valueOf(h)
    if (!set.contains(boxed)) {
      if (set.size < k) set.add(boxed)
      else if (h < set.last()) { set.pollLast(); set.add(boxed) }
    }
  }

  def mergeFrom(other: KmvBuffer): Unit = {
    val it = other.set.iterator()
    while (it.hasNext) insert(it.next())
  }
}

/** `graft_kmv(h, k)` aggregate → array<long> of the k smallest
  * distinct hashes, ascending. The KMV sketch as a first-class
  * map-side-combinable aggregate: per-partition partials hold k
  * values, duplicates collapse in-buffer, and the shuffle carries
  * partitions·k longs instead of the key domain. */
case class KmvSketch(h: Expression, k: Int,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KmvBuffer] {
  require(k > 0 && k <= 100000, "k must be in 1..100000")

  override def children: Seq[Expression] = Seq(h)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_kmv"

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buffer: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = h.eval(input)
    if (v != null) buffer.insert(v match {
      case l: Long => l
      case n: Number => n.longValue()
    })
    buffer
  }

  override def merge(buffer: KmvBuffer, input: KmvBuffer): KmvBuffer = {
    buffer.mergeFrom(input); buffer
  }

  override def eval(buffer: KmvBuffer): Any = {
    val out = new Array[Long](buffer.set.size)
    val it = buffer.set.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buffer: KmvBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + buffer.set.size * 8)
    bb.putInt(buffer.k).putInt(buffer.set.size)
    val it = buffer.set.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new KmvBuffer(bb.getInt)
    val n = bb.getInt
    var i = 0
    while (i < n) { buf.insert(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KmvSketch =
    copy(h = newChildren(0))
}
