package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded collect buffer: keeps at most `cap` (id, aux) pairs, drops
  * the rest. Growable primitive arrays, O(cap) memory per group no
  * matter how hot the key. */
final class CappedBuffer(val cap: Int) {
  var ids = new Array[Long](math.min(cap, 8))
  var aux = new Array[Long](math.min(cap, 8))
  var size = 0

  def add(id: Long, a: Long): Unit = {
    if (size < cap) {
      if (size == ids.length) {
        val n = math.min(cap, ids.length * 2)
        ids = java.util.Arrays.copyOf(ids, n)
        aux = java.util.Arrays.copyOf(aux, n)
      }
      ids(size) = id
      aux(size) = a
      size += 1
    }
  }

  def mergeFrom(other: CappedBuffer): Unit = {
    var i = 0
    while (i < other.size && size < cap) { add(other.ids(i), other.aux(i)); i += 1 }
  }
}

/** `graft_collect_capped(id, aux, cap)` → array<struct<id,aux>> holding
  * at most `cap` of the group's pairs (an arbitrary subset beyond the
  * cap). Groups of size <= cap collect completely; larger groups yield
  * exactly `cap` elements — which is all a df-cap needs: with
  * cap = maxDocFreq + 1, `size(...) <= maxDocFreq` distinguishes
  * "keep every member" from "boilerplate, discard" without ever holding
  * an unbounded hot-key bucket. TypedImperativeAggregate gives map-side
  * partial aggregation and the partial buffers are capped too, so a
  * gram shared by millions of documents costs O(cap) memory at every
  * stage — the property that lets the fingerprint inverted index run as
  * one linear groupBy at 100 TB instead of a windowed self-join. */
case class CollectCapped(id: Expression, aux: Expression, cap: Int,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CappedBuffer] {
  require(cap > 0 && cap <= (1 << 20), "cap must be in 1..2^20")

  override def children: Seq[Expression] = Seq(id, aux)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("aux", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_collect_capped"

  override def createAggregationBuffer(): CappedBuffer = new CappedBuffer(cap)

  override def update(buffer: CappedBuffer, input: InternalRow): CappedBuffer = {
    val i = id.eval(input)
    val a = aux.eval(input)
    if (i != null && a != null) {
      buffer.add(i.asInstanceOf[Number].longValue(), a.asInstanceOf[Number].longValue())
    }
    buffer
  }

  override def merge(buffer: CappedBuffer, input: CappedBuffer): CappedBuffer = {
    buffer.mergeFrom(input)
    buffer
  }

  override def eval(buffer: CappedBuffer): Any = {
    val rows = new Array[Any](buffer.size)
    var i = 0
    while (i < buffer.size) { rows(i) = InternalRow(buffer.ids(i), buffer.aux(i)); i += 1 }
    new GenericArrayData(rows)
  }

  override def serialize(buffer: CappedBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + buffer.size * 16)
    bb.putInt(buffer.cap).putInt(buffer.size)
    var i = 0
    while (i < buffer.size) { bb.putLong(buffer.ids(i)).putLong(buffer.aux(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): CappedBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new CappedBuffer(bb.getInt)
    val n = bb.getInt
    var i = 0
    while (i < n) { buf.add(bb.getLong, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CollectCapped =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CollectCapped =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): CollectCapped =
    copy(id = newChildren(0), aux = newChildren(1))
}
