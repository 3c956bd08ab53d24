package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Mergeable quantile summary: a KLL-style compactor stack with equal
  * level capacities and DETERMINISTIC alternating-parity compaction
  * (Karnin–Lang–Liberty FOCS'16 structure; Manku–Rajagopalan–Lindsay
  * SIGMOD'98 deterministic analysis). Level `h` holds items of weight
  * 2^h; when a level reaches `k` items it sorts, keeps one leftover
  * exact if the count is odd, and promotes every other item of the
  * even remainder to level h+1, alternating the kept parity per level.
  *
  * Worst-case rank error under ANY merge tree: one compaction at
  * level h shifts any rank query by at most 2^h (ceil-vs-floor of the
  * pair count); items ever entering level h total at most n/2^h and
  * each compaction consumes at least k−1 of them, so level h performs
  * at most n/(2^h (k−1)) compactions contributing ≤ n/(k−1) error,
  * and compactions only happen at levels with ≥ k items, i.e. up to
  * H = floor(log2(n/(k−1))). Total: ≤ (H+1)·n/(k−1), certified here
  * as bound = (H+2)·n/(k−1) with integer-exact arithmetic — the slack
  * absorbs the H=0 and leftover edge cases. Because the bound is
  * WORST-CASE (not probabilistic) and merge-order-independent, a
  * tolerance gate built on it is deterministic even though Spark's
  * final-merge arrival order is not.
  *
  * State is O(k·log(n/k)) longs at every aggregation stage —
  * map-side combinable, so the shuffle carries partials·|sketch|
  * instead of n rows (the graft_kmv shape for rank queries). */
final class KllBuffer(val k: Int) {
  require(k >= 4, "k must be >= 4")
  // level h buffer (unsorted between compactions)
  var levels = scala.collection.mutable.ArrayBuffer(
    scala.collection.mutable.ArrayBuffer.empty[Long])
  // per-level alternating keep-parity (the derandomized coin)
  var parity = scala.collection.mutable.ArrayBuffer(false)
  var n = 0L

  def insert(v: Long): Unit = {
    n += 1L
    levels(0) += v
    var h = 0
    while (h < levels.length && levels(h).length >= k) { compact(h); h += 1 }
  }

  /** Sort level h, keep the largest if odd (exact, no error), promote
    * alternating elements of the even remainder to level h+1. */
  private def compact(h: Int): Unit = {
    val buf = levels(h)
    val arr = buf.toArray
    java.util.Arrays.sort(arr)
    buf.clear()
    var m = arr.length
    if (m % 2 == 1) { buf += arr(m - 1); m -= 1 }
    if (m == 0) return
    if (h + 1 >= levels.length) {
      levels += scala.collection.mutable.ArrayBuffer.empty[Long]
      parity += false
    }
    val up = levels(h + 1)
    var i = if (parity(h)) 1 else 0
    parity(h) = !parity(h)
    while (i < m) { up += arr(i); i += 2 }
  }

  /** Level-wise concatenate, then re-compact bottom-up. The error
    * accounting above is per-compaction, so arbitrary merge trees
    * stay inside the certified bound. */
  def mergeFrom(other: KllBuffer): Unit = {
    n += other.n
    var h = 0
    while (h < other.levels.length) {
      if (h >= levels.length) {
        levels += scala.collection.mutable.ArrayBuffer.empty[Long]
        parity += false
      }
      levels(h) ++= other.levels(h)
      h += 1
    }
    h = 0
    while (h < levels.length) {
      if (levels(h).length >= k) compact(h)
      h += 1
    }
  }
}

/** `graft_kll(v, k)` aggregate → array<struct<lvl:int, v:bigint>>:
  * the summary's items with their level (weight = 2^lvl), each level
  * ascending. Rank estimation over the result is plain relational
  * code: est_rank(y) = Σ shiftleft(1, lvl) over entries with v ≤ y. */
case class KllSketch(v: Expression, k: Int,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllBuffer] {
  require(k >= 4 && k <= 65536, "k must be in 4..65536")

  override def children: Seq[Expression] = Seq(v)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("lvl", IntegerType, nullable = false),
      StructField("v", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_kll"

  override def createAggregationBuffer(): KllBuffer = new KllBuffer(k)

  // The sketch keys on LONG order. Integral inputs (byte..long) ride
  // as-is; DECIMAL gets its own arm (Spark's Decimal is not a
  // java.lang.Number) and — like DOUBLE via longValue() — TRUNCATES
  // toward zero, which reorders values inside the same integer bucket.
  // Fractional columns that need exact rank semantics go through the
  // order-preserving bits adapter instead (F.doubleSortableBits;
  // ScaleOps.quantileSketchDouble is the worked face).
  override def update(buffer: KllBuffer, input: InternalRow): KllBuffer = {
    val x = v.eval(input)
    if (x != null) buffer.insert(x match {
      case l: Long => l
      case d: org.apache.spark.sql.types.Decimal => d.toLong
      case n: Number => n.longValue()
    })
    buffer
  }

  override def merge(buffer: KllBuffer, input: KllBuffer): KllBuffer = {
    buffer.mergeFrom(input); buffer
  }

  override def eval(buffer: KllBuffer): Any = {
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    var h = 0
    while (h < buffer.levels.length) {
      val arr = buffer.levels(h).toArray
      java.util.Arrays.sort(arr)
      var i = 0
      while (i < arr.length) {
        out += new GenericInternalRow(Array[Any](h, arr(i)))
        i += 1
      }
      h += 1
    }
    new GenericArrayData(out.toArray)
  }

  override def serialize(buffer: KllBuffer): Array[Byte] = {
    val items = buffer.levels.map(_.length).sum
    val bb = ByteBuffer.allocate(4 + 8 + 4 + buffer.levels.length * (1 + 4) +
      items * 8)
    bb.putInt(buffer.k).putLong(buffer.n).putInt(buffer.levels.length)
    var h = 0
    while (h < buffer.levels.length) {
      bb.put(if (buffer.parity(h)) 1.toByte else 0.toByte)
      bb.putInt(buffer.levels(h).length)
      buffer.levels(h).foreach(bb.putLong)
      h += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KllBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new KllBuffer(bb.getInt)
    buf.n = bb.getLong
    val nl = bb.getInt
    buf.levels.clear(); buf.parity.clear()
    var h = 0
    while (h < nl) {
      buf.parity += (bb.get() == 1.toByte)
      val c = bb.getInt
      val lvl = scala.collection.mutable.ArrayBuffer.empty[Long]
      var i = 0
      while (i < c) { lvl += bb.getLong; i += 1 }
      buf.levels += lvl
      h += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KllSketch =
    copy(v = newChildren(0))
}
