package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for ops Spark's builtins can't express
  * efficiently (SURVEY.md §2d). Each generates a single static call into
  * [[HashImpls]] per row, so they stay inside WholeStageCodegen spans.
  */

/** array<string> shingles → array<long> MinHash signature. */
case class MinHashSignature(child: Expression, numPerm: Int)
    extends UnaryExpression {
  require(numPerm > 0 && numPerm <= 256, "numPerm must be in 1..256")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"
  override protected def nullSafeEval(input: Any): Any =
    HashImpls.minhash(input.asInstanceOf[ArrayData], numPerm)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashImpls.minhash($c, $numPerm)")
  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** array<string> tokens → SimHash (64-bit fast path; `portable` = the
  * 60-bit md5-hash variant a SQL oracle can recompute exactly). */
case class SimHash64(child: Expression, portable: Boolean = false) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"
  override protected def nullSafeEval(input: Any): Any =
    if (portable) HashImpls.simhashPortable(input.asInstanceOf[ArrayData])
    else HashImpls.simhash(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (portable) "simhashPortable" else "simhash"
    defineCodeGen(ctx, ev, c => s"graft.functions.HashImpls.$fn($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** string → array<long> winnowing fingerprint (k-gram size, window w;
  * `portable` swaps the rolling hash for the md5 gram hash). */
case class WinnowFingerprint(child: Expression, k: Int, w: Int, portable: Boolean = false)
    extends UnaryExpression {
  require(k > 0 && w > 0)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_fingerprint"
  override protected def nullSafeEval(input: Any): Any =
    if (portable) HashImpls.winnowPortable(input.asInstanceOf[UTF8String], k, w)
    else HashImpls.winnow(input.asInstanceOf[UTF8String], k, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (portable) "winnowPortable" else "winnow"
    defineCodeGen(ctx, ev, c => s"graft.functions.HashImpls.$fn($c, $k, $w)")
  }
  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprint =
    copy(child = newChild)
}

/** string → array<string> word k-gram shingles (codegen'd single pass;
  * the HOF-composed equivalent evaluates its lambdas interpreted). */
case class ShingleStrings(child: Expression, k: Int) extends UnaryExpression {
  require(k > 0)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingle_strings"
  override protected def nullSafeEval(input: Any): Any =
    HashImpls.shingleStrings(input.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashImpls.shingleStrings($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): ShingleStrings =
    copy(child = newChild)
}

/** string → array<long> hashed k-token shingles (no string shingles).
  * `sortedDistinct` folds `sort_array(array_distinct(...))` into the
  * same kernel pass (what the set-similarity verify kernel consumes). */
case class ShingleHashes(child: Expression, k: Int,
                         sortedDistinct: Boolean = false) extends UnaryExpression {
  require(k > 0)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes"
  private def fn = if (sortedDistinct) "shingleHashesSorted" else "shingleHashes"
  override protected def nullSafeEval(input: Any): Any =
    if (sortedDistinct) HashImpls.shingleHashesSorted(input.asInstanceOf[UTF8String], k)
    else HashImpls.shingleHashes(input.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashImpls.$fn($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** array<long> element hashes → array<long> MinHash signature. */
case class MinHashFromHashes(child: Expression, numPerm: Int) extends UnaryExpression {
  require(numPerm > 0 && numPerm <= 256)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_hashes"
  override protected def nullSafeEval(input: Any): Any =
    HashImpls.minhashFromHashes(input.asInstanceOf[ArrayData], numPerm)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashImpls.minhashFromHashes($c, $numPerm)")
  override protected def withNewChildInternal(newChild: Expression): MinHashFromHashes =
    copy(child = newChild)
}

/** (long, long) → long Morton/Z-order interleave of the low `bits`
  * bits (write-time clustering key for two-dimensional layouts). */
case class ZOrder2(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits > 0 && bits <= 31)
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_zorder2"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    HashImpls.zorder2(a.asInstanceOf[Long], b.asInstanceOf[Long], bits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.HashImpls.zorder2($a, $b, $bits)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ZOrder2 =
    copy(left = l, right = r)
}

/** struct → binary: protobuf wire encoding under the struct-derived
  * descriptor — serialization inside WholeStageCodegen, no external
  * Row materialization (the UDF formulation deserializes every row). */
case class ProtoEncode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_proto_encode"
  @transient private lazy val encoder =
    new graft.schema.ProtoInternalRowEncoder(child.dataType.asInstanceOf[StructType])
  override protected def nullSafeEval(input: Any): Any =
    encoder.encode(input.asInstanceOf[InternalRow])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("protoEncoder", encoder,
      classOf[graft.schema.ProtoInternalRowEncoder].getName)
    defineCodeGen(ctx, ev, c => s"$ref.encode($c)")
  }
  override protected def withNewChildInternal(newChild: Expression): ProtoEncode =
    copy(child = newChild)
}

/** (array<long> sorted, array<long> sorted) → intersection size. */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_sorted_intersect"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    HashImpls.sortedIntersectCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.HashImpls.sortedIntersectCount($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedIntersectCount =
    copy(left = l, right = r)
}

/** (array<float>, array<float>) → cosine similarity as double. */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    HashImpls.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.HashImpls.cosine($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
}

/** array<float> → int LSH bucket from `numPlanes` random hyperplanes
  * (`planeOffset` selects an independent table for OR-amplification;
  * `portable` uses md5-derived plane coefficients reproducible in SQL). */
case class HyperplaneBucket(child: Expression, numPlanes: Int, planeOffset: Int = 0,
                            portable: Boolean = false)
    extends UnaryExpression {
  require(numPlanes > 0 && numPlanes <= 30)
  require(planeOffset >= 0)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_hyperplane_bucket"
  override protected def nullSafeEval(input: Any): Any =
    if (portable) HashImpls.hyperplaneBucketPortable(input.asInstanceOf[ArrayData], numPlanes, planeOffset)
    else HashImpls.hyperplaneBucket(input.asInstanceOf[ArrayData], numPlanes, planeOffset)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (portable) "hyperplaneBucketPortable" else "hyperplaneBucket"
    defineCodeGen(ctx, ev,
      c => s"graft.functions.HashImpls.$fn($c, $numPlanes, $planeOffset)")
  }
  override protected def withNewChildInternal(newChild: Expression): HyperplaneBucket =
    copy(child = newChild)
}

/** (array<long> xb, array<array<long>> cents) →
  * struct<dist_sq: long, list_id: long>: exact-integer nearest
  * centroid (ties → lowest index). The codegen'd static call replaces
  * an interpreted aggregate/zip_with/transform chain whose cold-JIT
  * warmup dominated the k-means Lloyd loop. */
case class NearestCentroid(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("dist_sq", LongType, nullable = false),
    StructField("list_id", LongType, nullable = false)))
  override def prettyName: String = "graft_nearest_centroid"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    HashImpls.nearestCentroid(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.HashImpls.nearestCentroid($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): NearestCentroid =
    copy(left = l, right = r)
}

/** (array<long> ids, array<double> cosines, array<array<float>> vecs)
  * → array<struct<score2,id>>: greedy MMR selection (λ = 1/2) over one
  * query's candidate pool, all comparisons in integer basis points so
  * the pick sequence is engine-portable (see HashImpls.mmrSelect). */
case class MmrSelect(first: Expression, second: Expression, third: Expression, k: Int)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  require(k > 0 && k <= 1000)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score2", LongType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_mmr"
  override protected def nullSafeEval(ids: Any, cos: Any, vecs: Any): Any =
    HashImpls.mmrSelect(ids.asInstanceOf[ArrayData], cos.asInstanceOf[ArrayData],
      vecs.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c) => s"graft.functions.HashImpls.mmrSelect($a, $b, $c, $k)")
  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): MmrSelect =
    copy(first = f, second = s, third = t)
}

/** double → order-preserving sortable long bits — the adapter that
  * lets a DOUBLE column ride the Long-keyed `graft_kll` sketch (and
  * any other rank machinery): x ≤ y ⇔ bits(x) ≤ bits(y), so order
  * statistics commute with the mapping and the sketch's rank
  * guarantees transfer verbatim. NaN canonicalizes above +∞,
  * −0.0 < +0.0 (the IEEE total order). Exact round-trip with
  * [[SortableBitsToDouble]] is spec-pinned on negatives, subnormals
  * and infinities. */
case class DoubleSortableBits(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_double_sortable_bits"
  override protected def nullSafeEval(input: Any): Any =
    HashImpls.doubleSortableBits(input.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashImpls.doubleSortableBits($c)")
  override protected def withNewChildInternal(newChild: Expression): DoubleSortableBits =
    copy(child = newChild)
}

/** long → double: exact inverse of [[DoubleSortableBits]]. */
case class SortableBitsToDouble(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_sortable_bits_to_double"
  override protected def nullSafeEval(input: Any): Any =
    HashImpls.sortableBitsToDouble(input.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashImpls.sortableBitsToDouble($c)")
  override protected def withNewChildInternal(newChild: Expression): SortableBitsToDouble =
    copy(child = newChild)
}
