package graft.functions

import org.apache.spark.sql.graftshim.Shims
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression

/** Column-API entry points for graft's custom Catalyst expressions. */
object F {

  /** Registers graft_* as session SQL functions (idempotent) so they
    * are also callable from spark.sql text. */
  def register(spark: SparkSession): Unit = Shims.register(spark)

  /** MinHash signature of an array<string> shingle column. */
  def minhash(shingles: Column, numPerm: Int = 128): Column =
    Shims.column(MinHashSignature(Shims.expression(shingles), numPerm))

  /** SimHash of an array<string> token column (64-bit fast path;
    * portable = 60-bit md5 variant reproducible by SQL oracles). */
  def simhash(tokens: Column, portable: Boolean = false): Column =
    Shims.column(SimHash64(Shims.expression(tokens), portable))

  /** Winnowing fingerprint set of a string column. */
  def fingerprint(text: Column, k: Int = 8, w: Int = 4, portable: Boolean = false): Column =
    Shims.column(WinnowFingerprint(Shims.expression(text), k, w, portable))

  /** Cosine similarity of two array<float> columns. */
  def cosine(a: Column, b: Column): Column =
    Shims.column(CosineSim(Shims.expression(a), Shims.expression(b)))

  /** Exact-integer nearest centroid of a bp-quantized vector against
    * an array<array<long>> centroid column → struct(dist_sq, list_id). */
  def nearestCentroid(xb: Column, cents: Column): Column =
    Shims.column(NearestCentroid(Shims.expression(xb), Shims.expression(cents)))

  /** Hashed k-token shingles straight from a string column.
    * `sortedDistinct` fuses `sort_array(array_distinct(...))` into the
    * kernel pass. */
  def shingleHashes(text: Column, k: Int = 3, sortedDistinct: Boolean = false): Column =
    Shims.column(ShingleHashes(Shims.expression(text), k, sortedDistinct))

  /** Word k-gram shingle strings (codegen'd single pass). */
  def shingleStrings(text: Column, k: Int = 3): Column =
    Shims.column(ShingleStrings(Shims.expression(text), k))

  /** Protobuf wire encoding of a struct column (descriptor derived
    * from the struct type; codegen'd). */
  def protoEncode(struct: Column): Column =
    Shims.column(ProtoEncode(Shims.expression(struct)))

  /** Morton/Z-order interleave of two long columns' low `bits` bits. */
  def zorder2(a: Column, b: Column, bits: Int = 16): Column =
    Shims.column(ZOrder2(Shims.expression(a), Shims.expression(b), bits))

  /** MinHash signature over precomputed element hashes. */
  def minhashHashed(hashes: Column, numPerm: Int = 128): Column =
    Shims.column(MinHashFromHashes(Shims.expression(hashes), numPerm))

  /** Intersection size of two sorted array<long> columns. */
  def sortedIntersect(a: Column, b: Column): Column =
    Shims.column(SortedIntersectCount(Shims.expression(a), Shims.expression(b)))

  /** Bounded top-k aggregate: array<struct<score,id>> of the k highest
    * scores (map-side partial aggregation, O(k) state per group). */
  def topk(score: Column, id: Column, k: Int): Column =
    Shims.column(TopKByScore(Shims.expression(score), Shims.expression(id), k)
      .toAggregateExpression())

  /** Greedy MMR selection (λ = 1/2) over one query's candidate pool:
    * (ids, raw cosines, vectors) → array<struct<score2,id>> in pick
    * order, score2 = integer basis points (2 × MMR score × 1e4). */
  def mmr(ids: Column, cos: Column, vecs: Column, k: Int): Column =
    Shims.column(MmrSelect(Shims.expression(ids), Shims.expression(cos),
      Shims.expression(vecs), k))

  /** Bottom-k distinct-hash aggregate (KMV sketch): array<long> of the
    * k smallest distinct values, ascending — dedup happens inside the
    * O(k) buffer, so no key-grain distinct exchange precedes it. */
  def kmvSketch(h: Column, k: Int): Column =
    Shims.column(KmvSketch(Shims.expression(h), k).toAggregateExpression())

  /** Mergeable weighted Misra–Gries aggregate: array<struct<tok,cnt>>
    * of ≤ s surviving candidates + a NULL-tok marker carrying the
    * group's total weight. O(s) state at every aggregation stage. */
  def mgSketch(key: Column, w: Column, s: Int): Column =
    Shims.column(MgSketch(Shims.expression(key), Shims.expression(w), s)
      .toAggregateExpression())

  /** Mergeable KLL-style quantile summary (deterministic alternating
    * compaction): array<struct<lvl,v>>, weight = 2^lvl. Worst-case
    * rank error certified by [[graft.operators.ScaleOps.quantileSketch]]'s
    * integer bound formula under any merge order. */
  def kllSketch(v: Column, k: Int): Column =
    Shims.column(KllSketch(Shims.expression(v), k).toAggregateExpression())

  /** Bounded collect aggregate: array<struct<id,aux>> of at most `cap`
    * of the group's pairs (complete when the group fits the cap —
    * O(cap) state per group at every aggregation stage). */
  def collectCapped(id: Column, aux: Column, cap: Int): Column =
    Shims.column(CollectCapped(Shims.expression(id), Shims.expression(aux), cap)
      .toAggregateExpression())

  /** Order-preserving sortable bits of a double column (x ≤ y ⇔
    * bits(x) ≤ bits(y)) — the adapter that puts DOUBLE columns on the
    * Long-keyed rank machinery (graft_kll). */
  def doubleSortableBits(c: Column): Column =
    Shims.column(DoubleSortableBits(Shims.expression(c)))

  /** Exact inverse of [[doubleSortableBits]]. */
  def sortableBitsToDouble(c: Column): Column =
    Shims.column(SortableBitsToDouble(Shims.expression(c)))

  /** Random-hyperplane LSH bucket id of an array<float> column. */
  def hyperplaneBucket(vec: Column, numPlanes: Int = 12, planeOffset: Int = 0,
                       portable: Boolean = false): Column =
    Shims.column(HyperplaneBucket(Shims.expression(vec), numPlanes, planeOffset, portable))
}
