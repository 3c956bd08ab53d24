package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions._

/** `spark.sql.extensions=graft.GraftExtensions` injection point: makes
  * every graft_* function available at session build time (the
  * SparkSessionExtensions-sanctioned alternative to
  * `graft.functions.F.register(spark)` for sessions you don't build).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, what: String): Int = e.eval() match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(s"$what must be an int literal, got $other")
  }

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "", "", "", "", "", "", "built-in")

  override def apply(ext: SparkSessionExtensions): Unit = {
    def inject(name: String, usage: String, builder: FunctionBuilder): Unit =
      ext.injectFunction((FunctionIdentifier(name), info(name, usage), builder))

    inject("graft_minhash", "graft_minhash(shingles, numPerm) - MinHash signature",
      args => MinHashSignature(args(0), intArg(args(1), "numPerm")))
    inject("graft_simhash", "graft_simhash(tokens) - 64-bit SimHash",
      args => SimHash64(args(0)))
    inject("graft_fingerprint", "graft_fingerprint(text, k, w) - winnowing fingerprints",
      args => WinnowFingerprint(args(0), intArg(args(1), "k"), intArg(args(2), "w")))
    inject("graft_cosine", "graft_cosine(a, b) - cosine similarity of float vectors",
      args => CosineSim(args(0), args(1)))
    inject("graft_nearest_centroid",
      "graft_nearest_centroid(xb, cents) - exact-integer nearest centroid (dist_sq, list_id)",
      args => NearestCentroid(args(0), args(1)))
    inject("graft_sorted_intersect", "graft_sorted_intersect(a, b) - sorted long array intersection size",
      args => SortedIntersectCount(args(0), args(1)))
    inject("graft_topk", "graft_topk(score, id, k) - top-k (score,id) pairs",
      args => TopKByScore(args(0), args(1), intArg(args(2), "k")).toAggregateExpression())
    inject("graft_hyperplane_bucket", "graft_hyperplane_bucket(vec, planes) - LSH bucket",
      args => HyperplaneBucket(args(0), intArg(args(1), "numPlanes")))
    inject("graft_shingle_strings", "graft_shingle_strings(text, k) - word k-gram shingles",
      args => ShingleStrings(args(0), intArg(args(1), "k")))
    inject("graft_shingle_hashes", "graft_shingle_hashes(text, k) - hashed word k-gram shingles",
      args => ShingleHashes(args(0), intArg(args(1), "k")))
    inject("graft_minhash_hashes", "graft_minhash_hashes(hashes, numPerm) - MinHash over element hashes",
      args => MinHashFromHashes(args(0), intArg(args(1), "numPerm")))
    inject("graft_proto_encode", "graft_proto_encode(struct) - protobuf wire encoding",
      args => ProtoEncode(args(0)))
    inject("graft_kmv",
      "graft_kmv(h, k) - bottom-k distinct hashes (KMV sketch), ascending",
      args => KmvSketch(args(0), intArg(args(1), "k")).toAggregateExpression())
    inject("graft_mg",
      "graft_mg(key, w, s) - mergeable weighted Misra-Gries candidates + total marker",
      args => MgSketch(args(0), args(1), intArg(args(2), "s")).toAggregateExpression())
    inject("graft_kll",
      "graft_kll(v, k) - mergeable KLL quantile summary: (lvl, v) items, weight 2^lvl",
      args => KllSketch(args(0), intArg(args(1), "k")).toAggregateExpression())
    inject("graft_collect_capped",
      "graft_collect_capped(id, aux, cap) - at most cap (id,aux) pairs per group",
      args => CollectCapped(args(0), args(1), intArg(args(2), "cap")).toAggregateExpression())

    // optimizer rule: pin the broadcast of provably <=1-row join sides
    // (global aggregates, LIMIT 1) at PLAN time — size estimates
    // over-state them until AQE observes the real output
    ext.injectOptimizerRule(_ => graft.plans.BroadcastScalarAgg)
  }
}
