package org.apache.spark.sql.graftshim

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.{Column, SparkSession}

import graft.functions._

/** Bridge into `private[sql]` Spark internals (this package is a
  * subpackage of org.apache.spark.sql, the supported extension trick).
  * Exposes Expression⇄Column conversion and registers graft's custom
  * expressions in the session's FunctionRegistry so operators can use
  * them via `functions.call_function` — analysis resolves them like any
  * builtin, keeping plans serializable and EXPLAIN-readable.
  */
object Shims {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  private def intArg(e: Expression, what: String): Int = e.eval() match {
    case i: Int => i
    case l: Long => l.toInt
    case other => throw new IllegalArgumentException(s"$what must be an int literal, got $other")
  }

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_minhash",
      args => MinHashSignature(args(0), intArg(args(1), "numPerm")), "built-in")
    reg.createOrReplaceTempFunction("graft_simhash",
      args => SimHash64(args(0)), "built-in")
    reg.createOrReplaceTempFunction("graft_fingerprint",
      args => WinnowFingerprint(args(0), intArg(args(1), "k"), intArg(args(2), "w")), "built-in")
    reg.createOrReplaceTempFunction("graft_cosine",
      args => CosineSim(args(0), args(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_sorted_intersect",
      args => SortedIntersectCount(args(0), args(1)), "built-in")
    reg.createOrReplaceTempFunction("graft_topk",
      args => TopKByScore(args(0), args(1), intArg(args(2), "k")).toAggregateExpression(),
      "built-in")
    reg.createOrReplaceTempFunction("graft_hyperplane_bucket",
      args => HyperplaneBucket(args(0), intArg(args(1), "numPlanes")), "built-in")
    reg.createOrReplaceTempFunction("graft_shingle_strings",
      args => ShingleStrings(args(0), intArg(args(1), "k")), "built-in")
    reg.createOrReplaceTempFunction("graft_shingle_hashes",
      args => ShingleHashes(args(0), intArg(args(1), "k")), "built-in")
    reg.createOrReplaceTempFunction("graft_minhash_hashes",
      args => MinHashFromHashes(args(0), intArg(args(1), "numPerm")), "built-in")
    reg.createOrReplaceTempFunction("graft_proto_encode",
      args => ProtoEncode(args(0)), "built-in")
    reg.createOrReplaceTempFunction("graft_kll",
      args => KllSketch(args(0), intArg(args(1), "k")).toAggregateExpression(),
      "built-in")
    reg.createOrReplaceTempFunction("graft_collect_capped",
      args => CollectCapped(args(0), args(1), intArg(args(2), "cap")).toAggregateExpression(),
      "built-in")
    reg.createOrReplaceTempFunction("graft_double_sortable_bits",
      args => DoubleSortableBits(args(0)), "built-in")
    reg.createOrReplaceTempFunction("graft_sortable_bits_to_double",
      args => SortableBitsToDouble(args(0)), "built-in")
  }
}
