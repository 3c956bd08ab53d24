package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Relational

/** q64 hierarchy rollup on a hand-built decimal trie: exact depth,
  * height and subtree sums, including multi-level chains the
  * iterative-doubling closure must cover in one round more than a
  * single self-join would. */
class HierarchySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("closure depth/height and subtree rollups are exact") {
    val spark = this.spark
    import spark.implicits._
    // trie: 1 <- 12 <- 123 <- 1234 (chain of depth 3) plus 1 <- 13;
    // values are node ids in cents for easy arithmetic
    val parts = Seq(1L, 12L, 13L, 123L, 1234L)
      .map(k => (k, k.toDouble / 100.0))
      .toDF("p_partkey", "p_retailprice")
    val out = Relational.q64HierarchyRollup(parts).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // node -> (depth, height, subtree_cents, subtree_n)
    assert(out(1L) == ((0L, 3L, 1L + 12L + 13L + 123L + 1234L, 5L)), s"$out")
    assert(out(12L) == ((1L, 2L, 12L + 123L + 1234L, 3L)))
    assert(out(13L) == ((1L, 0L, 13L, 1L)))
    assert(out(123L) == ((2L, 1L, 123L + 1234L, 2L)))
    assert(out(1234L) == ((3L, 0L, 1234L, 1L)))
  }

  test("a 19-digit-deep chain closes within the five doubling rounds") {
    val spark = this.spark
    import spark.implicits._
    // the longest chain a positive long key can produce: 19 digits
    val chain = Iterator.iterate(1L)(k => k * 10 + 1).take(19).toSeq
    val parts = chain.map(k => (k, 0.01)).toDF("p_partkey", "p_retailprice")
    val out = Relational.q64HierarchyRollup(parts).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(4))).toMap
    assert(out(chain.head) == ((0L, 18L, 19L)), s"root sees the whole chain: $out")
    assert(out(chain.last) == ((18L, 0L, 1L)), "leaf depth = 18")
  }
}
