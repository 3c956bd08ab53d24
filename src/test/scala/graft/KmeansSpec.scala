package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Ann

/** Lloyd k-means: separation on planted blobs + the plan promise that
  * assignment is row-local (centroids are literals — no join, no
  * corpus shuffle in the final assignment pass). */
class KmeansSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("two planted blobs separate into two clusters; within-blob ids agree") {
    val spark = this.spark
    import spark.implicits._
    // blob A near (1, 0, ...), blob B near (-1, 0, ...): 64-dim floats
    def v(base: Float, jitter: Float) =
      Array.tabulate(64)(i => if (i == 0) base + jitter else jitter / 10)
    val rows = (0 until 20).map { i =>
      val (base, j) = if (i < 10) (1.0f, i * 0.001f) else (-1.0f, (i - 10) * 0.001f)
      (i.toLong, v(base, j), 0)
    }
    val df = rows.toDF("vec_id", "embedding", "label")
    val out = Ann.embeddingKmeans(df, nlist = 2, iters = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val a = (0L until 10L).map(out).toSet
    val b = (10L until 20L).map(out).toSet
    assert(a.size == 1 && b.size == 1 && a != b,
      s"blobs must land in two distinct clusters: $out")
  }

  test("assignment pass is row-local: no join, no corpus shuffle before the sort") {
    val df = Tables.embeddings(spark, TestSpark.sf)
    val p = Ann.embeddingKmeans(df, nlist = 4, iters = 1)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"assignment must not join the corpus:\n$p")
    // the only exchange is the final orderBy's range partitioning
    val ex = "Exchange".r.findAllIn(p).size
    assert(ex <= 1, s"assignment pass must not shuffle the corpus (got $ex):\n$p")
  }

  test("deterministic: two runs produce identical assignments") {
    val df = Tables.embeddings(spark, TestSpark.sf)
    val r1 = Ann.embeddingKmeans(df, nlist = 4, iters = 2).collect().toSeq
    val r2 = Ann.embeddingKmeans(df, nlist = 4, iters = 2).collect().toSeq
    assert(r1 == r2)
  }
}
