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

  test("assignment pass is row-local: centroids broadcast, no corpus shuffle before the sort") {
    val df = Tables.embeddings(spark, TestSpark.sf)
    val p = Ann.embeddingKmeans(df, nlist = 4, iters = 1)
      .queryExecution.executedPlan.toString
    // the ONLY join is the 1-row centroid broadcast (centroids ride as
    // data, not literals — literals would recompile codegen per Lloyd
    // round); the corpus itself must never join or sort-merge
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"the corpus must never shuffle into a join:\n$p")
    assert("Join".r.findAllIn(p).size <= 1 && p.contains("BroadcastExchange"),
      s"only the 1-row centroid broadcast may join:\n$p")
    // the only shuffle exchange is the final orderBy's range partitioning
    assert("Exchange rangepartitioning".r.findAllIn(p).size <= 1 &&
      !p.contains("Exchange hashpartitioning"),
      s"assignment pass must not shuffle the corpus:\n$p")
  }

  test("deterministic: two runs produce identical assignments") {
    val df = Tables.embeddings(spark, TestSpark.sf)
    val r1 = Ann.embeddingKmeans(df, nlist = 4, iters = 2).collect().toSeq
    val r2 = Ann.embeddingKmeans(df, nlist = 4, iters = 2).collect().toSeq
    assert(r1 == r2)
  }

  test("stored-model assign face is bit-identical to the in-query face") {
    val df = Tables.embeddings(spark, TestSpark.sf)
    val dir = java.nio.file.Files.createTempDirectory("graft-km-model").toString
    Ann.buildKmeansModel(df, dir, nlist = 4, iters = 2)
    val stored = Ann.kmeansAssignStored(df, dir).collect().toSeq
    val inQuery = Ann.embeddingKmeans(df, nlist = 4, iters = 2).collect().toSeq
    assert(stored == inQuery)
  }

  test("stream face assigns micro-batches identically to batch, zero state") {
    val spark = this.spark
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val df = Tables.embeddings(spark, TestSpark.sf)
    val dir = java.nio.file.Files.createTempDirectory("graft-km-stream").toString
    Ann.buildKmeansModel(df, dir, nlist = 4, iters = 2)
    val expect = Ann.kmeansAssignStored(df, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val sample = df.limit(7).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val cents = spark.read.parquet(s"$dir/centroids").orderBy("list_id")
      .collect().map(_.getSeq[Long](1).toArray)
    val got = scala.collection.mutable.Map[Long, (Long, Long)]()
    val mem = MemoryStream[(Long, Array[Float])]
    val stream = Ann.kmeansAssignStream(
      mem.toDF().toDF("vec_id", "embedding"), cents)
    assert(stream.queryExecution.analyzed.collect {
      case p if p.nodeName.contains("Aggregate") => p
    }.isEmpty, "stream face must be stateless")
    val q = stream.writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.collect().foreach(r => got(r.getLong(0)) = (r.getLong(1), r.getLong(2)))
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-km-ck").toString)
      .start()
    try {
      mem.addData(sample.toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(got.size == 7)
    got.foreach { case (id, a) =>
      assert(a == expect(id), s"vec $id: stream $a != batch ${expect(id)}")
    }
  }

  test("cluster balance: dense clusters thin toward the quota, sparse keep everything") {
    val spark = this.spark
    import spark.implicits._
    // blob A: 160 vectors near +1; blob B: 8 vectors near -1
    def v(base: Float, jitter: Float) =
      Array.tabulate(64)(i => if (i == 0) base + jitter else jitter / 10)
    val rows = (0 until 160).map(i => (i.toLong, v(1.0f, i * 0.0005f), 0)) ++
      (0 until 8).map(i => ((1000 + i).toLong, v(-1.0f, i * 0.0005f), 0))
    val df = rows.toDF("vec_id", "embedding", "label")
    val dir = java.nio.file.Files.createTempDirectory("graft-km-bal").toString
    Ann.buildKmeansModel(df, dir, nlist = 2, iters = 3)
    val out = Ann.clusterBalance(df, dir, nlist = 2).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val (dense, sparse) = (out.maxBy(_._1), out.minBy(_._1))
    // quota = 168/4 = 42: the 160-blob thins to ~42/160 permille, the
    // 8-blob's threshold caps at 1000 and keeps all 8
    assert(sparse._2 == 1000L && sparse._3 == sparse._1,
      s"sparse cluster keeps everything: $out")
    assert(dense._2 < 1000L && dense._3 < dense._1,
      s"dense cluster must thin: $out")
  }
}
