package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Ann, Dedup, ScaleOps}

/** Round-7 curation/pre-flight operators: kNN label propagation on
  * planted blobs, quality-aware dup-cluster keeper, and the exact
  * join pre-flight. */
class CurationOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("label propagation recovers planted blob labels") {
    val spark = this.spark
    import spark.implicits._
    def v(base: Float, j: Float) =
      Array.tabulate(64)(i => if (i == 0) base + j else j / 10)
    // ids 0-29 -> blob A label 0, ids 30-59 -> blob B label 1; the
    // stride-50 query set is {0, 50}, one per blob
    val rows = (0 until 60).map { i =>
      val (base, lbl) = if (i < 30) (1.0f, 0) else (-1.0f, 1)
      (i.toLong, v(base, (i % 30) * 0.001f), lbl)
    }
    val emb = rows.toDF("vec_id", "embedding", "label")
    val out = Ann.embeddingLabelProp(emb).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(4))).toMap
    assert(out.keySet == Set(0L, 50L))
    assert(out(0L) == ((0L, true)), "blob-A query must vote label 0")
    assert(out(50L) == ((1L, true)), "blob-B query must vote label 1")
  }

  test("best keeper picks the higher-quality doc, not the min id") {
    val spark = this.spark
    import spark.implicits._
    // two near-dup families; in each the LATER doc repeats stopwords
    // already present in the base (identical distinct-token set, so
    // shingle jaccard stays ~1 while the stopword RATIO — and with it
    // p_keep — rises), so min-id would pick the lower-quality copy
    val base = "the quick brown fox jumps over the lazy dog and runs to the " +
      "river in the morning light where a bird is singing of summer"
    val stops = " the a of and to in is the a of and to in is"
    // short enough that base+junk+stops stays inside one floor(n/100)
    // length block of the blocked-jaccard candidate generator
    val junk = "zz yy xx ww vv uu tt ss rr qq "
    val docs = Seq(
      (1L, base + " xq"), // family 1, one novel token, lower quality
      (2L, base + stops),
      (10L, junk + base),
      (11L, junk + base + stops))
      .map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Dedup.dedupBestKeeper(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out.size == 2, s"two clusters expected: $out")
    // keeper is the richer doc (2 and 11), not the min id (1 and 10)
    assert(out(1L)._2 == 2L, s"cluster 1 keeper: $out")
    assert(out(10L)._2 == 11L, s"cluster 10 keeper: $out")
  }

  test("leakage-safe split keeps whole dup clusters in one split") {
    val spark = this.spark
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog and runs to the " +
      "river in the morning light where a bird is singing of summer"
    val stops = " the a of and to in is the a of and to in is"
    // one dup family (1, 2) + singletons spread over many ids so both
    // splits are populated
    val docs = (Seq((1L, base + " xq"), (2L, base + stops)) ++
      (100 until 140).map(i => (i.toLong, s"unique document number $i with its own words $i")))
      .map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Dedup.leakageSafeSplit(docs).collect()
    val bySplit = out.map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out.forall(_.getLong(3) == 0L),
      s"no cluster may span splits: ${out.toSeq}")
    assert(bySplit.values.map(_._1).sum == 42L, "every doc assigned")
    // the dup family must be in ONE split: total docs - total clusters
    // = 1 (the one merged pair), and that surplus sits inside a single
    // split's (n_docs - n_clusters)
    val surplus = bySplit.values.map(v => v._1 - v._2)
    assert(surplus.sum == 1L && surplus.count(_ > 0) == 1,
      s"the dup pair travels together: $bySplit")
  }

  test("join pre-flight cardinality is exact and advice thresholds fire") {
    val spark = this.spark
    import spark.implicits._
    // hot key 7 on both sides: 51x20 = 1020 of 1057 join rows -> salt
    val left = ((1 to 38).map(i => (i.toLong, "x")) ++
      (1 to 50).map(_ => (7L, "x"))).toDF("k", "pay")
    val right = ((1 to 38).map(i => (i.toLong, "y")) ++
      (1 to 19).map(_ => (7L, "y")) ++ Seq((999L, "y"))).toDF("k2", "pay2")
    val exact = left.join(right, col("k") === col("k2")).count()
    val row = ScaleOps.joinPreflight(left, "k", right, "k2", broadcastMax = 10L)
      .collect()(0)
    assert(row.getLong(0) == exact, "join_rows must equal the real join count")
    assert(row.getLong(4) == 51L * 20L, "hot key contribution")
    assert(row.getString(6) == "salt", s"dominant key must advise salting: $row")
    val bcast = ScaleOps.joinPreflight(left, "k", right, "k2",
      broadcastMax = 1000L).collect()(0)
    assert(bcast.getString(6) == "broadcast")
  }
}
