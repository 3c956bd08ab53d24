package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Batch-B BPE (TextOps.tokenizerBpeBatched): on a chain-free corpus
  * the batched policy reproduces the sequential trainer's merges
  * exactly; rounds are ceil(merges/B); in-round selections are
  * mutually symbol-disjoint with round-grain vocab accounting. */
class BpeBatchedSpec extends AnyFunSuite {

  /** 2-letter words over disjoint alphabets with strictly decreasing
    * frequencies: no merge can chain into another, so batched and
    * sequential selection orders coincide. */
  private def chainFree = {
    val spark = TestSpark.spark
    import spark.implicits._
    val words = Seq("ab" -> 100, "cd" -> 90, "ef" -> 80, "gh" -> 70,
      "ij" -> 60, "kl" -> 50, "mn" -> 40, "op" -> 30)
    val text = words.flatMap { case (w, n) => Seq.fill(n)(w) }.mkString(" ")
    Seq((1L, text)).toDF("doc_id", "text")
  }

  test("chain-free corpus: batched merges equal the sequential trainer's, in 2 rounds instead of 8") {
    val docs = chainFree
    val seqRows = graft.operators.TextOps.tokenizerBpe(docs, merges = 8)
      .select("merge_idx", "lhs", "rhs", "merged", "pair_count")
      .collect().toSeq.map(_.toString)
    val batched = graft.operators.TextOps
      .tokenizerBpeBatched(docs, merges = 8, batchB = 4)
    val batRows = batched
      .select("merge_idx", "lhs", "rhs", "merged", "pair_count")
      .collect().toSeq.map(_.toString)
    assert(batRows == seqRows, "disjoint-frequency corpus must match sequential")
    val rounds = batched.select("merge_round").distinct().collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(rounds == Seq(1L, 2L), s"ceil(8/4) = 2 driver rounds, got $rounds")
    // B = merges -> ONE round, still the sequential merge set
    val oneRound = graft.operators.TextOps
      .tokenizerBpeBatched(docs, merges = 8, batchB = 8)
    assert(oneRound.select("merge_round").distinct().count() == 1)
    assert(oneRound.select("merge_idx", "lhs", "rhs", "merged", "pair_count")
      .collect().toSeq.map(_.toString) == seqRows)
  }

  test("real corpus: in-round selections are symbol-disjoint, counts exact, vocab round-grain") {
    val spark = TestSpark.spark
    val docs = graft.Tables.documents(spark, TestSpark.sf)
    val out = graft.operators.TextOps
      .tokenizerBpeBatched(docs, merges = 8, batchB = 4).collect().toSeq
    assert(out.size == 8)
    // mutual disjointness of {lhs, rhs, merged} within each round
    out.groupBy(_.getLong(5)).foreach { case (rnd, rows) =>
      val symSets = rows.map(r => Set(r.getString(1), r.getString(2), r.getString(3)))
      for (Seq(a, b) <- symSets.combinations(2))
        assert((a & b).isEmpty, s"round $rnd selections share symbols: $a vs $b")
      // round-grain vocab: one value per round
      assert(rows.map(_.getLong(6)).distinct.size == 1)
    }
    // merge_idx is the (round, selection) order, 1..merges
    assert(out.map(_.getLong(0)) == (1L to 8L),
      "merge_idx numbers the global selection order")
  }

  test("a hot pair rejected for overlap is deferred to the next round's snapshot, never lost") {
    val spark = TestSpark.spark
    import spark.implicits._
    // (e,r) dominates; (o,r) shares r, so round 1 must defer it; it
    // must then lead round 2 with its (unchanged) exact count
    val text = (Seq.fill(10)("er") ++ Seq.fill(8)("or") ++ Seq.fill(6)("st") ++
      Seq.fill(5)("uv") ++ Seq.fill(4)("wx")).mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val out = graft.operators.TextOps
      .tokenizerBpeBatched(docs, merges = 4, batchB = 3).collect().toSeq
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(4), r.getLong(5)))
    assert(out(0) == ((1L, "e", "r", 10L, 1L)))
    assert(out.take(3).map(t => (t._2, t._3)) == Seq(("e","r"), ("s","t"), ("u","v")),
      s"round 1 skips the overlapping (o,r): $out")
    assert(out(3) == ((4L, "o", "r", 8L, 2L)),
      s"deferred pair leads round 2 with its exact count: $out")
  }
}
