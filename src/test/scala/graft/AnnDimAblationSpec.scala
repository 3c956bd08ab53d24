package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The prefix-dimension recall curve: the full-width row is recall
  * 10000 by construction; when the WHOLE signal lives in the first 8
  * dimensions (zero tail) the d=8 prefix reproduces the full-dim
  * ranking exactly; and when the prefix carries no discriminating
  * signal the early-width recall collapses — the two poles the
  * ablation curve interpolates on real embeddings. */
class AnnDimAblationSpec extends AnyFunSuite {

  test("full width exact; zero-tail corpus is perfect at d=8; uninformative prefix collapses") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    // all signal in dims 0..7, dims 8..63 exactly zero: full-dim
    // cosine IS prefix cosine, so every width >= 8 must be exact
    val prefixOnly = (0 until 400).map { i =>
      val c = i % 4
      val v = Array.tabulate(64) { j =>
        if (j < 8) (if (j % 4 == c) 10f else 1f) + 0.5f * rnd.nextGaussian().toFloat
        else 0f
      }
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
    val curve = graft.operators.Ann
      .annDimAblation(prefixOnly, k = 5, stride = 40)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    assert(curve(64L) == 10000L, "full width must be the exact self-check")
    assert(curve(8L) == 10000L && curve(16L) == 10000L && curve(32L) == 10000L,
      s"a zero tail makes every prefix >= the signal width exact: $curve")

    // identical prefix for every vector (no discriminating signal
    // before dim 56): the d=8 chain ranks by tie-break alone
    val tailOnly = (0 until 400).map { i =>
      val c = i % 4
      val v = Array.tabulate(64) { j =>
        if (j >= 56) (if (j % 4 == c) 10f else 1f) + 0.5f * rnd.nextGaussian().toFloat
        else if (j == 0) 1f else 0f
      }
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
    val tailCurve = graft.operators.Ann
      .annDimAblation(tailOnly, k = 5, stride = 40)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    assert(tailCurve(64L) == 10000L)
    assert(tailCurve(8L) < 2000L,
      s"an uninformative prefix must collapse early recall: $tailCurve")
    assert(tailCurve(8L) < curve(8L))
  }
}
