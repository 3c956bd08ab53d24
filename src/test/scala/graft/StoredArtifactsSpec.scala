package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** The stored-artifact key must change — forcing a rebuild — whenever
  * the data changes, even at IDENTICAL row counts (the r6 staleness
  * hazard: regenerated testdata with the same counts silently served a
  * stale index under the old (path, rowCount, params) key), and
  * whenever the build algorithm version bumps. */
class StoredArtifactsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def dir(rows: Seq[Long]): String = {
    val spark = this.spark
    import spark.implicits._
    StoredArtifacts.contentKeyedDir("graft-test-family",
      rows.toDF("id"), "sfX", "-p1")
  }

  test("same data -> same key (deterministic, order-independent)") {
    assert(dir(Seq(1L, 2L, 3L, 64L, 128L)) == dir(Seq(128L, 64L, 3L, 2L, 1L)))
  }

  test("changed values at identical row count -> different key (rebuild)") {
    // a regeneration perturbs essentially every row (the events ns/us
    // layout change), so the 1/64 content sample sees disjoint values
    val a = dir(0L until 4096L)
    val b = dir((0L until 4096L).map(_ * 2 + 1000000L))
    assert(a != b, s"regenerated data with equal row count must re-key: $a")
  }

  test("row count and algo version are both in the key") {
    val d = dir(Seq(1L, 2L))
    assert(d.contains("-n2") && d.contains(s"-v${StoredArtifacts.AlgoVersion}-"))
    assert(d.endsWith("-p1"))
  }
}
