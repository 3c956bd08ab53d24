package graft

import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the driver's t1 smoke: entry() on sf0.001 returns rows. */
class EntrySpec extends AnyFunSuite {
  test("entry returns a non-empty flagship result") {
    val df = SparkEntry.entry(TestSpark.spark)
    assert(df.count() > 0)
    assert(df.columns.toSet == Set("lang_pred", "split", "n_docs", "avg_quality"))
  }

  test("every oracleSql key has a queries entry (driver contract invariant)") {
    val qs = SparkEntry.queries.keySet
    val missing = SparkEntry.oracleSql.keySet.diff(qs)
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("every queries entry has an oracle (full-coverage invariant)") {
    val unoracled = SparkEntry.queries.keySet.diff(SparkEntry.oracleSql.keySet)
    assert(unoracled.isEmpty,
      s"queries without oracles (add SQL or a documented [rows] exception): $unoracled")
  }
}
