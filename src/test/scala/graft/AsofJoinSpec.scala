package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Relational

/** q63 as-of join semantics on a hand-built timeline: inclusive
  * at-or-before, equal-instant event_id tie-break, NULL before the
  * first event, exact integer staleness. */
class AsofJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("as-of picks the latest at-or-before event with id tie-breaks") {
    val spark = this.spark
    import spark.implicits._
    val events = Seq(
      (1L, "2024-01-01 00:00:10", 1L, "A"),
      (1L, "2024-01-01 00:00:20", 2L, "B"),
      (1L, "2024-01-01 00:00:20", 3L, "C"), // equal instant: id 3 wins
      (2L, "2024-01-01 00:01:00", 4L, "D"))
      .toDF("user_id", "s", "event_id", "event_type")
      .select(col("user_id"), to_timestamp(col("s")).as("ts"),
        col("event_id"), col("event_type"))
    val orders = Seq(
      (101L, 1L, "2024-01-01 00:00:05"), // before any event -> NULL
      (102L, 1L, "2024-01-01 00:00:10"), // at-or-before is inclusive -> e1
      (103L, 1L, "2024-01-01 00:00:25"), // equal-ts pair resolved by id -> e3
      (104L, 3L, "2024-01-01 00:05:00")) // user with no events -> NULL
      .toDF("o_orderkey", "o_custkey", "s")
      .select(col("o_orderkey"), col("o_custkey"),
        to_timestamp(col("s")).as("o_orderdate"))
    val out = Relational.q63AsofJoin(events, orders).collect()
      .map(r => r.getLong(0) -> (Option(r.get(3)), Option(r.get(4)), Option(r.get(5))))
      .toMap
    assert(out(101L) == ((None, None, None)))
    assert(out(102L) == ((Some(1L), Some("A"), Some(0L))))
    assert(out(103L) == ((Some(3L), Some("C"), Some(5000000L))))
    assert(out(104L) == ((None, None, None)))
  }
}
