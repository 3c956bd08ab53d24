package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Relational

/** Value-level + plan-shape checks for the canonical TPC-H additions
  * (q39–q46). Value tests run on tiny hand-built frames where the
  * expected answer is checkable by hand; plan tests assert the shapes
  * the Scaladoc promises on the real sf0.001 tables. */
class TpchCanonSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: String) = java.sql.Timestamp.from(java.time.Instant.parse(s))

  test("q42 (Q13): zero-order customers land in the c_count=0 bucket") {
    val spark = this.spark
    import spark.implicits._
    val customer = Seq((1L, "c1"), (2L, "c2"), (3L, "c3"))
      .toDF("c_custkey", "c_name")
    val orders = Seq(
      (10L, 1L, "1-URGENT"), (11L, 1L, "2-HIGH"),   // cust 1: 2 orders
      (12L, 2L, "5-LOW")                            // cust 2: only excluded
    ).toDF("o_orderkey", "o_custkey", "o_orderpriority")
    val out = Relational.q42TpchQ13(customer, orders).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    // c_count=0 has custs 2 and 3 (custdist 2); c_count=2 has cust 1
    assert(out == Seq((0L, 2L), (2L, 1L)), s"got $out")
  }

  test("q45 (Q17): the 5*qty*cnt < sum_qty cut matches qty < avg/5 exactly") {
    val spark = this.spark
    import spark.implicits._
    // one part, quantities 1, 9, 10, 10: avg=7.5, avg/5=1.5 -> only qty=1
    val li = Seq(
      (100L, 1.0, 1000.0), (100L, 9.0, 2000.0),
      (100L, 10.0, 3000.0), (100L, 10.0, 4000.0)
    ).toDF("l_partkey", "l_quantity", "l_extendedprice")
    val part = Seq((100L, "Brand#19")).toDF("p_partkey", "p_brand")
    val r = Relational.q45TpchQ17(li, part).collect()(0)
    assert(r.getLong(1) == 1L, s"only the qty=1 row qualifies: $r")
    // avg_yearly = 1000.00 cents-exact / 7 years
    assert(math.abs(r.getDouble(0) - 1000.0 / 7.0) < 0.01, s"got $r")
  }

  test("q46 (Q18): threshold cut is exact on integral quantities") {
    val spark = this.spark
    import spark.implicits._
    val li = Seq(
      (10L, 200.0), (10L, 101.0),  // order 10: 301 > 300 qualifies
      (11L, 150.0), (11L, 150.0)   // order 11: exactly 300 does NOT
    ).toDF("l_orderkey", "l_quantity")
    val orders = Seq((10L, 1L, ts("1996-01-01T00:00:00Z"), 5000.0),
      (11L, 1L, ts("1996-01-02T00:00:00Z"), 6000.0))
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val customer = Seq((1L, "c1")).toDF("c_custkey", "c_name")
    val out = Relational.q46TpchQ18(customer, orders, li).collect()
    assert(out.length == 1 && out(0).getLong(2) == 10L &&
      out(0).getLong(5) == 301L, s"got ${out.toSeq}")
  }

  test("q40 (Q6) plan: every predicate reaches the parquet scan, no shuffle joins") {
    val p = Relational.q40TpchQ6(Tables.lineitem(spark, TestSpark.sf))
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters"), "filters must push to the scan")
    assert(p.contains("l_shipdate") && p.contains("l_discount"),
      s"ship-date and discount predicates must be pushed:\n$p")
    assert(!p.contains("Join"), "Q6 is a pure scan — no join")
  }

  test("q39 (Q3) / q46 (Q18) plans: top-N compiles to TakeOrdered, no cartesian") {
    val q3 = Relational.q39TpchQ3(Tables.customer(spark, TestSpark.sf),
      Tables.orders(spark, TestSpark.sf), Tables.lineitem(spark, TestSpark.sf))
      .queryExecution.executedPlan.toString
    assert(q3.contains("TakeOrderedAndProject"), s"Q3 top-10 must TakeOrdered:\n$q3")
    assert(!q3.contains("CartesianProduct"))
    val q18 = Relational.q46TpchQ18(Tables.customer(spark, TestSpark.sf),
      Tables.orders(spark, TestSpark.sf), Tables.lineitem(spark, TestSpark.sf))
      .queryExecution.executedPlan.toString
    assert(q18.contains("TakeOrderedAndProject"), s"Q18 top-20 must TakeOrdered:\n$q18")
  }

  test("q47 (Q4): an order with many flagged lines counts once (semi join, not inner)") {
    val spark = this.spark
    import spark.implicits._
    val orders = Seq(
      (10L, ts("1996-02-01T00:00:00Z"), "1-URGENT"),
      (11L, ts("1996-02-02T00:00:00Z"), "1-URGENT"),
      (12L, ts("1995-01-01T00:00:00Z"), "1-URGENT")  // outside quarter
    ).toDF("o_orderkey", "o_orderdate", "o_orderpriority")
    val li = Seq((10L, "R"), (10L, "R"), (10L, "R"), (11L, "N"), (12L, "R"))
      .toDF("l_orderkey", "l_returnflag")
    val out = Relational.q47TpchQ4(orders, li).collect()
    assert(out.length == 1 && out(0).getString(0) == "1-URGENT" &&
      out(0).getLong(1) == 1L, s"got ${out.toSeq}")
  }

  test("q50 (Q22): above-average cut is strict and the anti join drops recent buyers") {
    val spark = this.spark
    import spark.implicits._
    val customer = Seq(
      (1L, 1, 100.0),   // above avg (avg=75), lapsed -> kept
      (2L, 1, 50.0),    // below avg
      (3L, 2, 100.0),   // above avg but ordered recently -> dropped
      (4L, 2, 75.0)     // exactly avg: strict cut drops it
    ).toDF("c_custkey", "c_nationkey", "c_acctbal")
    val orders = Seq((3L, ts("2001-01-01T00:00:00Z")))
      .toDF("o_custkey", "o_orderdate")
    val out = Relational.q50TpchQ22(customer, orders).collect()
    assert(out.length == 1 && out(0).getInt(0) == 1 &&
      out(0).getLong(1) == 1L && out(0).getDouble(2) == 100.0,
      s"got ${out.toSeq}")
  }

  test("q49 (Q19) plan: brand filter reaches the part scan, quantity envelope the lineitem scan") {
    val df = Relational.q49TpchQ19(Tables.lineitem(spark, TestSpark.sf),
      Tables.part(spark, TestSpark.sf))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("p_brand"), "brand predicate must reach the part side")
    assert(p.contains("GreaterThanOrEqual(l_quantity") ||
      p.contains("l_quantity"), "quantity envelope must reach the lineitem scan")
    assert(!p.contains("CartesianProduct"))
  }

  test("q41 (Q7) plan: nation/supplier dims broadcast, facts keep the shuffle spine") {
    val p = Relational.q41TpchQ7(Tables.customer(spark, TestSpark.sf),
      Tables.orders(spark, TestSpark.sf), Tables.lineitem(spark, TestSpark.sf),
      Tables.supplier(spark, TestSpark.sf), Tables.nation(spark, TestSpark.sf))
      .queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      s"supplier+nation sides must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"))
  }
}
