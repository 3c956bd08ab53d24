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

  test("q57 (Q21): the collapsed per-order aggregate equals the literal exists/not-exists dataflow") {
    import org.apache.spark.sql.functions._
    val li = Tables.lineitem(spark, TestSpark.sf)
    val orders = Tables.orders(spark, TestSpark.sf)
    val supplier = Tables.supplier(spark, TestSpark.sf)
    // naive shape: distinct (order, supplier) pairs; late pairs; sole-late
    // via anti join against other-supplier late pairs; multi-supplier via
    // semi join — three joins where q57 runs one aggregate
    val joined = li.select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      .join(orders.filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
    val allPairs = joined.select(col("l_orderkey"), col("l_suppkey")).distinct()
    val latePairs = joined
      .filter(datediff(col("l_shipdate"), col("o_orderdate")) > 90)
      .select(col("l_orderkey"), col("l_suppkey")).distinct()
    val multi = allPairs.groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("ns")).filter(col("ns") >= 2).select(col("l_orderkey"))
    val naive = latePairs.as("a")
      .join(latePairs.as("b"),
        col("a.l_orderkey") === col("b.l_orderkey") &&
          col("a.l_suppkey") =!= col("b.l_suppkey"), "left_anti")
      .join(multi, Seq("l_orderkey"), "left_semi")
      .groupBy(col("l_suppkey")).agg(count(lit(1)).as("numwait"))
      .join(supplier.select(col("s_suppkey"), col("s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_name"), col("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .collect().toSeq
    val fused = Relational.q57TpchQ21(li, orders, supplier).collect().toSeq
    assert(fused == naive, s"fused:\n$fused\nnaive:\n$naive")
  }

  test("q51 (Q2): the window-min formulation equals groupBy-min + join") {
    import org.apache.spark.sql.functions._
    val li = Tables.lineitem(spark, TestSpark.sf)
    val part = Tables.part(spark, TestSpark.sf)
    val supplier = Tables.supplier(spark, TestSpark.sf)
    val nation = Tables.nation(spark, TestSpark.sf)
    val region = Tables.region(spark, TestSpark.sf)
    val out = Relational.q51TpchQ2(li, part, supplier, nation, region).collect().toSeq
    // re-derive with the subquery shape: per-part min over the SAME
    // qualified (cost x part x regional supplier) table, then equi-join
    val unitMc = expr(
      "(CAST(round(l_extendedprice * 100) AS BIGINT) * 1000) div CAST(l_quantity AS BIGINT)")
    val cost = li.select(col("l_partkey"), col("l_suppkey"), unitMc.as("unit_mc"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(col("unit_mc")).as("cost_mc"))
    val supp = supplier
      .join(nation.join(region.filter(col("r_name") === "EUROPE"),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
    val qual = cost
      .join(part.filter(col("p_type") === "SMALL" && col("p_size") <= 10)
        .select(col("p_partkey"), col("p_name")),
        col("l_partkey") === col("p_partkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
    val mins = qual.groupBy(col("p_partkey").as("mk")).agg(min(col("cost_mc")).as("min_mc"))
    val naive = qual.join(mins,
        col("p_partkey") === col("mk") && col("cost_mc") === col("min_mc"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("p_name"), col("cost_mc"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
      .limit(100).collect().toSeq
    assert(out == naive, s"window-min and join-min disagree")
  }

  test("q53 (Q11): the above-average cut is strict and nation-scoped") {
    val spark = this.spark
    import spark.implicits._
    // nation 3 suppliers 1,2; nation 0 supplier 9 (excluded). Part
    // values from nation-3 lines: p100=20.00, p101=2.00, p102=1.00,
    // p103=1.00 -> n=4, total=24.00: only 20.00*4 > 3*24 qualifies.
    // p104 has value ONLY from the excluded nation and must not appear.
    val li = Seq(
      (100L, 1L, 20.0), (101L, 2L, 2.0), (102L, 1L, 1.0), (103L, 2L, 1.0),
      (104L, 9L, 500.0)
    ).toDF("l_partkey", "l_suppkey", "l_extendedprice")
    val supplier = Seq((1L, 3L), (2L, 3L), (9L, 0L)).toDF("s_suppkey", "s_nationkey")
    val nation = Seq((3L, "NATION_3"), (0L, "NATION_0")).toDF("n_nationkey", "n_name")
    val out = Relational.q53TpchQ11(li, supplier, nation).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == Seq((100L, 2000L)), s"got $out")
  }

  test("q54 (Q12): lag buckets split on exact day boundaries; priority split is total") {
    val spark = this.spark
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.from(java.time.Instant.parse(s))
    val d0 = "2000-01-01T00:00:00Z"
    def shift(days: Int) = java.sql.Timestamp.from(
      java.time.Instant.parse(d0).plus(java.time.Duration.ofDays(days.toLong)))
    val orders = Seq(
      (1L, ts(d0), "1-URGENT"), (2L, ts(d0), "5-LOW"), (3L, ts(d0), "2-HIGH"),
      (4L, ts(d0), "3-MEDIUM"), (5L, ts(d0), "4-NOT SPECIFIED")
    ).toDF("o_orderkey", "o_orderdate", "o_orderpriority")
    val li = Seq(
      (1L, shift(30)),   // fast (boundary), high
      (2L, shift(31)),   // normal (boundary), low
      (3L, shift(90)),   // normal (boundary), high
      (4L, shift(91)),   // late (boundary), low
      (5L, shift(-1))    // early, low
    ).toDF("l_orderkey", "l_shipdate")
    val out = Relational.q54TpchQ12(li, orders).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq(("early", 0L, 1L), ("fast", 1L, 0L),
      ("late", 0L, 1L), ("normal", 1L, 1L)), s"got $out")
  }

  test("q56 (Q20): dominance is strict — an exact half does not qualify") {
    val spark = this.spark
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.from(java.time.Instant.parse(s))
    val d = ts("1997-06-01T00:00:00Z")
    val li = Seq(
      // part 100: supplier 1 ships 6 of 10 -> 12 > 10 qualifies
      (100L, 1L, 6.0, d), (100L, 2L, 4.0, d),
      // part 101: suppliers split 5/5 -> 10 > 10 is FALSE for both
      (101L, 1L, 5.0, d), (101L, 2L, 5.0, d),
      // part 102: outside the ship year -> ignored entirely
      (102L, 2L, 50.0, ts("1995-01-01T00:00:00Z"))
    ).toDF("l_partkey", "l_suppkey", "l_quantity", "l_shipdate")
    val part = Seq((100L, "blue bolt"), (101L, "blue gear"), (102L, "blue cog"))
      .toDF("p_partkey", "p_name")
    val supplier = Seq((1L, "s1", 3L), (2L, "s2", 3L))
      .toDF("s_suppkey", "s_name", "s_nationkey")
    val nation = Seq((3L, "NATION_3")).toDF("n_nationkey", "n_name")
    val out = Relational.q56TpchQ20(li, part, supplier, nation).collect()
      .map(r => (r.getLong(0), r.getLong(3))).toSeq
    assert(out == Seq((1L, 1L)), s"only supplier 1 dominates exactly one part: $out")
  }

  test("q58 (SCD2): intervals tile half-open per user, exactly one current version") {
    import org.apache.spark.sql.functions._
    val out = Relational.q58Scd2(Tables.events(spark, TestSpark.sf))
    // exactly one open-ended (current) version per user
    val perUser = out.groupBy(col("user_id"))
      .agg(sum(when(col("is_current"), 1L).otherwise(0L)).as("n_cur"),
        count(lit(1)).as("n_ver"), max(col("version")).as("max_ver"))
    assert(perUser.filter(col("n_cur") =!= 1L).isEmpty, "each user needs exactly one current row")
    // versions are dense 1..n
    assert(perUser.filter(col("n_ver") =!= col("max_ver")).isEmpty, "versions must be dense")
    // half-open tiling: every non-current valid_to equals the next
    // version's valid_from, and intervals never overlap or gap
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("version"))
    val bad = out.withColumn("next_from", lead(col("valid_from_us"), 1).over(w))
      .filter(col("next_from").isNotNull && col("valid_to_us") =!= col("next_from"))
    assert(bad.isEmpty, "valid_to must equal the successor's valid_from")
    // consecutive versions never share a state (runs are maximal)
    val same = out.withColumn("next_state", lead(col("state"), 1).over(w))
      .filter(col("next_state").isNotNull && col("state") === col("next_state"))
    assert(same.isEmpty, "adjacent versions with equal state mean a run failed to collapse")
  }

  test("q59 (gapfill): full grid, zero-filled gaps, LOCF carries the last state forward") {
    val spark = this.spark
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.from(java.time.Instant.parse(s))
    val events = Seq(
      // user 1: events on day 1 and day 4 of a 5-day global span
      (1L, 1L, ts("2024-01-01T10:00:00Z"), "view", 1.0),
      (1L, 2L, ts("2024-01-01T11:00:00Z"), "click", 2.5),
      (1L, 3L, ts("2024-01-04T09:00:00Z"), "purchase", 10.0),
      // user 2: a single event on day 5 (defines the span's far edge)
      (2L, 4L, ts("2024-01-05T08:00:00Z"), "view", 0.5)
    ).toDF("user_id", "event_id", "ts", "event_type", "value")
    val out = Relational.q59Gapfill(events).collect()
      .map(r => (r.getLong(0), r.getDate(1).toString, r.getLong(2),
        r.getLong(3), Option(r.getString(4)))).toSeq
    assert(out.length == 10, s"2 users x 5 days: $out")
    val u1 = out.filter(_._1 == 1L)
    // day 1: two events, 350 cents, last state = click (latest ts wins)
    assert(u1(0) == ((1L, "2024-01-01", 2L, 350L, Some("click"))), s"$u1")
    // days 2-3: zero-filled, click carried forward
    assert(u1(1) == ((1L, "2024-01-02", 0L, 0L, Some("click"))))
    assert(u1(2) == ((1L, "2024-01-03", 0L, 0L, Some("click"))))
    // day 4: purchase becomes the new carried state through day 5
    assert(u1(3) == ((1L, "2024-01-04", 1L, 1000L, Some("purchase"))))
    assert(u1(4) == ((1L, "2024-01-05", 0L, 0L, Some("purchase"))))
    // user 2: leading gap days have NO state to carry -> null
    val u2 = out.filter(_._1 == 2L)
    assert(u2.take(4).forall(r => r._3 == 0L && r._5.isEmpty), s"$u2")
    assert(u2(4) == ((2L, "2024-01-05", 1L, 50L, Some("view"))))
  }

  test("q60 (SCD2 PIT): interval probes hit the right version, pre-history probes are NULL") {
    val spark = this.spark
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.from(java.time.Instant.parse(s))
    // span 00:00 .. 08:00 -> probes at exactly 02:00, 04:00, 06:00
    val events = Seq(
      (1L, 1L, ts("2024-01-01T00:00:00Z"), "a"),
      (1L, 2L, ts("2024-01-01T03:00:00Z"), "b"),
      (1L, 3L, ts("2024-01-01T08:00:00Z"), "b"),
      // user 2 appears only at 05:00 -> probes 1 & 2 predate history
      (2L, 4L, ts("2024-01-01T05:00:00Z"), "x")
    ).toDF("user_id", "event_id", "ts", "event_type")
    val out = Relational.q60Scd2Pit(events).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        Option(r.getString(4)))).toSeq
    assert(out.length == 6, s"2 users x 3 probes, one row each: $out")
    assert(out(0) == ((1L, 1L, Some(1L), Some("a"))), s"probe inside v1: $out")
    assert(out(1) == ((1L, 2L, Some(2L), Some("b"))), s"probe inside open v2: $out")
    assert(out(2) == ((1L, 3L, Some(2L), Some("b"))))
    assert(out(3) == ((2L, 1L, None, None)), s"pre-history probe must be NULL: $out")
    assert(out(4) == ((2L, 2L, None, None)))
    assert(out(5) == ((2L, 3L, Some(1L), Some("x"))))
  }

  test("q61 (MERGE): update adds deltas, matched tombstone drops, unmatched inserts and no-ops") {
    val spark = this.spark
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.from(java.time.Instant.parse(s))
    val customer = Seq((2L, 100.00), (4L, 50.00), (34L, 75.00), (5L, 20.00))
      .toDF("c_custkey", "c_acctbal") // snapshot keeps even keys: 2, 4, 34
    val orders = Seq(
      (2L, 10.00, ts("1997-06-01T00:00:00Z")),   // matched upsert
      (3L, 7.50, ts("1997-02-01T00:00:00Z")),    // unmatched -> insert
      (34L, 5.00, ts("1997-03-01T00:00:00Z")),   // 34 % 17 = 0: matched tombstone -> drop
      (17L, 9.00, ts("1997-04-01T00:00:00Z")),   // unmatched tombstone -> no-op
      (4L, 99.00, ts("1996-06-01T00:00:00Z")))   // outside the window -> 4 stays 'kept'
      .toDF("o_custkey", "o_totalprice", "o_orderdate")
    val out = Relational.q61MergeUpsert(customer, orders).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(out == Seq((2L, 11000L, "updated"), (3L, 750L, "inserted"),
      (4L, 5000L, "kept")), s"merge actions wrong: $out")
  }

  test("feature matrix: features see only data <= T, the label only (T, T+7d]") {
    val spark = this.spark
    import spark.implicits._
    val t0 = java.time.Instant.parse("2024-01-01T00:00:00Z")
    def at(days: Double) = java.sql.Timestamp.from(t0.plusSeconds((days * 86400).toLong))
    // span 0..40d -> probes at exactly +10d, +20d, +30d
    val events = Seq(
      (1L, 1L, at(0), "a", 1.00),
      (1L, 2L, at(9.5), "b", 2.00),
      (1L, 3L, at(24), "c", 4.00),
      (1L, 4L, at(40), "d", 8.00),
      (2L, 5L, at(35), "x", 16.00)
    ).toDF("user_id", "event_id", "ts", "event_type", "value")
    val out = Relational.pipelineFeatureMatrix(events).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((Option(r.getString(3)), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    // user 1 @+10d: trailing (3d,10d] has e2; LTV e1+e2; next event at
    // +24d is beyond the 7d label window -> label 0
    assert(out((1L, 1L)) == ((Some("b"), 1L, 300L, 0L)), s"$out")
    // @+20d: quiet week, but e3 at +24d lands in (20d,27d] -> label 1
    assert(out((1L, 2L)) == ((Some("b"), 0L, 300L, 1L)))
    // @+30d: e3 in the trailing week and in LTV; e4 at +40d is past
    // the label window -> 0
    assert(out((1L, 3L)) == ((Some("c"), 1L, 700L, 0L)))
    // user 2 exists only at +35d: all-zero features, NULL state,
    // label fires only for the +30d probe
    assert(out((2L, 1L)) == ((None, 0L, 0L, 0L)))
    assert(out((2L, 2L)) == ((None, 0L, 0L, 0L)))
    assert(out((2L, 3L)) == ((None, 0L, 0L, 1L)))
  }

  test("q62 (A/B): planted arm effect is significant; hash-split null is not") {
    val spark = this.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def ts(s: String) = java.sql.Timestamp.from(java.time.Instant.parse(s))
    // recover each user's hash arm, then give arm 0 a 100% effect
    val ids = (1L to 200L)
    val arms = ids.toDF("user_id")
      .withColumn("arm", pmod(conv(substring(md5(concat(col("user_id")
        .cast("string"), lit(":ab"))), 1, 15), 16, 10).cast("long"), lit(2L)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val effect = ids.map(i => (i, i,
      ts("2024-01-01T00:00:00Z"),
      if (arms(i) == 0L) "purchase" else "view"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val r = Relational.q62AbTest(effect).head()
    assert(r.getLong(4) == 10000L && r.getLong(5) == 0L,
      s"arm 0 converts fully, arm 1 never: $r")
    assert(r.getBoolean(7), s"a 100% effect must be significant: $r")
    // null calibration: identical behavior in both arms -> NOT significant
    val nul = ids.map(i => (i, i, ts("2024-01-01T00:00:00Z"),
      if (i % 2 == 0) "purchase" else "view"))
      .toDF("user_id", "event_id", "ts", "event_type")
    val rn = Relational.q62AbTest(nul).head()
    assert(!rn.getBoolean(7), s"hash-independent 50/50 must not be significant: $rn")
  }

  test("q52 (Q9): the 80% cost stand-in truncates exactly like the oracle's integer div") {
    val spark = this.spark
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.from(java.time.Instant.parse(s))
    // retail 9.99 -> 999 cents -> *4 div 5 = 799 (exact trunc, not 799.2)
    // one line: qty 2, ext 100.00, disc 0 -> rev 10000c, cost 1598c
    val li = Seq((1L, 100L, 1L, 2.0, 100.0, 0.0))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount")
    val orders = Seq((1L, ts("1996-03-01T00:00:00Z"))).toDF("o_orderkey", "o_orderdate")
    val part = Seq((100L, "red widget", 9.99)).toDF("p_partkey", "p_name", "p_retailprice")
    val supplier = Seq((1L, 3L)).toDF("s_suppkey", "s_nationkey")
    val nation = Seq((3L, "NATION_3")).toDF("n_nationkey", "n_name")
    val r = Relational.q52TpchQ9(li, orders, part, supplier, nation).collect()(0)
    assert(r.getString(0) == "NATION_3" && r.getLong(1) == 1996L)
    assert(math.abs(r.getDouble(2) - 84.02) < 1e-9, s"(10000 - 1598)/100: $r")
  }
}
