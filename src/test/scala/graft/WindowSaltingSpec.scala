package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hot-key keyed-window mitigation (ScaleOps.windowPreflight /
  * sessionsSalted / asofSalted): the salted two-phase re-plans must be
  * row-identical to their single-window originals on frames built to
  * stress every boundary case — sessions spanning salt buckets,
  * probes in event-free buckets (cross-bucket carry), equal-instant
  * ties, and keys with no prior events. */
class WindowSaltingSpec extends AnyFunSuite {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  /** user 1 is the hot key: a continuous every-10-min run spanning
    * several 1-hour salt buckets (one true session crossing bucket
    * boundaries), then a >30-min gap inside a single bucket (a split
    * the salting must NOT lose), then a run that starts exactly at a
    * bucket boundary. user 2 has a singleton and an exact-gap pair
    * (30 min 0 s — at-or-under the gap, must NOT split). */
  private def eventsDf = {
    val spark = TestSpark.spark
    import spark.implicits._
    // every 10 min from 01:00 to 03:50 — ONE session crossing three
    // 1-hour salt buckets
    val base = ts("2024-01-01 01:00:00").getTime
    val hotRun = (0 until 18).map(i =>
      (1L, 100L + i, new java.sql.Timestamp(base + i * 600000L), "view"))
    val rest = Seq(
      (1L, 200L, ts("2024-01-01 09:00:00"), "click"),
      (1L, 201L, ts("2024-01-01 09:40:01"), "view"),   // 40m01s gap: splits
      (1L, 202L, ts("2024-01-02 00:00:00"), "purchase"), // bucket-boundary start
      (2L, 300L, ts("2024-01-01 05:00:00"), "view"),
      (2L, 301L, ts("2024-01-01 05:30:00"), "click"),  // exactly 30m: glued
      (2L, 302L, ts("2024-01-03 12:00:00"), "view"))
    (hotRun ++ rest).toDF("user_id", "event_id", "ts", "event_type")
  }

  test("sessionsSalted is row-identical to q32Sessions across bucket widths") {
    val e = eventsDf
    val plain = graft.operators.Relational.q32Sessions(e)
      .collect().toSeq.map(_.toString)
    for (bucketMinutes <- Seq(60, 240, 1440)) {
      val salted = graft.operators.ScaleOps
        .sessionsSalted(e, gapMinutes = 30, bucketMinutes = bucketMinutes)
        .collect().toSeq.map(_.toString)
      assert(salted == plain, s"bucketMinutes=$bucketMinutes diverged")
    }
  }

  test("sessionsSalted equals q32Sessions on a randomized frame") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val rows = (0 until 800).map { i =>
      val user = rnd.nextInt(5).toLong
      val t = new java.sql.Timestamp(
        ts("2024-01-01 00:00:00").getTime + rnd.nextInt(5 * 24 * 3600) * 1000L)
      (user, i.toLong, t, "view")
    }
    val e = rows.toDF("user_id", "event_id", "ts", "event_type")
    val plain = graft.operators.Relational.q32Sessions(e)
      .collect().toSeq.map(_.toString)
    val salted = graft.operators.ScaleOps
      .sessionsSalted(e, gapMinutes = 30, bucketMinutes = 180)
      .collect().toSeq.map(_.toString)
    assert(salted == plain)
  }

  test("asofSalted is row-identical to q63AsofJoin incl. event-free-bucket carry and no-prior-event probes") {
    val spark = TestSpark.spark
    import spark.implicits._
    val e = eventsDf
    val orders = Seq(
      // probe far after user 1's last event: carry-in must cross
      // several event-free buckets
      (10L, 1L, "2024-01-05 00:00:00"),
      // probe at the exact instant of event 202: at-or-before is
      // inclusive, so the equal-instant event wins
      (11L, 1L, "2024-01-02 00:00:00"),
      // probe before user 2's first event: NULL event columns
      (12L, 2L, "2024-01-01 00:00:00"),
      (13L, 2L, "2024-01-02 00:00:00"),
      // customer with no events at all
      (14L, 9L, "2024-01-03 00:00:00"))
      .toDF("o_orderkey", "o_custkey", "od")
      .withColumn("o_orderdate", col("od").cast("timestamp")).drop("od")
      // NULL-custkey probe: q63's window puts it in the NULL partition
      // and still emits it — the salted join must not drop it
      .unionByName(Seq((15L, "2024-01-03 00:00:00"))
        .toDF("o_orderkey", "od")
        .select(col("o_orderkey"), lit(null).cast("long").as("o_custkey"),
          col("od").cast("timestamp").as("o_orderdate")))
    val plain = graft.operators.Relational.q63AsofJoin(e, orders)
      .collect().toSeq.map(_.toString)
    for (bucketMinutes <- Seq(60, 1440)) {
      val salted = graft.operators.ScaleOps
        .asofSalted(e, orders, bucketMinutes = bucketMinutes)
        .collect().toSeq.map(_.toString)
      assert(salted == plain, s"bucketMinutes=$bucketMinutes diverged")
    }
  }

  test("asofSalted equals q63AsofJoin on a randomized frame") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(43)
    val t0 = ts("2024-01-01 00:00:00").getTime
    val e = (0 until 600).map { i =>
      (rnd.nextInt(6).toLong, i.toLong,
        new java.sql.Timestamp(t0 + rnd.nextInt(10 * 24 * 3600) * 1000L),
        if (rnd.nextBoolean()) "view" else "click")
    }.toDF("user_id", "event_id", "ts", "event_type")
    // probe customers 0..7: ids 6,7 have no events at all
    val o = (0 until 200).map { i =>
      (1000L + i, rnd.nextInt(8).toLong,
        new java.sql.Timestamp(t0 + rnd.nextInt(10 * 24 * 3600) * 1000L))
    }.toDF("o_orderkey", "o_custkey", "o_orderdate")
    val plain = graft.operators.Relational.q63AsofJoin(e, o)
      .collect().toSeq.map(_.toString)
    for (bucketMinutes <- Seq(90, 1440)) {
      val salted = graft.operators.ScaleOps
        .asofSalted(e, o, bucketMinutes = bucketMinutes)
        .collect().toSeq.map(_.toString)
      assert(salted == plain, s"bucketMinutes=$bucketMinutes diverged")
    }
  }

  test("asofAuto routes on the union-key preflight verdict and matches q63AsofJoin either way") {
    val spark = TestSpark.spark
    import spark.implicits._
    val e = eventsDf // user 1: 21 rows, user 2: 3 rows
    val orders = Seq(
      (10L, 1L, "2024-01-05 00:00:00"),
      (11L, 1L, "2024-01-02 00:00:00"),
      (12L, 2L, "2024-01-01 00:00:00"),
      (14L, 9L, "2024-01-03 00:00:00"))
      .toDF("o_orderkey", "o_custkey", "od")
      .withColumn("o_orderdate", col("od").cast("timestamp")).drop("od")
    val plain = graft.operators.Relational.q63AsofJoin(e, orders)
      .collect().toSeq.map(_.toString)
    // threshold below the hot union key -> salted path; far above -> plain
    for (thr <- Seq(5L, 1000L)) {
      val auto = graft.operators.ScaleOps
        .asofAuto(e, orders, hotThreshold = thr, bucketMinutes = 60)
        .collect().toSeq.map(_.toString)
      assert(auto == plain, s"hotThreshold=$thr diverged")
    }
  }

  test("sessionsAuto routes on the preflight verdict and matches q32Sessions either way") {
    val e = eventsDf // user 1: 21 rows, user 2: 3 rows
    val plain = graft.operators.Relational.q32Sessions(e)
      .collect().toSeq.map(_.toString)
    // threshold below the hot key -> salted path; far above -> plain
    for (thr <- Seq(10L, 1000L)) {
      val auto = graft.operators.ScaleOps
        .sessionsAuto(e, hotThreshold = thr, bucketMinutes = 60)
        .collect().toSeq.map(_.toString)
      assert(auto == plain, s"hotThreshold=$thr diverged")
    }
  }

  test("windowPreflight reports the planted hot key exactly and flips the verdict at the threshold") {
    val spark = TestSpark.spark
    import spark.implicits._
    val e = eventsDf // user 1: 21 rows, user 2: 3 rows
    val salt = graft.operators.ScaleOps
      .windowPreflight(e, "user_id", hotThreshold = 10L).head()
    assert(salt.getLong(0) == 24 && salt.getLong(1) == 2, "n_rows/n_keys")
    assert(salt.getLong(2) == 21 && salt.getLong(3) == 1L, "max_key_rows/hot_key")
    assert(salt.getLong(4) == 1, "one key over threshold 10")
    assert(salt.getLong(5) == 21 * 10000 / 24, "hot_share_bp")
    assert(salt.getString(6) == "salt")
    val ok = graft.operators.ScaleOps
      .windowPreflight(e, "user_id", hotThreshold = 100L).head()
    assert(ok.getLong(4) == 0 && ok.getString(6) == "window")
    // tie-break: two keys at the same max count -> smallest key id
    val tied = Seq((5L, 1L), (3L, 2L), (3L, 3L), (5L, 4L))
      .toDF("user_id", "event_id")
    val t = graft.operators.ScaleOps
      .windowPreflight(tied, "user_id", hotThreshold = 2L).head()
    assert(t.getLong(2) == 2 && t.getLong(3) == 3L,
      s"smallest key wins the tie: $t")
  }
}
