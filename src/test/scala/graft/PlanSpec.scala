package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators._

/** Plan-shape assertions: the optimizations SURVEY.md promises must be
  * visible in the physical plan, not just hoped for. */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q2 filter and projection reach the parquet scan") {
    val p = plan(Relational.q2FilterProject(Tables.lineitem(spark, TestSpark.sf)))
    assert(p.contains("PushedFilters: ["))
    assert(p.contains("GreaterThanOrEqual(l_shipdate") || p.contains("IsNotNull(l_shipdate"))
    // pruned read schema: only the 6 referenced columns, not all 11
    assert(!p.contains("l_returnflag"))
  }

  test("q3 dimension joins broadcast, fact join does not collapse to cartesian") {
    val p = plan(Relational.q3JoinBroadcast(Tables.orders(spark, TestSpark.sf),
      Tables.customer(spark, TestSpark.sf), Tables.nation(spark, TestSpark.sf),
      Tables.region(spark, TestSpark.sf)))
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q5 top-k compiles to TakeOrderedAndProject (no global sort)") {
    val p = plan(Relational.q5TopK(Tables.orders(spark, TestSpark.sf)))
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("Exchange rangepartitioning"))
  }

  test("q1 aggregation is partial (map-side combine before the shuffle)") {
    val p = plan(Relational.q1Agg(Tables.lineitem(spark, TestSpark.sf)))
    assert(p.contains("HashAggregate"))
    assert(p.contains("partial_sum") || p.contains("partial"))
  }

  test("custom expressions do not break whole-stage codegen") {
    val df = TextOps.textTokens(Tables.documents(spark, TestSpark.sf))
    df.collect() // finalize the AQE plan so codegen spans are visible
    assert(plan(df).contains("*("), "no whole-stage codegen span")
    import org.apache.spark.sql.functions._
    val fp = Tables.documents(spark, TestSpark.sf)
      .select(graft.functions.F.fingerprint(col("text"), 8, 4).as("fp"))
    fp.collect()
    assert(plan(fp).contains("*("), "no whole-stage codegen span")
  }

  test("ann_bruteforce broadcasts the query side") {
    val p = plan(Ann.annBruteforce(Tables.embeddings(spark, TestSpark.sf)))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
  }

  test("tpch q5: dimension chain broadcasts, facts join on the shuffle spine") {
    val p = plan(Relational.q36TpchQ5(Tables.customer(spark, TestSpark.sf),
      Tables.orders(spark, TestSpark.sf), Tables.lineitem(spark, TestSpark.sf),
      Tables.supplier(spark, TestSpark.sf), Tables.nation(spark, TestSpark.sf),
      Tables.region(spark, TestSpark.sf)))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      s"region/nation/supplier dims must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), "no cartesian in the join graph")
    assert(p.contains("PushedFilters"), "order-date/region filters must reach the scans")
  }

  test("tpch q21: exists/not-exists collapses to one fact shuffle, no self-joins") {
    val p = plan(Relational.q57TpchQ21(Tables.lineitem(spark, TestSpark.sf),
      Tables.orders(spark, TestSpark.sf), Tables.supplier(spark, TestSpark.sf)))
    // the canonical formulation self-joins lineitem three times; ours
    // aggregates once per order — lineitem must appear in exactly one scan
    assert("lineitem\\.parquet".r.findAllIn(p).size == 1,
      s"lineitem must be scanned exactly once:\n$p")
    assert(p.contains("BroadcastHashJoin"), "supplier name join must broadcast")
    assert(!p.contains("CartesianProduct"))
  }

  test("tpch q2: part and the supplier-geo chain broadcast onto the cost rollup") {
    val p = plan(Relational.q51TpchQ2(Tables.lineitem(spark, TestSpark.sf),
      Tables.part(spark, TestSpark.sf), Tables.supplier(spark, TestSpark.sf),
      Tables.nation(spark, TestSpark.sf), Tables.region(spark, TestSpark.sf)))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      s"part and supplier-geo dims must broadcast:\n$p")
    assert(p.contains("partial_min"), "per-(part,supplier) cost min must map-side combine")
    assert(!p.contains("CartesianProduct"))
  }

  test("embedding_pca Gram matrix: row-local pair expansion, one exchange, no join") {
    val p = plan(Ann.gramMatrix(Tables.embeddings(spark, TestSpark.sf)))
    assert(!p.contains("Join"), s"Gram plan must not join the corpus to itself:\n$p")
    assert("Exchange".r.findAllIn(p).size == 1,
      s"Gram plan should shuffle only the combined dims-squared partials:\n$p")
    assert(p.contains("partial_sum"), "Gram aggregate must map-side combine")
  }

  test("hybrid retrieval over stored indexes never re-tokenizes the corpus") {
    val e = Tables.embeddings(spark, TestSpark.sf)
    val docs = Tables.documents(spark, TestSpark.sf)
    val p = plan(Ann.pipelineHybridRetrieval(e, docs,
      Ann.ensureIvfIndex(e, Ann.defaultIvfIndexDir(e, TestSpark.sf)),
      lexIndexDir = Some(graft.operators.TextOps.ensureLexIndex(docs,
        graft.operators.TextOps.defaultLexIndexDir(docs, TestSpark.sf)))))
    // the tokenizer expression appearing anywhere means a corpus
    // re-tokenization snuck back in past the stored lex index
    assert(!p.contains("split(trim(lower("),
      s"stored-index hybrid must not tokenize the corpus:\n$p")
    assert(p.contains("graft-lex-index"), "lex side must scan the stored index")
  }

  test("SCD2 PIT probe rides the user_id equi join, not a nested-loop fan-out") {
    val p = plan(Relational.q60Scd2Pit(Tables.events(spark, TestSpark.sf)))
    // exactly ONE nested-loop join is legitimate: the 3-row probe
    // broadcast; the ledger join degenerating to a second one means
    // the equi key was lost and every probe scans every version
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1,
      s"interval residual must ride the user_id equi join:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("funnel reads events exactly once (the r7 single-scan rewrite)") {
    val p = plan(Relational.q24Funnel(Tables.events(spark, TestSpark.sf)))
    assert("Scan parquet".r.findAllIn(p).size == 1,
      s"funnel must scan events once, not per step:\n$p")
    assert(!p.contains("Join"), "step membership is window-local, never joined")
  }

  test("q53 global cut is a window over the rollup, not a second corpus pass") {
    val p = plan(Relational.q53TpchQ11(Tables.lineitem(spark, TestSpark.sf),
      Tables.supplier(spark, TestSpark.sf), Tables.nation(spark, TestSpark.sf)))
    assert(p.contains("Window"), "total must come from a window over perPart")
    assert("Scan parquet".r.findAllIn(p).size == 3,
      s"exactly lineitem+supplier+nation scans expected:\n$p")
  }

  test("as-of join is the union-window shape: one window, zero joins") {
    val p = plan(Relational.q63AsofJoin(Tables.events(spark, TestSpark.sf),
      Tables.orders(spark, TestSpark.sf)))
    assert(!p.contains("Join"), s"as-of must not range-join:\n$p")
    assert(p.contains("Window"), "the running struct-max window is the operator")
    assert("Scan parquet".r.findAllIn(p).size == 2, "one scan per side")
  }

  test("salted sessions scan events once; salted as-of scans each side once") {
    val ps = plan(graft.operators.ScaleOps.sessionsSalted(
      Tables.events(spark, TestSpark.sf)))
    assert("Scan parquet".r.findAllIn(ps).size == 1,
      s"sessionsSalted must read events once:\n$ps")
    assert(!ps.contains("Join"), "sessions salting is windows + aggs, no join")
    val pa = plan(graft.operators.ScaleOps.asofSalted(
      Tables.events(spark, TestSpark.sf), Tables.orders(spark, TestSpark.sf)))
    // the materialized union frame feeds both phases; explain re-prints
    // the cache-build subtree (2 source scans) under EVERY
    // InMemoryTableScan reference, so the tight invariant is: all
    // parquet scans live inside cache builds — none outside
    val imts = "InMemoryTableScan".r.findAllIn(pa).size
    val scans = "Scan parquet".r.findAllIn(pa).size
    assert(imts >= 2, s"both phases must consume the cached union:\n$pa")
    assert(scans == 2 * imts,
      s"every events/orders scan must live inside the cached union build " +
        s"($scans scans shown for $imts cache reads):\n$pa")
  }

  test("zonemap builds in one scan with no window and a partial agg") {
    val p = plan(graft.operators.ScaleOps.zonemapPrune(
      Tables.lineitem(spark, TestSpark.sf)))
    assert("Scan parquet".r.findAllIn(p).size == 1,
      s"value tiling needs exactly one corpus pass:\n$p")
    assert(!p.contains("Window"),
      "value-tiled blocks must not rank-tile through a window")
    assert(p.contains("partial"), "block stats must combine map-side")
  }

  test("heavy hitters: one exact-pass scan outside the cached MG summary; candidate join broadcasts") {
    // cache-state determinism: an earlier suite may have cached the
    // same frames, which changes how explain prints cache re-prints
    spark.sharedState.cacheManager.clearCache()
    val p = plan(graft.operators.ScaleOps.heavyHitters(
      Tables.documents(spark, TestSpark.sf)))
    val scans = "Scan parquet".r.findAllIn(p).size
    val imts = "InMemoryTableScan".r.findAllIn(p).size
    // each cache read re-prints the summary build (one scan inside);
    // exactly ONE scan — the exact pass — lives outside cache builds
    assert(scans == imts + 1,
      s"expected 1 non-cache scan ($scans scans, $imts cache reads):\n$p")
    assert(p.contains("BroadcastHashJoin"),
      "the candidate set must broadcast into the exact pass")
    assert(!p.contains("SortMergeJoin"), s"no corpus-grain shuffle join:\n$p")
  }

  test("KMV set ops: every orders scan lives inside a cache build; no key-grain joins") {
    // same cache-state determinism guard as the heavy-hitters pin
    spark.sharedState.cacheManager.clearCache()
    val p = plan(graft.operators.ScaleOps.kmvSetOps(
      Tables.orders(spark, TestSpark.sf)))
    val scans = "Scan parquet".r.findAllIn(p).size
    val imts = "InMemoryTableScan".r.findAllIn(p).size
    // base/sketch/union-sketch are all materialized: every printed
    // scan is a cache-build re-print, so cache reads dominate scans
    assert(imts >= scans,
      s"scans must all be cache-build re-prints ($scans vs $imts):\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"everything after the sketch is ≤ 2k rows — no shuffle join:\n$p")
    assert(!p.contains("CartesianProduct"),
      "the 1-row stat combines must stay broadcast nested-loop")
  }

  test("integrity audit folds all five checks onto one scan per table") {
    val p = plan(graft.operators.ScaleOps.integrityAudit(
      Tables.orders(spark, TestSpark.sf), Tables.lineitem(spark, TestSpark.sf),
      Tables.customer(spark, TestSpark.sf)))
    assert("Scan parquet".r.findAllIn(p).size == 3,
      s"one scan per table (orders/lineitem/customer):\n$p")
    assert(p.contains("FullOuter"),
      "the orderkey-grain presence join classifies every row")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"joins must stay key-based:\n$p")
  }
}

class CodegenCoverageSpec extends org.scalatest.funsuite.AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("new expressions stay inside whole-stage codegen spans") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, TestSpark.sf)
    val sh = docs.select(graft.functions.F.shingleStrings(col("text"), 3).as("sh"))
    sh.collect()
    assert(sh.queryExecution.executedPlan.toString.contains("*("), "shingleStrings outside codegen")
    val pe = Tables.events(spark, TestSpark.sf).select(
      graft.functions.F.protoEncode(struct(col("event_id"), col("event_type"))).as("p"))
    pe.collect()
    assert(pe.queryExecution.executedPlan.toString.contains("*("), "protoEncode outside codegen")
  }
}
