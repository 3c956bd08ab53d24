package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The BroadcastScalarAgg optimizer rule: a join side that provably
  * produces at most one row broadcasts at PLAN time, even when size
  * estimates would refuse it, and never perturbs results. */
class BroadcastScalarAggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def withRule[T](body: => T): T = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ graft.plans.BroadcastScalarAgg
    try body
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations
        .filterNot(_ eq graft.plans.BroadcastScalarAgg)
  }

  test("a global-agg side broadcasts even with auto-broadcast disabled") {
    val spark = this.spark
    import spark.implicits._
    val big = (1L to 5000L).toDF("id")
    val scalar = big.agg(sum(col("id")).as("total"))
    def planOf(withHint: Boolean): String = {
      def run() = {
        val df = big.crossJoin(scalar).filter(col("id") * 2 > col("total") / 2000)
        df.collect()
        df.queryExecution.executedPlan.toString
      }
      val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try { if (withHint) withRule(run()) else run() }
      finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
        spark.conf.set("spark.sql.adaptive.enabled", "true")
      }
    }
    val withoutRule = planOf(withHint = false)
    val withRulePlan = planOf(withHint = true)
    assert(!withoutRule.contains("Broadcast"),
      s"precondition: stats-driven planning must refuse the broadcast:\n$withoutRule")
    assert(withRulePlan.contains("BroadcastNestedLoopJoin") ||
      withRulePlan.contains("BroadcastHashJoin"),
      s"the provably-1-row side must broadcast under the rule:\n$withRulePlan")
  }

  test("results are identical with and without the rule") {
    val spark = this.spark
    import spark.implicits._
    val df = (1L to 100L).toDF("id")
    val scalar = df.agg(max(col("id")).as("mx"))
    def result(): Seq[Long] = df.crossJoin(scalar)
      .filter(col("id") === col("mx")).select(col("id"))
      .collect().map(_.getLong(0)).toSeq
    val plain = result()
    val ruled = withRule(result())
    assert(plain == ruled && plain == Seq(100L))
  }
}
