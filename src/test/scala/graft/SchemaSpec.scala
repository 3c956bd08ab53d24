package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import graft.schema._

class SchemaTransformerSpec extends AnyFunSuite {

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType),
    StructField("active", BooleanType),
    StructField("payload", BinaryType),
    StructField("score", DoubleType),
    StructField("amount", DecimalType(18, 4)),
    StructField("created", TimestampType),
    StructField("birthday", DateType),
    StructField("tags", ArrayType(StringType)),
    StructField("address", StructType(Seq(
      StructField("street", StringType),
      StructField("zips", ArrayType(LongType)))))))

  test("StructType → BQ schema mirrors the reference type map") {
    val bq = SchemaTransformer.toBq(schema)
    val byName = bq.fields.map(f => f.name -> f).toMap
    assert(byName("id").bqType == BqType.INT64 && byName("id").mode == BqMode.REQUIRED)
    assert(byName("name").bqType == BqType.STRING && byName("name").mode == BqMode.NULLABLE)
    assert(byName("active").bqType == BqType.BOOL)
    assert(byName("payload").bqType == BqType.BYTES)
    assert(byName("score").bqType == BqType.DOUBLE)
    assert(byName("amount").bqType == BqType.NUMERIC &&
      byName("amount").precision.contains(18) && byName("amount").scale.contains(4))
    assert(byName("created").bqType == BqType.TIMESTAMP)
    assert(byName("birthday").bqType == BqType.DATE)
    assert(byName("tags").bqType == BqType.STRING && byName("tags").mode == BqMode.REPEATED)
    assert(byName("address").bqType == BqType.STRUCT &&
      byName("address").fields.map(_.name) == Seq("street", "zips") &&
      byName("address").fields(1).mode == BqMode.REPEATED)
  }

  test("roundtrip BQ → StructType preserves structure") {
    val back = SchemaTransformer.toSpark(SchemaTransformer.toBq(schema))
    assert(back.fieldNames.toSeq == schema.fieldNames.toSeq)
    assert(back("tags").dataType.isInstanceOf[ArrayType])
    assert(back("address").dataType.asInstanceOf[StructType].fieldNames.toSeq == Seq("street", "zips"))
    assert(back("id").nullable == false && back("name").nullable == true)
    assert(back("amount").dataType == DecimalType(18, 4))
  }
}

class SchemaToolsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val tools = new SchemaTools(spark)

  private def freshTable(name: String): String = {
    tools.dropTable(name); name
  }

  test("createTable + exists") {
    val t = freshTable("graft_t1")
    assert(!tools.exists(t))
    tools.createTable(t, StructType(Seq(
      StructField("a", LongType), StructField("b", StringType))))
    assert(tools.exists(t))
    assert(tools.currentSchema(t).fieldNames.toSeq == Seq("a", "b"))
  }

  test("updateTable adds new columns and drops removed ones (reference updateTable semantics)") {
    val t = freshTable("graft_t2")
    tools.createTable(t, StructType(Seq(
      StructField("a", LongType), StructField("b", StringType), StructField("c", DoubleType))))
    spark.sql(s"INSERT INTO $t VALUES (1, 'x', 2.5), (2, 'y', 3.5)")

    val target = StructType(Seq(
      StructField("a", LongType), StructField("c", DoubleType), StructField("d", StringType)))
    val (added, dropped) = tools.updateTable(t, target)
    assert(added == Seq("d") && dropped == Seq("b"))
    val after = tools.currentSchema(t)
    assert(after.fieldNames.sorted.toSeq == Seq("a", "c", "d"))
    assert(spark.table(t).count() == 2)
  }

  test("updateTable is a no-op when schemas already agree") {
    val t = freshTable("graft_t3")
    val s = StructType(Seq(StructField("a", LongType)))
    tools.createTable(t, s)
    assert(tools.updateTable(t, s) == (Nil, Nil))
  }

  test("createOrUpdateView updates the view query (reference updateView)") {
    val t = freshTable("graft_t4")
    tools.createTable(t, StructType(Seq(StructField("a", LongType))))
    spark.sql(s"INSERT INTO $t VALUES (1), (5), (10)")
    tools.createOrUpdateView("graft_v4", s"SELECT a FROM $t WHERE a > 1")
    assert(spark.table("graft_v4").count() == 2)
    tools.createOrUpdateView("graft_v4", s"SELECT a FROM $t WHERE a > 6")
    assert(spark.table("graft_v4").count() == 1)
  }
}
