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

class ProtoDescriptorSpec extends org.scalatest.funsuite.AnyFunSuite {
  import org.apache.spark.sql.types._
  import org.apache.spark.sql.Row
  import graft.schema._

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType),
    StructField("score", DoubleType),
    StructField("ok", BooleanType),
    StructField("payload", BinaryType),
    StructField("tags", ArrayType(StringType)),
    StructField("counts", ArrayType(LongType)),
    StructField("born", DateType),
    StructField("seen", TimestampType),
    StructField("address", StructType(Seq(
      StructField("city", StringType),
      StructField("zip", LongType))))))

  test("descriptor derivation: numbered fields, wire types, nested message") {
    val d = ProtoDescriptor.fromStruct(schema)
    assert(d.fields.map(_.number) == (1 to 10))
    assert(d.fields.head.wireType == ProtoWireType.Varint)        // INT64
    assert(d.fields(1).wireType == ProtoWireType.LengthDelimited) // STRING
    assert(d.fields(2).wireType == ProtoWireType.Fixed64)         // DOUBLE
    assert(d.fields(5).repeated && d.fields(6).repeated)
    assert(d.fields(9).nested.exists(_.fields.map(_.name) == Seq("city", "zip")))
    assert(d.toProtoText.contains("repeated string tags = 6;"))
  }

  test("wire round-trip: StructType -> descriptor -> encode -> decode -> equal rows") {
    val ser = new ProtoRowSerializer(schema)
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val rows = Seq(
      Row(1L, "alice", 2.5, true, Array[Byte](1, 2, 3), Seq("a", "b"), Seq(7L, -9L),
        java.sql.Date.valueOf("2024-03-01"), ts("2024-03-01 10:30:00.123456"),
        Row("vilnius", 10001L)),
      Row(-2L, "bobé 中文", -0.0, false, Array.empty[Byte], Seq.empty[String],
        Seq(Long.MinValue, Long.MaxValue), null, null, null),
      Row(3L, null, null, null, null, null, null, null, null, Row(null, 5L)))
    rows.foreach { r =>
      val bytes = ser.serialize(r)
      val back = ser.deserialize(bytes)
      (0 until schema.length).foreach { i =>
        val (a, b) = (r.get(i), back.get(i))
        (a, b) match {
          case (x: Array[Byte], y: Array[Byte]) => assert(x.toSeq == y.toSeq)
          case (null, y) => assert(y == null, s"field $i: $y")
          case (x: Seq[_], y) if x.isEmpty =>
            // proto wire format cannot distinguish empty repeated from
            // absent: zero elements decode as null
            assert(y == null, s"field $i: $y")
          case (x: Seq[_], y: Seq[_]) => assert(x == y, s"field $i")
          case (x, y) => assert(x == y, s"field $i: $x vs $y")
        }
      }
    }
  }

  test("varint edge values survive (negatives are 10-byte, proto-style)") {
    val s = StructType(Seq(StructField("v", LongType)))
    val ser = new ProtoRowSerializer(s)
    Seq(0L, 1L, -1L, 127L, 128L, Long.MaxValue, Long.MinValue).foreach { v =>
      assert(ser.deserialize(ser.serialize(Row(v))).getLong(0) == v, s"v=$v")
    }
    val negBytes = ser.serialize(Row(-1L))
    assert(negBytes.length == 1 + 10, "proto int64 -1 must take 10 varint bytes")
  }

  test("schema type map covers GEOGRAPHY and INTERVAL") {
    import org.apache.spark.sql.types._
    val bq = BqTableSchema(Seq(
      BqField("geo", BqType.GEOGRAPHY),
      BqField("iv", BqType.INTERVAL)))
    val st = SchemaTransformer.toSpark(bq)
    assert(st.fields(0).dataType == StringType)
    assert(st.fields(1).dataType.isInstanceOf[DayTimeIntervalType])
    assert(SchemaTransformer.toBq(StructType(Seq(
      StructField("iv", DayTimeIntervalType())))).fields.head.bqType == BqType.INTERVAL)
  }

  test("schema JSON round-trips through the model and StructType") {
    val json =
      """[
        | {"name": "id", "type": "INTEGER", "mode": "REQUIRED"},
        | {"name": "name", "type": "STRING"},
        | {"name": "geo", "type": "GEOGRAPHY"},
        | {"name": "addr", "type": "RECORD", "mode": "REPEATED", "fields": [
        |   {"name": "city", "type": "STRING"},
        |   {"name": "zip", "type": "INT64", "mode": "NULLABLE"}
        | ]}
        |]""".stripMargin
    val bq = BqSchemaJson.parse(json)
    assert(bq.fields.map(_.bqType) ==
      Seq(BqType.INT64, BqType.STRING, BqType.GEOGRAPHY, BqType.STRUCT))
    assert(bq.fields(3).mode == graft.schema.BqMode.REPEATED)
    // model -> StructType -> model -> JSON -> model fixpoint
    val st = SchemaTransformer.toSpark(bq)
    assert(st.fields(3).dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType])
    val bq2 = BqSchemaJson.parse(BqSchemaJson.render(bq))
    assert(bq2 == bq)
  }
}

class ProtoEncodeExprSpec extends org.scalatest.funsuite.AnyFunSuite {
  test("codegen proto expression emits the same wire bytes as the Row serializer") {
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val df = Tables.events(spark, TestSpark.sf)
      .select(col("event_id"), col("event_type"), col("user_id")).limit(200)
    val viaExpr = df.select(col("event_id"),
        graft.functions.F.protoEncode(
          struct(col("event_id"), col("event_type"), col("user_id"))).as("payload"))
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("event_type", StringType),
      StructField("user_id", LongType)))
    val ser = new graft.schema.ProtoRowSerializer(schema)
    df.collect().foreach { r =>
      val external = ser.serialize(org.apache.spark.sql.Row(r.getLong(0), r.getString(1), r.getLong(2)))
      assert(viaExpr(r.getLong(0)) == external.toSeq, s"event ${r.getLong(0)}")
      // and the wire bytes decode back to the original values
      val back = ser.deserialize(external)
      assert(back.getLong(0) == r.getLong(0) && back.getString(1) == r.getString(1))
    }
  }
}

class SchemaJsonDdlSpec extends org.scalatest.funsuite.AnyFunSuite {
  test("a BigQuery schema JSON document creates a usable Spark table") {
    val spark = TestSpark.spark
    val tools = new graft.schema.SchemaTools(spark)
    tools.dropTable("graft_from_json")
    val st = tools.createTableFromJson("graft_from_json",
      """[
        | {"name": "id", "type": "INTEGER", "mode": "REQUIRED"},
        | {"name": "name", "type": "STRING"},
        | {"name": "score", "type": "FLOAT64"}
        |]""".stripMargin)
    assert(st.fieldNames.toSeq == Seq("id", "name", "score"))
    spark.sql("INSERT INTO graft_from_json VALUES (1, 'x', 2.5)")
    assert(spark.table("graft_from_json").count() == 1)
    tools.dropTable("graft_from_json")
  }
}
