package graft.schema

import org.apache.spark.sql.types._

/** BigQuery-style schema model + StructType transform — the Spark
  * re-expression of schema/SchemaTransformer.java (type map at
  * SchemaTransformer.java:22-46) without any service dependency.
  * REPEATED mode ⇄ ArrayType, STRUCT ⇄ nested StructType, NULLABLE/
  * REQUIRED ⇄ nullability.
  */
object BqType extends Enumeration {
  val BOOL, BYTES, DATE, DATETIME, DOUBLE, GEOGRAPHY, INT64, INTERVAL,
      NUMERIC, BIGNUMERIC, JSON, STRING, STRUCT, TIME, TIMESTAMP = Value
}

object BqMode extends Enumeration {
  val NULLABLE, REQUIRED, REPEATED = Value
}

case class BqField(name: String, bqType: BqType.Value,
                   mode: BqMode.Value = BqMode.NULLABLE,
                   fields: Seq[BqField] = Nil,
                   description: Option[String] = None,
                   precision: Option[Int] = None,
                   scale: Option[Int] = None,
                   maxLength: Option[Int] = None)

case class BqTableSchema(fields: Seq[BqField])

object SchemaTransformer {

  def toBq(schema: StructType): BqTableSchema = BqTableSchema(schema.fields.toIndexedSeq.map(toBqField))

  private def toBqField(f: StructField): BqField = f.dataType match {
    case ArrayType(elem, _) =>
      val inner = toBqField(StructField(f.name, elem, nullable = false))
      inner.copy(mode = BqMode.REPEATED)
    case s: StructType =>
      BqField(f.name, BqType.STRUCT, modeOf(f), s.fields.map(toBqField).toSeq)
    case d: DecimalType =>
      val t = if (d.precision > 38) BqType.BIGNUMERIC else BqType.NUMERIC
      BqField(f.name, t, modeOf(f), precision = Some(d.precision), scale = Some(d.scale))
    case dt =>
      BqField(f.name, scalarType(dt), modeOf(f))
  }

  private def modeOf(f: StructField): BqMode.Value =
    if (f.nullable) BqMode.NULLABLE else BqMode.REQUIRED

  private def scalarType(dt: DataType): BqType.Value = dt match {
    case BooleanType => BqType.BOOL
    case BinaryType => BqType.BYTES
    case DateType => BqType.DATE
    case TimestampNTZType => BqType.DATETIME
    case TimestampType => BqType.TIMESTAMP
    case FloatType | DoubleType => BqType.DOUBLE
    case ByteType | ShortType | IntegerType | LongType => BqType.INT64
    case StringType => BqType.STRING
    case VariantType => BqType.JSON
    // reference type map carries INTERVAL (SchemaTransformer.java:35);
    // both Spark interval flavors funnel into the single BQ INTERVAL
    case _: DayTimeIntervalType | _: YearMonthIntervalType => BqType.INTERVAL
    case other => throw new IllegalArgumentException(s"No BigQuery mapping for $other")
  }

  def toSpark(schema: BqTableSchema): StructType =
    StructType(schema.fields.map(toSparkField))

  private def toSparkField(f: BqField): StructField = {
    val base: DataType = f.bqType match {
      case BqType.BOOL => BooleanType
      case BqType.BYTES => BinaryType
      case BqType.DATE => DateType
      case BqType.DATETIME => TimestampNTZType
      case BqType.TIMESTAMP => TimestampType
      case BqType.DOUBLE => DoubleType
      case BqType.INT64 => LongType
      case BqType.NUMERIC | BqType.BIGNUMERIC =>
        DecimalType(f.precision.getOrElse(38), f.scale.getOrElse(9))
      // GEOGRAPHY travels as WKT text in Spark (no native geo type)
      case BqType.JSON | BqType.STRING | BqType.TIME | BqType.GEOGRAPHY => StringType
      case BqType.INTERVAL => DayTimeIntervalType()
      case BqType.STRUCT => StructType(f.fields.map(toSparkField))
    }
    f.mode match {
      case BqMode.REPEATED => StructField(f.name, ArrayType(base), nullable = true)
      case BqMode.REQUIRED => StructField(f.name, base, nullable = false)
      case BqMode.NULLABLE => StructField(f.name, base, nullable = true)
    }
  }
}
