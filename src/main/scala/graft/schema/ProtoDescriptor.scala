package graft.schema

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Schema-driven protobuf wire-format serialization — the re-expression
  * of the reference's descriptor chain (BQTableSchemaToProtoDescriptor
  * at client/BigQueryProtoClientProvider.java:49 feeding
  * serializer/ProtoValueSerializer.java): table schema → message
  * descriptor (field name, number, wire type, label) → field-tagged,
  * length-delimited row encoding.
  *
  * The wire format is real protobuf: tag = (number << 3) | wireType,
  * varints are little-endian base-128 (negatives as 10-byte
  * two's-complement like proto int64), nested STRUCTs are embedded
  * length-delimited messages, REPEATED fields are unpacked (one tagged
  * element each). Any protobuf parser given the equivalent .proto would
  * read these bytes.
  */
object ProtoWireType extends Enumeration {
  /** proto wire types: 0 = varint, 1 = fixed64, 2 = length-delimited */
  val Varint = Value(0)
  val Fixed64 = Value(1)
  val LengthDelimited = Value(2)
}

/** One field of a derived message descriptor. */
case class ProtoFieldDescriptor(name: String, number: Int,
                                wireType: ProtoWireType.Value,
                                bqType: BqType.Value,
                                repeated: Boolean,
                                nested: Option[ProtoMessageDescriptor] = None)

/** Descriptor analog: an ordered set of numbered, typed fields. */
case class ProtoMessageDescriptor(name: String, fields: Seq[ProtoFieldDescriptor]) {
  /** Renders the equivalent .proto text (debugging / interop check). */
  def toProtoText: String = {
    val sb = new StringBuilder(s"message $name {\n")
    fields.foreach { f =>
      val label = if (f.repeated) "repeated " else "optional "
      val t = f.bqType match {
        case BqType.BOOL => "bool"
        case BqType.INT64 | BqType.DATE | BqType.TIMESTAMP => "int64"
        case BqType.DOUBLE => "double"
        case BqType.BYTES => "bytes"
        case BqType.STRUCT => f.nested.get.name
        case _ => "string"
      }
      sb.append(s"  $label$t ${f.name} = ${f.number};\n")
    }
    fields.flatMap(_.nested).foreach(n => sb.append(n.toProtoText.linesIterator
      .map("  " + _).mkString("", "\n", "\n")))
    sb.append("}").toString
  }
}

object ProtoDescriptor {

  /** BqTableSchema → message descriptor. Field numbers are 1-based in
    * schema order (the reference's conversion does the same); the wire
    * type is derived from the BQ type the way the Storage Write API
    * encodes it: INT64/DATE/TIMESTAMP/BOOL as varint, DOUBLE as
    * fixed64, everything stringy as length-delimited, STRUCT as an
    * embedded message. */
  def fromBq(schema: BqTableSchema, name: String = "Row"): ProtoMessageDescriptor =
    ProtoMessageDescriptor(name, schema.fields.zipWithIndex.map { case (f, i) =>
      val repeated = f.mode == BqMode.REPEATED
      f.bqType match {
        case BqType.STRUCT =>
          val nested = fromBq(BqTableSchema(f.fields), name + "_" + f.name)
          ProtoFieldDescriptor(f.name, i + 1, ProtoWireType.LengthDelimited,
            f.bqType, repeated, Some(nested))
        case BqType.BOOL | BqType.INT64 | BqType.DATE | BqType.TIMESTAMP =>
          ProtoFieldDescriptor(f.name, i + 1, ProtoWireType.Varint, f.bqType, repeated)
        case BqType.DOUBLE =>
          ProtoFieldDescriptor(f.name, i + 1, ProtoWireType.Fixed64, f.bqType, repeated)
        case _ =>
          ProtoFieldDescriptor(f.name, i + 1, ProtoWireType.LengthDelimited, f.bqType, repeated)
      }
    })

  /** StructType → descriptor via the BQ schema model (the same two-hop
    * derivation the reference performs: table schema → descriptor). */
  def fromStruct(schema: StructType, name: String = "Row"): ProtoMessageDescriptor =
    fromBq(SchemaTransformer.toBq(schema), name)
}

/** Encodes Catalyst InternalRows into protobuf wire bytes — the
  * zero-conversion engine-side twin of [[ProtoRowSerializer]] (same
  * descriptor, same wire bytes), used by the `graft_proto_encode`
  * codegen expression so serialization runs inside WholeStageCodegen
  * with no external-Row materialization. */
class ProtoInternalRowEncoder(schema: StructType) extends Serializable {
  import org.apache.spark.sql.catalyst.InternalRow

  private val descriptor = ProtoDescriptor.fromStruct(schema)

  def encode(row: InternalRow): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    writeMessage(out, row, schema, descriptor)
    out.toByteArray
  }

  private def writeMessage(out: java.io.ByteArrayOutputStream, row: InternalRow,
                           st: StructType, d: ProtoMessageDescriptor): Unit = {
    var i = 0
    while (i < d.fields.length) {
      if (!row.isNullAt(i)) {
        val f = d.fields(i)
        st.fields(i).dataType match {
          case ArrayType(elem, _) =>
            val arr = row.getArray(i)
            var j = 0
            while (j < arr.numElements()) {
              writeOne(out, f, elem, arr.get(j, elem))
              j += 1
            }
          case dt => writeOne(out, f, dt, row.get(i, dt))
        }
      }
      i += 1
    }
  }

  private def writeOne(out: java.io.ByteArrayOutputStream, f: ProtoFieldDescriptor,
                       dt: DataType, v: Any): Unit = {
    writeVarint(out, (f.number.toLong << 3) | f.wireType.id.toLong)
    f.wireType match {
      case ProtoWireType.Varint =>
        val value = v match {
          case b: Boolean => if (b) 1L else 0L
          case l: Long => l
          case i: Int => i.toLong
          case s: Short => s.toLong
          case b: Byte => b.toLong
        }
        writeVarint(out, value)
      case ProtoWireType.Fixed64 =>
        val bits = v match {
          case d: Double => java.lang.Double.doubleToLongBits(d)
          case fl: Float => java.lang.Double.doubleToLongBits(fl.toDouble)
        }
        var k = 0
        var b = bits
        while (k < 8) { out.write((b & 0xff).toInt); b >>>= 8; k += 1 }
      case ProtoWireType.LengthDelimited =>
        val bytes = (dt, v) match {
          case (BinaryType, b: Array[Byte]) => b
          case (s: StructType, r: InternalRow) =>
            val inner = new java.io.ByteArrayOutputStream()
            writeMessage(inner, r, s, f.nested.get)
            inner.toByteArray
          case (_, u: org.apache.spark.unsafe.types.UTF8String) => u.getBytes
          case (_, other) => String.valueOf(other)
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)
        }
        writeVarint(out, bytes.length.toLong)
        out.write(bytes)
    }
  }

  private def writeVarint(out: java.io.ByteArrayOutputStream, value: Long): Unit = {
    var v = value
    while ((v & ~0x7fL) != 0) {
      out.write(((v & 0x7f) | 0x80).toInt)
      v >>>= 7
    }
    out.write(v.toInt)
  }
}

/** Encodes Spark Rows into protobuf wire bytes under a descriptor
  * derived from the row schema, and decodes them back. */
class ProtoRowSerializer(schema: StructType) extends graft.sinks.RowValueSerializer[Row] {
  private val descriptor = ProtoDescriptor.fromStruct(schema)

  def messageDescriptor: ProtoMessageDescriptor = descriptor

  override def serialize(row: Row): Array[Byte] = encodeMessage(row, schema, descriptor)

  private def encodeMessage(row: Row, st: StructType, d: ProtoMessageDescriptor): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    d.fields.zipWithIndex.foreach { case (f, i) =>
      if (!row.isNullAt(i)) {
        if (f.repeated) {
          row.getSeq[Any](i).foreach(v => writeField(out, f, v, st.fields(i)))
        } else writeField(out, f, row.get(i), st.fields(i))
      }
    }
    out.toByteArray
  }

  private def writeField(out: java.io.ByteArrayOutputStream, f: ProtoFieldDescriptor,
                         v: Any, sf: StructField): Unit = {
    writeVarint(out, (f.number.toLong << 3) | f.wireType.id.toLong)
    f.wireType match {
      case ProtoWireType.Varint => writeVarint(out, varintValue(v))
      case ProtoWireType.Fixed64 =>
        val bits = v match {
          case d: Double => java.lang.Double.doubleToLongBits(d)
          case fl: Float => java.lang.Double.doubleToLongBits(fl.toDouble)
          case n: Number => java.lang.Double.doubleToLongBits(n.doubleValue())
        }
        var i = 0
        var b = bits
        while (i < 8) { out.write((b & 0xff).toInt); b >>>= 8; i += 1 }
      case ProtoWireType.LengthDelimited =>
        val bytes = v match {
          case b: Array[Byte] => b
          case r: Row =>
            val innerSt = (sf.dataType match {
              case s: StructType => s
              case ArrayType(s: StructType, _) => s
              case other => throw new IllegalArgumentException(s"not a struct: $other")
            })
            encodeMessage(r, innerSt, f.nested.get)
          case other => String.valueOf(other).getBytes(StandardCharsets.UTF_8)
        }
        writeVarint(out, bytes.length.toLong)
        out.write(bytes)
    }
  }

  private def varintValue(v: Any): Long = v match {
    case b: Boolean => if (b) 1L else 0L
    case l: Long => l
    case i: Int => i.toLong
    case s: Short => s.toLong
    case b: Byte => b.toLong
    case d: java.sql.Date => d.toLocalDate.toEpochDay // DATE = epoch days
    case t: java.sql.Timestamp => // TIMESTAMP = epoch micros
      t.getTime * 1000L + (t.getNanos % 1000000) / 1000
    case t: java.time.Instant =>
      t.getEpochSecond * 1000000L + t.getNano / 1000
    case d: java.time.LocalDate => d.toEpochDay
    case n: Number => n.longValue()
  }

  private def writeVarint(out: java.io.ByteArrayOutputStream, value: Long): Unit = {
    var v = value
    while ((v & ~0x7fL) != 0) {
      out.write(((v & 0x7f) | 0x80).toInt)
      v >>>= 7
    }
    out.write(v.toInt)
  }

  // ---- decode ---------------------------------------------------------

  /** Parses wire bytes back into a Row (field numbers resolved through
    * the descriptor; unknown field numbers are an error — the schemas
    * on both ends must agree, as with the Storage Write API). */
  def deserialize(bytes: Array[Byte]): Row = decodeMessage(bytes, schema, descriptor)

  private def decodeMessage(bytes: Array[Byte], st: StructType,
                            d: ProtoMessageDescriptor): Row = {
    val byNumber = d.fields.map(f => f.number -> f).toMap
    val values = new Array[Any](d.fields.size)
    val repeatedAcc = scala.collection.mutable.Map.empty[Int, Vector[Any]]
    var pos = 0

    def readVarint(): Long = {
      var shift = 0
      var result = 0L
      var b = 0
      do {
        b = bytes(pos) & 0xff
        pos += 1
        result |= (b & 0x7fL) << shift
        shift += 7
      } while ((b & 0x80) != 0)
      result
    }

    while (pos < bytes.length) {
      val tag = readVarint()
      val number = (tag >>> 3).toInt
      val wire = (tag & 7).toInt
      val f = byNumber.getOrElse(number,
        throw new IllegalArgumentException(s"unknown field number $number"))
      val idx = d.fields.indexOf(f)
      val sf = st.fields(idx)
      val value: Any = wire match {
        case 0 =>
          val raw = readVarint()
          f.bqType match {
            case BqType.BOOL => raw != 0L
            case BqType.DATE => java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(raw))
            case BqType.TIMESTAMP =>
              val ts = new java.sql.Timestamp(Math.floorDiv(raw, 1000L))
              ts.setNanos((Math.floorMod(raw, 1000000L) * 1000L).toInt)
              ts
            case _ => elemType(sf) match {
              case IntegerType => raw.toInt
              case ShortType => raw.toShort
              case ByteType => raw.toByte
              case _ => raw
            }
          }
        case 1 =>
          var bits = 0L
          var i = 0
          while (i < 8) { bits |= (bytes(pos + i) & 0xffL) << (8 * i); i += 1 }
          pos += 8
          val dv = java.lang.Double.longBitsToDouble(bits)
          elemType(sf) match {
            case FloatType => dv.toFloat
            case _ => dv
          }
        case 2 =>
          val len = readVarint().toInt
          val chunk = java.util.Arrays.copyOfRange(bytes, pos, pos + len)
          pos += len
          f.bqType match {
            case BqType.BYTES => chunk
            case BqType.STRUCT =>
              val innerSt = elemType(sf).asInstanceOf[StructType]
              decodeMessage(chunk, innerSt, f.nested.get)
            case _ => new String(chunk, StandardCharsets.UTF_8)
          }
        case other => throw new IllegalArgumentException(s"unsupported wire type $other")
      }
      if (f.repeated) repeatedAcc(idx) = repeatedAcc.getOrElse(idx, Vector.empty) :+ value
      else values(idx) = value
    }
    repeatedAcc.foreach { case (idx, vs) => values(idx) = vs }
    new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(values, st)
  }

  private def elemType(sf: StructField): DataType = sf.dataType match {
    case ArrayType(e, _) => e
    case other => other
  }
}
