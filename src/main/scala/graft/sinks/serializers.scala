package graft.sinks

import java.nio.charset.StandardCharsets
import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.Row

/** Row-to-bytes serializers — the Spark re-expression of
  * serializer/RowValueSerializer.java (+ Json/Proto variants). The
  * reference defers to user implementations; graft provides generic
  * Row-driven ones so any DataFrame can be sunk without codegen'd
  * per-type plumbing.
  */
trait RowValueSerializer[A] extends Serializable {
  def serialize(value: A): Array[Byte]
}

/** serializer/NoOpRowSerializer.java analog. */
class NoOpRowSerializer extends RowValueSerializer[Array[Byte]] {
  override def serialize(value: Array[Byte]): Array[Byte] = value
}

/** JSON per-row encoding (JsonRowValueSerializer analog): field order
  * follows the schema; nulls omitted like Spark's `to_json`. */
class JsonRowSerializer extends RowValueSerializer[Row] {
  override def serialize(row: Row): Array[Byte] = {
    val sb = new StringBuilder("{")
    var first = true
    val schema = row.schema
    var i = 0
    while (i < schema.length) {
      if (!row.isNullAt(i)) {
        if (!first) sb.append(',')
        first = false
        sb.append('"').append(escape(schema(i).name)).append("\":")
        row.get(i) match {
          case s: String => sb.append('"').append(escape(s)).append('"')
          case b: Boolean => sb.append(b)
          // bare NaN/Infinity tokens are invalid JSON — encode as null
          case d: java.lang.Double if d.isNaN || d.isInfinite => sb.append("null")
          case f: java.lang.Float if f.isNaN || f.isInfinite => sb.append("null")
          case n: java.lang.Number => sb.append(n.toString)
          case other => sb.append('"').append(escape(other.toString)).append('"')
        }
      }
      i += 1
    }
    sb.append('}').toString.getBytes(StandardCharsets.UTF_8)
  }

  private def escape(s: String): String = {
    val sb = new StringBuilder
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }
}

/** Compact tag-length-value binary encoding (ProtoValueSerializer
  * analog): deterministic, self-delimiting, schema-ordered — the wire
  * shape a proto encoder would produce, without a descriptor
  * dependency. Tag byte = field index; wire types: 0=null, 1=varint-
  * less fixed64, 2=length-delimited utf8, 3=fixed64 double, 4=bool. */
class BinaryRowSerializer extends RowValueSerializer[Row] {
  override def serialize(row: Row): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < row.schema.length) {
      out.write(i)
      if (row.isNullAt(i)) out.write(0)
      else row.get(i) match {
        case l: Long => out.write(1); out.write(fixed64(l))
        case n: Int => out.write(1); out.write(fixed64(n.toLong))
        case s: String =>
          val b = s.getBytes(StandardCharsets.UTF_8)
          out.write(2); out.write(fixed64(b.length.toLong)); out.write(b)
        case d: Double => out.write(3); out.write(fixed64(java.lang.Double.doubleToLongBits(d)))
        case b: Boolean => out.write(4); out.write(if (b) 1 else 0)
        case other =>
          val b = other.toString.getBytes(StandardCharsets.UTF_8)
          out.write(2); out.write(fixed64(b.length.toLong)); out.write(b)
      }
      i += 1
    }
    out.toByteArray
  }

  private def fixed64(l: Long): Array[Byte] =
    ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN).putLong(l).array()
}
