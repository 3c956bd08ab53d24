package graft.schema

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

/** BigQuery-style schema JSON ⇄ BqTableSchema — the classic
  * `[{"name": ..., "type": ..., "mode": ..., "fields": [...]}, ...]`
  * document a `bq` user would hand the reference connector. Gives the
  * schema model a text round-trip:
  * JSON → BqTableSchema → StructType → BqTableSchema → JSON.
  */
object BqSchemaJson {
  private val mapper = new ObjectMapper()

  def parse(json: String): BqTableSchema = {
    val root = mapper.readTree(json)
    val arr = if (root.isArray) root
      else if (root.has("fields")) root.get("fields")
      else throw new IllegalArgumentException("schema JSON must be an array or {fields: []}")
    BqTableSchema(arr.elements().asScala.map(parseField).toSeq)
  }

  private def parseField(n: JsonNode): BqField = {
    val name = n.get("name").asText()
    val t = BqType.withName(n.get("type").asText().toUpperCase match {
      case "RECORD" => "STRUCT" // legacy alias
      case "BOOLEAN" => "BOOL"
      case "FLOAT" | "FLOAT64" => "DOUBLE"
      case "INTEGER" => "INT64"
      case other => other
    })
    val mode = if (n.has("mode")) BqMode.withName(n.get("mode").asText().toUpperCase)
      else BqMode.NULLABLE
    val children = if (n.has("fields"))
      n.get("fields").elements().asScala.map(parseField).toSeq else Nil
    BqField(name, t, mode, children,
      description = Option(n.get("description")).map(_.asText()),
      precision = Option(n.get("precision")).map(_.asInt()),
      scale = Option(n.get("scale")).map(_.asInt()),
      maxLength = Option(n.get("maxLength")).map(_.asInt()))
  }

  def render(schema: BqTableSchema): String = {
    val arr = mapper.createArrayNode()
    schema.fields.foreach(f => arr.add(renderField(f)))
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(arr)
  }

  private def renderField(f: BqField): ObjectNode = {
    val o = mapper.createObjectNode()
    o.put("name", f.name)
    o.put("type", f.bqType.toString)
    o.put("mode", f.mode.toString)
    f.description.foreach(o.put("description", _))
    f.precision.foreach(o.put("precision", _))
    f.scale.foreach(o.put("scale", _))
    f.maxLength.foreach(o.put("maxLength", _))
    if (f.fields.nonEmpty) {
      val arr: ArrayNode = mapper.createArrayNode()
      f.fields.foreach(c => arr.add(renderField(c)))
      o.set[ObjectNode]("fields", arr)
    }
    o
  }
}
