package graft.schema

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.StructType

/** Table lifecycle + schema evolution against the Spark catalog — the
  * re-expression of schema/SchemaTools.java: createTable,
  * exists, updateTable (add the new columns, drop the removed top-level
  * columns — SchemaTools.java:91-103), updateView.
  *
  * The reference patches BigQuery via RPC + `ALTER TABLE ... DROP
  * COLUMN` SQL; here the catalog is Spark's: new columns arrive via
  * `ALTER TABLE ADD COLUMNS` (cheap, metadata-only), dropped columns
  * require a rewrite for parquet-backed tables (CREATE OR REPLACE from
  * a projection) — same observable semantics, costs made explicit.
  */
class SchemaTools(spark: SparkSession) {

  def exists(table: String): Boolean = spark.catalog.tableExists(table)

  def createTable(table: String, schema: StructType): Unit = {
    val ddl = schema.toDDL
    spark.sql(s"CREATE TABLE $table ($ddl) USING parquet")
  }

  /** Creates a table straight from a BigQuery-style schema JSON
    * document (the artifact a `bq` user already has) — JSON →
    * BqTableSchema → StructType → DDL. */
  def createTableFromJson(table: String, schemaJson: String): StructType = {
    val st = SchemaTransformer.toSpark(BqSchemaJson.parse(schemaJson))
    createTable(table, st)
    st
  }

  def dropTable(table: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS $table")

  def currentSchema(table: String): StructType = spark.table(table).schema

  /** Evolve `table` to `newSchema`: columns present only in newSchema
    * are added (nullable); columns absent from it are dropped. Nested
    * field changes are out of scope, as in the reference (top-level
    * only — SchemaTools.java:140-143). Returns (added, dropped). */
  def updateTable(table: String, newSchema: StructType): (Seq[String], Seq[String]) = {
    val cur = currentSchema(table)
    val curNames = cur.fieldNames.toSet
    val newNames = newSchema.fieldNames.toSet
    val added = newSchema.fields.filter(f => !curNames.contains(f.name)).toSeq
    val dropped = cur.fieldNames.filter(n => !newNames.contains(n)).toSeq

    if (added.nonEmpty) {
      val ddl = added.map(f => s"${quote(f.name)} ${f.dataType.sql}").mkString(", ")
      spark.sql(s"ALTER TABLE $table ADD COLUMNS ($ddl)")
    }
    if (dropped.nonEmpty) {
      // Parquet v1 tables can't DROP COLUMN in place: rewrite through a
      // projection, preserving remaining column order of newSchema.
      val keep = spark.table(table).select(
        newSchema.fieldNames.filter(n => curNames.contains(n) || added.exists(_.name == n))
          .map(n => col(quote(n))).toIndexedSeq: _*)
      val tmp = table + "_graft_evolve_tmp"
      keep.write.mode("overwrite").saveAsTable(tmp)
      spark.sql(s"DROP TABLE $table")
      spark.sql(s"ALTER TABLE $tmp RENAME TO $table")
    }
    (added.map(_.name).toSeq, dropped)
  }

  def createOrUpdateView(view: String, query: String): Unit =
    spark.sql(s"CREATE OR REPLACE VIEW $view AS $query")

  private def quote(n: String): String = s"`$n`"
}
