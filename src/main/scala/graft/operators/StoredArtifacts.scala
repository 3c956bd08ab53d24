package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared mechanics of the stored-artifact lifecycle (k-NN adjacency,
  * IVF lists, k-means centroids, BPE vocab, LR quality weights): a
  * content-keyed on-disk location plus a build-if-absent guard keyed
  * on the last-written table's parquet `_SUCCESS` sentinel. One
  * implementation instead of five copies — the copy drift already
  * produced one real bug (the quality-model dir omitted its build
  * params from the key, silently reusing a model trained with
  * different settings). */
private[operators] object StoredArtifacts {

  /** Bumped whenever ANY stored-artifact build algorithm changes in a
    * way that alters artifact content for identical inputs. Baked into
    * every artifact path, so an algorithm change can never silently
    * serve a stale pre-change artifact (the r6 verdict's staleness
    * hazard #4). Per-family algorithm changes should ALSO change that
    * family's `paramSuffix`; this constant is the belt to that
    * suspenders. */
  val AlgoVersion = 2

  /** `tmpdir/<family>/<safe(sfKey)>-v<algo>-n<rowCount>-f<fingerprint><paramSuffix>`
    * — keyed by (source key, algorithm version, row count, content
    * fingerprint) and the build parameters.
    *
    * The fingerprint is an order-independent xor-fold of a portable
    * 60-bit md5 over a keyed 1/64 sample of the dataframe's first
    * column: one single-column aggregate, cheap at any scale (column
    * pruning means the scan touches one column; the md5 only runs on
    * the 1/64 sample the xxhash64 gate admits; xor can never overflow
    * under ANSI mode and ignores row order). Identical row counts
    * with regenerated values — the real failure mode the testdata
    * generator has produced between rounds (the events ns/µs layout
    * change) — now produce a different key and a rebuild instead of a
    * silently stale model. */
  def contentKeyedDir(family: String, df: DataFrame, sfKey: String,
                      paramSuffix: String): String = {
    val safe = sfKey.replaceAll("[^A-Za-z0-9._-]", "_")
    val first = col(df.columns.head)
    val row = df.agg(
      count(lit(1)).as("n"),
      coalesce(bit_xor(when(pmod(xxhash64(first), lit(64)) === 0,
        conv(substring(md5(first.cast("string")), 1, 15), 16, 10).cast("long"))
        .otherwise(0L)), lit(0L)).as("fp")).head()
    val n = row.getLong(0)
    val fp = java.lang.Long.toHexString(row.getLong(1))
    s"${System.getProperty("java.io.tmpdir")}/$family/$safe-v$AlgoVersion-n$n-f$fp$paramSuffix"
  }

  /** Build-if-absent: the parquet `_SUCCESS` of `sentinel` (the LAST
    * table the build writes) is the completed-build marker — a torn
    * build rewrites, a finished one is never rebuilt. */
  def ensureBuilt(dir: String, sentinel: String)(build: => Unit): String = {
    if (!new java.io.File(s"$dir/$sentinel/_SUCCESS").exists()) build
    dir
  }

  /** True when `f` is a COMPLETED parquet table with at least one data
    * file. A zero-row write emits `_SUCCESS` but can emit no part
    * files (the empty plan schedules no write tasks), and
    * `spark.read.parquet` on such a dir throws at schema inference —
    * so every delta/epoch lister must require data files, not just the
    * sentinel. The stream faces also skip no-data micro-batches at
    * write time; this read-side filter additionally tolerates dirs a
    * pre-guard writer or a legitimately-empty keep set (every batch
    * doc was a dup) already produced — semantically an empty epoch
    * contributes nothing to a union, so skipping it IS reading it. */
  def readableEpoch(f: java.io.File): Boolean =
    new java.io.File(f, "_SUCCESS").exists && hasParquetFile(f)

  /** Recursive because partitioned tables (`partitionBy("list_id")`)
    * keep their part files under `key=value/` subdirectories. */
  private def hasParquetFile(f: java.io.File): Boolean =
    Option(f.listFiles()).exists(_.exists(c =>
      (c.isFile && c.getName.endsWith(".parquet")) ||
        (c.isDirectory && !c.getName.startsWith("_") && hasParquetFile(c))))
}
