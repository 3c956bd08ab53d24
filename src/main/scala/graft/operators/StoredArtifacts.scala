package graft.operators

import org.apache.spark.sql.DataFrame

/** Shared mechanics of the stored-artifact lifecycle (k-NN adjacency,
  * IVF lists, k-means centroids, BPE vocab, LR quality weights): a
  * content-keyed on-disk location plus a build-if-absent guard keyed
  * on the last-written table's parquet `_SUCCESS` sentinel. One
  * implementation instead of five copies — the copy drift already
  * produced one real bug (the quality-model dir omitted its build
  * params from the key, silently reusing a model trained with
  * different settings). */
private[operators] object StoredArtifacts {

  /** `tmpdir/<family>/<safe(sfKey)>-n<rowCount><paramSuffix>` — keyed
    * by (source key, row count — a parquet-metadata read) and the
    * build parameters: the strongest identity available without
    * hashing the corpus (see [[Ann.defaultIndexDir]]'s caveat). */
  def contentKeyedDir(family: String, df: DataFrame, sfKey: String,
                      paramSuffix: String): String = {
    val safe = sfKey.replaceAll("[^A-Za-z0-9._-]", "_")
    val n = df.count()
    s"${System.getProperty("java.io.tmpdir")}/$family/$safe-n$n$paramSuffix"
  }

  /** Build-if-absent: the parquet `_SUCCESS` of `sentinel` (the LAST
    * table the build writes) is the completed-build marker — a torn
    * build rewrites, a finished one is never rebuilt. */
  def ensureBuilt(dir: String, sentinel: String)(build: => Unit): String = {
    if (!new java.io.File(s"$dir/$sentinel/_SUCCESS").exists()) build
    dir
  }
}
