package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.F

/** Deduplication operators for LLM training data, SURVEY.md §2d.
  *
  * Shared shape: per-row signature (codegen custom Expression) →
  * bucket/band shuffle → candidate pairs within buckets → exact verify.
  * No all-pairs comparison anywhere: candidate generation is always
  * bounded by a bucketing key, which is what keeps these ops alive at
  * 100 TB (pairs are generated per band-bucket, and band buckets are
  * uniformly hash-distributed).
  */
object Dedup {

  private[operators] val tokens: Column = split(trim(lower(col("text"))), "\\s+")

  /** Word 3-gram shingles (falls back to whole text when too short). */
  private[operators] def shingles(k: Int = 3): Column =
    when(size(tokens) >= k,
      transform(sequence(lit(0), size(tokens) - k),
        i => concat_ws(" ", slice(tokens, i + 1, lit(k)))))
      .otherwise(array(concat_ws(" ", tokens)))

  /** Exact dedup by content hash; groups shuffle on a 128-bit digest,
    * never on raw text (shuffle key stays 16 bytes at 100 TB). */
  def dedupExact(documents: DataFrame): DataFrame =
    documents
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .orderBy(col("content_hash"))

  /** MinHash + banded LSH near-dup detection.
    *
    * numPerm=128 signature, `bands` bands of 128/bands rows hashed to a
    * band key; docs sharing any band key become candidates; candidates
    * are verified with exact shingle-set Jaccard >= `threshold`.
    * Output: one row per doc with its verified duplicate partner (min
    * doc_id), or null — plus signature head for inspection.
    */
  def dedupMinhashLsh(documents: DataFrame, numPerm: Int = 128, bands: Int = 16,
                      threshold: Double = 0.5): DataFrame = {
    require(bands > 0 && numPerm % bands == 0,
      s"bands ($bands) must divide numPerm ($numPerm): a remainder silently drops " +
        "tail permutations, and bands > numPerm degenerates to all-pairs")
    val rowsPerBand = numPerm / bands
    val docs = documents
      .select(col("doc_id"), shingles().as("sh"))
      .withColumn("sig", F.minhash(col("sh"), numPerm))

    val banded = docs.select(col("doc_id"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(slice(col("sig"), b * lit(rowsPerBand) + 1, lit(rowsPerBand))))))
      .select(col("doc_id"), col("pos").as("band_id"), col("col").as("band_hash"))

    val cands = banded.as("x").join(banded.as("y"),
        col("x.band_id") === col("y.band_id") &&
        col("x.band_hash") === col("y.band_hash") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .distinct()

    val verified = cands
      .join(docs.select(col("doc_id").as("a_id"), col("sh").as("sh_a")), "a_id")
      .join(docs.select(col("doc_id").as("b_id"), col("sh").as("sh_b")), "b_id")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jaccard") >= threshold)

    // Symmetrize so every member of a dup pair points at its min partner.
    val partners = verified.select(col("a_id").as("doc_id"), col("b_id").as("partner"))
      .unionAll(verified.select(col("b_id").as("doc_id"), col("a_id").as("partner")))
      .groupBy(col("doc_id")).agg(min(col("partner")).as("dup_partner"))

    docs.select(col("doc_id"), size(col("sh")).as("n_shingles"),
        element_at(col("sig"), 1).as("sig_head"))
      .join(partners, Seq("doc_id"), "left")
      .orderBy(col("doc_id"))
  }

  /** MinHash LSH on the allocation-free fast path: hashed shingles
    * straight from text bytes (ShingleHashes) → MinHash over longs →
    * same banding — no token/shingle strings materialize anywhere, and
    * the Jaccard verify runs the sorted-merge intersect kernel. Same
    * output shape as [[dedupMinhashLsh]]; the spec asserts both find
    * the same duplicate partners. */
  def dedupMinhashLshFast(documents: DataFrame, numPerm: Int = 128, bands: Int = 16,
                          threshold: Double = 0.5): DataFrame = {
    require(bands > 0 && numPerm % bands == 0,
      s"bands ($bands) must divide numPerm ($numPerm)")
    val rowsPerBand = numPerm / bands
    val docs = documents
      .select(col("doc_id"),
        sort_array(array_distinct(F.shingleHashes(col("text"), 3))).as("shh"))
      .withColumn("sig", F.minhashHashed(col("shh"), numPerm))

    val banded = docs.select(col("doc_id"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(slice(col("sig"), b * lit(rowsPerBand) + 1, lit(rowsPerBand))))))
      .select(col("doc_id"), col("pos").as("band_id"), col("col").as("band_hash"))

    val cands = banded.as("x").join(banded.as("y"),
        col("x.band_id") === col("y.band_id") &&
        col("x.band_hash") === col("y.band_hash") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .distinct()

    val inter = F.sortedIntersect(col("shh_a"), col("shh_b"))
    val verified = cands
      .join(docs.select(col("doc_id").as("a_id"), col("shh").as("shh_a")), "a_id")
      .join(docs.select(col("doc_id").as("b_id"), col("shh").as("shh_b")), "b_id")
      .withColumn("jaccard",
        inter.cast("double") / (size(col("shh_a")) + size(col("shh_b")) - inter))
      .filter(col("jaccard") >= threshold)

    val partners = verified.select(col("a_id").as("doc_id"), col("b_id").as("partner"))
      .unionAll(verified.select(col("b_id").as("doc_id"), col("a_id").as("partner")))
      .groupBy(col("doc_id")).agg(min(col("partner")).as("dup_partner"))

    docs.select(col("doc_id"), size(col("shh")).as("n_shingles"),
        element_at(col("sig"), 1).as("sig_head"))
      .join(partners, Seq("doc_id"), "left")
      .orderBy(col("doc_id"))
  }

  /** SimHash near-dup: 64-bit signature, candidates share one of four
    * 16-bit bands, verified by Hamming distance <= maxHamming. */
  def dedupSimhash(documents: DataFrame, maxHamming: Int = 6): DataFrame = {
    val docs = documents.select(col("doc_id"), F.simhash(tokens).as("sim"))
    val banded = docs.select(col("doc_id"), col("sim"),
        posexplode(array((0 to 3).map(b =>
          shiftrightunsigned(col("sim"), b * 16).bitwiseAND(lit(0xffffL))): _*)))
      .select(col("doc_id"), col("sim"), col("pos").as("band_id"), col("col").as("band_val"))
    val cands = banded.as("x").join(banded.as("y"),
        col("x.band_id") === col("y.band_id") &&
        col("x.band_val") === col("y.band_val") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("x.sim").as("sim_a"),
        col("y.doc_id").as("b_id"), col("y.sim").as("sim_b"))
      .distinct()
      .withColumn("hamming", bit_count(col("sim_a").bitwiseXOR(col("sim_b"))))
      .filter(col("hamming") <= maxHamming)
    val partners = cands.select(col("a_id").as("doc_id"), col("b_id").as("partner"))
      .unionAll(cands.select(col("b_id").as("doc_id"), col("a_id").as("partner")))
      .groupBy(col("doc_id")).agg(min(col("partner")).as("dup_partner"))
    docs.join(partners, Seq("doc_id"), "left")
      .select(col("doc_id"), col("sim").as("simhash"), col("dup_partner"))
      .orderBy(col("doc_id"))
  }

  /** Token-set Jaccard dedup with a signature-banded candidate stage:
    * MinHash over the distinct tokens → banded LSH buckets generate
    * candidates, then exact token-set Jaccard verifies via the
    * sorted-merge intersect kernel. `blockKeys` (e.g. lang/source)
    * compose metadata blocking with banding: the block columns are
    * FOLDED INTO the 8-byte band hash, so block-AND-band semantics
    * cost no extra join keys and no string replication in the shuffle.
    * 32 bands x 4 rows → >0.99 recall at threshold 0.8. */
  def dedupNgramJaccard(documents: DataFrame, threshold: Double = 0.8,
                        numPerm: Int = 128, bands: Int = 32,
                        blockKeys: Seq[String] = Nil): DataFrame = {
    require(bands > 0 && numPerm % bands == 0,
      s"bands ($bands) must divide numPerm ($numPerm)")
    val rowsPerBand = numPerm / bands
    val docs = documents.select((Seq(col("doc_id")) ++ blockKeys.map(col) ++ Seq(
        array_distinct(tokens).as("tok_set"),
        sort_array(array_distinct(transform(array_distinct(tokens),
          t => xxhash64(t)))).as("tok_hashes"))): _*)
      .withColumn("sig", F.minhash(col("tok_set"), numPerm))
    val banded = docs.select(col("doc_id"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64((blockKeys.map(col) :+
            slice(col("sig"), b * lit(rowsPerBand) + 1, lit(rowsPerBand))): _*))))
      .select(col("doc_id"), col("pos").as("band_id"), col("col").as("band_hash"))
    val cands = banded.as("x").join(banded.as("y"),
        col("x.band_id") === col("y.band_id") &&
        col("x.band_hash") === col("y.band_hash") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .distinct()
    val inter = F.sortedIntersect(col("h_a"), col("h_b"))
    cands
      .join(docs.select(col("doc_id").as("a_id"), col("tok_hashes").as("h_a")), "a_id")
      .join(docs.select(col("doc_id").as("b_id"), col("tok_hashes").as("h_b")), "b_id")
      .withColumn("jaccard",
        inter.cast("double") / (size(col("h_a")) + size(col("h_b")) - inter))
      .filter(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), round(col("jaccard"), 4).as("jaccard"))
      .orderBy(col("a_id"), col("b_id"))
  }

  /** Block-then-band composition (the production default): metadata
    * bounds the similarity-degenerate case, banding bounds the
    * big-block case. */
  def dedupNgramJaccardComposed(documents: DataFrame, threshold: Double = 0.8): DataFrame =
    dedupNgramJaccard(documents, threshold, blockKeys = Seq("lang", "source"))

  /** Attribute-blocked variant (classic record-linkage blocking on
    * (lang, source, length)) — kept for corpora where metadata blocking
    * is cheaper than signatures; block sizes grow with corpus, so the
    * banded [[dedupNgramJaccard]] is the default scale path. */
  def dedupNgramJaccardBlocked(documents: DataFrame, threshold: Double = 0.8): DataFrame = {
    val docs = documents.select(col("doc_id"), col("lang"), col("source"),
        (col("n_chars") / 100).cast("int").as("len_bucket"),
        sort_array(array_distinct(transform(array_distinct(tokens),
          t => xxhash64(t)))).as("tok_hashes"))
    val inter = F.sortedIntersect(col("x.tok_hashes"), col("y.tok_hashes"))
    docs.as("x").join(docs.as("y"),
        col("x.lang") === col("y.lang") &&
        col("x.source") === col("y.source") &&
        col("x.len_bucket") === col("y.len_bucket") &&
        col("x.doc_id") < col("y.doc_id"))
      .withColumn("jaccard",
        inter.cast("double") /
          (size(col("x.tok_hashes")) + size(col("y.tok_hashes")) - inter))
      .filter(col("jaccard") >= threshold)
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"),
        round(col("jaccard"), 4).as("jaccard"))
      .orderBy(col("a_id"), col("b_id"))
  }

  /** Winnowing-fingerprint dedup: docs sharing >= `minShared` selected
    * fingerprints are near-dup candidates, verified by fingerprint-set
    * overlap ratio. The explode/group candidate generation is the
    * inverted-index pattern: pairs only form inside one fingerprint
    * bucket, never globally. */
  def dedupFingerprint(documents: DataFrame, minShared: Int = 3,
                       overlap: Double = 0.5, maxDocFreq: Int = 20): DataFrame = {
    val docs = documents.select(col("doc_id"),
      F.fingerprint(col("text"), 20, 4).as("fp"))
    val exploded = docs.select(col("doc_id"), explode(col("fp")).as("f"))
    // Stop-fingerprint removal (standard winnowing-index practice): a
    // gram shared by more than maxDocFreq docs is boilerplate and would
    // blow the bucket join quadratically; true near-dups still share
    // plenty of rare grams. Bounds pairs at maxDocFreq^2/2 per bucket.
    val rare = exploded.groupBy(col("f"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDocFreq)
      .select(col("f"))
    val inverted = exploded.join(rare, "f")
    val cands = inverted.as("x").join(inverted.as("y"),
        col("x.f") === col("y.f") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
    cands
      .join(docs.select(col("doc_id").as("a_id"), size(col("fp")).as("na")), "a_id")
      .join(docs.select(col("doc_id").as("b_id"), size(col("fp")).as("nb")), "b_id")
      .withColumn("overlap_ratio",
        round(col("shared").cast("double") / least(col("na"), col("nb")), 4))
      .filter(col("overlap_ratio") >= overlap)
      .select(col("a_id"), col("b_id"), col("shared"), col("overlap_ratio"))
      .orderBy(col("a_id"), col("b_id"))
  }

  /** Connected components over near-dup pairs: iterative min-label
    * propagation (each node adopts the min label in its neighborhood)
    * until fixpoint — the distributed union-find that turns pairwise
    * dup evidence into clusters. Converges in O(component diameter)
    * rounds; dup clusters are shallow in practice. `localCheckpoint`
    * per round truncates lineage so plans stay constant-size.
    * Input: (a_id, b_id) pairs. Output: (doc_id, cluster_id) with
    * cluster_id = min doc_id of the component; keep-one dedup keeps
    * doc_id == cluster_id. */
  def dupClusters(pairs: DataFrame, maxIter: Int = 25): DataFrame = {
    val edges = pairs.select(col("a_id"), col("b_id"))
      .unionAll(pairs.select(col("b_id").as("a_id"), col("a_id").as("b_id")))
      .localCheckpoint(true)
    var labels = edges.select(col("a_id").as("id")).distinct()
      .withColumn("label", col("id"))
      .localCheckpoint(true)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val nbrMin = edges
        .join(labels.select(col("id").as("b_id"), col("label").as("nl")), "b_id")
        .groupBy(col("a_id").as("id")).agg(min(col("nl")).as("nmin"))
      val updated = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"), col("label"),
          least(col("label"), coalesce(col("nmin"), col("label"))).as("new_label"))
        .localCheckpoint(true)
      converged = updated.filter(col("new_label") < col("label")).isEmpty
      labels = updated.select(col("id"), col("new_label").as("label")).localCheckpoint(true)
      i += 1
    }
    labels.select(col("id").as("doc_id"), col("label").as("cluster_id"))
      .orderBy(col("doc_id"))
  }

  /** End-to-end near-dup clustering: fingerprint pairs → components →
    * cluster summary (size, kept representative). */
  def dedupClusters(documents: DataFrame): DataFrame = {
    val pairs = dedupFingerprint(documents).select(col("a_id"), col("b_id"))
    dupClusters(pairs)
      .groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("cluster_size"), min(col("doc_id")).as("keep_id"))
      .orderBy(col("cluster_id"))
  }

  /** Embedding-cosine near-dup pairs, candidates restricted to a shared
    * random-hyperplane LSH bucket (no all-pairs at scale). */
  def dedupEmbedding(embeddings: DataFrame, numPlanes: Int = 8,
                     threshold: Double = 0.95): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vecs = embeddings.select(col("vec_id"), col("embedding"),
      F.hyperplaneBucket(col("embedding"), numPlanes).as("bucket"))
    val pairs = vecs.as("x").join(vecs.as("y"),
        col("x.bucket") === col("y.bucket") && col("x.vec_id") =!= col("y.vec_id"))
      .withColumn("cos", F.cosine(col("x.embedding"), col("y.embedding")))
    val w = Window.partitionBy(col("x.vec_id")).orderBy(col("cos").desc, col("y.vec_id").asc)
    val best = pairs
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("x.vec_id").as("vec_id"), col("y.vec_id").as("best_match_id"),
        round(col("cos"), 4).as("best_cosine"),
        (col("cos") >= threshold).as("is_dup"))
    vecs.select(col("vec_id"), col("bucket"))
      .join(best, Seq("vec_id"), "left")
      .orderBy(col("vec_id"))
  }
}
