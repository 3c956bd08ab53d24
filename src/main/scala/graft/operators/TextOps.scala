package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM training-data pipelines, SURVEY.md §2d.
  *
  * Everything here is built from codegen'd builtins (split / filter
  * lambda / regexp) — no UDFs — so the whole pipeline stays inside
  * WholeStageCodegen and scales embarrassingly parallel (per-row, no
  * shuffle). Each op has an exact DuckDB-SQL mirror in SparkEntry.
  */
object TextOps {

  private val tokens: Column = split(trim(lower(col("text"))), "\\s+")

  private def stopHits(stops: Seq[String]): Column =
    size(filter(tokens, t => t.isin(stops.map(x => x: Any): _*)))

  val EN_STOPS = Seq("the", "a", "of", "and", "to", "in", "is")
  val DE_STOPS = Seq("der", "die", "das", "und", "ist", "ein")
  val FR_STOPS = Seq("le", "la", "les", "et", "est", "un")
  val ES_STOPS = Seq("el", "la", "los", "y", "es", "un")

  /** Token statistics: whitespace tokens + BPE-ish regex tokens. */
  def textTokens(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      length(col("text")).cast("long").as("n_chars"),
      size(tokens).cast("long").as("n_ws_tokens"),
      size(regexp_extract_all(lower(col("text")),
        lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))).cast("long").as("n_bpe_tokens"))
      .orderBy(col("doc_id"))

  private def punctRatioCol: Column = {
    val nChars = length(col("text"))
    (nChars - length(regexp_replace(col("text"), "[.,!?;:]", ""))).cast("double") / nChars
  }

  /** Unrounded composite quality score (shared by textQuality and the
    * curation pipeline so filters compare raw values on both sides). */
  private[operators] def rawQualityScore: Column = {
    val nTok = size(tokens)
    val stopRatio = stopHits(EN_STOPS).cast("double") / nTok
    least(nTok.cast("double") / lit(50.0), lit(1.0)) * lit(0.5) +
      least(stopRatio * lit(5.0), lit(1.0)) * lit(0.3) +
      (lit(1.0) - least(punctRatioCol * lit(10.0), lit(1.0))) * lit(0.2)
  }

  /** Quality scoring: length, punctuation ratio, stopword ratio, mean
    * word length, and a bounded composite score. */
  def textQuality(documents: DataFrame): DataFrame = {
    val nChars = length(col("text"))
    val nTok = size(tokens)
    val punctRatio = punctRatioCol
    val stopRatio = stopHits(EN_STOPS).cast("double") / nTok
    val meanWordLen = length(regexp_replace(col("text"), "\\s+", "")).cast("double") / nTok
    val score = rawQualityScore
    documents.select(
      col("doc_id"),
      nChars.cast("long").as("n_chars"),
      nTok.cast("long").as("n_tokens"),
      round(punctRatio + lit(1e-9), 4).as("punct_ratio"),
      round(stopRatio + lit(1e-9), 4).as("stop_ratio"),
      round(meanWordLen + lit(1e-9), 4).as("mean_word_len"),
      round(score + lit(1e-9), 4).as("quality_score"))
      .orderBy(col("doc_id"))
  }

  /** Corpus-level vocabulary statistics: top-N token frequencies.
    * explode → hash-agg on token (map-side combine) → global top-N via
    * TakeOrdered; at 100 TB the agg output is vocabulary-sized, tiny
    * next to the corpus. */
  def ngramFreq(documents: DataFrame, topN: Int = 100): DataFrame =
    documents
      .select(explode(tokens).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy(col("token"))
      .agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("token").asc)
      .limit(topN)

  /** Flagship curation pipeline: the composition a training-data run
    * actually executes — exact-dedup (keep first copy), quality gate,
    * language ID, deterministic md5 train/val/test split — in one
    * DataFrame program (one shuffle for the dedup window, one for the
    * final rollup). */
  def curationPipeline(documents: DataFrame, minQuality: Double = 0.5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keepW = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))
    val split = conv(substring(md5(col("text")), 1, 4), 16, 10).cast("long") % 100
    // quality and language are per-row expressions — computed as
    // columns in the same pass, never joined back by key (a join per
    // derived column is two extra shuffles the plan doesn't need)
    documents
      .withColumn("copy_rank", row_number().over(keepW))
      .withColumn("split_bucket", split)
      .filter(col("copy_rank") === 1)
      .withColumn("quality_score", rawQualityScore)
      .withColumn("lang_pred", langPredCol)
      .filter(col("quality_score") >= minQuality)
      .withColumn("split",
        when(col("split_bucket") < 10, "val")
          .when(col("split_bucket") < 20, "test")
          .otherwise("train"))
      .groupBy(col("lang_pred"), col("split"))
      .agg(count(lit(1)).as("n_docs"), round(avg(col("quality_score")) + lit(1e-9), 4).as("avg_quality"))
      .orderBy(col("lang_pred"), col("split"))
  }

  /** PII redaction: email / phone-like / URL patterns masked; emits
    * the redacted text plus a redaction count (audit trail). Patterns
    * kept to the regex subset Java and RE2 interpret identically. */
  def piiRedact(documents: DataFrame): DataFrame = {
    val emailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
    val phoneRe = "\\+?[0-9][0-9 ()-]{7,}[0-9]"
    val urlRe = "https?://[^ ]+"
    val once = regexp_replace(regexp_replace(regexp_replace(col("text"),
      emailRe, "<EMAIL>"), urlRe, "<URL>"), phoneRe, "<PHONE>")
    documents.select(
      col("doc_id"),
      once.as("redacted"),
      ((length(col("text")) - length(regexp_replace(regexp_replace(regexp_replace(col("text"),
        emailRe, ""), urlRe, ""), phoneRe, ""))) > 0).as("had_pii"))
      .select(col("doc_id"), length(col("redacted")).cast("long").as("redacted_len"),
        col("had_pii"))
      .orderBy(col("doc_id"))
  }

  /** Repetition signals: duplicate-token fraction and the most frequent
    * token's share — the cheap boilerplate/spam detectors. Explode →
    * per-(doc, token) counts → per-doc max; all map-side-combinable. */
  def textRepetition(documents: DataFrame): DataFrame = {
    val perTok = documents.select(col("doc_id"), explode(tokens).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
    perTok.groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tokens"), count(lit(1)).as("n_distinct"),
        max(col("c")).as("top_count"))
      .select(col("doc_id"), col("n_tokens"), col("n_distinct"),
        round(col("n_distinct").cast("double") / col("n_tokens") + lit(1e-9), 4).as("distinct_ratio"),
        round(col("top_count").cast("double") / col("n_tokens") + lit(1e-9), 4).as("top_token_frac"))
      .orderBy(col("doc_id"))
  }

  /** The language-ID decision expression, shared by the batch op and
    * the streaming pipeline. */
  private[operators] def langPredCol: Column = {
    val en = stopHits(EN_STOPS)
    val de = stopHits(DE_STOPS)
    val fr = stopHits(FR_STOPS)
    val es = stopHits(ES_STOPS)
    val zh = octet_length(col("text")) - length(col("text"))
    when(zh > 0, "zh")
      .when(en >= de && en >= fr && en >= es, "en")
      .when(de >= fr && de >= es, "de")
      .when(fr >= es, "fr")
      .otherwise("es")
  }

  /** Stopword-profile language ID. `nonascii` doubles as a CJK signal
    * (octet_length > char length) without regex-dialect hazards. */
  def textLangid(documents: DataFrame): DataFrame = {
    val en = stopHits(EN_STOPS)
    val de = stopHits(DE_STOPS)
    val fr = stopHits(FR_STOPS)
    val es = stopHits(ES_STOPS)
    val zh = octet_length(col("text")) - length(col("text"))
    documents.select(
      col("doc_id"), col("lang"),
      en.cast("long").as("en_score"), de.cast("long").as("de_score"), fr.cast("long").as("fr_score"), es.cast("long").as("es_score"),
      zh.cast("long").as("zh_score"), langPredCol.as("lang_pred"))
      .orderBy(col("doc_id"))
  }

  /** Streaming face of the curation pipeline: the same per-document
    * stages — exact dedup, quality gate, language ID, deterministic
    * split — running on a document stream. Everything is stateless
    * per-row EXCEPT the dedup, whose state is bounded by the watermark
    * (`dropDuplicatesWithinWatermark` on the content hash keeps a
    * digest only as long as a duplicate could still arrive). Emits one
    * curated record per surviving document in append mode; rollups
    * happen downstream. Requires a `ts` event-time column. */
  def curationStream(docs: DataFrame, lateness: String = "10 minutes",
                     minQuality: Double = 0.5): DataFrame = {
    val split = conv(substring(md5(col("text")), 1, 4), 16, 10).cast("long") % 100
    docs
      .withWatermark("ts", lateness)
      .withColumn("content_hash", md5(col("text")))
      .dropDuplicatesWithinWatermark("content_hash")
      .withColumn("quality_score", rawQualityScore)
      .filter(col("quality_score") >= minQuality)
      .select(col("doc_id"), col("ts"),
        langPredCol.as("lang_pred"),
        when(split < 10, "val").when(split < 20, "test").otherwise("train").as("split"),
        round(col("quality_score") + lit(1e-9), 4).as("quality_score"))
  }

  /** Exact-span dedup signal (the Lee et al. "Deduplicating Training
    * Data" exact-substring family, at k-token span granularity): for
    * each doc, how many of its distinct k-token spans appear in at
    * least one OTHER document. High dup_fraction = templated/copied
    * text, the C4-style removal candidate.
    *
    * Scale shape: distinct spans per doc → groupBy span COUNT (the
    * inverted span index; map-side combinable, and hot boilerplate
    * spans are merely counted — no doc-pair join exists, so unlike the
    * similarity kernels this needs no df-cap) → one shuffle join back
    * on span. Linear in corpus spans. */
  def spanDedup(documents: DataFrame, k: Int = 10): DataFrame = {
    // spans travel as 64-bit shingle hashes, not k-token strings: the
    // output consumes only equality structure (counts), so hashing cuts
    // the two span shuffles ~8x in bytes and skips all string
    // allocation (collision risk 2^-64 per pair — at corpus scale a
    // collision perturbs one span count, not a pair join)
    val docSpans = documents.select(col("doc_id"),
      explode(graft.functions.F.shingleHashes(col("text"), k, sortedDistinct = true)).as("span"))
    // spans are distinct within a doc, so count(*) = distinct-doc count
    val spanDf = docSpans.groupBy(col("span")).agg(count(lit(1)).as("span_df"))
    docSpans.join(spanDf, "span")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(when(col("span_df") >= 2, 1L).otherwise(0L)).as("dup_spans"))
      .withColumn("dup_fraction",
        round(col("dup_spans").cast("double") / col("n_spans"), 4))
      .orderBy(col("doc_id"))
  }

  /** [[packSequences]] with oversized-document SPLITTING — the full
    * production packing semantic: a doc longer than the budget first
    * splits into ceil(n/budget) chunks (all but the last exactly
    * budget tokens), and the greedy pass packs CHUNKS in (doc_id,
    * chunk_idx) order. Every pack therefore closes at exactly >=
    * budget except each shard's tail — no pack is dominated by one
    * runaway doc. Chunk expansion is a per-row explode (no shuffle);
    * the rest is the same one-shard-shuffle greedy kernel. */
  def packSequencesSplit(documents: DataFrame, budgetTokens: Long = 1024,
                         shards: Int = 8): DataFrame = {
    val sized = documents.select(col("doc_id"),
      pmod(col("doc_id"), lit(shards.toLong)).as("shard"),
      size(tokens).cast("long").as("n_tokens"))
    val chunks = sized
      .select(col("doc_id"), col("shard"), col("n_tokens"),
        explode(sequence(lit(0L),
          floor((col("n_tokens") - 1) / budgetTokens).cast("long"))).as("chunk_idx"))
      .withColumn("chunk_tokens",
        least(lit(budgetTokens), col("n_tokens") - col("chunk_idx") * budgetTokens))
      // order key: chunks of a doc stay adjacent in doc order (2^20
      // chunks/doc headroom = 1G tokens per doc at the default budget)
      .withColumn("ord", col("doc_id") * lit(1L << 20) + col("chunk_idx"))
    graft.sinks.Batcher
      .assignBatches(chunks, "shard", "ord", "chunk_tokens",
        maxCount = Long.MaxValue, maxBytes = budgetTokens)
      .groupBy(col("shard"), col("batch_id").as("pack_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(col("chunk_tokens")).as("pack_tokens"))
      .withColumn("fill_ratio",
        round(col("pack_tokens").cast("double") / budgetTokens, 4))
      .orderBy(col("shard"), col("pack_id"))
  }

  /** Unigram log-probability quality signal (the KenLM-perplexity
    * proxy pipelines use before a real LM is available): score each
    * doc by the mean negative log corpus-probability of its tokens.
    * Rare-token-dense docs (mojibake, codes, exotic boilerplate) score
    * high; fluent text scores low. Two linear passes: corpus term
    * frequencies (map-side-combinable groupBy on 64-bit token hashes),
    * then a shuffle join back — the same inverted-index shape as
    * [[spanDedup]], linear in corpus tokens. The corpus token total
    * rides a 1-row broadcast. */
  def textUnigramLp(documents: DataFrame): DataFrame = {
    val toks = documents.select(col("doc_id"),
      explode(graft.functions.F.shingleHashes(col("text"), 1)).as("tok"))
    val freq = toks.groupBy(col("tok")).agg(count(lit(1)).as("tf"))
    val total = toks.agg(count(lit(1)).as("n_total"))
    toks.join(freq, "tok")
      .crossJoin(broadcast(total))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        round(avg(-log(col("tf").cast("double") / col("n_total"))), 4)
          .as("avg_neg_logprob"))
      .orderBy(col("doc_id"))
  }

  /** Sequence packing: greedily packs documents into training
    * sequences of ~`budgetTokens` whitespace tokens (the pretraining
    * batch-assembly step that follows curation — GPT/T5-style
    * pipelines pack short documents together so context windows aren't
    * padding). Reuses the sink batcher's greedy kernel
    * ([[graft.sinks.Batcher.assignBatches]], reference semantics of
    * process/BatchTrigger.java: the document that crosses the budget
    * CLOSES the pack it joined, so fill_ratio can slightly exceed 1
    * and a doc longer than the budget occupies a pack alone —
    * production would truncate/split upstream at curation).
    *
    * Scale shape: docs hash into `shards` independent packing domains
    * (one shuffle on the shard key, then a single ordered pass per
    * shard — O(1) state, no driver involvement); shard count scales
    * with the cluster, pack determinism holds within a shard by
    * doc_id order. Output is one row per PACK (bounded by corpus
    * tokens / budget). */
  def packSequences(documents: DataFrame, budgetTokens: Long = 1024,
                    shards: Int = 8): DataFrame = {
    val sized = documents.select(col("doc_id"),
      pmod(col("doc_id"), lit(shards.toLong)).as("shard"),
      size(tokens).cast("long").as("n_tokens"))
    graft.sinks.Batcher
      .assignBatches(sized, "shard", "doc_id", "n_tokens",
        maxCount = Long.MaxValue, maxBytes = budgetTokens)
      .groupBy(col("shard"), col("batch_id").as("pack_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("pack_tokens"))
      .withColumn("fill_ratio",
        round(col("pack_tokens").cast("double") / budgetTokens, 4))
      .orderBy(col("shard"), col("pack_id"))
  }

  /** Benchmark decontamination (GPT-3 appendix-C style): flags
    * training documents sharing any k-token span (k=13 is the
    * canonical n-gram) with a held-out benchmark set — here the docs
    * with `doc_id % benchMod == 0` stand in for the benchmark corpus.
    * Output: every NON-benchmark doc with its span count, contaminated
    * span count, and contamination fraction.
    *
    * Scale shape: the benchmark side is fixed-size and TINY relative
    * to a 100 TB corpus, so its distinct span hashes BROADCAST — the
    * corpus streams through a broadcast hash join with no shuffle
    * except the final per-doc count (map-side combinable). Spans
    * travel as 64-bit shingle hashes (same argument as [[spanDedup]]:
    * the output consumes only equality structure). */
  def decontaminate(documents: DataFrame, k: Int = 13,
                    benchMod: Int = 97): DataFrame = {
    val spans = documents.select(col("doc_id"),
      explode(graft.functions.F.shingleHashes(col("text"), k, sortedDistinct = true)).as("span"))
    val benchSpans = spans.filter(pmod(col("doc_id"), lit(benchMod.toLong)) === 0)
      .select(col("span")).distinct()
      .withColumn("hit", lit(1L))
    spans.filter(pmod(col("doc_id"), lit(benchMod.toLong)) =!= 0)
      .join(broadcast(benchSpans), Seq("span"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(coalesce(col("hit"), lit(0L))).as("contaminated"))
      .withColumn("contamination",
        round(col("contaminated").cast("double") / col("n_spans"), 4))
      .orderBy(col("doc_id"))
  }

  /** The complete training-data assembly line as ONE DataFrame
    * program — the flagship composition: benchmark decontamination
    * ([[decontaminate]]) → exact dedup (keep the first doc per content
    * hash) → quality gate ([[curationPipeline]]'s score) → greedy
    * sequence packing ([[packSequences]]). Output is one row per
    * training pack. Every stage reuses the operator the rest of the
    * suite already oracle-proves; the composed plan keeps each
    * stage's scale shape (broadcast benchmark join, hash-partitioned
    * dedup window, per-row quality expressions, one shard shuffle for
    * packing). */
  def assemblyPipeline(documents: DataFrame, budgetTokens: Long = 1024,
                       shards: Int = 8, k: Int = 13, benchMod: Int = 97,
                       minQuality: Double = 0.5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val clean = decontaminate(documents, k, benchMod)
      .filter(col("contaminated") === 0L).select(col("doc_id"))
    val keepW = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))
    val survivors = documents.join(clean, "doc_id")
      .withColumn("copy_rank", row_number().over(keepW))
      .filter(col("copy_rank") === 1)
      .withColumn("quality_score", rawQualityScore)
      .filter(col("quality_score") >= minQuality)
      .select(col("doc_id"), col("text"))
    packSequences(survivors, budgetTokens, shards)
  }

  /** Streaming face of [[decontaminate]]: drops contaminated documents
    * AT INGEST, before they ever land in the training corpus. The
    * benchmark's distinct span hashes collapse into one array row on
    * the STATIC side, broadcast into every micro-batch; each streamed
    * doc is then a row-local `array_intersect` — no shuffle, no
    * watermark, zero streaming state. Same fixed-size-benchmark
    * argument as the batch op: the span set must fit an executor,
    * which a held-out eval suite always does. */
  def decontaminateStream(docs: DataFrame, benchmarkDocs: DataFrame,
                          k: Int = 13): DataFrame = {
    // static side: distinct benchmark span hashes, collapsed to ONE
    // array row and cross-joined (broadcast, 1 row) into the stream —
    // row-local set intersection, zero streaming state
    val benchArr = benchmarkDocs
      .select(explode(graft.functions.F.shingleHashes(col("text"), k, sortedDistinct = true)).as("span"))
      .agg(collect_set(col("span")).as("bench_spans"))
    docs.crossJoin(broadcast(benchArr))
      .withColumn("spans", graft.functions.F.shingleHashes(col("text"), k, sortedDistinct = true))
      .withColumn("contaminated_spans",
        size(array_intersect(col("spans"), col("bench_spans"))).cast("long"))
      .filter(col("contaminated_spans") === 0L)
      .drop("spans", "bench_spans")
  }
}
