package graft

import org.apache.spark.sql.functions._

/** Stored-phrase-index probe (SURVEY §8m): measures what the two
  * design choices of the positional index buy. The sf0.1 synthetic
  * corpus is vocabulary-flat (31 types, no Zipf head — the
  * token-spectrum finding), so the probe plants the skew the design
  * targets: the corpus is replicated `copies`× (scale) and a rare
  * phrase LED BY the corpus's fattest term is planted in 20 docs —
  * the stopword-led lookup every search engine dreads.
  *
  *  1. RAREST-WORD SEEK: word-1 seek candidates = the fat term's
  *     whole posting list; the df-directed seek reads the planted
  *     words' lists instead.
  *  2. THE STORED INDEX: probing the written-once index vs
  *     re-tokenizing the corpus in-query for the same phrase.
  *
  * Result equality is checked on the way. Not part of the driver
  * gate; run manually:
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.PhraseProbe"
  */
object PhraseProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val copies = sys.env.getOrElse("SPARK_GRAFT_PHRASE_COPIES", "20").toInt
    val spark = Sessions.local()
    val base = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
    val nBase = base.count()

    // fattest corpus term = the planted phrase's lead word
    val fat = base
      .select(explode(split(trim(lower(col("text"))), "\\s+")).as("t"))
      .filter(col("t") =!= "").groupBy(col("t")).count()
      .orderBy(col("count").desc).head()
    val lead = fat.getString(0)
    val phrase = Seq(lead, "zqplanted", "wvrare")
    println(s"[phraseprobe] corpus=$nBase docs x $copies, lead term " +
      s"'$lead' (${fat.getLong(1)} occ/copy), phrase: ${phrase.mkString(" ")}")

    val big = (0 until copies).map { c =>
      base.select((col("doc_id") * copies + c).as("doc_id"), col("text"))
    }.reduce(_ unionByName _)
    val planted = spark.range(20).select(
      (col("id") - 100L).as("doc_id"),
      concat(lit(s"filler ${phrase.mkString(" ")} tail words here")).as("text"))
    // the corpus lives ON DISK, like any real corpus — an in-memory
    // frame would hand the no-index path a cache a 100 TB corpus
    // doesn't have
    val corpusDir = java.nio.file.Files
      .createTempDirectory("graft-phraseprobe-corpus").toString
    big.unionByName(planted).write.mode("overwrite").parquet(corpusDir)
    val docs = spark.read.parquet(corpusDir)
    println(s"[phraseprobe] planted 20 docs; total=${docs.count()} (on disk)")

    val dir = java.nio.file.Files.createTempDirectory("graft-phraseprobe").toString
    val t0 = System.nanoTime()
    operators.TextOps.buildPosIndex(docs, dir)
    println(f"[phraseprobe] index build (once per corpus epoch): " +
      f"${(System.nanoTime() - t0) / 1e9}%.2f s")

    // candidate sets: word-1 seek would read the fat term's postings
    val post = spark.read.parquet(s"$dir/postings")
    val cand1 = post.filter(col("term") === lead).count()
    val (probeBase, candRare, _) = operators.TextOps.storedPhraseParts(
      spark, dir, Seq(phrase), 64)
    val nRare = candRare.count()
    println(f"[phraseprobe] candidates: word-1 seek=$cand1, rarest-word " +
      f"seek=$nRare (${cand1.toDouble / math.max(nRare, 1)}%.0fx fewer)")
    // data-touched ratio: the probe reads its terms' posting lists
    // (bucket-pruned, term-pushed); the no-index path reads EVERY
    // corpus token
    val totalToks = post.count()
    val probeRows = probeBase.count()
    println(f"[phraseprobe] rows touched: probe<=$probeRows posting rows " +
      f"vs corpus=$totalToks tokens (${totalToks.toDouble / math.max(probeRows, 1)}%.0fx)")

    def timed(name: String)(action: => (Long, Long)): (Long, Long) = {
      val runs = (1 to 3).map { _ =>
        val t = System.nanoTime()
        val out = action
        ((System.nanoTime() - t) / 1e9, out)
      }
      println(f"[phraseprobe] $name best=${runs.map(_._1).min}%.2f s " +
        f"-> (n_docs, n_occ)=${runs.head._2}")
      runs.head._2
    }

    val viaIndex = timed("stored-index probe") {
      val r = operators.TextOps.phraseProbeStored(spark, dir, Seq(phrase), 64)
        .collect()
      (r.head.getLong(1), r.head.getLong(2))
    }
    val viaCorpus = timed("in-query (re-tokenize corpus)") {
      val toks = docs.select(col("doc_id"),
          posexplode(split(trim(lower(col("text"))), "\\s+")).as(Seq("pos", "term")))
        .filter(col("term") =!= "")
      val t1 = toks.filter(col("term") === phrase(0))
        .select(col("doc_id"), col("pos"))
      val t2 = toks.filter(col("term") === phrase(1))
        .select(col("doc_id"), (col("pos") - 1).as("pos"))
      val t3 = toks.filter(col("term") === phrase(2))
        .select(col("doc_id"), (col("pos") - 2).as("pos"))
      val r = t1.join(t2, Seq("doc_id", "pos")).join(t3, Seq("doc_id", "pos"))
        .agg(countDistinct(col("doc_id")), count(lit(1))).head()
      (r.getLong(0), r.getLong(1))
    }
    require(viaIndex == viaCorpus,
      s"index and corpus disagree: $viaIndex vs $viaCorpus")
    println(s"[phraseprobe] verified equal: $viaIndex")
    spark.stop()
  }
}
