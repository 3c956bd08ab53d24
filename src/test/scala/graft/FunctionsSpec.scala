package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.{F, HashImpls}

class HashImplsSpec extends AnyFunSuite {

  private def arr(ss: String*) = new GenericArrayData(ss.map(UTF8String.fromString).toArray[Any])

  test("minhash: identical inputs → identical signatures; supersets keep elementwise mins") {
    val a = HashImpls.minhash(arr("x", "y", "z"), 32).toLongArray()
    val b = HashImpls.minhash(arr("x", "y", "z"), 32).toLongArray()
    assert(a.toSeq == b.toSeq)
    val sup = HashImpls.minhash(arr("x", "y", "z", "w"), 32).toLongArray()
    (a zip sup).foreach { case (ai, si) =>
      assert(java.lang.Long.compareUnsigned(si, ai) <= 0)
    }
  }

  test("minhash similarity estimates Jaccard") {
    val n = 256
    val a = HashImpls.minhash(arr((1 to 100).map("s" + _): _*), n).toLongArray()
    val b = HashImpls.minhash(arr((51 to 150).map("s" + _): _*), n).toLongArray()
    val agree = (a zip b).count { case (x, y) => x == y }.toDouble / n
    val trueJ = 50.0 / 150.0
    assert(math.abs(agree - trueJ) < 0.12, s"estimate $agree vs $trueJ")
  }

  test("simhash: near-identical token sets have small hamming distance") {
    val base = (1 to 200).map("tok" + _)
    val h1 = HashImpls.simhash(arr(base: _*))
    val h2 = HashImpls.simhash(arr((base.drop(2) :+ "other" :+ "new"): _*))
    val h3 = HashImpls.simhash(arr((1 to 200).map("zzz" + _): _*))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(h1, h2) < 12)
    assert(ham(h1, h3) > 12)
  }

  test("winnow: fingerprints are order-robust and contained for substrings") {
    def fp(s: String) = HashImpls.winnow(UTF8String.fromString(s), 8, 4).toLongArray().toSet
    val a = fp("the quick brown fox jumps over the lazy dog")
    val b = fp("the quick brown fox leaps over the lazy dog")
    assert(a == fp("the quick brown fox jumps over the lazy dog"))
    val overlap = a.intersect(b).size.toDouble / a.union(b).size
    assert(overlap > 0.3, s"overlap $overlap")
    assert(fp("").isEmpty && fp("ab").size == 1)
  }

  test("winnowPortable: shared-buffer gram hashing equals per-substring md5") {
    // naive reference: md5-hash every k-char substring independently,
    // then window-min selection — exactly the documented semantics the
    // DuckDB oracle mirrors
    def naive(s: String, k: Int, w: Int): Set[Long] = {
      val n = s.length
      if (n == 0) Set.empty
      else if (n <= k) Set(HashImpls.md5Hash60(s.getBytes("UTF-8")))
      else {
        val hs = (0 to n - k).map(i => HashImpls.md5Hash60(s.substring(i, i + k).getBytes("UTF-8")))
        if (hs.length <= w) Set(hs.min)
        else (0 to hs.length - w).map(st => hs.slice(st, st + w).min).toSet
      }
    }
    def fast(s: String, k: Int, w: Int): Set[Long] =
      HashImpls.winnowPortable(UTF8String.fromString(s), k, w).toLongArray().toSet
    val cases = Seq(
      "the quick brown fox jumps over the lazy dog",
      "héllo wörld with some ümläuts and 中文 text mixed in",
      "emoji 😀 forces the surrogate fallback path here",
      "short", "", "ab",
      "aaaaaaaaaaaaaaaaaaaaaaaa")
    for (s <- cases; (k, w) <- Seq((8, 4), (4, 20), (20, 4)))
      assert(fast(s, k, w) == naive(s, k, w), s"mismatch for '$s' k=$k w=$w")
  }

  test("md5Block60: single-block compression matches the JDK digest bit-for-bit") {
    // reference: first 15 hex chars of the full md5, as a long — the
    // exact DuckDB-oracle formulation the portable kernels promise
    def ref(bytes: Array[Byte]): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5").digest(bytes)
        .map(b => f"${b & 0xff}%02x").mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    val rnd = new scala.util.Random(0x5eed)
    val scratch = new Array[Int](16)
    for (len <- 0 to 55; _ <- 1 to 4) {
      val msg = new Array[Byte](len)
      rnd.nextBytes(msg)
      assert(HashImpls.md5Block60(msg, 0, len, scratch) == ref(msg), s"len=$len")
    }
    // offset reads must hash only [off, off+len)
    val buf = new Array[Byte](80)
    rnd.nextBytes(buf)
    assert(HashImpls.md5Block60(buf, 13, 20, scratch) ==
      ref(java.util.Arrays.copyOfRange(buf, 13, 33)))
    // md5Hash60 dispatch: long inputs take the JDK path, same contract
    val long = new Array[Byte](200)
    rnd.nextBytes(long)
    assert(HashImpls.md5Hash60(long) == ref(long))
    assert(HashImpls.md5Hash60(java.util.Arrays.copyOf(buf, 55)) ==
      ref(java.util.Arrays.copyOf(buf, 55)))
  }

  test("cosine: orthogonal/parallel/empty vectors") {
    def v(fs: Float*) = new GenericArrayData(fs.toArray[Any])
    assert(HashImpls.cosine(v(1f, 0f), v(0f, 1f)) == 0.0)
    assert(math.abs(HashImpls.cosine(v(1f, 2f, 3f), v(2f, 4f, 6f)) - 1.0) < 1e-12)
    assert(HashImpls.cosine(v(0f, 0f), v(1f, 1f)) == 0.0)
  }

  test("hyperplane bucket: deterministic, scale-invariant for positive scaling") {
    def v(fs: Float*) = new GenericArrayData(fs.toArray[Any])
    val b1 = HashImpls.hyperplaneBucket(v(1f, -2f, 3f, 0.5f), 12)
    val b2 = HashImpls.hyperplaneBucket(v(2f, -4f, 6f, 1f), 12)
    assert(b1 == b2)
    assert(b1 >= 0 && b1 < 4096)
  }
}

class ExpressionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("custom expressions run inside codegen plans and via SQL registration") {
    import spark.implicits._
    F.register(spark)
    val df = Seq(("a b c d e", Seq(0.5f, 1.0f)), ("a b c x y", Seq(1.0f, 0.0f)))
      .toDF("text", "vec")
    val out = df.select(
      F.minhash(split($"text", " "), 16).as("mh"),
      F.simhash(split($"text", " ")).as("sh"),
      F.fingerprint($"text", 4, 2).as("fp"),
      F.cosine($"vec", $"vec").as("cos_self"),
      F.hyperplaneBucket($"vec", 6).as("bucket")).collect()
    assert(out.length == 2)
    assert(out(0).getSeq[Long](0).size == 16)
    assert(math.abs(out(0).getDouble(3) - 1.0) < 1e-12)
    // SQL surface
    val viaSql = spark.sql(
      "SELECT graft_cosine(array(1.0f, 0.0f), array(0.0f, 2.0f)) AS c").head().getDouble(0)
    assert(viaSql == 0.0)
    // identical text → identical minhash through the Column API
    val sigs = Seq("x y z", "x y z").toDF("text")
      .select(F.minhash(split($"text", " "), 8).as("s")).collect()
    assert(sigs(0).getSeq[Long](0) == sigs(1).getSeq[Long](0))
  }
}

class DedupParamSpec extends AnyFunSuite {
  test("band counts that do not divide numPerm are rejected") {
    val spark = TestSpark.spark
    val docs = Tables.documents(spark, TestSpark.sf)
    intercept[IllegalArgumentException] {
      graft.operators.Dedup.dedupMinhashLsh(docs, numPerm = 128, bands = 7)
    }
    intercept[IllegalArgumentException] {
      graft.operators.Dedup.dedupMinhashLshFast(docs, numPerm = 128, bands = 0)
    }
    intercept[IllegalArgumentException] {
      graft.operators.Dedup.dedupNgramJaccard(docs, numPerm = 64, bands = 256)
    }
  }
}

class EmbeddingDedupSpec extends AnyFunSuite {
  test("planted near-duplicate vectors are found by multi-table hyperplane LSH") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def vec(): Array[Float] = Array.fill(64)(rnd.nextGaussian().toFloat)
    def jitter(v: Array[Float]): Array[Float] =
      v.map(x => x + 0.01f * rnd.nextGaussian().toFloat)
    val base = (0 until 20).map(_ => vec())
    val rows = base.zipWithIndex.map { case (v, i) => (i.toLong, v) } ++
      Seq(0, 3, 7).map(i => (100L + i, jitter(base(i))))
    val df = rows.toDF("vec_id", "embedding")
    val out = graft.operators.Dedup.dedupEmbedding(df).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    Seq(0, 3, 7).foreach { i =>
      assert(out(100L + i) == i.toLong, s"planted dup of $i missed")
      assert(out(i.toLong) == 100L + i || out(i.toLong) < 100L)
    }
    assert(out(1L) == -1L, "unrelated vector flagged as dup")
  }
}

class SemanticDedupSpec extends AnyFunSuite {
  test("SemDeDup flags planted in-cluster near-dups and keeps the far-from-centroid member") {
    val spark = TestSpark.spark
    import spark.implicits._
    val base = Tables.embeddings(spark, TestSpark.sf)
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect()
    // fixed-seed jitter (cos ~0.99996) -> the planted twin lands in the
    // same argmax cluster and above the 0.95 threshold, deterministically
    val rnd = new scala.util.Random(11)
    val planted = Seq(2L, 17L, 123L).map { i =>
      val v = base.find(_._1 == i).get._2
      (9000L + i, v.map(x => x + 0.001f * rnd.nextGaussian().toFloat))
    }
    val df = (base.toSeq ++ planted).toDF("vec_id", "embedding")
    val out = graft.operators.Dedup.dedupSemantic(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4)))).toMap
    Seq(2L, 17L, 123L).foreach { i =>
      val (origList, origCc, _, origDup) = out(i)
      val (twinList, twinCc, twinPartner, twinDup) = out(9000L + i)
      assert(origList == twinList, s"planted twin of $i crossed clusters")
      assert(origDup || twinDup, s"planted pair ($i, ${9000L + i}) not flagged")
      // keep-rule: the flagged member is the one closer to the centroid
      // (higher cent_cos); exact tie -> the higher vec_id loses
      if (twinDup && twinPartner == i)
        assert(twinCc > origCc || (twinCc == origCc), s"twin of $i lost with lower cent_cos")
      if (origDup && out(i)._3 == 9000L + i)
        assert(origCc > twinCc, s"original $i lost to its twin without higher cent_cos")
    }
    // verdicts are cluster-scoped: every dup's partner is in its own cluster
    out.foreach { case (id, (list, _, partner, isDup)) =>
      assert(isDup == (partner >= 0L))
      if (isDup) assert(out(partner)._1 == list, s"$id paired across clusters")
    }
  }
}

class ShingleStringsSpec extends AnyFunSuite {
  test("codegen shingle strings match the builtin HOF pipeline exactly") {
    val spark = TestSpark.spark
    import org.apache.spark.sql.functions._
    val base = Tables.documents(spark, TestSpark.sf).select("doc_id", "text")
    val edge = spark.createDataFrame(Seq(
      (9001L, ""), (9002L, "one"), (9003L, "one two"), (9004L, "  padded  "),
      (9005L, "tab\tsep\nnewline end\t"), (9006L, "UPPER Case MiX"))).toDF("doc_id", "text")
    val docs = base.unionAll(edge)
    val tokens = split(trim(lower(col("text"))), "\\s+")
    val builtin = when(size(tokens) >= 3,
      transform(sequence(lit(0), size(tokens) - 3),
        i => concat_ws(" ", slice(tokens, i + 1, lit(3)))))
      .otherwise(array(concat_ws(" ", tokens)))
    val diff = docs.select(col("doc_id"), builtin.as("a"),
        graft.functions.F.shingleStrings(col("text"), 3).as("b"))
      .filter(not(col("a") <=> col("b")))
    assert(diff.isEmpty, s"mismatch: ${diff.take(3).mkString(",")}")
  }
}

class AnnIvfSpec extends AnyFunSuite {
  test("IVF probes recover neighbors on a clustered corpus") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // 4 well-separated clusters x 50 vectors (unit-ish gaussians around
    // distant centers) — the corpus shape IVF is built for
    val centers = Array.tabulate(4)(c => Array.tabulate(64)(j =>
      if (j % 4 == c) 10f else 0f))
    val rows = (0 until 200).map { i =>
      val c = i % 4
      (i.toLong, centers(c).map(x => x + 0.5f * rnd.nextGaussian().toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
    val ivf = graft.operators.Ann.annIvf(df, k = 5, stride = 10, nlist = 4, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val exact = graft.operators.Ann.annBruteforce(df, k = 5, stride = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    assert(ivf.keySet == exact.keySet)
    // same-cluster neighbors dominate; probing the right lists must
    // recover nearly all of the exact top-5
    val recalls = exact.map { case (q, nn) => (ivf(q) & nn).size.toDouble / nn.size }
    assert(recalls.sum / recalls.size >= 0.9, s"mean recall ${recalls.sum / recalls.size}")
  }

  test("sampled-quantizer IVF recovers neighbors on the same clustered corpus") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val centers = Array.tabulate(4)(c => Array.tabulate(64)(j =>
      if (j % 4 == c) 10f else 0f))
    val rows = (0 until 200).map { i =>
      val c = i % 4
      (i.toLong, centers(c).map(x => x + 0.5f * rnd.nextGaussian().toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
    // more lists than true clusters: sampled centroids land in every
    // cluster w.h.p., and probing half the lists spans the query's
    // cluster even when several sampled centroids share it
    val ivf = graft.operators.Ann.annIvfSampled(df, k = 5, stride = 10, nlist = 8, nprobe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val exact = graft.operators.Ann.annBruteforce(df, k = 5, stride = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    assert(ivf.keySet == exact.keySet)
    val recalls = exact.map { case (q, nn) => (ivf.getOrElse(q, Set.empty[Long]) & nn).size.toDouble / nn.size }
    assert(recalls.sum / recalls.size >= 0.8, s"mean recall ${recalls.sum / recalls.size}")
  }

  test("cluster histogram partitions the corpus and separates planted clusters") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val centers = Array.tabulate(4)(c => Array.tabulate(64)(j =>
      if (j % 4 == c) 10f else 0f))
    val rows = (0 until 200).map { i =>
      val c = i % 4
      (i.toLong, centers(c).map(x => x + 0.5f * rnd.nextGaussian().toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
    val hist = graft.operators.Ann.embeddingClusterHist(df, nlist = 4).collect()
    // a partition: every vector lands in exactly one list
    assert(hist.map(_.getLong(1)).sum == 200L)
    // well-separated planted clusters: no list mixes them, so each
    // nonempty list holds a multiple of one cluster's members — and
    // with 4 sampled centroids at least 2 distinct clusters separate
    assert(hist.length >= 2 && hist.length <= 4)
  }
}

class MmrSpec extends AnyFunSuite {
  test("MMR demotes the near-duplicate of the first pick in favor of a diverse doc") {
    val spark = TestSpark.spark
    import spark.implicits._
    // query (id 0) along (10, 0); two near-identical relevant docs
    // (ids 1, 2) and one slightly-less-relevant but diverse doc (id 3)
    val df = Seq(
      (0L, Array(10f, 0f)),
      (1L, Array(10f, 1f)),
      (2L, Array(10f, 1.001f)),
      (3L, Array(10f, -2f))
    ).toDF("vec_id", "embedding")
    val out = graft.operators.Ann.annMmr(df, k = 3, poolSize = 20, stride = 1000)
      .collect()
    assert(out.map(_.getLong(0)).toSet == Set(0L), "only vec 0 is a query")
    val picks = out.sortBy(_.getLong(1)).map(_.getLong(2)).toSeq
    // pure relevance order is (1, 2, 3): 1 and 2 tie at 9950 bp (id
    // tie-break), 3 trails at 9806. MMR keeps 1, then prefers the
    // diverse 3 (9806 - 9562 = 244 half-bp) over the redundant 2
    // (9950 - 10000 = -50): picks = 1, 3, 2.
    assert(picks == Seq(1L, 3L, 2L), s"got $picks")
    val first = out.minBy(_.getLong(1))
    assert(first.getDouble(3) == 9950d / 2e4, "first pick score = rel/2")
  }

  test("MMR pick sequence equals a reference greedy loop on random vectors") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val rows = (0L until 60L).map(i => (i, Array.fill(8)(rnd.nextGaussian().toFloat)))
    val df = rows.toDF("vec_id", "embedding")
    val out = graft.operators.Ann.annMmr(df, k = 4, poolSize = 10, stride = 30)
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getLong(1)).map(_.getLong(2)).toSeq).toMap

    // reference: plain-Scala greedy MMR over the same bp-rounded scores
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = a.map(x => x.toDouble * x.toDouble).sum
      val nb = b.map(x => x.toDouble * x.toDouble).sum
      dot / math.sqrt(na * nb)
    }
    def bp(x: Double): Long =
      (if (x * 1e4 >= 0) math.floor(x * 1e4 + 0.5) else math.ceil(x * 1e4 - 0.5)).toLong
    val vecs = rows.toMap
    for (q <- Seq(0L, 30L)) {
      val pool = rows.filter(_._1 != q)
        .map { case (i, v) => (i, cos(vecs(q), v)) }
        .sortBy { case (i, c) => (-c, i) }.take(10)
        .map { case (i, c) => (i, bp(c)) }
      var selected = Vector.empty[Long]
      var remaining = pool
      while (selected.size < 4) {
        val scored = remaining.map { case (i, relBp) =>
          val pen = if (selected.isEmpty) 0L
            else selected.map(s => bp(cos(vecs(i), vecs(s)))).max
          (i, relBp - pen)
        }
        val pick = scored.minBy { case (i, s) => (-s, i) }._1
        selected :+= pick
        remaining = remaining.filterNot(_._1 == pick)
      }
      assert(out(q) == selected, s"query $q: got ${out(q)}, want $selected")
    }
  }
}

class AnnGraphSpec extends AnyFunSuite {
  test("beam search over the bucketed k-NN graph recovers neighbors on a clustered corpus") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val centers = Array.tabulate(4)(c => Array.tabulate(64)(j =>
      if (j % 4 == c) 10f else 0f))
    val rows = (0 until 200).map { i =>
      val c = i % 4
      (i.toLong, centers(c).map(x => x + 0.5f * rnd.nextGaussian().toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
    val graph = graft.operators.Ann.annGraph(df, k = 5, stride = 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val exact = graft.operators.Ann.annBruteforce(df, k = 5, stride = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    assert(graph.keySet == exact.keySet)
    // entry starts inside the query's own LSH bucket and hops stay in
    // the query's cluster, so recall on well-separated clusters is high
    val recalls = exact.map { case (q, nn) => (graph(q) & nn).size.toDouble / nn.size }
    assert(recalls.sum / recalls.size >= 0.6, s"mean recall ${recalls.sum / recalls.size}")
  }
}

class IvfStoredIndexSpec extends AnyFunSuite {
  test("IVF probe over stored inverted lists matches the self-contained face and prunes partitions") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    val rows = (0 until 200).map(i =>
      (i.toLong, Array.fill(64)((rnd.nextGaussian() * 0.3).toFloat)))
    val df = rows.toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfidx").toString
    graft.operators.Ann.ensureIvfIndex(df, dir)
    val probe = graft.operators.Ann.annIvfProbe(df, dir, k = 5, stride = 10)
    assert(probe.collect().toSeq ==
      graft.operators.Ann.annIvfSampled(df, k = 5, stride = 10).collect().toSeq,
      "probe over the stored lists must equal the in-query build")
    // the inverted-list layout is partitioned by list_id: the probe
    // scan must carry a partition filter, not read every list
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(list_id"),
      s"probe scan should prune list partitions:\n$plan")
  }
}

class AnnAuditSpec extends AnyFunSuite {
  test("recall audit reports 100% when the probe covers every list, and honest bp otherwise") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val df = (0 until 200).map(i =>
      (i.toLong, Array.fill(64)((rnd.nextGaussian() * 0.3).toFloat)))
      .toDF("vec_id", "embedding")
    // nprobe = nlist: the IVF scan covers the whole corpus, so its
    // top-k IS the bruteforce top-k and recall must be exactly 10000
    val full = graft.operators.Ann.annRecallAudit(df, k = 5, stride = 20,
      nlist = 8, nprobe = 8).collect()
    assert(full.nonEmpty && full.forall(_.getLong(2) == 10000L),
      s"full probe must recall everything: ${full.toSeq}")
    // under-probed: recall is between 0 and 10000 and hits*2000 = bp
    val part = graft.operators.Ann.annRecallAudit(df, k = 5, stride = 20,
      nlist = 8, nprobe = 2).collect()
    assert(part.forall(r => r.getLong(2) == r.getLong(1) * 2000L))
    assert(part.forall(r => r.getLong(2) >= 0L && r.getLong(2) <= 10000L))
  }

  test("drift test: identical halves stay quiet, a scaled half trips the TV cut") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    def vec(scale: Double) = Array.fill(8)((rnd.nextGaussian() * 0.05 + scale).toFloat)
    // identical half multisets (row i carries base(i/2), so even and
    // odd halves hold exactly the same vectors) -> TV exactly 0
    val base = Array.fill(100)(vec(1.0))
    val same = (0 until 200).map(i => (i.toLong, base(i / 2))).toDF("vec_id", "embedding")
    val rs = graft.operators.Ann.embeddingDrift(same).head()
    assert(rs.getLong(3) == 0L && !rs.getBoolean(4),
      s"identical halves must not drift: $rs")
    // odd ids scaled 3x -> disjoint norm buckets -> TV = 10000 bp
    val drifted = (0 until 200).map(i =>
      (i.toLong, vec(if (i % 2 == 0) 1.0 else 3.0))).toDF("vec_id", "embedding")
    val rd = graft.operators.Ann.embeddingDrift(drifted).head()
    assert(rd.getLong(3) == 10000L && rd.getBoolean(4),
      s"disjoint norm distributions must show full TV: $rd")
  }

  test("centroid shift isolates the planted dimension exactly") {
    val spark = TestSpark.spark
    import spark.implicits._
    // even ids at the origin; odd ids shifted +1.0 in dim 3 only
    val rows = (0 until 100).map { i =>
      val v = Array.fill(8)(0f); if (i % 2 == 1) v(3) = 1f; (i.toLong, v)
    }
    val out = graft.operators.Ann.embeddingCentroidShift(rows.toDF("vec_id", "embedding"))
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out(3L) == 10000L, s"dim 3 must shift exactly 1.0 = 10000 bp: $out")
    assert((out - 3L).values.forall(_ == 0L), s"other dims must not move: $out")
  }

  test("calibration curve separates: high score deciles carry the positives") {
    val spark = TestSpark.spark
    val out = graft.operators.TextOps.textQualityCalibration(
      Tables.documents(spark, TestSpark.sf)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.length <= 11 && out.forall(r => r._4 >= 0L && r._4 <= 10000L))
    val (hi, lo) = out.partition(_._1 >= 5)
    def rate(rs: Array[(Long, Long, Long, Long)]) =
      if (rs.map(_._2).sum == 0) 0.0 else rs.map(_._3).sum.toDouble / rs.map(_._2).sum
    assert(rate(hi) > rate(lo) + 0.5,
      s"trained scores above the threshold must concentrate positives: ${out.toSeq}")
  }

  test("epoch diff classifies added/removed/changed/unchanged exactly") {
    val spark = TestSpark.spark
    import spark.implicits._
    val docs = (0L to 9L).map(i => (i, s"text $i")).toDF("doc_id", "text")
    val out = graft.operators.TextOps.pipelineEpochDiff(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out("added") == ((2L, 4L, 9L)))     // %5==4: ids 4, 9
    assert(out("removed") == ((2L, 0L, 5L)))   // %5==0: ids 0, 5
    assert(out("changed") == ((1L, 7L, 7L)))   // %7==0 survivor: id 7
    assert(out("unchanged") == ((5L, 1L, 8L))) // 1, 2, 3, 6, 8
  }

  test("outlier report flags the planted far vector first, ceil(n/100) rows") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    // 149 tight vectors around the origin + 1 planted far point
    val base = (0 until 149).map(i =>
      (i.toLong, Array.fill(8)((rnd.nextGaussian() * 0.01).toFloat)))
    val far = Seq((999L, Array.fill(8)(3.0f)))
    val out = graft.operators.Ann.embeddingOutliers((base ++ far)
      .toDF("vec_id", "embedding")).collect()
    assert(out.length == 2, s"ceil(150/100) = 2 flagged rows: ${out.toSeq}") // 150 vecs
    assert(out.head.getLong(1) == 999L && out.head.getLong(0) == 1L,
      s"planted outlier must rank first: ${out.toSeq}")
  }
}

class HybridRetrievalSpec extends AnyFunSuite {
  test("RRF fusion emits dense per-query ranks with credits from the achievable set") {
    val spark = TestSpark.spark
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val docs = Tables.documents(spark, TestSpark.sf)
    val dir = java.nio.file.Files.createTempDirectory("graft-hybrid").toString
    graft.operators.Ann.ensureIvfIndex(emb, dir)
    val out = graft.operators.Ann.pipelineHybridRetrieval(emb, docs, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty)
    // per query: ranks dense from 1, fused credit non-increasing
    out.groupBy(_._1).foreach { case (q, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to sorted.length).toSeq, s"q$q ranks: ${sorted.toSeq}")
      val cr = sorted.map(_._4).toSeq
      assert(cr == cr.sorted.reverse, s"q$q credits must be non-increasing: $cr")
      // no query doc retrieves itself through either side
      assert(rows.forall(_._3 != q), s"q$q must not retrieve itself")
    }
    // every fused credit is a sum of 1-2 per-side credits 1e6/(60+r), r in 1..5
    val singles = (1 to 5).map(r => 1000000L / (60 + r)).toSet
    val achievable = singles ++ (for (a <- singles; b <- singles) yield a + b)
    assert(out.forall(r => achievable(r._4)),
      s"unexpected fused credit: ${out.filterNot(r => achievable(r._4)).toSeq}")
    // at least one doc must carry a two-side (summed) credit somewhere
    // in the corpus-scale run OR all credits are single-side — record
    // which, but require the max credit to be at least the best single
    assert(out.map(_._4).max >= singles.max)
  }
}

class LexStoredSpec extends AnyFunSuite {
  test("BM25 over the stored lexical index matches the self-contained face; ensure builds once") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(53)
    val docs = (0 until 80).map(i =>
      (i.toLong, (0 until 25).map(_ => s"w${rnd.nextInt(30)}").mkString(" ")))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-lex").toString
    graft.operators.TextOps.ensureLexIndex(docs, dir)
    val marker = new java.io.File(s"$dir/globals/_SUCCESS")
    assert(marker.exists(), "index build must leave the completed-build sentinel")
    val built = marker.lastModified()
    val stored = graft.operators.TextOps.textBm25Stored(spark, dir).collect().toSeq
    val self = graft.operators.TextOps.textBm25(docs).collect().toSeq
    assert(stored == self, "stored-index scoring must equal the self-contained face")
    graft.operators.TextOps.ensureLexIndex(docs, dir)
    assert(marker.lastModified() == built, "a finished index must never rebuild")
  }
}

class VocabStoredSpec extends AnyFunSuite {
  test("apply over the stored vocab matches the self-contained retrain face") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val docs = (0 until 60).map(i =>
      (i.toLong, (0 until 20).map(_ => s"w${rnd.nextInt(30)}").mkString(" ")))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-vocab").toString
    graft.operators.TextOps.ensureVocabIndex(docs, dir)
    val marker = new java.io.File(s"$dir/vocab/_SUCCESS")
    assert(marker.exists())
    val built = marker.lastModified()
    val stored = graft.operators.TextOps.tokenizerApplyStored(docs, dir).collect().toSeq
    val full = graft.operators.TextOps.tokenizerApply(docs).collect().toSeq
    assert(stored == full, "stored-vocab scoring must equal the retrain face")
    graft.operators.TextOps.ensureVocabIndex(docs, dir)
    assert(marker.lastModified() == built, "a finished vocab must never rebuild")
  }
}

class IvfProbeStreamSpec extends AnyFunSuite {
  test("each micro-batch probes the stored inverted lists as its query set") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rnd = new scala.util.Random(43)
    val corpus = (0 until 200).map(i =>
      (i.toLong, Array.fill(64)((rnd.nextGaussian() * 0.3).toFloat)))
    val corpusDf = corpus.toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfstream").toString
    graft.operators.Ann.ensureIvfIndex(corpusDf, dir)
    val results = scala.collection.mutable.Map[Long, Int]()
    val mem = MemoryStream[(Long, Array[Float])]
    val q = graft.operators.Ann.annIvfProbeStream(
        mem.toDF().toDF("vec_id", "embedding"), dir, k = 3) { (df, id) =>
        results(id) = df.collect().length
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-ivfstream-ck").toString)
      .start()
    try {
      mem.addData((1000L, corpus(5)._2), (1001L, corpus(17)._2))
      q.processAllAvailable()
      mem.addData((1002L, corpus(42)._2))
      q.processAllAvailable()
    } finally q.stop()
    // each probe vector is a copy of a corpus vector: its own source
    // must be among the k=3 neighbors of its probed lists
    assert(results(0L) == 6 && results(1L) == 3,
      s"each query returns k=3 ranked neighbors: $results")
  }
}

class IvfAppendStreamSpec extends AnyFunSuite {
  test("appended delta epochs become searchable; replayed epochs don't double-append") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rnd = new scala.util.Random(67)
    val corpus = (0 until 200).map(i =>
      (i.toLong, Array.fill(64)((rnd.nextGaussian() * 0.3).toFloat)))
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfappend").toString
    graft.operators.Ann.ensureIvfIndex(corpus.toDF("vec_id", "embedding"), dir)
    val mem = MemoryStream[(Long, Array[Float])]
    val q = graft.operators.Ann
      .ivfAppendStream(mem.toDF().toDF("vec_id", "embedding"), dir)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-ivfappend-ck").toString)
      .start()
    val novel = (0 until 64).map(j => (10f + j * 0.01f))
    try {
      mem.addData((1000L, novel.toArray), (1001L, corpus(3)._2))
      q.processAllAvailable()
    } finally q.stop()
    // the novel vector must now be its own nearest neighbor's source:
    // probing WITH the novel vector as the query returns 1000 first
    val probe = graft.operators.Ann.ivfProbeQueries(
        Seq((9999L, novel.toArray)).toDF("q_id", "q_vec"), dir, k = 1)
      .collect()
    assert(probe.length == 1 && probe(0).getLong(1) == 1000L,
      s"the appended vector must be searchable: ${probe.toSeq}")
    assert(spark.read.parquet(s"$dir/delta-b0").count() == 2)
    // replay: a fresh stream re-delivers the same records as ITS batch
    // 0 — the delta dir overwrites instead of double-appending
    val mem2 = MemoryStream[(Long, Array[Float])]
    val q2 = graft.operators.Ann
      .ivfAppendStream(mem2.toDF().toDF("vec_id", "embedding"), dir)
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-ivfappend-ck2").toString)
      .start()
    try {
      mem2.addData((1000L, novel.toArray), (1001L, corpus(3)._2))
      q2.processAllAvailable()
    } finally q2.stop()
    assert(spark.read.parquet(s"$dir/delta-b0").count() == 2,
      "a replayed epoch must overwrite its delta dir, not double it")
  }
}

class AnnStoredIndexSpec extends AnyFunSuite {
  test("stored-index probe and pagerank match the self-contained faces; ensure builds once") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val centers = Array.tabulate(4)(c => Array.tabulate(64)(j =>
      if (j % 4 == c) 10f else 0f))
    val rows = (0 until 200).map { i =>
      (i.toLong, centers(i % 4).map(x => x + 0.5f * rnd.nextGaussian().toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("graft-annidx").toString
    graft.operators.Ann.ensureAnnIndex(df, dir)
    val marker = new java.io.File(s"$dir/entries/_SUCCESS")
    assert(marker.exists(), "index build must leave the completed-build sentinel")
    val built = marker.lastModified()
    val probe = graft.operators.Ann.annGraphProbe(df, dir, k = 5, stride = 10)
      .collect().toSeq
    val full = graft.operators.Ann.annGraph(df, k = 5, stride = 10)
      .collect().toSeq
    assert(probe == full, "probe over the stored index must equal the in-query build")
    graft.operators.Ann.ensureAnnIndex(df, dir)
    assert(marker.lastModified() == built, "a finished index must never rebuild")
    val prStored = graft.operators.Ann.graphPagerankStored(df, dir).collect().toSeq
    val pr = graft.operators.Ann.graphPagerank(df).collect().toSeq
    assert(prStored == pr, "pagerank over the stored adjacency must equal the rebuild face")
  }

  test("graph_triangles: K4 plus pendant counts each clique corner in 3 triangles, once each") {
    val spark = TestSpark.spark
    import spark.implicits._
    // hand-built adjacency: K4 on {1,2,3,4} stored DIRECTED both ways
    // (the k-NN layout) + pendant 5-1; K4 has exactly 4 triangles and
    // every clique node sits in 3 of them; the pendant is in none
    val k4 = for {
      a <- 1L to 4L; b <- 1L to 4L if a != b
    } yield (a, b)
    val adj = (k4 ++ Seq((1L, 5L), (5L, 1L))).toDF("node", "nbr")
    val dir = java.nio.file.Files.createTempDirectory("graft-tri").toString
    adj.write.mode("overwrite").parquet(s"$dir/adjacency")
    val out = graft.operators.Ann
      .graphTriangles(Seq((0L, Array(0f))).toDF("vec_id", "embedding"), dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L)),
      s"K4 corners count 3 each (12 corner-slots / 4 triangles): $out")
  }

  test("graph_communities: two triangles converge to min labels, isolated node keeps its own") {
    val spark = TestSpark.spark
    import spark.implicits._
    def tri(a: Long, b: Long, c: Long) =
      Seq(a -> b, b -> a, a -> c, c -> a, b -> c, c -> b)
    val adj = (tri(1L, 2L, 3L) ++ tri(5L, 6L, 7L)).toDF("node", "nbr")
    val dir = java.nio.file.Files.createTempDirectory("graft-lpa").toString
    adj.write.mode("overwrite").parquet(s"$dir/adjacency")
    val nodes = (1L to 7L).map(i => (i, Array(0f))).toDF("vec_id", "embedding")
    val out = graft.operators.Ann.graphCommunities(nodes, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq((1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L), (4L, 4L, 1L),
      (5L, 5L, 3L), (6L, 5L, 3L), (7L, 5L, 3L)),
      s"min-tie sync LPA must settle each triangle on its smallest id: $out")
  }
}

class QuantizeInt8Spec extends AnyFunSuite {
  test("reconstruction error is bounded by one code step; constant dims are exact") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(61)
    // dim 0 constant (scale collapses to the 1-guard), others random
    val rows = (0 until 150).map(i =>
      (i.toLong, Array.tabulate(64)(j =>
        if (j == 0) 0.25f else (rnd.nextGaussian() * 0.3).toFloat)))
    val out = graft.operators.Ann.embeddingQuantizeInt8(rows.toDF("vec_id", "embedding"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(5)))
    assert(out.length == 64)
    val const = out.find(_._1 == 0L).get
    assert(const._2 == const._3 && const._4 == 0L,
      s"constant dim must reconstruct exactly: $const")
    out.foreach { case (dim, mn, mx, maxErr) =>
      val step = math.max(mx - mn, 1L) / 255L + 1L
      assert(maxErr <= step,
        s"dim $dim: max err $maxErr exceeds one code step $step (range $mn..$mx)")
    }
  }
}

class StratifiedSampleSpec extends AnyFunSuite {
  test("dense center thins to the quota, sparse tail bands keep everything") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    // dominant axis = dim 0; 80% of mass near the center, tails sparse
    val rows = (0 until 400).map { i =>
      val a = if (i % 5 == 0) rnd.nextGaussian() * 3.0 else rnd.nextGaussian() * 0.2
      (i.toLong, Array.tabulate(64)(j =>
        if (j == 0) a.toFloat else 0.05f * rnd.nextGaussian().toFloat))
    }
    val out = graft.operators.Ann.embeddingStratifiedSample(rows.toDF("vec_id", "embedding"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val total = out.map(_._2).sum
    val kept = out.map(_._4).sum
    assert(out.forall { case (_, n, _, k) => k <= n }, s"kept can't exceed band size: ${out.toSeq}")
    assert(out.exists { case (_, _, th, _) => th == 1000L },
      s"some sparse band should keep everything: ${out.toSeq}")
    assert(out.exists { case (_, _, th, _) => th < 1000L },
      s"the dense center must downsample: ${out.toSeq}")
    assert(kept.toDouble / total < 0.75,
      s"stratified draw should be well under the corpus: $kept/$total")
  }
}

class EmbeddingPcaSpec extends AnyFunSuite {
  test("integer power iteration recovers a planted dominant direction") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // dominant direction = (3, 4)/5 in dims 0-1, small noise elsewhere
    val rows = (0L until 300L).map { i =>
      val a = (rnd.nextGaussian() * 0.5).toFloat
      Array.tabulate(64) { j =>
        val base = if (j == 0) 0.6f * a else if (j == 1) 0.8f * a else 0f
        base + 0.02f * rnd.nextGaussian().toFloat
      }
    }.zipWithIndex.map { case (v, i) => (i.toLong, v) }
    val out = graft.operators.Ann.embeddingPca(rows.toDF("vec_id", "embedding"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size == 64)
    val v = Array.tabulate(64)(i => out(i.toLong).toDouble)
    val n = math.sqrt(v.map(x => x * x).sum)
    val c01 = (0.6 * v(0) + 0.8 * v(1)) / n
    assert(math.abs(c01) > 0.99,
      s"top direction should align with (0.6, 0.8): got cos $c01, v01 = (${v(0)}, ${v(1)})")
    assert(math.abs(out(0L)).max(math.abs(out(1L))) == 1000L,
      "max component normalizes to exactly 1000 milli-units")
  }
}

class EmbeddingPca2Spec extends AnyFunSuite {
  test("deflated power iteration recovers both planted directions in strength order") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(37)
    // strong direction = dim 0 (amp 3), runner-up = dim 1 (amp 1)
    val rows = (0L until 300L).map { i =>
      val a = (rnd.nextGaussian() * 3.0).toFloat
      val b = rnd.nextGaussian().toFloat
      (i, Array.tabulate(64)(j =>
        (if (j == 0) a else if (j == 1) b else 0f) +
          0.02f * rnd.nextGaussian().toFloat))
    }
    val out = graft.operators.Ann.embeddingPca2(rows.toDF("vec_id", "embedding"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    def comp(c: Long) = Array.tabulate(64)(i => out((c, i.toLong)).toDouble)
    val (v1, v2) = (comp(1L), comp(2L))
    def cosWith(v: Array[Double], dim: Int) =
      math.abs(v(dim)) / math.sqrt(v.map(x => x * x).sum)
    assert(cosWith(v1, 0) > 0.95, s"component 1 should align dim 0: ${v1.take(4).toSeq}")
    assert(cosWith(v2, 1) > 0.95, s"component 2 should align dim 1: ${v2.take(4).toSeq}")
    val ortho = math.abs(v1.zip(v2).map { case (a, b) => a * b }.sum) /
      (math.sqrt(v1.map(x => x * x).sum) * math.sqrt(v2.map(x => x * x).sum))
    assert(ortho < 0.2, s"deflated component should be near-orthogonal: $ortho")
  }
}

class EmbeddingProjectSpec extends AnyFunSuite {
  test("projections are the exact integer dot product with the pca loadings") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val rows = (0L until 100L).map(i =>
      (i, Array.fill(64)((rnd.nextGaussian() * 0.3).toFloat)))
    val df = rows.toDF("vec_id", "embedding")
    val load = graft.operators.Ann.embeddingPca(df).collect()
      .map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
    val proj = graft.operators.Ann.embeddingProject(df).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def bp(x: Double): Long =
      (if (x * 1e4 >= 0) math.floor(x * 1e4 + 0.5) else math.ceil(x * 1e4 - 0.5)).toLong
    for ((id, v) <- rows.take(10)) {
      val want = v.zipWithIndex.map { case (x, i) => bp(x) * load(i) }.sum / 1000L
      assert(proj(id) == want, s"vec $id: got ${proj(id)}, want $want")
    }
  }
}

class PagerankSpec extends AnyFunSuite {
  test("a planted hub (every shell point's nearest neighbor) ranks first") {
    val spark = TestSpark.spark
    import spark.implicits._
    // center = 10*e0; shell_i = 10*e0 + 3*e_(1+i%60): every shell
    // point is closer (cosine) to the center than to any other shell
    // point, so the center collects in-links from the whole shell
    val center = (0L, Array.tabulate(64)(j => if (j == 0) 10f else 0f))
    val shell = (1L to 40L).map { i =>
      (i, Array.tabulate(64) { j =>
        if (j == 0) 10f else if (j == 1 + ((i - 1) % 60).toInt) 3f else 0f
      })
    }
    val df = (center +: shell).toDF("vec_id", "embedding")
    val out = graft.operators.Ann.graphPagerank(df, topN = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out.map(_._1) == (1L to 5L), "dense ranks")
    assert(out.head._2 == 0L, s"hub must rank first: got $out")
    val rs = out.map(_._3)
    assert(rs.zip(rs.tail).forall { case (a, b) => a >= b }, "ranks descend")
    // the shell is symmetric, so low-id shells tie the hub's in-degree
    // via the id tie-break in neighbor lists; the hub wins rank 1 on
    // the final (mass desc, id asc) order
    assert(out.head._3 >= out(1)._3)
  }
}

class HardNegativesSpec extends AnyFunSuite {
  test("near-duplicates are excluded; the hardest genuine negative ranks first") {
    val spark = TestSpark.spark
    import spark.implicits._
    // anchor 0; id 1 is a near-dup (cos ~ 1), ids 2-3 are hard
    // negatives (high but sub-ceiling cos), id 4 is easy (low cos)
    val df = Seq(
      (0L, Array(10f, 0f, 0f)),
      (1L, Array(10f, 0.01f, 0f)),   // cos ~ 0.9999 -> excluded
      (2L, Array(10f, 3f, 0f)),      // cos ~ 0.958  -> hardest negative
      (3L, Array(10f, 5f, 0f)),      // cos ~ 0.894
      (4L, Array(0f, 1f, 1f))        // cos 0
    ).toDF("vec_id", "embedding")
    val out = graft.operators.Ann.hardNegatives(df, k = 3, stride = 1000)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq((1L, 2L), (2L, 3L), (3L, 4L)), s"got $out")
  }
}

class BinaryRerankSpec extends AnyFunSuite {

  test("binary codes pack into two 32-bit words; planted orthants have exact Hamming") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // clustered corpus: binarization against the per-dim mean keeps
    // orthant structure, so same-cluster Hamming ≈ 0 and the rerank
    // recovers the exact neighbors
    val rnd = new scala.util.Random(11)
    val centers = Array.tabulate(4)(c => Array.tabulate(64)(j =>
      if (j % 4 == c) 10f else 0f))
    val rows = (0 until 200).map { i =>
      val c = i % 4
      (i.toLong, centers(c).map(x => x + 0.5f * rnd.nextGaussian().toFloat))
    }
    val df = rows.toDF("vec_id", "embedding")
    // shortlist must exceed the 50-vector cluster size: every
    // same-cluster candidate ties at Hamming 0, and a shorter list
    // cuts the tie set by vec_id, not by similarity
    val bin = graft.operators.Ann.annBinaryRerank(df, k = 5, stride = 10, shortlist = 60)
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val exact = graft.operators.Ann.annBruteforce(df, k = 5, stride = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    assert(bin.keySet == exact.keySet)
    val recalls = exact.map { case (q, nn) => (bin(q) & nn).size.toDouble / nn.size }
    assert(recalls.sum / recalls.size >= 0.9,
      s"mean recall ${recalls.sum / recalls.size} on an orthant-separated corpus")
  }

  test("binary rerank recall floor on the real corpus at 5% shortlist") {
    val spark = TestSpark.spark
    val emb = Tables.embeddings(spark, TestSpark.sf)
    val bin = graft.operators.Ann.annBinaryRerank(emb)
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val exact = graft.operators.Ann.annBruteforce(emb)
      .collect().map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    assert(bin.keySet == exact.keySet)
    val recalls = exact.map { case (q, nn) => (bin(q) & nn).size.toDouble / nn.size }
    // measured 0.78 at sf0.001 (deterministic data + deterministic
    // operator); the floor has 0.18 headroom
    assert(recalls.sum / recalls.size >= 0.6,
      s"mean recall ${recalls.sum / recalls.size}")
  }
}
