package graft.functions

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Row-level kernels behind the custom Catalyst expressions. All are
  * static, allocation-light, branch-free where it matters — codegen
  * emits a single static call per row (see the expressions' doGenCode).
  *
  * Deterministic by construction: fixed xxhash64 seed, splitmix64-derived
  * permutation coefficients — results are stable across partitions,
  * executors and runs, which the dedup operators rely on.
  */
object HashImpls {
  final val HashSeed = 42L

  def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def hash64(s: UTF8String): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, HashSeed)

  private final val MaxPerm = 256
  // Odd multipliers so the affine permutations are bijective mod 2^64.
  private val permA: Array[Long] = Array.tabulate(MaxPerm)(i => splitmix64(2L * i) | 1L)
  private val permB: Array[Long] = Array.tabulate(MaxPerm)(i => splitmix64(2L * i + 1))

  /** MinHash signature: per permutation i, min over shingles of the
    * affine-permuted xxhash64, compared unsigned. */
  def minhash(shingles: ArrayData, numPerm: Int): ArrayData = {
    val mins = Array.fill(numPerm)(-1L) // unsigned max
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        val h = hash64(shingles.getUTF8String(i))
        var j = 0
        while (j < numPerm) {
          val v = permA(j) * h + permB(j)
          if (java.lang.Long.compareUnsigned(v, mins(j)) < 0) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** 64-bit SimHash over token hashes (majority vote per bit). */
  def simhash(tokens: ArrayData): Long = {
    val acc = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = hash64(tokens.getUTF8String(i))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var r = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) r |= (1L << b); b += 1 }
    r
  }

  /** Winnowing selection over a gram-hash sequence: rightmost-min per
    * window of w (unsigned order), distinct sorted survivors. Monotonic
    * index deque → O(m) total instead of O(m·w) rescans, and a value is
    * appended only when the window minimum's INDEX moves (the classic
    * winnowing dedup — adjacent windows usually re-select the same
    * gram), so the final sort+dedup touches ~2m/(w+1) longs with zero
    * boxing; the TreeSet-per-window formulation this replaces boxed
    * every insert. Unsigned comparison matches signed for the
    * non-negative 60-bit portable hashes, so both kernels share it. */
  private def winnowSelect(hashes: Array[Long], w: Int): Array[Long] = {
    val m = hashes.length
    if (m <= w) {
      var min = hashes(0)
      var i = 1
      while (i < m) {
        if (java.lang.Long.compareUnsigned(hashes(i), min) <= 0) min = hashes(i)
        i += 1
      }
      return Array(min)
    }
    val sel = new Array[Long](m)
    var selN = 0
    val dq = new Array[Int](m)
    var head = 0
    var tail = 0
    var last = -1
    var i = 0
    while (i < m) {
      // pop >= from the back so the NEWEST index survives ties
      // (rightmost-min, matching the `<=` window scan this replaces)
      while (tail > head &&
        java.lang.Long.compareUnsigned(hashes(dq(tail - 1)), hashes(i)) >= 0) tail -= 1
      dq(tail) = i
      tail += 1
      val start = i - w + 1
      if (start >= 0) {
        while (dq(head) < start) head += 1
        val mi = dq(head)
        if (mi != last) { sel(selN) = hashes(mi); selN += 1; last = mi }
      }
      i += 1
    }
    val out = java.util.Arrays.copyOf(sel, selN)
    java.util.Arrays.sort(out)
    var wr = 0
    i = 0
    while (i < out.length) {
      if (wr == 0 || out(i) != out(wr - 1)) { out(wr) = out(i); wr += 1 }
      i += 1
    }
    if (wr == out.length) out else java.util.Arrays.copyOf(out, wr)
  }

  /** Winnowing document fingerprint (Schleimer et al., MOSS): k-gram
    * rolling polynomial hashes, rightmost-min per window of w, distinct
    * sorted selection. Robust to insertions/reorderings, output size
    * ~2/(w+1) of input length.
    */
  def winnow(text: UTF8String, k: Int, w: Int): ArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    if (n == 0) return new GenericArrayData(Array.emptyLongArray)
    if (n <= k) {
      var h = 0L
      var i = 0
      while (i < n) { h = h * 257L + (bytes(i) & 0xffL); i += 1 }
      return new GenericArrayData(Array(splitmix64(h)))
    }
    val m = n - k + 1
    val hashes = new Array[Long](m)
    var pow = 1L
    var i = 1
    while (i < k) { pow *= 257L; i += 1 }
    var h = 0L
    i = 0
    while (i < k) { h = h * 257L + (bytes(i) & 0xffL); i += 1 }
    hashes(0) = splitmix64(h)
    i = 1
    while (i < m) {
      h = (h - (bytes(i - 1) & 0xffL) * pow) * 257L + (bytes(i + k - 1) & 0xffL)
      hashes(i) = splitmix64(h)
      i += 1
    }
    new GenericArrayData(winnowSelect(hashes, w))
  }

  /** Hashed k-token shingles straight from UTF-8 bytes: lowercases
    * ASCII inline, hashes each whitespace token (xxhash64), then
    * combines k consecutive token hashes into a shingle hash — no
    * token/shingle strings ever materialize (the allocation-free fast
    * path under MinHash at corpus scale). Combiner = order-sensitive
    * splitmix chain, matching logical k-gram semantics. */
  def shingleHashes(text: UTF8String, k: Int): ArrayData =
    new GenericArrayData(shingleHashesRaw(text, k))

  /** [[shingleHashes]] with the distinct+sort folded into the kernel —
    * equivalent to `sort_array(array_distinct(shingleHashes(...)))` but
    * without two extra ArrayData passes (signed ascending order, same
    * as Spark's BIGINT sort, which [[sortedIntersectCount]] requires). */
  def shingleHashesSorted(text: UTF8String, k: Int): ArrayData = {
    val out = shingleHashesRaw(text, k)
    java.util.Arrays.sort(out)
    var w = 0
    var i = 0
    while (i < out.length) {
      if (w == 0 || out(i) != out(w - 1)) { out(w) = out(i); w += 1 }
      i += 1
    }
    new GenericArrayData(
      if (w == out.length) out else java.util.Arrays.copyOf(out, w))
  }

  private def shingleHashesRaw(text: UTF8String, k: Int): Array[Long] = {
    val bytes = text.getBytes
    val n = bytes.length
    // primitive growable buffer — no per-token Long boxing
    var tokenHashes = new Array[Long](math.max(16, n / 6))
    var m = 0
    var i = 0
    var h = 0xcbf29ce484222325L // FNV offset as running token hash
    var inTok = false
    while (i <= n) {
      val c = if (i < n) bytes(i) else ' '.toByte
      val isWs = c == ' ' || c == '\t' || c == '\n' || c == '\r'
      if (isWs) {
        if (inTok) {
          if (m == tokenHashes.length)
            tokenHashes = java.util.Arrays.copyOf(tokenHashes, m * 2)
          tokenHashes(m) = splitmix64(h)
          m += 1
          h = 0xcbf29ce484222325L
          inTok = false
        }
      } else {
        val lc = if (c >= 'A' && c <= 'Z') (c + 32).toByte else c
        h = (h ^ (lc & 0xffL)) * 0x100000001b3L // FNV-1a step
        inTok = true
      }
      i += 1
    }
    if (m == 0) return Array.emptyLongArray
    if (m < k) {
      var acc = 0L
      var j = 0
      while (j < m) { acc = splitmix64(acc ^ tokenHashes(j)); j += 1 }
      return Array(acc)
    }
    val out = new Array[Long](m - k + 1)
    var s0 = 0
    while (s0 <= m - k) {
      var acc = 0L
      var j = 0
      while (j < k) { acc = splitmix64(acc ^ tokenHashes(s0 + j)); j += 1 }
      out(s0) = acc
      s0 += 1
    }
    out
  }

  /** Word k-gram shingle STRINGS in one codegen'd pass — semantically
    * identical to the builtin pipeline
    * `transform(sequence(...), i -> concat_ws(" ", slice(split(trim(
    * lower(text)), "\\s+"), i+1, k)))` (short docs fall back to the
    * whole normalized text), but ~10x faster: Spark's higher-order
    * array functions evaluate their lambda interpreted per element,
    * outside WholeStageCodegen. */
  private val wsPattern = java.util.regex.Pattern.compile("\\s+")

  def shingleStrings(text: UTF8String, k: Int): ArrayData = {
    // limit -1 keeps trailing empty tokens, matching Spark's split()
    val toks = wsPattern.split(text.toLowerCase.trim.toString, -1)
    val n = toks.length
    if (n < k) {
      return new GenericArrayData(Array[Any](UTF8String.fromString(toks.mkString(" "))))
    }
    val out = new Array[Any](n - k + 1)
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i <= n - k) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** MinHash over precomputed 64-bit element hashes (pairs with
    * [[shingleHashes]]; skips string hashing entirely). */
  def minhashFromHashes(hashes: ArrayData, numPerm: Int): ArrayData = {
    val mins = Array.fill(numPerm)(-1L)
    val n = hashes.numElements()
    var i = 0
    while (i < n) {
      val h = hashes.getLong(i)
      var j = 0
      while (j < numPerm) {
        val v = permA(j) * h + permB(j)
        if (java.lang.Long.compareUnsigned(v, mins(j)) < 0) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** Intersection size of two SORTED long arrays (single merge pass —
    * the per-pair kernel behind set-similarity joins; no hashing, no
    * allocation). */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  /** Cosine similarity of two float vectors (tight primitive loop —
    * no boxing, unlike zip_with/aggregate higher-order functions). */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
  }

  /** Random-hyperplane LSH bucket: bit p = sign of <vec, plane_p> with
    * plane coefficients derived from splitmix64 — the deterministic
    * analog of a Gaussian projection (uniform in [-1,1)). `planeOffset`
    * selects a disjoint plane family, giving independent hash tables
    * for OR-amplified (multi-table) LSH. */
  def hyperplaneBucket(vec: ArrayData, numPlanes: Int, planeOffset: Int = 0): Int = {
    val n = vec.numElements()
    var bucket = 0
    var p = 0
    while (p < numPlanes) {
      var dot = 0.0
      var j = 0
      while (j < n) {
        val c = splitmix64(((p + planeOffset).toLong << 32) | (j.toLong & 0xffffffffL))
        // map to [-1, 1)
        val coef = (c >> 11).toDouble / (1L << 52).toDouble
        dot += vec.getFloat(j) * coef
        j += 1
      }
      if (dot >= 0) bucket |= (1 << p)
      p += 1
    }
    bucket
  }

  /** [[hyperplaneBucket]] with md5-derived plane coefficients a SQL
    * engine can recompute exactly: coef(p, j) = (md5_60("p:j") - 2^59)
    * / 2^59 — integer arithmetic plus a power-of-two division, both
    * exact in IEEE doubles. (The sign of the dot product is then
    * engine-independent up to last-ulp summation-order noise, which
    * only matters for dots within ~1e-15 of zero.) */
  private val portableCoefCache =
    new java.util.concurrent.ConcurrentHashMap[java.lang.Long, java.lang.Double]()

  private def portableCoef(plane: Int, j: Int): Double =
    portableCoefCache.computeIfAbsent((plane.toLong << 32) | j.toLong, key => {
      val h = md5Hash60(s"$plane:$j".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      (h - (1L << 59)).toDouble / (1L << 59).toDouble
    })

  def hyperplaneBucketPortable(vec: ArrayData, numPlanes: Int, planeOffset: Int): Int = {
    val n = vec.numElements()
    var bucket = 0
    var p = 0
    while (p < numPlanes) {
      var dot = 0.0
      var j = 0
      while (j < n) {
        dot += vec.getFloat(j).toDouble * portableCoef(p + planeOffset, j)
        j += 1
      }
      if (dot >= 0) bucket |= (1 << p)
      p += 1
    }
    bucket
  }

  /** Morton/Z-order interleave of the low `bits` bits of two
    * non-negative keys: sorting by this key keeps BOTH dimensions'
    * ranges tight within every file/row group, so min/max statistics
    * prune scans filtered on either dimension (the multi-dimensional
    * data-layout lever; one-dimensional sort only tightens one). */
  def zorder2(a: Long, b: Long, bits: Int): Long = {
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((a >>> i) & 1L) << (2 * i)
      z |= ((b >>> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  // ---- portable (md5-based) hash variants ----------------------------
  //
  // The xxhash/splitmix kernels above are the production fast path. The
  // `*Portable` variants swap the element hash for the first 60 bits of
  // md5, which any SQL engine can reproduce —
  // DuckDB: CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT) — so the
  // driver's oracle can recompute signatures exactly instead of only
  // spot-checking. Same algorithms, same selection logic; only the
  // element hash differs.

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  // RFC 1321 round constants K[i] = floor(abs(sin(i+1)) * 2^32) and
  // per-round rotate amounts — the public MD5 definition, generated
  // rather than typed so there is nothing to mistranscribe.
  private val md5K: Array[Int] =
    Array.tabulate(64)(i => (Math.abs(Math.sin(i + 1.0)) * 4294967296.0).toLong.toInt)
  private val md5S: Array[Int] = Array(
    7, 12, 17, 22, 7, 12, 17, 22, 7, 12, 17, 22, 7, 12, 17, 22,
    5, 9, 14, 20, 5, 9, 14, 20, 5, 9, 14, 20, 5, 9, 14, 20,
    4, 11, 16, 23, 4, 11, 16, 23, 4, 11, 16, 23, 4, 11, 16, 23,
    6, 10, 15, 21, 6, 10, 15, 21, 6, 10, 15, 21, 6, 10, 15, 21)

  private val md5Scratch = new ThreadLocal[Array[Int]] {
    override def initialValue(): Array[Int] = new Array[Int](16)
  }

  /** md5 of a message that fits one padded block (len <= 55 bytes),
    * returning the first 60 bits — bit-identical to
    * `pack60(MessageDigest md5)` for those inputs. One compression
    * function call on a caller-owned Int[16] scratch block: none of the
    * engine reset/update/digest machinery the JDK path pays per call,
    * which is what makes the per-gram portable kernels viable (winnowing
    * hashes every character position of the corpus). */
  def md5Block60(buf: Array[Byte], off: Int, len: Int, scratch: Array[Int]): Long = {
    val m = scratch
    java.util.Arrays.fill(m, 0)
    var i = 0
    while (i < len) { m(i >> 2) |= (buf(off + i) & 0xff) << ((i & 3) << 3); i += 1 }
    m(len >> 2) |= 0x80 << ((len & 3) << 3)
    m(14) = len << 3 // message bit length; len <= 55 so the high word is 0
    var a = 0x67452301
    var b = 0xefcdab89
    var c = 0x98badcfe
    var d = 0x10325476
    i = 0
    while (i < 64) {
      var f = 0
      var g = 0
      if (i < 16) { f = (b & c) | (~b & d); g = i }
      else if (i < 32) { f = (d & b) | (~d & c); g = (5 * i + 1) & 15 }
      else if (i < 48) { f = b ^ c ^ d; g = (3 * i + 5) & 15 }
      else { f = c ^ (b | ~d); g = (7 * i) & 15 }
      val tmp = d
      d = c
      c = b
      b = b + Integer.rotateLeft(a + f + md5K(i) + m(g), md5S(i))
      a = tmp
      i += 1
    }
    // Digest bytes 0..3 are (a + IV_a) little-endian, 4..7 are
    // (b + IV_b); pack60 chains the first 7 bytes big-endian and
    // appends the top nibble of byte 7. c/d never reach the output.
    val ra = a + 0x67452301
    val rb = b + 0xefcdab89
    val first7 =
      ((ra & 0xffL) << 48) | (((ra >>> 8) & 0xffL) << 40) |
        (((ra >>> 16) & 0xffL) << 32) | (((ra >>> 24) & 0xffL) << 24) |
        ((rb & 0xffL) << 16) | (((rb >>> 8) & 0xffL) << 8) | ((rb >>> 16) & 0xffL)
    (first7 << 4) | (((rb >>> 24) & 0xffL) >>> 4)
  }

  /** First 60 bits (15 hex chars) of an md5 digest, as a non-negative
    * long. */
  private def pack60(h: Array[Byte]): Long = {
    var first7 = 0L
    var i = 0
    while (i < 7) { first7 = (first7 << 8) | (h(i) & 0xffL); i += 1 }
    (first7 << 4) | ((h(7) & 0xffL) >>> 4)
  }

  /** First 60 bits (15 hex chars) of md5(s), as a non-negative long.
    * Single-block fast path for messages <= 55 bytes (token/gram scale);
    * the JDK engine handles the multi-block tail. */
  def md5Hash60(bytes: Array[Byte]): Long =
    if (bytes.length <= 55) md5Block60(bytes, 0, bytes.length, md5Scratch.get())
    else {
      val d = md5Local.get()
      d.reset()
      pack60(d.digest(bytes))
    }

  /** [[simhash]] with the portable 60-bit md5 token hash. */
  def simhashPortable(tokens: ArrayData): Long = {
    val acc = new Array[Int](60)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = md5Hash60(tokens.getUTF8String(i).getBytes)
        var b = 0
        while (b < 60) {
          if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var r = 0L
    var b = 0
    while (b < 60) { if (acc(b) > 0) r |= (1L << b); b += 1 }
    r
  }

  /** [[winnow]] with the portable md5 k-gram hash. Grams are taken over
    * characters (not bytes) so a SQL `substr` produces the same grams;
    * selected values are identical to a window-min over the gram-hash
    * sequence, which is how the oracle mirrors it. */
  def winnowPortable(text: UTF8String, k: Int, w: Int): ArrayData = {
    val s = text.toString
    val n = s.length
    if (n == 0) return new GenericArrayData(Array.emptyLongArray)
    if (n <= k)
      return new GenericArrayData(Array(md5Hash60(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))))
    val m = n - k + 1
    val hashes = new Array[Long](m)
    // Hot loop: encode the doc to UTF-8 ONCE and digest each k-char
    // gram straight out of the shared buffer via a char→byte offset
    // table, reusing one 16-byte digest output — zero per-gram
    // allocations (the naive substring(i,i+k).getBytes made two per
    // character position, the hottest allocation site in the repo).
    // Identical md5 inputs because each BMP char encodes independently;
    // a surrogate pair could be SPLIT by a gram boundary (changing the
    // encoded bytes), so any surrogate falls back to per-gram encoding.
    val all = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val offs = new Array[Int](n + 1)
    var hasSurrogate = false
    var ci = 0
    var bi = 0
    while (ci < n && !hasSurrogate) {
      offs(ci) = bi
      val c = s.charAt(ci)
      if (c < 0x80) bi += 1
      else if (c < 0x800) bi += 2
      else if (Character.isSurrogate(c)) hasSurrogate = true
      else bi += 3
      ci += 1
    }
    offs(n) = all.length
    var i = 0
    if (hasSurrogate) {
      while (i < m) {
        hashes(i) = md5Hash60(s.substring(i, i + k).getBytes(java.nio.charset.StandardCharsets.UTF_8))
        i += 1
      }
    } else {
      // Single-block md5 per gram (k chars encode to <= 3k bytes; the
      // rare gram over 55 bytes falls back to the JDK engine). Identical
      // 60-bit outputs, none of the per-call engine overhead.
      val scratch = md5Scratch.get()
      val d = md5Local.get()
      val digestBuf = new Array[Byte](16)
      while (i < m) {
        val glen = offs(i + k) - offs(i)
        if (glen <= 55) hashes(i) = md5Block60(all, offs(i), glen, scratch)
        else {
          d.reset()
          d.update(all, offs(i), glen)
          d.digest(digestBuf, 0, 16)
          hashes(i) = pack60(digestBuf)
        }
        i += 1
      }
    }
    new GenericArrayData(winnowSelect(hashes, w))
  }

  /** C-style round-half-away-from-zero of `x * 1e4` — the exact
    * arithmetic of DuckDB's `CAST(round(cos * 1e4) AS BIGINT)`, so
    * basis-point scores agree bit-for-bit across engines. */
  private def toBp(x: Double): Long = {
    val y = x * 1e4
    (if (y >= 0) math.floor(y + 0.5) else math.ceil(y - 0.5)).toLong
  }

  /** Greedy MMR (maximal marginal relevance) selection over one
    * query's candidate pool, λ = 1/2. All comparisons happen in
    * integer basis points: score2 = rel_bp − maxSimToSelected_bp
    * (= 2 × λ-weighted MMR score × 1e4; the empty-set penalty is 0,
    * so the first pick is pure relevance). Ties → lower id. Returns
    * array<struct<score2: long, id: long>> in pick order. Cost is
    * O(k·n + n²·dim picks-worth of cosines) — row-local, bounded by
    * the pool size, never the corpus. */
  def mmrSelect(ids: ArrayData, cos: ArrayData, vecs: ArrayData, k: Int): ArrayData = {
    val n = ids.numElements()
    val m = math.min(k, n)
    val idArr = new Array[Long](n)
    val relBp = new Array[Long](n)
    val vecArr = new Array[ArrayData](n)
    var i = 0
    while (i < n) {
      idArr(i) = ids.getLong(i)
      relBp(i) = toBp(cos.getDouble(i))
      vecArr(i) = vecs.getArray(i)
      i += 1
    }
    val penBp = new Array[Long](n)
    val taken = new Array[Boolean](n)
    val out = new Array[Any](m)
    var last = -1
    var t = 0
    while (t < m) {
      if (last >= 0) {
        var j = 0
        while (j < n) {
          if (!taken(j)) {
            val s = toBp(cosine(vecArr(j), vecArr(last)))
            if (t == 1 || s > penBp(j)) penBp(j) = s
          }
          j += 1
        }
      }
      var best = -1
      var bestScore = 0L
      var j = 0
      while (j < n) {
        if (!taken(j)) {
          val sc = if (t == 0) relBp(j) else relBp(j) - penBp(j)
          if (best < 0 || sc > bestScore || (sc == bestScore && idArr(j) < idArr(best))) {
            best = j
            bestScore = sc
          }
        }
        j += 1
      }
      taken(best) = true
      last = best
      out(t) = org.apache.spark.sql.catalyst.InternalRow(bestScore, idArr(best))
      t += 1
    }
    new GenericArrayData(out)
  }

  /** Exact-integer nearest centroid: argmin of Σ(x−c)² over the
    * centroid list (ties → lowest index, the strict `<` rule — same
    * pick as array_min over (dist, id) structs). Inputs are
    * basis-point quantized longs, so every distance is exact and the
    * argmin is engine-portable. Returns (dist_sq, list_id). */
  def nearestCentroid(xb: ArrayData, cents: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    val dims = xb.numElements()
    val k = cents.numElements()
    var bestD = Long.MaxValue
    var bestI = 0L
    var c = 0
    while (c < k) {
      val cv = cents.getArray(c)
      var d = 0L
      var j = 0
      while (j < dims) {
        val t = xb.getLong(j) - cv.getLong(j)
        d += t * t
        j += 1
      }
      if (d < bestD) { bestD = d; bestI = c.toLong }
      c += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(bestD, bestI)
  }

  /** IEEE-754 double → ORDER-PRESERVING signed-long bits (the classic
    * sign-flip trick, e.g. Lucene's sortable numerics): positive
    * doubles keep their raw bits; negative doubles flip every bit
    * EXCEPT the sign, reversing their backwards raw-bits order while
    * staying below the positives. Total order matches double order
    * with −0.0 < +0.0 and NaN (canonicalized by doubleToLongBits)
    * above +∞. The mask `(b >> 63) & Long.MaxValue` is all-ones-minus-
    * sign for negatives and 0 for positives — and since the SIGN bit
    * is untouched, the same function inverts itself on the bits level
    * (an involution; [[sortableBitsToDouble]] is the full inverse). */
  def doubleSortableBits(d: Double): Long = {
    val b = java.lang.Double.doubleToLongBits(d)
    b ^ ((b >> 63) & Long.MaxValue)
  }

  /** Exact inverse of [[doubleSortableBits]] (the xor mask depends
    * only on the preserved sign bit, so it self-inverts). */
  def sortableBitsToDouble(l: Long): Double =
    java.lang.Double.longBitsToDouble(l ^ ((l >> 63) & Long.MaxValue))
}
