package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

class GraftExtensionsSpec extends AnyFunSuite {
  test("spark.sql.extensions=graft.GraftExtensions exposes graft_* in a fresh session") {
    // getOrCreate reuses the default session (ignoring configs), so
    // detach it first to prove injection happens at session-build time.
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .withExtensions(new GraftExtensions()) // = spark.sql.extensions=graft.GraftExtensions (static conf can't attach to the test's pre-existing context)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val one = s.sql("SELECT graft_cosine(array(1.0f, 0.0f), array(1.0f, 0.0f)) AS c").head().getDouble(0)
      assert(math.abs(one - 1.0) < 1e-12)
      val mh = s.sql("SELECT size(graft_minhash(array('a','b'), 16)) AS n").head().getInt(0)
      assert(mh == 16)
      val fp = s.sql("SELECT graft_fingerprint('hello world, again', 4, 2) AS f").head().getSeq[Long](0)
      assert(fp.nonEmpty)
      val si = s.sql("SELECT graft_sorted_intersect(array(1L,2L,5L), array(2L,5L,9L)) AS i").head().getInt(0)
      assert(si == 2)
      val sh = s.sql("SELECT graft_shingle_strings('a b c d', 3) AS s").head().getSeq[String](0)
      assert(sh == Seq("a b c", "b c d"))
      val shh = s.sql("SELECT size(graft_shingle_hashes('a b c d', 3)) AS n").head().getInt(0)
      assert(shh == 2)
      val mhh = s.sql("SELECT size(graft_minhash_hashes(array(1L, 2L), 8)) AS n").head().getInt(0)
      assert(mhh == 8)
      val pe = s.sql("SELECT graft_proto_encode(named_struct('id', 5L, 'name', 'x')) AS p")
        .head().getAs[Array[Byte]](0)
      assert(pe.length == 1 + 1 + 1 + 1 + 1) // tag+varint(5), tag+len+'x'
      val hb = s.sql("SELECT graft_hyperplane_bucket(array(1.0f, 0.5f), 4) AS b").head().getInt(0)
      assert(hb >= 0 && hb < 16)
      // graft_kmv: bottom-3 distinct hashes, ascending, dups collapsed
      val kmv = s.sql(
        "SELECT graft_kmv(h, 3) AS sk FROM VALUES (9L),(2L),(7L),(2L),(5L) t(h)")
        .head().getSeq[Long](0)
      assert(kmv == Seq(2L, 5L, 7L))
      // graft_mg: candidates + NULL-tok total marker
      val mg = s.sql(
        "SELECT graft_mg(t, 1L, 2) AS sk FROM VALUES ('a'),('a'),('b'),('a') t(t)")
        .head().getSeq[org.apache.spark.sql.Row](0)
      assert(mg.exists(r => r.isNullAt(0) && r.getLong(1) == 4L),
        "marker must carry the total weight")
      assert(mg.exists(r => !r.isNullAt(0) && r.getString(0) == "a"),
        "the 3/4-share key must survive")
    } finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
