package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Verifies the SparkSessionExtensions entry point: a session built
  * with the extensions exposes the native functions WITHOUT any
  * per-session register() call — the cluster deployment path. */
class GraftExtensionsSpec extends AnyFunSuite {

  test("withExtensions(GraftExtensions) exposes native SQL functions") {
    val shared = SparkSpec.session // ensure the shared context exists
    // Build a separate session over the same SparkContext with the
    // extensions wired in; restore the shared session afterwards so
    // other suites are unaffected.
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val sess = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions())
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      import sess.implicits._
      Seq("aaaa bbbb cccc", "aaaa bbbb cccc").toDF("t").createOrReplaceTempView("ext_docs")
      val sig = sess.sql("SELECT minhash_sig(t, 4, 8) AS s FROM ext_docs")
        .as[Seq[Long]].collect()
      assert(sig(0) == sig(1) && sig(0).length == 8)
      assert(sess.sql("SELECT kmv_distinct(t, 64) AS d FROM ext_docs").as[Long].head() == 1L)
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }
}
