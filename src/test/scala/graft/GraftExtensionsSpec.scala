package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The extensions class must make vec_dot resolvable in plain SQL on a
  * session built with spark.sql.extensions=graft.GraftExtensions.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  test("vec_dot resolves on a session built with GraftExtensions") {
    // withExtensions rather than the spark.sql.extensions string conf:
    // the conf path only applies when the SparkContext is created fresh,
    // and the test JVM shares one context across suites
    val prior = SparkSession.getDefaultSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .withExtensions(new GraftExtensions())
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val v = s.sql("SELECT vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
        .head().getDouble(0)
      assert(v == 11.0)
    } finally {
      prior.foreach { p =>
        SparkSession.setDefaultSession(p)
        SparkSession.setActiveSession(p)
      }
    }
  }
}
