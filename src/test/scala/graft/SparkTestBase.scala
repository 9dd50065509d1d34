package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM-wide session; suites run in
  * the forked test JVM, `build.sbt` supplies the JDK-17 add-opens). */
object SparkTestBase {
  // the library factory, so the suites exercise the exact session posture
  // (extensions, AQE, skew-join, UTC) a deployment gets
  lazy val spark: SparkSession = GraftSession.local("graft-tests", 4)
}

abstract class SparkSuite extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = SparkTestBase.spark
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf001 = "/root/testdata/sf0.001"

  /** Run `body` with SQL confs set, restoring previous values after. */
  def withSQLConf[A](confs: (String, String)*)(body: => A): A = {
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
