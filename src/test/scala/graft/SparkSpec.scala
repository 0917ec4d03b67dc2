package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for specs: graft extensions (governance rule) and the
  * graft catalog are installed the way a production session would, so tests
  * exercise the same wiring Verify/Bench use.
  */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {

  val sfDir = "/root/testdata/sf0.001"

  lazy val spark: SparkSession = SparkSpec.session

  override def afterAll(): Unit = {
    // session is shared across suites; do not stop it here
    super.afterAll()
  }
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.catalog.graft", "graft.catalog.GraftCatalog")
      .config("spark.sql.catalog.graft.dir", "/root/testdata/sf0.001")
      // delegation allow-list is static-conf-only (set at context build, like
      // spark-defaults in production): this principal may impersonate ONLY
      // "analyst" — GovernanceSpec exercises both the grant and the denial
      .config(graft.plans.Users.DelegationKey,
        s"${System.getProperty("user.name")}:analyst")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
