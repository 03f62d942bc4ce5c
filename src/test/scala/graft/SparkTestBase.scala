package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for every suite (Test/fork runs them in a
  * single JVM — reusing the session avoids ~5 s of startup per suite).
  */
object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = GraftSession.builder(Some("local[4]"), shufflePartitions = 4).getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

trait SparkTestBase {
  lazy val spark: SparkSession = SparkTestSession.spark
  val sfDir = "/root/testdata/sf0.001"
  def wh: Warehouse = Warehouse(spark, sfDir)
}
