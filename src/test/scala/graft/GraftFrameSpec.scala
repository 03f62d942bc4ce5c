package graft

import org.scalatest.funsuite.AnyFunSuite

class GraftFrameSpec extends AnyFunSuite with SparkTestBase {

  private def nation = GraftFrame.table(wh, "nation")

  test("head honors n and column projection") {
    val rows = nation.head(5, Seq("n_nationkey", "n_name"))
    assert(rows.length === 5)
    assert(rows.head.length === 2)
  }

  test("count and schema") {
    assert(nation.count() === 25)
    assert(nation.schemaString.contains("n_name"))
  }

  test("toLocalRows enforces the driver-safety bound") {
    assert(nation.toLocalRows().length === 25)
    intercept[IllegalArgumentException] {
      GraftFrame.table(wh, "orders").toLocalRows(maxRows = 10)
    }
  }

  test("toLocalIterator streams all rows") {
    assert(nation.toLocalIterator().size === 25)
  }

  test("toView makes the frame SQL-addressable") {
    nation.toView("nation_handle")
    assert(spark.sql("SELECT count(*) FROM nation_handle").collect()(0).getLong(0) === 25)
  }

  test("transforms chain lazily") {
    val out = nation
      .filter("n_nationkey < 10")
      .rename(Map("n_name" -> "name"))
      .alterColumns(Map("n_nationkey" -> "string"))
      .select("n_nationkey", "name")
    assert(out.count() === 10)
    assert(out.schema("n_nationkey").dataType === org.apache.spark.sql.types.StringType)
  }
}
