package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GraftEngineSpec extends AnyFunSuite with SparkTestBase {

  private lazy val engine = GraftEngine(spark, sfDir)

  test("toDf builds a frame from local rows and a DDL schema") {
    val df = engine.toDf(Seq(Row(1L, "a"), Row(2L, "b")), "id bigint, v string")
    assert(df.count() === 2)
    assert(df.schema.fieldNames.toSeq === Seq("id", "v"))
  }

  test("engine verbs compose end-to-end") {
    val c = engine.loadTable("customer", columns = Seq("c_custkey", "c_nationkey"))
    val n = engine.rename(engine.loadTable("nation"), Map("n_nationkey" -> "c_nationkey"))
    val joined = engine.join(c, n, "inner", Seq("c_nationkey"))
    val top = engine.take(joined, 3, Seq(col("c_custkey").desc))
    assert(top.count() === 3)
    val agg = engine.select(Map("j" -> joined),
      "SELECT n_name, count(*) AS c FROM j GROUP BY n_name")
    assert(agg.count() === 25)
  }

  test("engine sample follows the reference contract") {
    intercept[IllegalArgumentException] { engine.sample(engine.loadTable("orders")) }
    assert(engine.sample(engine.loadTable("orders"), n = Some(50)).count() === 50)
  }

  test("frame handle is reachable from the engine") {
    assert(engine.table("region").count() === 5)
  }
}
