package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational

/** Mirrors the reference DataFrame suite's type coverage
  * (tests/fugue_trino/test_dataframe.py: binary/list/map/struct/
  * deep-nested/any-column-name): complex-typed columns must flow through
  * the engine verbs and survive a storage roundtrip unchanged.
  */
class ComplexTypesSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private lazy val complex = spark.sql(
    """SELECT id,
      | cast(concat('bin', id) AS binary)            AS b,
      | array(id, id + 1)                            AS arr,
      | map('k1', id, 'k2', id * 2)                  AS m,
      | named_struct('x', id, 'y',
      |   named_struct('z', array(id, 7L)))          AS s
      |FROM range(10)""".stripMargin)

  test("complex types flow through filter/select/assign") {
    val out = Relational.assign(
      complex.filter(col("s.x") > 2),
      Seq("z0" -> element_at(col("s.y.z"), 1), "mk" -> col("m.k1")))
    val r = out.orderBy("id").collect()
    assert(r.length === 7)
    assert(r.head.getAs[Long]("z0") === 3L)
    assert(r.head.getAs[Long]("mk") === 3L)
  }

  test("complex types survive a parquet roundtrip byte-for-byte") {
    val tmp = Files.createTempDirectory("graft_complex").toString
    wh.saveDf(complex, s"$tmp/c", format = "parquet")
    val back = wh.loadDf(s"$tmp/c", format = "parquet")
    // parquet reads come back nullable; structure must match exactly
    assert(back.schema.simpleString === complex.schema.simpleString)
    val a = complex.orderBy("id").collect()
    val b = back.orderBy("id").collect()
    a.zip(b).foreach { case (x, y) =>
      assert(java.util.Arrays.equals(x.getAs[Array[Byte]]("b"), y.getAs[Array[Byte]]("b")))
      assert(x.getAs[Row]("s") === y.getAs[Row]("s"))
      assert(x.getSeq[Long](x.fieldIndex("arr")) === y.getSeq[Long](y.fieldIndex("arr")))
    }
  }

  test("arbitrary column names (spaces, symbols) work through rename and select") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val weird = Relational.rename(df, Map("v" -> "weird name +/", "id" -> "the id"))
    assert(weird.columns.toSet === Set("the id", "weird name +/"))
    val back = Relational.rename(weird, Map("weird name +/" -> "v"))
    assert(back.select("v").count() === 2)
  }

  test("unified sample validates its arguments like the reference") {
    val df = wh.loadTable("customer")
    intercept[IllegalArgumentException] { Relational.sample(df) }
    intercept[IllegalArgumentException] { Relational.sample(df, n = Some(10), frac = Some(0.5)) }
    assert(Relational.sample(df, n = Some(90)).count() === 90)
    val f = Relational.sample(df, frac = Some(0.5)).count()
    assert(f > 25 && f < 125)
  }
}
