package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational

/** Parity with the reference's OWN engine-contract tests: the suites at
  * tests/fugue_trino/test_execution_engine.py and
  * tests/fugue_bigquery/test_execution_engine.py run Fugue's public
  * ExecutionEngineTests, whose semantic corners are re-asserted here
  * against the Spark-native verbs — same inputs, same expected behavior.
  */
class ReferenceContractSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private lazy val engine = GraftEngine(spark, sfDir)

  test("sample validation contract (test_execution_engine.py:34-52 both backends)") {
    val a = engine.toDf((0 until 100).map(i => Row(i)), "a int")
    intercept[IllegalArgumentException](Relational.sample(a)) // must set one
    intercept[IllegalArgumentException](
      Relational.sample(a, n = Some(90), frac = Some(0.9))) // can't set both
    val f = Relational.sample(a, frac = Some(0.8))
    assert(f.schema.simpleString === a.schema.simpleString) // schema preserved
    val c = f.count()
    assert(c > 50 && c < 100, s"frac=0.8 of 100 gave $c")
    val b = Relational.sample(a, n = Some(90))
    assert(b.schema.simpleString === a.schema.simpleString)
    assert(b.count() === 90)
  }

  test("joins never match NULL keys (SQL semantics, all join types)") {
    val l = Seq((Option(1L), "l1"), (None: Option[Long], "l2")).toDF("k", "lv")
    val r = Seq((Option(1L), "r1"), (None: Option[Long], "r2")).toDF("k", "rv")
    assert(Relational.join(l, r, "inner", Seq("k")).count() === 1)
    // left keeps the null-key row, unmatched
    val left = Relational.join(l, r, "left", Seq("k"))
      .collect().map(row => Option(row.get(0)).map(_.toString).orNull -> row.getString(1)).toMap
    assert(left.size === 2 && left(null) === "l2")
    // semi/anti partition the left on matchability
    assert(Relational.join(l, r, "semi", Seq("k")).count() === 1)
    assert(Relational.join(l, r, "anti", Seq("k"))
      .collect().map(_.getString(1)).toSeq === Seq("l2"))
  }

  test("intersect and except are DISTINCT set ops even with duplicate inputs") {
    val a = Seq(1, 1, 2, 2, 3).toDF("x")
    val b = Seq(2, 2, 3, 3, 4).toDF("x")
    assert(Relational.intersect(a, b).collect().map(_.getInt(0)).sorted.toSeq === Seq(2, 3))
    assert(Relational.subtract(a, b).collect().map(_.getInt(0)).toSeq === Seq(1))
    assert(Relational.distinct(a).count() === 3)
  }

  test("fillna fills per-column values and leaves other columns alone") {
    val df = Seq[(Option[Int], Option[String])](
      (Some(1), None), (None, Some("b")), (None, None)).toDF("n", "s")
    val filled = Relational.fillna(df, Map("n" -> 0, "s" -> "?"))
      .collect().map(r => (r.getInt(0), r.getString(1))).toSet
    assert(filled === Set((1, "?"), (0, "b"), (0, "?")))
    // subset semantics: only the listed column is filled
    val partial = Relational.fillna(df, Map("n" -> 0))
    assert(partial.filter(col("s").isNull).count() === 2)
  }

  test("dropna any/all/subset contract") {
    val df = Seq[(Option[Int], Option[Int])](
      (Some(1), None), (None, None), (Some(2), Some(3))).toDF("a", "b")
    assert(Relational.dropna(df, "any").count() === 1)
    assert(Relational.dropna(df, "all").count() === 2)
    assert(Relational.dropna(df, "any", Seq("a")).count() === 2)
  }

  test("take per partition honors presort and na_position") {
    val df = Seq[(String, Option[Int])](
      ("g1", Some(5)), ("g1", None), ("g1", Some(9)),
      ("g2", None), ("g2", Some(1))).toDF("g", "v")
    // desc nulls last: the max non-null per group wins
    val last = Relational.takePresort(df, 1, "v desc", "last", Seq("g"))
      .collect().map(r => r.getString(0) -> r.get(1)).toMap
    assert(last === Map("g1" -> 9, "g2" -> 1))
    // desc nulls first: the null row wins where present
    val first = Relational.takePresort(df, 1, "v desc", "first", Seq("g"))
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(first === Map("g1" -> None, "g2" -> None))
  }

  test("union is by column NAME, not position") {
    val a = Seq((1, "x")).toDF("n", "s")
    val b = Seq(("y", 2)).toDF("s", "n") // reversed order, same names
    val u = Relational.unionAll(Seq(a, b)).collect().map(r => (r.getInt(0), r.getString(1))).toSet
    assert(u === Set((1, "x"), (2, "y")))
  }

  test("to_df builds a frame from local rows with the declared schema") {
    val df = engine.toDf(Seq(Row(1L, "a"), Row(2L, "b")), "id bigint, name string")
    assert(df.schema.simpleString === "struct<id:bigint,name:string>")
    assert(df.count() === 2)
  }

  test("alter_columns rejects unknown columns like the reference client") {
    // fugue_bigquery/_utils.py alter_table_columns raises on a column not
    // in the schema; Spark's cast of a missing column must fail too
    intercept[Exception] {
      Relational.alterColumns(Seq((1, "x")).toDF("n", "s"), Map("nope" -> "string"))
        .collect()
    }
  }
}
