package graft

import org.scalatest.funsuite.AnyFunSuite

/** Ported 1:1 from the reference's own contract test
  * (tests/fugue_trino/test_collections.py:test_table_name).
  */
class TableNameSpec extends AnyFunSuite {

  test("parse matches the reference contract") {
    assert(TableName.parse(" a . b . c").toString === "a.b.c")
    assert(TableName.parse(" b . c", defaultCatalog = Some("a")).toString === "a.b.c")
    assert(TableName.parse("  c",
      defaultCatalog = Some("a"), defaultSchema = Some("b")).toString === "a.b.c")
    assert(TableName.parse(" ",
      defaultCatalog = Some("a"), defaultSchema = Some("b"),
      tableFunc = Some(() => "c")).toString === "a.b.c")
    assert(TableName.parse(null: String,
      defaultCatalog = Some("a"), defaultSchema = Some("b"),
      tableFunc = Some(() => "c")).toString === "a.b.c")
    val parsed = TableName.parse(" a . b . c")
    assert(TableName.parse(parsed).toString === "a.b.c") // idempotent
    assert(TableName.parse(Seq("a", "b", "c")).toString === "a.b.c")
    assert(TableName.parse(Seq(" a ", "b", " c")).toString === "a.b.c") // parts trimmed

    intercept[IllegalArgumentException](TableName.parse(" b . c"))
    intercept[IllegalArgumentException](TableName.parse(" c", defaultCatalog = Some("a")))
    intercept[IllegalArgumentException](TableName.parse(" ",
      defaultCatalog = Some("a"), defaultSchema = Some("b")))
    intercept[IllegalArgumentException](TableName.parse(Seq("a", "b", "c", "d")))
  }

  test("parsed names resolve through the warehouse path layer") {
    val tn = TableName.parse("sales.core.nation", defaultCatalog = Some("x"))
    assert(Warehouse.tablePath("/wh", tn.toString) === "/wh/sales/core/nation.parquet")
  }
}
