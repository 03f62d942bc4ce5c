package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

import graft.operators.Relational

/** Lazy frame handle mirroring the reference's warehouse DataFrame surface
  * (fugue_bigquery/dataframe.py:21: schema, head, count, as_pandas/as_arrow,
  * alter_columns, to_sql). Scala-native mapping: pandas/arrow local
  * materialization becomes Row collections and a streaming local iterator —
  * both bounded, because an unbounded driver collect is the classic way to
  * kill a 100 TB job.
  *
  * Everything stays lazy (a wrapped Dataset plan) until an action; transforms
  * return new handles.
  */
final case class GraftFrame(df: DataFrame) {

  def schema: StructType = df.schema
  def schemaString: String = df.schema.simpleString

  /** head(n, columns): bounded driver-side peek, column-pruned before the
    * limit so the scan only reads what's asked for.
    */
  def head(n: Int, columns: Seq[String] = Nil): Seq[Row] = {
    val d = if (columns.isEmpty) df else df.select(columns.map(col): _*)
    d.limit(n).collect().toSeq
  }

  def count(): Long = df.count()

  /** Local materialization (the as_pandas/as_arrow analogue). Guarded: if
    * the result exceeds `maxRows` this fails fast instead of OOMing the
    * driver — callers wanting more should write to storage instead.
    */
  def toLocalRows(maxRows: Int = 100000): Seq[Row] = {
    val got = df.limit(maxRows + 1).collect()
    require(got.length <= maxRows,
      s"result exceeds maxRows=$maxRows; write to storage instead of collecting")
    got.toSeq
  }

  /** Streaming local iterator: one partition in driver memory at a time. */
  def toLocalIterator(): Iterator[Row] = {
    import scala.jdk.CollectionConverters._
    df.toLocalIterator().asScala
  }

  /** Register as a temp view and return the name (the to_sql analogue —
    * the frame becomes addressable from SQL).
    */
  def toView(name: String): String = {
    df.createOrReplaceTempView(name)
    name
  }

  def select(columns: String*): GraftFrame = GraftFrame(df.select(columns.map(col): _*))
  def filter(condition: String): GraftFrame = GraftFrame(df.filter(condition))
  def alterColumns(casts: Map[String, String]): GraftFrame =
    GraftFrame(Relational.alterColumns(df, casts))
  def rename(renames: Map[String, String]): GraftFrame =
    GraftFrame(Relational.rename(df, renames))
  def dropColumns(cols: String*): GraftFrame = GraftFrame(Relational.dropColumns(df, cols))
  def persist(): GraftFrame = GraftFrame(Relational.persist(df))
  def unpersist(): GraftFrame = GraftFrame(Relational.unpersist(df))
}

object GraftFrame {
  /** Open a warehouse table as a handle. */
  def table(wh: Warehouse, name: String): GraftFrame = GraftFrame(wh.loadTable(name))
}
