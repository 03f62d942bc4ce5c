package graft

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

import graft.operators.Relational

/** The engine facade — the single object a user of the reference's
  * ExecutionEngine (fugue_trino/execution_engine.py:27,
  * fugue_bigquery/execution_engine.py) programs against, with every engine
  * verb delegated to the Spark-native implementations.
  *
  * Method-for-method mapping to the reference contract:
  *   to_df → toDf · join → join · union → unionAll/unionDistinct ·
  *   intersect/subtract/distinct → same · dropna/fillna → same ·
  *   sample(n|frac) → sample · take → take · select → select ·
  *   map_partitions/transform → transform · zip+comap → cogroup ·
  *   persist → persist · save_table/load_table/table_exists → same ·
  *   load_df/save_df(format) → loadDf/saveDf · get_schema → getSchema ·
  *   describe → describe
  * plus the scale extensions (Dedup/Similarity/TextAnalysis/Multimodal/
  * streaming.Events) reachable through the same session.
  */
final class GraftEngine(val spark: SparkSession, val warehouseDir: String) {

  val warehouse: Warehouse = Warehouse(spark, warehouseDir)

  // ---- frames ----------------------------------------------------------

  /** to_df: local rows → distributed frame (the reference's entry point
    * for test fixtures and small inputs).
    */
  def toDf(rows: Seq[Row], schemaDDL: String): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows),
      StructType.fromDDL(schemaDDL))

  def frame(df: DataFrame): GraftFrame = GraftFrame(df)
  def table(name: String): GraftFrame = GraftFrame(warehouse.loadTable(name))

  // ---- relational verbs ------------------------------------------------

  def join(left: DataFrame, right: DataFrame, how: String, on: Seq[String]): DataFrame =
    Relational.join(left, right, how, on)
  def saltedJoin(left: DataFrame, right: DataFrame, on: Seq[String],
      how: String = "inner", salt: Int = 8): DataFrame =
    Relational.saltedJoin(left, right, on, how, salt)
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
      rightCols: Seq[String]): DataFrame =
    Relational.asofJoin(left, right, keyCol, tsCol, rightCols)
  def unionAll(dfs: Seq[DataFrame]): DataFrame = Relational.unionAll(dfs)
  def unionDistinct(dfs: Seq[DataFrame]): DataFrame = Relational.unionDistinct(dfs)
  def intersect(a: DataFrame, b: DataFrame): DataFrame = Relational.intersect(a, b)
  def subtract(a: DataFrame, b: DataFrame): DataFrame = Relational.subtract(a, b)
  def distinct(df: DataFrame): DataFrame = Relational.distinct(df)
  def dropna(df: DataFrame, how: String = "any", subset: Seq[String] = Nil,
      thresh: Option[Int] = None): DataFrame =
    Relational.dropna(df, how, subset, thresh)
  def fillna(df: DataFrame, values: Map[String, Any]): DataFrame =
    Relational.fillna(df, values)
  def sample(df: DataFrame, n: Option[Int] = None, frac: Option[Double] = None,
      seed: Long = 42L, replace: Boolean = false): DataFrame =
    Relational.sample(df, n, frac, seed, replace)
  def take(df: DataFrame, n: Int, presort: Seq[Column],
      partitionBy: Seq[String] = Nil): DataFrame =
    Relational.take(df, n, presort, partitionBy)
  /** Fugue-style string presort with na_position ("first" | "last"). */
  def takePresort(df: DataFrame, n: Int, presort: String,
      naPosition: String = "last", partitionBy: Seq[String] = Nil): DataFrame =
    Relational.takePresort(df, n, presort, naPosition, partitionBy)
  def assign(df: DataFrame, cols: Seq[(String, Column)]): DataFrame =
    Relational.assign(df, cols)
  def alterColumns(df: DataFrame, casts: Map[String, String]): DataFrame =
    Relational.alterColumns(df, casts)
  def rename(df: DataFrame, renames: Map[String, String]): DataFrame =
    Relational.rename(df, renames)
  def dropColumns(df: DataFrame, cols: Seq[String]): DataFrame =
    Relational.dropColumns(df, cols)
  def select(frames: Map[String, DataFrame], sql: String): DataFrame =
    Relational.select(spark, frames, sql)
  def transform(df: DataFrame, outSchema: StructType)(
      f: Iterator[Row] => Iterator[Row]): DataFrame =
    Relational.transform(df, outSchema)(f)
  def cogroup(left: DataFrame, right: DataFrame, leftKey: String, rightKey: String,
      outSchema: StructType)(
      f: (Long, Iterator[Row], Iterator[Row]) => Iterator[Row]): DataFrame =
    Relational.cogroup(left, right, leftKey, rightKey, outSchema)(f)
  def persist(df: DataFrame): DataFrame = Relational.persist(df)
  def unpersist(df: DataFrame): DataFrame = Relational.unpersist(df)
  def repartition(df: DataFrame, n: Int, cols: Seq[String] = Nil): DataFrame =
    Relational.repartition(df, n, cols)
  def broadcastHint(df: DataFrame): DataFrame = Relational.broadcastHint(df)

  // ---- warehouse surface ----------------------------------------------

  def loadTable(table: String, columns: Seq[String] = Nil,
      rowFilter: Option[String] = None, sampleFrac: Double = 1.0): DataFrame =
    warehouse.loadTable(table, columns, rowFilter, sampleFrac)
  def loadSql(query: String): DataFrame = warehouse.loadSql(query)
  def saveTable(df: DataFrame, outDir: String, table: String,
      mode: String = "overwrite"): Unit = warehouse.saveTable(df, outDir, table, mode)
  def tableExists(dir: String, table: String): Boolean = warehouse.tableExists(dir, table)
  /** persist-to-storage: materialize to a warehouse table and re-read —
    * for intermediates that exceed cluster cache (reference persist,
    * fugue_trino/execution_engine.py:124-133).
    */
  def persistToTable(df: DataFrame, outDir: String, table: String = ""): DataFrame =
    warehouse.persistToTable(df, table, outDir)
  def getSchema(table: String): StructType = warehouse.getSchema(table)
  def describe(df: DataFrame): String = warehouse.describe(df)
  def loadDf(path: String, format: String = "parquet",
      schema: Option[StructType] = None): DataFrame =
    warehouse.loadDf(path, format, schema)
  /** Multi-path load_df (reference: Union[str, List[str]]) — one scan. */
  def loadDf(paths: Seq[String], format: String,
      schema: Option[StructType]): DataFrame =
    warehouse.loadDf(paths, format, schema, header = true)
  def saveDf(df: DataFrame, path: String, format: String = "parquet",
      mode: String = "overwrite"): Unit = warehouse.saveDf(df, path, format, mode)
  /** Expose `ns.table` names to loadSql (catalog DB per namespace). */
  def registerNamespace(ns: String): Unit = warehouse.registerNamespace(ns)
}

object GraftEngine {
  /** Bootstrap like the reference's get-or-create client/engine pair. */
  def apply(warehouseDir: String): GraftEngine =
    new GraftEngine(GraftSession.getOrCreate(), warehouseDir)
  def apply(spark: SparkSession, warehouseDir: String): GraftEngine =
    new GraftEngine(spark, warehouseDir)
}
