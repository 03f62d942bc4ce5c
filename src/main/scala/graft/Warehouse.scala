package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Spark-native analogue of the reference's warehouse client + api surface.
  *
  * The reference loads warehouse tables with optional column projection,
  * row filter, and sampling (fugue_bigquery/api.py:30 `load_table`), runs
  * arbitrary SQL (fugue_bigquery/api.py:113 `load_sql`), inspects schemas
  * (fugue_bigquery/api.py:15 `get_schema`), writes tables back
  * (fugue_trino/execution_engine.py:90 `save_table`) and checks existence
  * (fugue_trino/execution_engine.py:85 `table_exists`).
  *
  * Here the "warehouse" is parquet on distributed storage read through
  * Spark's vectorized scan: `columns` becomes column pruning and `rowFilter`
  * becomes a pushed predicate, both of which reach the parquet reader
  * (equivalent to the BigQuery Storage API's selected_fields/row_restriction
  * — verified in WarehouseSpec via the executed plan).
  */
final class Warehouse(val spark: SparkSession, val baseDir: String) {

  val tableNames: Seq[String] = Warehouse.knownTables

  private def path(table: String): String = s"$baseDir/$table.parquet"

  /** load_table with pushdown: columns → ReadSchema prune, rowFilter →
    * PushedFilters, sample → Bernoulli sample (post-scan, like TABLESAMPLE).
    */
  def loadTable(
      table: String,
      columns: Seq[String] = Nil,
      rowFilter: Option[String] = None,
      sample: Double = 1.0,
      seed: Long = 42L
  ): DataFrame = {
    var df = spark.read.parquet(path(table))
    // TIMESTAMP(NANOS) columns arrive as long (nanosAsLong) — normalize to
    // microsecond timestamps so downstream code sees real timestamps.
    df = Warehouse.normalizeNanos(table, df)
    rowFilter.foreach(f => df = df.filter(f))
    if (columns.nonEmpty) df = df.select(columns.map(df.col): _*)
    if (sample < 1.0) df = df.sample(withReplacement = false, sample, seed)
    df
  }

  /** Register every known table as a temp view and run arbitrary SQL —
    * the Spark-native `load_sql` / Fugue `select` (SQL over named frames).
    */
  def loadSql(query: String): DataFrame = {
    registerAll()
    spark.sql(query)
  }

  /** Register all known tables (idempotent) for SQL access. */
  def registerAll(): Unit =
    tableNames.foreach { t =>
      if (new java.io.File(path(t)).exists())
        loadTable(t).createOrReplaceTempView(t)
    }

  def getSchema(table: String): StructType =
    spark.read.parquet(path(table)).schema

  /** describe: compiled plan + output schema, mirroring
    * fugue_trino/api.py:14 `describe` (SQL + schema dump).
    */
  def describe(df: DataFrame): String = {
    val plan = df.queryExecution.optimizedPlan.toString
    s"$plan\nOutput Schema: ${df.schema.simpleString}"
  }

  /** save_table with overwrite/append, like the reference's
    * `df_to_table(..., overwrite=mode=="overwrite")`.
    */
  def saveTable(df: DataFrame, outDir: String, table: String, mode: String = "overwrite"): Unit =
    df.write.mode(mode).parquet(s"$outDir/$table.parquet")

  def tableExists(dir: String, table: String): Boolean =
    new java.io.File(s"$dir/$table.parquet").exists()
}

object Warehouse {
  val knownTables: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings"
  )

  /** Tables with TIMESTAMP(NANOS) columns (read as long under
    * nanosAsLong): convert to microsecond timestamps.
    */
  private[graft] def normalizeNanos(table: String, df: DataFrame): DataFrame =
    if (table == "events" && df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
    else df

  def apply(spark: SparkSession, baseDir: String): Warehouse =
    new Warehouse(spark, baseDir)
}
