package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Mirrors the role of the reference's client/engine bootstrap
  * (fugue_trino/execution_engine.py:173 `TrinoExecutionEngine.__init__`,
  * fugue_bigquery/client.py `BigQueryClient.get_or_create`) but Spark-native:
  * one SparkSession, tuned for large-scale shuffles with AQE enabled so the
  * same code path survives 100 TB inputs (skew-join splitting, partition
  * coalescing, runtime broadcast demotion).
  */
object GraftSession {

  /** Default local parallelism; on a real cluster this is driven by
    * spark-submit and the values below only set sane SQL defaults.
    */
  def builder(
      master: Option[String] = None,
      shufflePartitions: Int = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
  ): SparkSession.Builder = {
    // Catalog state (bucketed tables, derby metastore) lives under tmp, not
    // the working directory.
    val tmp = System.getProperty("java.io.tmpdir")
    if (System.getProperty("derby.system.home") == null)
      System.setProperty("derby.system.home", tmp)
    val b = SparkSession
      .builder()
      .appName("graft")
      .config("spark.sql.warehouse.dir", s"$tmp/graft-spark-warehouse")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // 64 MiB split target keeps scan tasks balanced on wide parquet.
      .config("spark.sql.files.maxPartitionBytes", "67108864")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet carries TIMESTAMP(NANOS) which Spark's vectorized
      // reader rejects; read as long and normalize in Warehouse.loadTable.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // reliable checkpoints (connectedComponents checkpointDir): delete
      // a round's files once its RDD is unreferenced — without this,
      // iterative reliable checkpointing accumulates every superseded
      // round in the checkpoint dir until application exit
      .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
      .config("spark.ui.enabled", "false")
    master.fold(b)(b.master)
  }

  def getOrCreate(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = builder(master = Some(s"local[$cpus]")).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
