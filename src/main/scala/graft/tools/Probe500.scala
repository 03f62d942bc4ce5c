package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{GraftSession, Warehouse}
import org.apache.spark.storage.StorageLevel

/** 500k-tier headline measurements for the r10s3 additions, ordered so
  * a wall-clock cut still leaves the cheap signals: holt fold, fuzzy
  * incremental 1% batch, fuzzy incremental 10% batch (post-OOM-fix —
  * the forced fetched-arrays broadcast died here at this tier). One rep
  * each; the 50k alternated-rep numbers carry the noise band. Not part
  * of the library surface.
  */
object Probe500 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mult = args.lift(1).map(_.toInt).getOrElse(100)
    val spark = GraftSession
      .builder(master = Some("local[32]"), shufflePartitions = 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Warehouse(spark, sfDir).loadTable("documents")
    val decades = docs
      .crossJoin(spark.range(mult / 10).toDF("d"))
      .select((col("doc_id") * (mult / 10) + col("d")).as("base_id"),
        when(col("d") === 0, col("text"))
          .otherwise(concat_ws(" ",
            transform(
              array_sort(
                zip_with(
                  split(col("text"), " "),
                  sequence(lit(1), size(split(col("text"), " "))),
                  (t, i) => struct(
                    xxhash64(t, i, col("doc_id"), col("d")).as("k"),
                    t.as("t")))),
              s => s.getField("t"))))
          .as("base_text"))
    val big = decades
      .crossJoin(spark.range(10).toDF("v"))
      .select(
        (col("base_id") * 10 + col("v")).as("doc_id"),
        when(col("v") === 0, col("base_text"))
          .otherwise(concat(col("base_text"), lit(" variant"), col("v"))).as("text"))
      .repartition(32 * (mult / 10))
      // DISK_ONLY: the 500k full-text corpus and the 26M-row gram store
      // would otherwise own the local JVM's storage pool and starve the
      // multi-million-pair verify join (measured OOM at this tier)
      .persist(StorageLevel.DISK_ONLY)
    val n = big.count()
    println(s"corpus: $n docs")

    def time[A](name: String)(f: => A): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    def drain(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val sevents = big.select(
      col("doc_id").as("eid"),
      pmod(col("doc_id"), lit(n / 50)).as("uid"),
      timestamp_micros(lit(1700000000000000L) +
        (col("doc_id") % 997) * 37000000L).as("ts"),
      (pmod(col("doc_id"), lit(1000L)).cast("double") / 100.0).as("value"))
      .persist(StorageLevel.DISK_ONLY)
    sevents.count()
    time("holt level+trend fold 500k") {
      drain(graft.operators.EventAnalytics.holt(
        sevents, "uid", "ts", "eid", "value",
        alphaPpm = 200000, betaPpm = 100000, devThreshCents = 3000))
    }
    sevents.unpersist()

    val fdocs = big.select(col("doc_id"), expr("substring(text, 1, 60)").as("s"))
    val fHist = fdocs.filter(col("doc_id") % 10 =!= 0)
    val fStore10k = graft.operators.Relational
      .fuzzyGramStore(fHist, "doc_id", "s", n = 3, maxGramFreq = 10000)
      .persist(StorageLevel.DISK_ONLY)
    fStore10k.count()
    // PRODUCTION config: maxGramFreq = 10000 (the fuzzyJoin default) —
    // uncapped prefixes blow up on this corpus's hot grams at 500k (the
    // cap is exactly the PPJoin dial for that); the gate keys run
    // cap 0 at gate scale for exact parity
    time("fuzzy incremental 10%-batch 500k cap10k") {
      drain(graft.operators.Relational.fuzzyJoinIncremental(
        fdocs.filter(col("doc_id") % 10 === 0), "doc_id", "s",
        fStore10k, fHist, thresholdNum = 4, thresholdDen = 5, n = 3,
        maxGramFreq = 10000))
    }
    time("fuzzy incremental 1%-batch 500k cap10k") {
      drain(graft.operators.Relational.fuzzyJoinIncremental(
        fdocs.filter(col("doc_id") % 100 === 10), "doc_id", "s",
        fStore10k, fHist, thresholdNum = 4, thresholdDen = 5, n = 3,
        maxGramFreq = 10000))
    }
    spark.stop()
  }
}
