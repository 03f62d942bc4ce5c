package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{GraftSession, Warehouse}

/** Isolated 50k-tier measurement for the round-10 tail additions
  * (editDistanceJoin, cusum) — the Scaling suite runs them late, where
  * earlier persists can evict the synthetic corpus cache and inflate the
  * reading (the r9s6 packBins/retrievalMetrics artifact). Two reps each,
  * alternated, on the same corpus the Scaling harness builds. Not part
  * of the library surface.
  */
object ProbeNew {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mult = args.lift(1).map(_.toInt).getOrElse(10)
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
      .persist()
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
      when(col("doc_id") % 10 === 0, "purchase")
        .when(col("doc_id") % 10 < 5, "view").otherwise("click").as("etype"),
      (pmod(col("doc_id"), lit(1000L)).cast("double") / 100.0).as("value"))
      .persist()
    sevents.count()

    for (rep <- 1 to 2) {
      time(s"editDistanceJoin k=2 over 40-char prefixes rep$rep") {
        drain(graft.operators.Relational.editDistanceJoin(
          big.select(col("doc_id"), expr("substring(text, 1, 40)").as("p")),
          "doc_id", "p", maxDist = 2))
      }
      time(s"cusum level-shift fold rep$rep") {
        drain(graft.operators.EventAnalytics.cusum(
          sevents, "uid", "ts", "eid", "value",
          targetCents = 500, slackCents = 100, threshCents = 10000))
      }
    }
    spark.stop()
  }
}
