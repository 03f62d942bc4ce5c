package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.{GraftSession, Warehouse}

/** Component breakdown for the editDistanceJoinIncremental 50k probe —
  * the ProbeNew reading (10% batch ≈ the full one-shot) needs a cause
  * before it is recorded: measures the batch-only one-shot (the newNew
  * leg), the incremental WITHOUT the eager localCheckpoint
  * (persistLevel=NONE), and the full incremental, alternated. Not part
  * of the library surface.
  */
object ProbeInc {
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
    println(s"corpus: ${big.count()} docs")

    def time[A](name: String)(f: => A): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    def drain(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val edocs = big.select(col("doc_id"), expr("substring(text, 1, 40)").as("p"))
    val eHist = edocs.filter(col("doc_id") % 10 =!= 0)
    val eBatch = edocs.filter(col("doc_id") % 10 === 0)
    val eStore = graft.operators.Relational
      .editSegmentStore(eHist, "doc_id", "p", maxDist = 2).persist()
    eStore.count()

    // batch-size scaling: if per-batch cost tracks BATCH size the shape
    // is right (store machinery is not a fixed corpus-sized toll); the
    // 1% batch probes against the SAME 90% store
    val eBatch1 = edocs.filter(col("doc_id") % 100 === 10)
    val fdocs = big.select(col("doc_id"), expr("substring(text, 1, 60)").as("s"))
    val fHist = fdocs.filter(col("doc_id") % 10 =!= 0)
    val fBatch = fdocs.filter(col("doc_id") % 10 === 0)
    val fBatch1 = fdocs.filter(col("doc_id") % 100 === 10)
    val fStore = graft.operators.Relational
      .fuzzyGramStore(fHist, "doc_id", "s", n = 3).persist()
    fStore.count()

    for (rep <- 1 to 2) {
      time(s"A newNew leg only: editDistanceJoin(batch) rep$rep") {
        drain(graft.operators.Relational.editDistanceJoin(
          eBatch, "doc_id", "p", maxDist = 2))
      }
      time(s"B incremental persistLevel=NONE rep$rep") {
        drain(graft.operators.Relational.editDistanceJoinIncremental(
          eBatch, "doc_id", "p", eStore, eHist, maxDist = 2,
          persistLevel = StorageLevel.NONE))
      }
      time(s"C incremental full (eager checkpoint) rep$rep") {
        drain(graft.operators.Relational.editDistanceJoinIncremental(
          eBatch, "doc_id", "p", eStore, eHist, maxDist = 2))
      }
      time(s"D edit incremental 1%-batch rep$rep") {
        drain(graft.operators.Relational.editDistanceJoinIncremental(
          eBatch1, "doc_id", "p", eStore, eHist, maxDist = 2))
      }
      time(s"E fuzzy incremental 10%-batch rep$rep") {
        drain(graft.operators.Relational.fuzzyJoinIncremental(
          fBatch, "doc_id", "s", fStore, fHist,
          thresholdNum = 4, thresholdDen = 5, n = 3))
      }
      time(s"F fuzzy incremental 1%-batch rep$rep") {
        drain(graft.operators.Relational.fuzzyJoinIncremental(
          fBatch1, "doc_id", "s", fStore, fHist,
          thresholdNum = 4, thresholdDen = 5, n = 3))
      }
    }
    spark.stop()
  }
}
