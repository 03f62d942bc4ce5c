package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{GraftSession, Warehouse}
import graft.operators.{Retrieval, TextAnalysis}

/** One-off measurement probe for the r9s6 500k-tier outliers (packBins
  * 12.8 s, retrievalMetrics 34.8 s) — times each stage of both plans in
  * isolation to localize the cost before concluding anything about the
  * operator shape. Not part of the library surface.
  */
object ProbePack {
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
      .repartition(320)
      .persist()
    println(s"corpus: ${big.count()} docs")

    def time[A](name: String)(f: => A): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    def drain(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // ---- packBins stages ----
    val key = conv(substring(md5(concat(lit("42"), lit(":"),
      col("doc_id").cast("string"))), 1, 15), 16, 10).cast("long")
    val toks = big.select(col("doc_id").cast("long").as("id"),
      coalesce(size(split(trim(col("text")), "\\s+")).cast("long"), lit(0L))
        .as("n_tokens"),
      pmod(key, lit(256L)).as("shard"))
    time("pb.1 toks projection only") { drain(toks) }
    time("pb.2 + repartition(64, shard)") {
      drain(toks.repartition(64, col("shard")))
    }
    time("pb.3 + sortWithinPartitions") {
      drain(toks.repartition(64, col("shard"))
        .sortWithinPartitions("shard", "id"))
    }
    time("pb.4 full packBins") {
      drain(TextAnalysis.packBins(big, "doc_id", "text", 2048L, 256))
    }

    // ---- retrievalMetrics stages ----
    val queries = big.filter(pmod(col("doc_id"), lit(100)) === 0)
      .select(col("doc_id").as("qid"))
    time("rm.0 queries scan") { drain(queries) }
    val results = queries
      .select(col("qid"), explode(sequence(lit(1L), lit(10L))).as("rank"))
      .withColumn("did", col("qid") + col("rank"))
    val qrels = queries
      .select(col("qid"), explode(sequence(lit(1L), lit(5L))).as("j"))
      .withColumn("did", col("qid") + col("j") * 2)
      .select("qid", "did")
    time("rm.1 results alone") { drain(results) }
    time("rm.2 qrels alone") { drain(qrels) }
    time("rm.3 full retrievalMetrics") {
      drain(Retrieval.retrievalMetrics(results, qrels,
        "qid", "did", "rank", k = 10))
    }
    time("rm.4 with persisted inputs") {
      val r2 = results.localCheckpoint()
      val q2 = qrels.localCheckpoint()
      drain(Retrieval.retrievalMetrics(r2, q2, "qid", "did", "rank", k = 10))
    }
    spark.stop()
  }
}
