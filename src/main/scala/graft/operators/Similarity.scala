package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Approximate-nearest-neighbor search over an embedding column,
  * SURVEY §2.3 rows 43-44.
  *
  * Both variants return one row per (query, rank): columns
  * (query_id, rank, neighbor_id, score), rank 1 = best, ties broken by
  * smaller neighbor_id — fully deterministic.
  *
  * Scale design: the query set is the small side (broadcast); the corpus is
  * never shuffled whole. Brute force is map-side only — the TopKAgg partial
  * aggregate reduces every partition to ≤ k entries per query before the
  * single shuffle, so shuffle volume is partitions × |queries| × k rows
  * regardless of corpus size. The LSH variant shuffles the corpus once as
  * narrow (id, table, bucket) rows and scores candidates only.
  */
object Similarity {

  /** Exact top-k cosine neighbors per query via a broadcast nested-loop
    * pass over the corpus. `excludeSelf` drops neighbor_id == query_id
    * matches (the usual "don't return the query itself" semantics).
    */
  def bruteForceTopK(
      corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qIdCol: String, qVecCol: String,
      k: Int, excludeSelf: Boolean = true): DataFrame = {
    val spark = corpus.sparkSession
    GraftFunctions.ensure(spark)
    val c = corpus.select(col(idCol).cast("long").as("neighbor_id"), col(vecCol).as("nbr_vec"))
    val q = queries.select(col(qIdCol).cast("long").as("query_id"), col(qVecCol).as("query_vec"))
    val crossed = c.crossJoin(broadcast(q))
    val filtered = if (excludeSelf) crossed.filter(col("neighbor_id") =!= col("query_id")) else crossed
    topKPerQuery(
      filtered.withColumn("score", GraftFunctions.cosineSim(col("nbr_vec"), col("query_vec"))),
      k)
  }

  /** LSH-bucketed approximate top-k: corpus and queries are bucketed with
    * the same `numTables` hyperplane tables (one expression pass each);
    * candidates are corpus rows sharing ≥ 1 (table, bucket) with a query.
    * Expected recall per true neighbor at angle θ is
    * 1-(1-(1-θ/π)^numBits)^numTables.
    */
  def lshTopK(
      corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qIdCol: String, qVecCol: String,
      k: Int, numBits: Int = 8, numTables: Int = 16, seed: Long = 42L,
      excludeSelf: Boolean = true): DataFrame = {
    val spark = corpus.sparkSession
    GraftFunctions.ensure(spark)
    val c = corpus.select(col(idCol).cast("long").as("neighbor_id"), col(vecCol).as("nbr_vec"))
    val q = queries.select(col(qIdCol).cast("long").as("query_id"), col(qVecCol).as("query_vec"))
    def bucketize(df: DataFrame, id: String, vec: String) =
      df.withColumn("bks", GraftFunctions.hyperplaneLshMulti(col(vec), numBits, numTables, seed))
        .select(col(id), posexplode(col("bks")).as(Seq("tbl", "bucket")))
    // Queries stay broadcast through bucketing; the corpus-side join is a
    // map-side hash probe, then candidates dedup on (query, neighbor).
    val cand = bucketize(c, "neighbor_id", "nbr_vec")
      .join(broadcast(bucketize(q, "query_id", "query_vec")), Seq("tbl", "bucket"))
      .select("query_id", "neighbor_id")
      .distinct()
    val scored = cand
      .join(c, "neighbor_id")
      .join(broadcast(q), "query_id")
      .withColumn("score", GraftFunctions.cosineSim(col("nbr_vec"), col("query_vec")))
    val filtered = if (excludeSelf) scored.filter(col("neighbor_id") =!= col("query_id")) else scored
    topKPerQuery(filtered, k)
  }

  /** IVF-flat approximate top-k: `numCells` corpus vectors (seeded hash
    * order — a uniform data sample, the degenerate-but-valid centroid
    * choice when no training pass is budgeted) become cell centroids;
    * every corpus vector is assigned to its nearest centroid in one
    * broadcast pass; each query probes its `numProbe` nearest cells and
    * scores only those cells' members.
    *
    * Scale: centroids are broadcast (numCells ≪ corpus); assignment is
    * map-side; the only shuffle is the candidate join on cell id. Recall
    * rises with numProbe (numProbe == numCells degenerates to exact).
    */
  def ivfTopK(
      corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qIdCol: String, qVecCol: String,
      k: Int, numCells: Int = 16, numProbe: Int = 4, seed: Long = 42L,
      excludeSelf: Boolean = true): DataFrame = {
    val spark = corpus.sparkSession
    GraftFunctions.ensure(spark)
    val c = corpus.select(col(idCol).cast("long").as("neighbor_id"), col(vecCol).as("nbr_vec"))
    val q = queries.select(col(qIdCol).cast("long").as("query_id"), col(qVecCol).as("query_vec"))
    // deterministic uniform sample: numCells smallest seeded hashes
    val cellOf = c
      .withColumn("__h", xxhash64(col("neighbor_id"), lit(seed)))
      .orderBy("__h").limit(numCells)
      .select(row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy("__h")).as("cell"),
        col("nbr_vec").as("centroid"))
    // nearest-centroid assignment: broadcast centroids, keep argmax cosine
    def assign(df: DataFrame, vec: String, keep: Int): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(df.columns.head).orderBy(col("__sim").desc, col("cell"))
      df.crossJoin(broadcast(cellOf))
        .withColumn("__sim", GraftFunctions.cosineSim(col(vec), col("centroid")))
        .withColumn("__rk", row_number().over(w))
        .filter(col("__rk") <= keep)
        .drop("centroid", "__sim", "__rk")
    }
    val assigned = assign(c, "nbr_vec", 1)
    val probed = assign(q, "query_vec", numProbe)
    val scored = assigned
      .join(broadcast(probed.select("query_id", "cell", "query_vec")), "cell")
      .withColumn("score", GraftFunctions.cosineSim(col("nbr_vec"), col("query_vec")))
      .select("query_id", "neighbor_id", "score").distinct()
    val filtered =
      if (excludeSelf) scored.filter(col("neighbor_id") =!= col("query_id")) else scored
    topKPerQuery(filtered, k)
  }

  /** Shared tail: bounded top-k per query (TopKAgg partial-aggregates
    * map-side), exploded to (query_id, rank, neighbor_id, score) rows.
    */
  private def topKPerQuery(scored: DataFrame, k: Int): DataFrame =
    scored
      .groupBy("query_id")
      .agg(GraftFunctions.topK(col("neighbor_id"), col("score"), k).as("topk"))
      .select(col("query_id"), posexplode(col("topk")).as(Seq("pos", "entry")))
      .select(
        col("query_id"),
        (col("pos") + 1).cast("long").as("rank"),
        col("entry.id").as("neighbor_id"),
        col("entry.score").as("score"))
}
