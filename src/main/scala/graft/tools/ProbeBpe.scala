package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{GraftSession, Warehouse}

/** Same-JVM interleaved A/B of the BPE merge fold: the r12 struct-
  * accumulator form (committed, via Bpe.encodeCorpus/trainDistributed)
  * vs a local replica of the pre-r12 regexp_extract form — the
  * cross-bench medians disagreed with the separate-JVM probes by
  * ±0.3 s on a noisy box, so settle it the ProbeHits way.
  *
  * Usage: runMain graft.tools.ProbeBpe <sfDir> <reps>
  */
object ProbeBpe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 5
    val s = GraftSession.getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val docs = Warehouse(s, dir).loadTable("documents")

    // pre-r12 fold, verbatim
    def oldMergeExpr(l: String, r: String): String = {
      val lastTok = "regexp_extract(acc, '([^ ]*)$', 1)"
      s"""aggregate(slice(__s, 2, greatest(size(__s) - 1, 0)),
         |  element_at(__s, 1),
         |  (acc, x) -> IF($lastTok = '$l' AND x = '$r',
         |    concat(substr(acc, 1, length(acc) - length($lastTok)), '$l$r'),
         |    concat(acc, ' ', x)))""".stripMargin
    }
    def oldEncode(merges: Seq[(Long, String, String)]): DataFrame = {
      var seg = docs
        .select(explode(
          expr("regexp_extract_all(lower(`text`), '[a-z0-9]+', 0)")).as("raw"))
        .distinct()
        .withColumn("w", expr("array_join(regexp_extract_all(raw, '.', 0), ' ')"))
      merges.sortBy(_._1).foreach { case (_, l, r) =>
        seg = seg
          .withColumn("__s", split(col("w"), " "))
          .withColumn("w", expr(oldMergeExpr(l, r)))
          .drop("__s")
      }
      val vocab = broadcast(
        seg.select(col("raw"), size(split(col("w"), " ")).cast("long").as("__n"))
          .localCheckpoint(true))
      val perDoc = docs
        .select(col("doc_id"), explode(
          expr("regexp_extract_all(lower(`text`), '[a-z0-9]+', 0)")).as("raw"))
        .join(vocab, "raw")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_words"), sum(col("__n")).as("n_tokens"))
      docs.select(col("doc_id"))
        .join(perDoc, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_words"), lit(0L)).as("n_words"),
          coalesce(col("n_tokens"), lit(0L)).as("n_tokens"))
    }

    val merges = graft.operators.Bpe.trainDistributed(docs, "text", numMerges = 16)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // warmup both
    graft.operators.Bpe.encodeCorpus(docs, "doc_id", "text", merges)
      .write.format("noop").mode("overwrite").save()
    oldEncode(merges).write.format("noop").mode("overwrite").save()

    val a = scala.collection.mutable.ArrayBuffer[Double]() // new (struct)
    val b = scala.collection.mutable.ArrayBuffer[Double]() // old (regexp)
    (1 to reps).foreach { r =>
      a += time(graft.operators.Bpe.encodeCorpus(docs, "doc_id", "text", merges)
        .write.format("noop").mode("overwrite").save())
      b += time(oldEncode(merges)
        .write.format("noop").mode("overwrite").save())
      println(f"rep$r struct=${a.last}%.3f regexp=${b.last}%.3f")
    }
    // parity: identical token counts (the equivalence claim, corpus-wide)
    val diff = graft.operators.Bpe.encodeCorpus(docs, "doc_id", "text", merges)
      .withColumnRenamed("n_tokens", "t1").select("doc_id", "t1")
      .join(oldEncode(merges).withColumnRenamed("n_tokens", "t2")
        .select("doc_id", "t2"), "doc_id")
      .filter(col("t1") =!= col("t2")).count()
    println(s"parity diff rows: $diff")
    def med(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    println(f"MEDIAN struct=${med(a.toSeq)}%.3f regexp=${med(b.toSeq)}%.3f " +
      f"load1m=${java.lang.management.ManagementFactory.getOperatingSystemMXBean.getSystemLoadAverage}%.2f")
    s.stop()
  }
}
