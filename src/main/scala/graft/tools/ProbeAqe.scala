package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession

/** Minimal AQE coalescing sanity probe (r13): does a small groupBy's
  * post-shuffle read coalesce below spark.sql.shuffle.partitions under
  * the session's settings? Prints the executed plan's partition counts.
  */
object ProbeAqe {
  def main(args: Array[String]): Unit = {
    val s = GraftSession.getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    println("parallelismFirst=" +
      s.conf.get("spark.sql.adaptive.coalescePartitions.parallelismFirst"))
    println("advisory=" + scala.util.Try(
      s.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes")))
    val df = s.range(0, 1000000).select((col("id") % 1000).as("k"), col("id"))
      .groupBy("k").agg(sum("id").as("s"))
    df.write.format("noop").mode("overwrite").save()
    println("groupBy output partitions (rdd) = " + df.rdd.getNumPartitions)
    val ck = s.range(0, 1000000).select((col("id") % 1000).as("k"), col("id"))
      .groupBy("k").agg(sum("id").as("s"))
      .localCheckpoint(eager = true)
    println("checkpointed groupBy partitions = " + ck.rdd.getNumPartitions)
    val j = s.range(0, 100000).select(col("id").as("k"))
      .join(ck, Seq("k")).groupBy("k").agg(count(lit(1)))
    j.write.format("noop").mode("overwrite").save()
    s.stop()
  }
}
