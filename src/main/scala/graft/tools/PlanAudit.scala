package graft.tools

import org.apache.spark.sql.execution.ExplainMode

import graft.{GraftSession, SparkEntry}

/** Plan-shape diagnostics: prints the physical plan skeleton (joins,
  * exchanges, scans, aggregates) of the named queries — the quick way to
  * re-check "is this still the plan we want" after a change.
  *
  * Usage: sbt "runMain graft.tools.PlanAudit [sfDir] [query ...]"
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = GraftSession.builder(master = Some("local[8]"), shufflePartitions = 8)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val interesting = Seq("Join", "Exchange", "Scan", "HashAggregate",
      "ObjectHashAggregate", "SortAggregate", "Window", "Generate")
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      println(s"=== $n ===")
      df.queryExecution.explainString(ExplainMode.fromString("simple"))
        .linesIterator
        .filter(l => interesting.exists(l.contains))
        .foreach(l => println(l.replaceAll("#\\d+L?", "").take(160)))
    }
    spark.stop()
  }
}
