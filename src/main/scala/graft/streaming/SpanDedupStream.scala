package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Warehouse
import graft.operators.Dedup

/** STREAMING-NATIVE substring dedup: the [[Dedup.sharedSpansIncremental]]
  * composition packaged as a durable foreachBatch sink. The span store —
  * history's winnowing anchors AND texts — lives in warehouse tables, not
  * in-memory state, so the stream survives restarts (a new session picks
  * up the store where the last one left off), the store is inspectable
  * like any other table, and store growth is append-only parquet (bucket
  * the anchor table by `h` at scale for bucket-pruned probes).
  *
  * Idempotent by document id: a micro-batch replay (foreachBatch is
  * at-least-once on failure recovery) re-processes only ids absent from
  * the store, so re-delivered documents neither duplicate store rows nor
  * re-emit their spans — the [[Events.mixtureReservoir]] re-delivery rule
  * applied at the document level.
  *
  * Per batch the work is O(batch + matches): one anchor pass over the
  * batch, a hash-probe of the store, text fetches for bounded candidates
  * ([[Dedup.sharedSpansIncremental]]'s contract), then two appends.
  */
object SpanDedupStream {

  private def anchorsTable(storeName: String) = s"${storeName}_anchors"
  private def textsTable(storeName: String) = s"${storeName}_texts"

  /** Process one arriving micro-batch against the persisted store under
    * `wh.baseDir`/`outDir`: returns the spans found (batch-vs-history and
    * batch-internal; never history-vs-history) and appends the NEW batch
    * docs' anchors and texts to the store tables. Absent store tables
    * bootstrap as empty history. Returns an empty frame for an
    * all-replayed batch.
    */
  def processBatch(wh: Warehouse, batch: DataFrame, idCol: String,
      textCol: String, storeName: String, outDir: String = "",
      minLen: Int = 40, k: Int = 20, maxHashDocs: Int = 100,
      maxHashOccurrences: Int = 1000): DataFrame = {
    val dir = if (outDir.nonEmpty) outDir else wh.baseDir
    // reads must target the STORE dir, which may differ from wh.baseDir
    val swh = if (dir == wh.baseDir) wh else Warehouse(wh.spark, dir)
    val aT = anchorsTable(storeName)
    val tT = textsTable(storeName)
    val b = batch.select(col(idCol).cast("long").as("id"), col(textCol).as("text"))
    val (storeAnchors, history, haveStore) =
      if (wh.tableExists(dir, tT))
        (swh.loadTable(aT), swh.loadTable(tT), true)
      else
        (Dedup.spanAnchorStore(b.limit(0), "id", "text", minLen, k),
          b.limit(0), false)
    // id-level idempotence: drop already-ingested docs before any work
    val fresh = (if (haveStore)
        b.join(history.select("id"), Seq("id"), "left_anti")
      else b)
      .localCheckpoint(true) // frozen: batch sources are spent after the trigger
    val spans = Dedup.sharedSpansIncremental(fresh, "id", "text",
      storeAnchors, history, minLen, k, maxHashDocs, maxHashOccurrences)
      .localCheckpoint(true) // materialize BEFORE the store appends below
    wh.saveTable(Dedup.spanAnchorStore(fresh, "id", "text", minLen, k),
      dir, aT, mode = "append")
    wh.saveTable(fresh, dir, tT, mode = "append")
    spans
  }

  /** foreachBatch sink: spans of each micro-batch append to
    * `storeName`_spans alongside the store tables.
    *
    * {{{
    * docsStream.writeStream
    *   .foreachBatch(SpanDedupStream.sink(wh, "doc_id", "text", "spanstore"))
    *   .start()
    * }}}
    */
  def sink(wh: Warehouse, idCol: String, textCol: String, storeName: String,
      outDir: String = "", minLen: Int = 40, k: Int = 20,
      maxHashDocs: Int = 100, maxHashOccurrences: Int = 1000):
      (DataFrame, Long) => Unit = { (batch: DataFrame, _: Long) =>
    val dir = if (outDir.nonEmpty) outDir else wh.baseDir
    val spans = processBatch(wh, batch, idCol, textCol, storeName, dir,
      minLen, k, maxHashDocs, maxHashOccurrences)
    wh.saveTable(spans, dir, s"${storeName}_spans", mode = "append")
  }
}
