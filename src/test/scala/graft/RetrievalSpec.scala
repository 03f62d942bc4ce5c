package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Relational, Retrieval, TextAnalysis}
import graft.streaming.Events
import graft.streaming.Events.Event

class RetrievalSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  // ---- BM25 ------------------------------------------------------------

  test("bm25TopK: hand-computed integer-exact scores, ranking and ties") {
    // N=3, SUMDL=9, df(x)=df(y)=2 -> idf factor 3/5 for both terms.
    // score_e6 = floor(1e6 * 3 * 22 * tf * 9 / (5 * (90*tf + 27 + 27*dl)))
    val docs = Seq(
      (1L, "x x y"),    // dl=3: x -> 825000, y -> 600000, total 1425000
      (2L, "x z"),      // dl=2: x -> floor(594e6/855) = 694736
      (3L, "y y y y")   // dl=4: y -> floor(2376e6/2475) = 960000
    ).toDF("doc_id", "text")
    val got = Retrieval.bm25TopK(docs, "text", "doc_id", Seq("x", "y"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4), r.getLong(5)))
    assert(got === Array(
      (1L, 1L, 1425000L, 2L, "x,y", 3L),
      (3L, 2L, 960000L, 1L, "y", 4L),
      (2L, 3L, 694736L, 1L, "x", 2L)))
  }

  test("bm25TopK: longer doc with equal tf scores lower (length norm)") {
    val docs = Seq((1L, "x pad pad pad pad pad pad"), (2L, "x")).toDF("doc_id", "text")
    val got = Retrieval.bm25TopK(docs, "text", "doc_id", Seq("x"), k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq((2L, 1L), (1L, 2L)))
  }

  test("bm25TopK: docs without any query term never appear; k caps output") {
    val docs = Seq((1L, "a b"), (2L, "x a"), (3L, "x b"), (4L, "c")).toDF("doc_id", "text")
    val res = Retrieval.bm25TopK(docs, "text", "doc_id", Seq("x"), k = 1)
    assert(res.count() === 1)
    val all = Retrieval.bm25TopK(docs, "text", "doc_id", Seq("x"), k = 10)
    assert(all.select("id").as[Long].collect().toSet === Set(2L, 3L))
  }

  // ---- RRF fusion ------------------------------------------------------

  test("rrfFuse: integer-exact contributions, missing side contributes 0") {
    val a = Seq((1L, 1L), (2L, 2L)).toDF("id", "rank")   // dense
    val b = Seq((2L, 1L), (3L, 2L)).toDF("id", "rank")   // sparse
    val got = Retrieval.rrfFuse(a, b, "id", "rank", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Long])))
    val c61 = 1000000000L / 61  // rank 1
    val c62 = 1000000000L / 62  // rank 2
    assert(got === Array(
      (2L, 1L, c62 + c61, Some(2L), Some(1L)),
      (1L, 2L, c61, Some(1L), None),
      (3L, 3L, c62, None, Some(2L))))
  }

  test("rrfFuse: doc ranked high in both lists beats each list's other docs") {
    // doc 2 is rank 1 dense + rank 2 sparse: 1/61 + 1/62 beats both
    // 1/63 + 1/61 (doc 3) and 1/62 + 1/63 (doc 1)
    val a = Seq((2L, 1L), (1L, 2L), (3L, 3L)).toDF("id", "rank")
    val b = Seq((3L, 1L), (2L, 2L), (1L, 3L)).toDF("id", "rank")
    val top = Retrieval.rrfFuse(a, b, "id", "rank", k = 1)
      .select("id").as[Long].head()
    assert(top === 2L)
  }

  // ---- MMR diversity re-rank ------------------------------------------

  test("mmrRerank: diverse pick beats a more-relevant near-duplicate") {
    // a is the top hit at angle -0.2 from the query, b its near-clone at
    // -0.25 (more relevant than c), c diverse at +0.35 on the other side:
    // step 2 trades b's relevance (0.969) against its redundancy to a
    // (0.999) and picks c (relevance 0.939, redundancy 0.853):
    // mmr_b = .7*.969-.3*.999 = .379 < mmr_c = .7*.939-.3*.853 = .402
    def unit(rad: Double) = Array(math.cos(rad).toFloat, math.sin(rad).toFloat)
    val q = unit(0.0)
    val a = unit(-0.2)
    val b = unit(-0.25)
    val cv = unit(0.35)
    def cos(x: Array[Float], y: Array[Float]): Double = {
      val dot = x.zip(y).map { case (p, r) => p.toDouble * r.toDouble }.sum
      val na = x.map(v => v.toDouble * v.toDouble).sum
      val nb = y.map(v => v.toDouble * v.toDouble).sum
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val cands = Seq(
      (0L, 1L, a, cos(q, a)), (0L, 2L, b, cos(q, b)), (0L, 3L, cv, cos(q, cv)))
      .toDF("query_id", "cand_id", "vec", "score")
    val got = Retrieval.mmrRerank(cands, "query_id", "cand_id", "vec", "score", k = 3)
      .orderBy("rank").collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(got.map(_._2) === Seq(1L, 3L, 2L),
      s"expected diverse c at rank 2, got $got")
    // plain relevance would have ordered b second
    assert(cos(q, b) > cos(q, cv))
  }

  test("mmrRerank: first pick is the top-scored candidate; k caps; multi-query") {
    val v = (i: Int) => Array(math.cos(i * 0.4).toFloat, math.sin(i * 0.4).toFloat)
    val rows = for (q <- 0L to 1L; c <- 1L to 6L)
      yield (q, c, v(c.toInt), 1.0 - 0.01 * c - 0.1 * q)
    val cands = rows.toDF("query_id", "cand_id", "vec", "score")
    val got = Retrieval.mmrRerank(cands, "query_id", "cand_id", "vec", "score", k = 4)
    assert(got.count() === 8) // 4 per query
    val firsts = got.filter($"rank" === 1)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(firsts === Map(0L -> 1L, 1L -> 1L)) // highest score per query
    // no candidate picked twice within a query
    val dups = got.groupBy("query_id", "neighbor_id").count()
      .filter($"count" > 1).count()
    assert(dups === 0)
  }

  // ---- URL canonicalization -------------------------------------------

  private def canon(url: String): (String, String) = {
    val r = TextAnalysis.canonicalizeUrl(Seq(url).toDF("url"), "url")
      .select("url_host", "url_canonical").head()
    (r.getString(0), r.getString(1))
  }

  test("canonicalizeUrl: case, www, default port, fragment, tracking, order") {
    assert(canon("HTTPS://WWW.Example.COM:443/A/b/?utm_source=x&b=2&a=1#frag")
      === ("example.com", "https://example.com/A/b?a=1&b=2"))
    assert(canon("HTTP://Host.com:80") === ("host.com", "http://host.com"))
    // non-default port survives; http does not strip :443
    assert(canon("http://host.com:8080/x") === ("host.com:8080", "http://host.com:8080/x"))
    assert(canon("http://host.com:443/x") === ("host.com:443", "http://host.com:443/x"))
  }

  test("canonicalizeUrl: query dropped entirely when only tracking params") {
    assert(canon("https://a.com/p?utm_source=x&fbclid=1")._2 === "https://a.com/p")
    // bare tracking name drops; prefix-only lookalike survives
    assert(canon("https://a.com/p?ref&refx=1")._2 === "https://a.com/p?refx=1")
  }

  test("canonicalizeUrl: a '?' inside the fragment is NOT a query") {
    // SPA-style fragment routing: everything after '#' drops, including
    // its embedded '?tab=1'
    assert(canon("https://a.com/#/route?tab=1")._2 === "https://a.com")
    assert(canon("https://a.com/p#sec?x=1")._2 === "https://a.com/p")
    // a real query AND a fragment '?': only the real one survives
    assert(canon("https://a.com/p?a=1#sec?x=2")._2 === "https://a.com/p?a=1")
  }

  test("canonicalizeUrl: root slash strips to host; path case preserved") {
    assert(canon("https://a.com/")._2 === "https://a.com")
    assert(canon("https://a.com/CaseSensitive/Path")._2
      === "https://a.com/CaseSensitive/Path")
  }

  // ---- shard assignment ------------------------------------------------

  test("shardAssign: pure function of (seed, id) — stable, uniform-ish, complete") {
    val ids = (0L until 500L).toDF("doc_id")
    val a = Relational.shardAssign(ids, "doc_id", 8, seed = 42L)
      .select("doc_id", "shard", "sort_key").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val b = Relational.shardAssign(ids.repartition(7), "doc_id", 8, seed = 42L)
      .select("doc_id", "shard", "sort_key").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(a === b) // partitioning-independent
    assert(a.forall { case (_, s, k) => s >= 0 && s < 8 && k >= 0 })
    val sizes = a.groupBy(_._2).map(_._2.length)
    assert(sizes.size === 8, "all 8 shards populated at n=500")
    assert(sizes.max < 3 * sizes.min, s"gross skew: $sizes")
    val c = Relational.shardAssign(ids, "doc_id", 8, seed = 43L)
      .select("doc_id", "shard").collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(c.map(_._2).toSeq !== a.map(_._2).toSeq, "seed changes the assignment")
  }

  test("writeShards: one directory per shard, rows sorted by sort_key within") {
    val dir = java.nio.file.Files.createTempDirectory("graft-shards").toString
    val ids = (0L until 200L).toDF("doc_id")
    Relational.writeShards(ids, "doc_id", 4, dir, seed = 7L)
    val back = spark.read.parquet(dir)
    assert(back.count() === 200)
    assert(back.select("shard").distinct().as[Int].collect().toSet === Set(0, 1, 2, 3))
    // round-trip preserves the assignment exactly
    val expect = Relational.shardAssign(ids, "doc_id", 4, seed = 7L)
      .select(col("doc_id"), col("shard")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(back.select(col("doc_id"), col("shard").cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet === expect)
  }

  // ---- sliding windows -------------------------------------------------

  private def tsMin(min: Long) =
    new Timestamp(1700000000000L / 3600000 * 3600000 + min * 60000)

  test("slidingWindowAggBatch: each event lands in exactly len/slide windows") {
    val ev = wh.loadTable("events")
    val n = ev.count()
    val agg = Events.slidingWindowAggBatch(ev, "1 hour", "15 minutes")
    assert(agg.agg(sum("n_events")).head().getLong(0) === 4 * n)
    // every window start is slide-aligned
    val misaligned = agg.filter(pmod(col("window_start_us"), lit(900000000L)) =!= 0)
    assert(misaligned.count() === 0)
  }

  test("slidingWindowAggBatch: hand fixture — the 4 covering windows") {
    // one event at hour-boundary + 20 min: covered by starts at -40, -25,
    // -10, +5 min relative... precisely starts floor(us/slide)*slide - j*slide
    val ev = Seq(Event(1, tsMin(20), 1, "click", 1.0)).toDF()
    val got = Events.slidingWindowAggBatch(ev, "1 hour", "15 minutes")
      .select("window_start_us").as[Long].collect().sorted
    val us = tsMin(20).getTime * 1000L
    val base = us / 900000000L * 900000000L
    assert(got === Array(base - 3 * 900000000L, base - 2 * 900000000L,
      base - 900000000L, base))
  }

  test("streaming sliding agg equals the batch re-expression once closed") {
    implicit val sqlCtx = spark.sqlContext
    val real = Seq(
      Event(1, tsMin(5), 1, "click", 1.00),
      Event(2, tsMin(10), 1, "click", 2.50),
      Event(3, tsMin(65), 2, "view", 3.00),
      Event(4, tsMin(70), 1, "click", 4.25))
    val sentinel = Event(99, tsMin(60 * 24 * 400), 99, "sentinel", 0.0)
    val mem = MemoryStream[Event]
    val q = Events.slidingWindowAggStream(mem.toDF(), watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("slide_out").outputMode("append").start()
    try {
      mem.addData(real: _*)
      q.processAllAvailable()
      mem.addData(sentinel)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("slide_out").filter($"event_type" =!= "sentinel")
      .collect().map(_.toSeq).toSet
    val expect = Events.slidingWindowAggBatch(real.toDF()).collect().map(_.toSeq).toSet
    assert(got === expect)
  }

  test("retrievalMetrics: hand-exact fixtures — hit@1, hit@3, zero hits, rank>k ignored") {
    // ilog2Fp(2)=2^20 and ilog2Fp(4)=2·2^20 exactly, so q1/q3 metrics
    // are hand-computable integers with no kernel replay
    val results = Seq(
      ("q1", "d3", 3L),           // only hit at rank 3
      ("q1", "d3", 7L),           // duplicate within k: counts once, best rank
      ("q1", "dx", 1L),           // irrelevant at rank 1
      ("q2", "dy", 1L),           // no relevant doc retrieved
      ("q3", "da", 1L),           // perfect hit at rank 1
      ("q3", "da", 11L),          // beyond k: ignored
      ("q4", "dz", 2L)            // unjudged query: no output row
    ).toDF("q", "d", "rank")
    val qrels = Seq(
      ("q1", "d3"), ("q1", "d3"), // duplicate qrel collapses
      ("q2", "dq"),
      ("q3", "da")
    ).toDF("q", "d")
    val got = Retrieval.retrievalMetrics(results, qrels, "q", "d", "rank", k = 10)
      .orderBy("q").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got === Seq(
      // q1: n_rel 1, hit@3: recall 1e6, rr 333333, dcg 5e5, ndcg 5e5
      ("q1", 1L, 1L, 1000000L, 333333L, 500000L, 500000L),
      // q2: judged, zero hits
      ("q2", 1L, 0L, 0L, 0L, 0L, 0L),
      // q3: perfect
      ("q3", 1L, 1L, 1000000L, 1000000L, 1000000L, 1000000L)))
  }

  test("retrievalMetrics: multi-hit nDCG and min(n_rel,k) ideal replay the kernel") {
    import graft.functions.Kernels
    def term(rank: Long): Long = 1048576000000L / Kernels.ilog2Fp(rank + 1L)
    val results = Seq(
      ("q", "a", 1L), ("q", "b", 2L), ("q", "c", 5L), ("q", "x", 3L))
      .toDF("q", "d", "rank")
    // n_rel = 4 > hits; one relevant doc never retrieved
    val qrels = Seq(("q", "a"), ("q", "b"), ("q", "c"), ("q", "missing"))
      .toDF("q", "d")
    val row = Retrieval.retrievalMetrics(results, qrels, "q", "d", "rank", k = 3)
      .collect().head
    val dcg = term(1) + term(2)            // c@5 is beyond k=3
    val idcg = term(1) + term(2) + term(3) // m = min(4, 3) = 3
    assert(row.getLong(1) === 4L)          // n_rel
    assert(row.getLong(2) === 2L)          // hits_k
    assert(row.getLong(3) === 2L * 1000000L / 4L)
    assert(row.getLong(4) === 1000000L)    // best rank 1
    assert(row.getLong(5) === dcg)
    assert(row.getLong(6) === dcg * 1000000L / idcg)
    intercept[IllegalArgumentException] {
      Retrieval.retrievalMetrics(results, qrels, "q", "d", "rank", k = 0)
    }
  }

  test("phraseSearch: positional intersection, overlaps, repeated words") {
    val docs = Seq(
      (1L, Some("the slow scan hit the slow scan again")), // 2 matches
      (2L, Some("slow and scan but never adjacent")),      // terms, no phrase
      (3L, Some("scan slow")),                             // wrong order
      (4L, Some("slow scan")),                             // exact at pos 1
      (5L, Some("  slow   scan  ")),                       // empty tokens skip
      (6L, None), (7L, Some("nothing here")))
      .toDF("doc_id", "text")
    val got = Retrieval.phraseSearch(docs, "doc_id", "text", "slow scan")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.keySet === Set(1L, 4L, 5L))
    assert(got(1L) === ((2L, 2L)), "both occurrences count; first at pos 2")
    assert(got(4L) === ((1L, 1L)))
    assert(got(5L) === ((1L, 1L)), "positions number non-empty tokens")
    // overlapping matches of a repeated-word phrase: 'a a' in 'a a a'
    val rep = Retrieval.phraseSearch(
        Seq((1L, "a a a")).toDF("doc_id", "text"), "doc_id", "text", "a a")
      .collect().head
    assert((rep.getLong(1), rep.getLong(2)) === ((2L, 1L)),
      "anchors 1 and 2 both match — repeated slots fill independently")
    // a 3-token phrase with a repeated word
    val tri = Retrieval.phraseSearch(
        Seq((1L, "x a b a y a b a")).toDF("doc_id", "text"),
        "doc_id", "text", "a b a")
      .collect().head
    assert((tri.getLong(1), tri.getLong(2)) === ((2L, 2L)))
  }
}
