package graft.tools

import graft.{GraftSession, Warehouse}

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}
import graft.functions.GraftFunctions

/** Throwaway measurement main for recall-contract margin selection. */
object Probe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val s = GraftSession.getOrCreate()
    GraftFunctions.ensure(s)
    val w = Warehouse(s, dir)
    val docs = w.loadTable("documents")
    val emb = w.loadTable("embeddings")

    // round-9 adaptive-probe margin sweep: `Probe <dir> r9` — on the
    // q_ivf/q_ivfpq recall-contract setup (planted 2-clone corpus,
    // default-seed uniform centroids, 16 cells, probe ceiling 6), for
    // each candidate probeMargin report (a) clone-cell misses and (b)
    // mean probed cells per query. Replicates selectCentroids' seeding
    // and assignCells' argmax/desc-sort driver-side (8 queries × 16
    // cells — trivial), so the sweep is exact.
    if (args.length > 1 && args(1) == "r9") {
      def clone2(j: Int) = emb.filter(col("vec_id") < 8)
        .select((lit(1000000L + j) + col("vec_id") * 2).as("vec_id"),
          expr(s"transform(embedding, (x, i) -> IF(i = vec_id * 2 + $j, CAST(0 AS FLOAT), x))")
            .as("embedding"))
      val aug = emb.select("vec_id", "embedding")
        .unionByName(clone2(0)).unionByName(clone2(1))
      val cents: Array[Array[Float]] = aug
        .withColumn("__h", xxhash64(col("vec_id"), lit(42L)))
        .orderBy("__h").limit(16)
        .select("embedding").collect().map(_.getSeq[Float](0).toArray)
      def cos(a: Array[Float], b: Array[Float]): Double = {
        var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
        if (na == 0 || nb == 0) 0.0 else dot / math.sqrt(na * nb)
      }
      val queries = emb.filter(col("vec_id") < 8)
        .select("vec_id", "embedding").collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      val clones = aug.filter(col("vec_id") >= 1000000L)
        .select("vec_id", "embedding").collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
      // clone → its single assigned cell (argmax, ties → largest cell id)
      def bestCell(v: Array[Float]): Int =
        cents.indices.maxBy(i => (cos(v, cents(i)), i))
      val cloneCell = clones.map { case (id, v) => id -> bestCell(v) }.toMap
      println("== r9 adaptive-probe sweep (16 cells, ceiling 6)")
      for (margin <- Seq(0.02, 0.05, 0.08, 0.12, 0.2, 0.3, Double.NaN)) {
        var probedTotal = 0; var misses = 0
        queries.foreach { case (qid, qv) =>
          val sims = cents.indices.map(i => (cos(qv, cents(i)), i))
            .sortBy(t => (-t._1, -t._2)).take(6)
          val best = sims.head._1
          val probed =
            if (margin.isNaN) sims else sims.filter(_._1 >= best - margin)
          probedTotal += probed.length
          val probedSet = probed.map(_._2).toSet
          Seq(0, 1).foreach { j =>
            val cid = 1000000L + j + qid * 2
            if (!probedSet.contains(cloneCell(cid))) misses += 1
          }
        }
        val label = if (margin.isNaN) "fixed-6" else f"margin=$margin%.2f"
        println(f"   $label: meanProbed=${probedTotal / 8.0}%.2f cloneMisses=$misses")
      }
      // needed margin per clone: best query sim minus sim to clone's cell
      val needed = queries.flatMap { case (qid, qv) =>
        val simByCell = cents.indices.map(i => cos(qv, cents(i)))
        val best = simByCell.max
        Seq(0, 1).map { j => best - simByCell(cloneCell(1000000L + j + qid * 2)) }
      }
      println(f"   needed margin: max=${needed.max}%.4f  p50=${needed.sorted.apply(needed.length / 2)}%.4f")
      return
    }

    // round-9b shortlist-margin sweep: `Probe <dir> r9b` — on the
    // headline IVF-PQ rerank config (m=16 ksub=32, 16 cells / probe
    // ceiling 6 @ margin 0.1, shortlist 50, k=5), for each candidate
    // shortlistMargin report result parity vs the unpruned rerank and
    // the mean surviving shortlist size, plus the measured NEEDED
    // margin: max over final top-5 neighbors of (adc@5 − adc(neighbor)).
    if (args.length > 1 && args(1) == "r9b") {
      val queries = emb.filter(col("vec_id") < 8)
      val model = Similarity.trainPq(emb, "vec_id", "embedding", m = 16, ksub = 32)
      def run(margin: Double) = Similarity.ivfPqTopK(
          emb, "vec_id", "embedding", queries, "vec_id", "embedding",
          k = 5, model, numCells = 16, numProbe = 6, rerankShortlistK = 50,
          probeMargin = 0.1, shortlistMargin = margin)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val full = run(Double.NaN)
      // needed margin, from the pure-ADC ranking of the same index
      val adc = Similarity.ivfPqTopK(
          emb, "vec_id", "embedding", queries, "vec_id", "embedding",
          k = 50, model, numCells = 16, numProbe = 6, probeMargin = 0.1)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      val adcByQn = adc.map(r => (r._1, r._3) -> r._4).toMap
      val adcAt5 = adc.filter(_._2 == 5L).map(r => r._1 -> r._4).toMap
      val needed = full.toSeq.flatMap { case (qid, _, nid) =>
        for (a5 <- adcAt5.get(qid); an <- adcByQn.get((qid, nid)))
          yield math.max(0.0, a5 - an)
      }
      println(f"== r9b needed shortlistMargin: max=${needed.max}%.4f p50=${needed.sorted.apply(needed.length / 2)}%.4f")
      for (m <- Seq(0.01, 0.02, 0.05, 0.1, 0.2)) {
        val kept = adc.count { case (qid, _, nid, sc) =>
          adcAt5.get(qid).forall(a5 => sc >= a5 - m) }
        println(f"   margin=$m%.2f: parity=${run(m) == full} meanShortlist=${kept / 8.0}%.1f (of 50)")
      }
      return
    }

    // round-8 margin measurements only: `Probe <dir> r8`
    if (args.length > 1 && args(1) == "r8") {
      // A. weighted-simhash hamming vs exact WEIGHTED jaccard >= 0.7
      val jtrim = regexp_replace(col("text"), "^[\\x00-\\x20]+|[\\x00-\\x20]+$", "")
      val wsigs = docs.select(col("doc_id").as("id"), col("text"))
        .filter(size(split(jtrim, " ", -1)) >= 3)
        .select(col("id"), GraftFunctions.simhashTf(col("text"), 3).as("sig"))
      val wexact = Dedup.ngramJaccard(docs, "doc_id", "text",
        n = 3, threshold = 0.7, shingler = "word_tf")
      val wj = wexact
        .join(wsigs.select(col("id").as("id_a"), col("sig").as("sa")), "id_a")
        .join(wsigs.select(col("id").as("id_b"), col("sig").as("sb")), "id_b")
        .withColumn("hamming", expr("bit_count(sa ^ sb)"))
        .select("id_a", "id_b", "jaccard", "hamming").collect()
      println(s"== wsimhash vs wjaccard: n=${wj.length}")
      for (t <- Seq(0.7, 0.8, 0.9)) {
        val sub = wj.filter(_.getDouble(2) >= t)
        if (sub.nonEmpty)
          println(f"   wj>=$t%.1f: n=${sub.length} maxHamming=${sub.map(_.getInt(3)).max}")
        else println(f"   wj>=$t%.1f: n=0")
      }
      // B. semantic near-dup recall over the planted-clone corpus
      val cloneS = emb.filter(col("vec_id") < 16)
        .select((lit(2000000L) + col("vec_id")).as("vec_id"),
          expr("transform(embedding, (x, i) -> IF(i = vec_id % 64, CAST(0 AS FLOAT), x))").as("embedding"))
      val augS = emb.select("vec_id", "embedding").unionByName(cloneS)
      val exactS = augS.select(col("vec_id").as("id_a"), col("embedding").as("va"))
        .crossJoin(broadcast(cloneS.select(col("vec_id").as("id_b"), col("embedding").as("vb"))))
        .filter(col("id_a") < col("id_b"))
        .withColumn("cosine", GraftFunctions.cosineSim(col("va"), col("vb")))
        .filter(col("cosine") >= 0.7)
        .select("id_a", "id_b").cache()
      println(s"== planted exact cosine>=0.7 pairs: ${exactS.count()}")
      for (cells <- Seq(8, 16, 32)) {
        val found = Dedup.semanticNearDup(augS, "vec_id", "embedding",
            threshold = 0.5, numCells = cells)
          .select("id_a", "id_b")
        val miss = exactS.join(found, Seq("id_a", "id_b"), "left_anti").count()
        println(s"== PLANTED semanticNearDup cells=$cells: misses=$miss")
      }
      s.stop()
      return
    }

    // 1. hamming distance of exact high-jaccard pairs under simhash sigs
    for (weighted <- Seq(false, true)) {
      val sigs =
        if (weighted) {
          val jtrim = regexp_replace(col("text"), "^[\\x00-\\x20]+|[\\x00-\\x20]+$", "")
          docs.select(col("doc_id").as("id"),
            GraftFunctions.simhashTf(col("text"), 3).as("sig"))
            .filter(size(split(jtrim, " ", -1)) >= 3)
        } else
          docs.select(col("doc_id").as("id"),
              Dedup.shingleHashes(col("text"), 3, "word").as("g"))
            .filter(size(col("g")) > 0)
            .select(col("id"), GraftFunctions.simhash64(col("g")).as("sig"))
      val exact = Dedup.ngramJaccard(docs, "doc_id", "text", n = 3, threshold = 0.7)
      val joined = exact
        .join(sigs.select(col("id").as("id_a"), col("sig").as("sa")), "id_a")
        .join(sigs.select(col("id").as("id_b"), col("sig").as("sb")), "id_b")
        .withColumn("hamming", expr("bit_count(sa ^ sb)"))
        .select("id_a", "id_b", "jaccard", "hamming")
        .collect()
      println(s"== simhash weighted=$weighted: ${joined.length} jaccard>=0.7 pairs")
      for (t <- Seq(0.7, 0.8, 0.9)) {
        val sub = joined.filter(_.getDouble(2) >= t)
        if (sub.nonEmpty)
          println(f"   j>=$t%.1f: n=${sub.length} maxHamming=${sub.map(_.getInt(3)).max}")
        else println(f"   j>=$t%.1f: n=0")
      }
    }

    // 2. exact cosine pair counts + embeddingNearDup hit check
    val base = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
    val a = base.select(col("id").as("id_a"), col("vec").as("va"))
    val b = base.select(col("id").as("id_b"), col("vec").as("vb"))
    val allPairs = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("cosine", GraftFunctions.cosineSim(col("va"), col("vb")))
      .select("id_a", "id_b", "cosine")
      .filter(col("cosine") >= 0.5).cache()
    for (t <- Seq(0.5, 0.6, 0.7, 0.8, 0.9))
      println(s"== exact cosine>=$t pairs: ${allPairs.filter(col("cosine") >= t).count()}")
    for ((bits, tables) <- Seq((8, 16), (8, 32), (6, 32))) {
      val found = Dedup.embeddingNearDup(emb, "vec_id", "embedding",
          threshold = 0.5, numBits = bits, numTables = tables)
        .select(col("id_a"), col("id_b"), lit(true).as("hit"))
      for (t <- Seq(0.7, 0.8)) {
        val miss = allPairs.filter(col("cosine") >= t)
          .join(found, Seq("id_a", "id_b"), "left_anti").count()
        println(s"   nearDup bits=$bits tables=$tables: cosine>=$t misses=$miss")
      }
    }

    // 3. exact top-2 vs lsh/ivf top-20
    val queries = emb.filter(col("vec_id") < 8)
    val exact2 = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 2)
      .select("query_id", "neighbor_id").cache()
    for ((bits, tables) <- Seq((8, 16), (6, 24), (4, 24))) {
      val lsh = Similarity.lshTopK(emb, "vec_id", "embedding",
          queries, "vec_id", "embedding", k = 20,
          numBits = bits, numTables = tables)
        .select("query_id", "neighbor_id")
      val miss = exact2.join(lsh, Seq("query_id", "neighbor_id"), "left_anti").count()
      println(s"== lshTopK bits=$bits tables=$tables: top2-in-top20 misses=$miss")
    }
    for (probe <- Seq(4, 6, 8, 12)) {
      val ivf = Similarity.ivfTopK(emb, "vec_id", "embedding",
          queries, "vec_id", "embedding", k = 20, numCells = 16, numProbe = probe)
        .select("query_id", "neighbor_id")
      val miss = exact2.join(ivf, Seq("query_id", "neighbor_id"), "left_anti").count()
      println(s"== ivfTopK probe=$probe/16: top2-in-top20 misses=$miss")
    }
    // 4. PLANTED-clone contracts: clone zeroes one element (exact in both
    // float and double arithmetic, so DuckDB can rebuild it bit-identically)
    val cloneA = emb.filter(col("vec_id") < 8)
      .select((lit(1000000L) + col("vec_id") * 2).as("vec_id"),
        expr("transform(embedding, (x, i) -> IF(i = vec_id % 64 * 2, CAST(0 AS FLOAT), x))").as("embedding"))
    val cloneB = emb.filter(col("vec_id") < 8)
      .select((lit(1000001L) + col("vec_id") * 2).as("vec_id"),
        expr("transform(embedding, (x, i) -> IF(i = vec_id % 64 * 2 + 1, CAST(0 AS FLOAT), x))").as("embedding"))
    val aug = emb.select("vec_id", "embedding").unionByName(cloneA).unionByName(cloneB)
    val exactAug = Similarity.bruteForceTopK(aug, "vec_id", "embedding",
        queries, "vec_id", "embedding", k = 2)
      .select("query_id", "rank", "neighbor_id", "score").cache()
    println("== planted exact top-2 per query:")
    exactAug.orderBy("query_id", "rank").collect().foreach(r => println(s"   $r"))
    for ((bits, tables) <- Seq((8, 16), (8, 24))) {
      val lsh = Similarity.lshTopK(aug, "vec_id", "embedding",
          queries, "vec_id", "embedding", k = 20, numBits = bits, numTables = tables)
        .select("query_id", "neighbor_id")
      val miss = exactAug.join(lsh, Seq("query_id", "neighbor_id"), "left_anti").count()
      println(s"== PLANTED lshTopK bits=$bits tables=$tables: misses=$miss")
    }
    for (probe <- Seq(2, 4, 6)) {
      val ivf = Similarity.ivfTopK(aug, "vec_id", "embedding",
          queries, "vec_id", "embedding", k = 20, numCells = 16, numProbe = probe)
        .select("query_id", "neighbor_id")
      val miss = exactAug.join(ivf, Seq("query_id", "neighbor_id"), "left_anti").count()
      println(s"== PLANTED ivfTopK probe=$probe/16: misses=$miss")
    }
    val cents = Similarity.trainCentroidsKMeans(aug, "vec_id", "embedding", 16)
    for (probe <- Seq(2, 4)) {
      val ivf = Similarity.ivfTopK(aug, "vec_id", "embedding",
          queries, "vec_id", "embedding", k = 20, numCells = 16, numProbe = probe,
          trainedCentroids = Some(cents))
      val miss = exactAug.join(ivf.select("query_id", "neighbor_id"),
        Seq("query_id", "neighbor_id"), "left_anti").count()
      println(s"== PLANTED ivfTopK-kmeans probe=$probe/16: misses=$miss")
    }
    // 5. planted PAIR recall for embeddingNearDup: clone of each vec_id<16
    val cloneP = emb.filter(col("vec_id") < 16)
      .select((lit(2000000L) + col("vec_id")).as("vec_id"),
        expr("transform(embedding, (x, i) -> IF(i = vec_id % 64, CAST(0 AS FLOAT), x))").as("embedding"))
    val augP = emb.select("vec_id", "embedding").unionByName(cloneP)
    val ap = augP.select(col("vec_id").as("id_a"), col("embedding").as("va"))
    val bp = augP.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
    val exactP = ap.crossJoin(bp).filter(col("id_a") < col("id_b"))
      .withColumn("cosine", GraftFunctions.cosineSim(col("va"), col("vb")))
      .filter(col("cosine") >= 0.7)
      .select("id_a", "id_b", "cosine").cache()
    println(s"== planted exact cosine>=0.7 pairs: ${exactP.count()}")
    println(s"   min clone cosine: ${exactP.agg(min("cosine")).collect()(0)}")
    for ((bits, tables) <- Seq((8, 16), (8, 24))) {
      val found = Dedup.embeddingNearDup(augP, "vec_id", "embedding",
          threshold = 0.5, numBits = bits, numTables = tables)
        .select("id_a", "id_b")
      val miss = exactP.join(found, Seq("id_a", "id_b"), "left_anti").count()
      println(s"== PLANTED nearDup bits=$bits tables=$tables: misses=$miss")
    }
    s.stop()
  }
}
