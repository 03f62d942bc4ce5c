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
