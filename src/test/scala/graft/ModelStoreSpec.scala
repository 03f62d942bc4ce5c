package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, ModelStore, Similarity, TextAnalysis}

/** Model persistence: every trained model must round-trip its warehouse
  * table BIT-identically, and scoring with a reloaded model must equal
  * scoring with the freshly trained one (train→score == store→load→score).
  */
class ModelStoreSpec extends AnyFunSuite with SparkTestBase {

  private lazy val outDir = Files.createTempDirectory("graft-models").toString
  private lazy val mw = Warehouse(spark, outDir)
  private lazy val emb = wh.loadTable("embeddings")

  test("PQ codebook round-trips bit-identically") {
    val pq = Similarity.trainPq(emb, "vec_id", "embedding", m = 16, ksub = 32)
    ModelStore.savePqModel(wh, outDir, "pq_m", pq)
    val pq2 = ModelStore.loadPqModel(mw, "pq_m")
    assert((pq2.m, pq2.dsub, pq2.ksub) === ((pq.m, pq.dsub, pq.ksub)))
    assert(java.util.Arrays.equals(pq2.flat, pq.flat))
  }

  test("centroids round-trip bit-identically and reloaded IVF scores match") {
    val cells = Similarity.trainCentroidsKMeans(emb, "vec_id", "embedding", numCells = 8)
    ModelStore.saveCentroids(wh, outDir, "cells_m", cells)
    val cells2 = ModelStore.loadCentroids(mw, "cells_m")
    assert(cells2.toSeq === cells.toSeq)
    val queries = emb.filter(col("vec_id") < 4)
    def run(c: Array[Seq[Float]]) =
      Similarity.ivfTopK(emb, "vec_id", "embedding", queries, "vec_id", "embedding",
          k = 3, numCells = 8, numProbe = 3, trainedCentroids = Some(c))
        .collect().map(_.toSeq).toSet
    assert(run(cells2) === run(cells))
  }

  test("reloaded IVF-PQ composition scores identically to the trained one") {
    val pq = Similarity.trainPq(emb, "vec_id", "embedding", m = 16, ksub = 32)
    val cells = Similarity.trainCentroidsKMeans(emb, "vec_id", "embedding", numCells = 8)
    ModelStore.savePqModel(wh, outDir, "pq_c", pq)
    ModelStore.saveCentroids(wh, outDir, "cells_c", cells)
    val queries = emb.filter(col("vec_id") < 4)
    def run(p: graft.functions.PqModel, c: Array[Seq[Float]]) =
      Similarity.ivfPqTopK(emb, "vec_id", "embedding", queries, "vec_id", "embedding",
          k = 3, p, numCells = 8, numProbe = 3, trainedCentroids = Some(c))
        .collect().map(_.toSeq).toSet
    assert(run(ModelStore.loadPqModel(mw, "pq_c"), ModelStore.loadCentroids(mw, "cells_c"))
      === run(pq, cells))
  }

  test("semantic dedup over persisted cells equals in-session training") {
    val trained = Similarity.trainCentroidsKMeans(emb, "vec_id", "embedding", numCells = 8)
    ModelStore.saveCentroids(wh, outDir, "sem_cells", trained)
    def pairs(c: Option[Array[Seq[Float]]]) =
      Dedup.semanticNearDup(emb, "vec_id", "embedding", threshold = 0.5,
          numCells = 8, trainedCentroids = c)
        .collect().map(_.toSeq).toSet
    assert(pairs(Some(ModelStore.loadCentroids(mw, "sem_cells"))) === pairs(None))
  }

  test("quality classifier round-trips bit-identically and scores match") {
    val docs = wh.loadTable("documents").limit(200)
      .withColumn("label", length(col("text")) > 200)
    val model = TextAnalysis.trainQualityClassifier(docs, "text", "label")
    ModelStore.saveQualityModel(wh, outDir, "quality_m", model)
    val model2 = ModelStore.loadQualityModel(mw, "quality_m")
    assert(model2.numBuckets === model.numBuckets)
    assert(model2.scale === model.scale)
    assert(java.util.Arrays.equals(model2.weights, model.weights))
    def score(m: graft.functions.QualityLrModel) =
      TextAnalysis.qualityClassify(docs, "text", m)
        .collect().map(_.toSeq).toSet
    assert(score(model2) === score(model))
  }

  test("BPE, bigram-LM, DF, and gram-set models round-trip bit-identically") {
    val docs = wh.loadTable("documents").limit(200)
    val bpe = graft.operators.Bpe.train(docs, "text", numMerges = 100)
    ModelStore.saveBpeModel(wh, outDir, "bpe_m", bpe)
    val bpe2 = ModelStore.loadBpeModel(mw, "bpe_m")
    assert(java.util.Arrays.equals(bpe2.sortedKeys, bpe.sortedKeys))
    assert(java.util.Arrays.equals(bpe2.rankAt, bpe.rankAt))

    val lm = TextAnalysis.trainLmModel(docs, "text")
    ModelStore.saveLmModel(wh, outDir, "lm_m", lm)
    val lm2 = ModelStore.loadLmModel(mw, "lm_m")
    assert(lm2.sortedWords.toSeq === lm.sortedWords.toSeq)
    assert(java.util.Arrays.equals(lm2.wordCount, lm.wordCount))
    assert(java.util.Arrays.equals(lm2.bigramKeys, lm.bigramKeys))
    assert(java.util.Arrays.equals(lm2.bigramCount, lm.bigramCount))
    // scoring under the reloaded model is scoring under the model
    def flu(m: graft.functions.LmModel) =
      TextAnalysis.lmFluency(docs, "text", m).collect().map(_.toSeq).toSet
    assert(flu(lm2) === flu(lm))

    val dfm = TextAnalysis.trainDfModel(docs, "text")
    ModelStore.saveDfModel(wh, outDir, "df_m", dfm)
    val dfm2 = ModelStore.loadDfModel(mw, "df_m")
    assert(dfm2.sortedWords.toSeq === dfm.sortedWords.toSeq)
    assert(java.util.Arrays.equals(dfm2.dfAt, dfm.dfAt))
    assert(dfm2.nDocs === dfm.nDocs)

    val gs = graft.operators.Dedup.trainDecontaminationSet(
      docs.filter(col("doc_id") % 20 === 0), "text", n = 3)
    ModelStore.saveGramSetModel(wh, outDir, "gs_m", gs)
    val gs2 = ModelStore.loadGramSetModel(mw, "gs_m")
    assert(java.util.Arrays.equals(gs2.sorted, gs.sorted))
    assert((gs2.n, gs2.char) === ((gs.n, gs.char)))
    def decon(m: graft.functions.GramSetModel) =
      graft.operators.Dedup.decontaminateMapSide(
        docs.filter(col("doc_id") % 20 =!= 0), "text", m)
        .select("doc_id", "contaminated").collect().map(_.toSeq).toSet
    assert(decon(gs2) === decon(gs))
  }

  test("DSIR model round-trips bit-identically and scores match") {
    val docs = wh.loadTable("documents").limit(300)
    val m = TextAnalysis.trainDsir(
      docs.filter(col("lang") === "en"), docs, "text")
    ModelStore.saveDsirModel(wh, outDir, "dsir_m", m)
    val m2 = ModelStore.loadDsirModel(mw, "dsir_m")
    assert(java.util.Arrays.equals(m2.weights, m.weights))
    assert((m2.numBuckets, m2.perGram) === ((m.numBuckets, m.perGram)))
    def score(mm: graft.functions.DsirModel) =
      TextAnalysis.dsirScore(docs, "text", mm)
        .select("doc_id", "n_grams", "dsir_score")
        .collect().map(_.toSeq).toSet
    assert(score(m2) === score(m))
  }

  test("loadPqModel rejects a ragged or truncated model table") {
    val spark2 = spark
    import spark2.implicits._
    wh.saveTable(Seq((0, 0, Seq(1.0f, 2.0f)), (0, 2, Seq(3.0f, 4.0f)))
      .toDF("subspace", "code", "sub_centroid"), outDir, "pq_bad")
    assertThrows[IllegalArgumentException] {
      ModelStore.loadPqModel(mw, "pq_bad")
    }
  }
}
