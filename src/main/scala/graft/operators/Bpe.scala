package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.BpeModel

/** Byte-pair-encoding training (Sennrich et al., ACL 2016) for the
  * trained-tokenizer token budget estimate (SURVEY §2.3 row 47 extension).
  *
  * The model trains driver-side on a bounded, seeded corpus sample — the
  * same train-on-sample recipe as IVF centroids
  * ([[Similarity.trainCentroidsKMeans]]): the merge table is the (small)
  * model; applying it to the full corpus stays distributed via the
  * codegen'd [[graft.functions.Kernels.bpeTokenCount]] kernel.
  * Deterministic in (data, seed): ties in pair frequency break on the
  * smaller pair key.
  */
object Bpe {

  def train(df: DataFrame, textCol: String, numMerges: Int = 500,
      sampleSize: Int = 500, seed: Long = 42L): BpeModel = {
    val texts = df
      .filter(col(textCol).isNotNull)
      .withColumn("__h", xxhash64(col(textCol), lit(seed)))
      .orderBy("__h").limit(sampleSize)
      .select(textCol).collect().map(_.getString(0))
    trainOnTexts(texts.toSeq, numMerges)
  }

  /** Train on literal texts (exposed for specs and local tooling). */
  def trainOnTexts(texts: Seq[String], numMerges: Int): BpeModel = {
    // word frequencies — BPE statistics are over distinct words weighted
    // by count, so repeated words cost one symbol array, not many
    val wordFreq = mutable.HashMap.empty[String, Long]
    texts.foreach(_.split("\\s+").foreach { w =>
      if (w.nonEmpty) wordFreq(w) = wordFreq.getOrElse(w, 0L) + 1L
    })
    var words: Array[(Array[Int], Long)] = wordFreq.toArray
      .sortBy(_._1) // deterministic iteration order
      .map { case (w, f) => (w.toCharArray.map(_.toInt), f) }
    val merges = mutable.ArrayBuffer.empty[Long]
    var rank = 0
    var done = false
    while (rank < numMerges && !done) {
      val freq = mutable.HashMap.empty[Long, Long]
      words.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val key = (syms(i).toLong << 32) | (syms(i + 1) & 0xffffffffL)
          freq(key) = freq.getOrElse(key, 0L) + f
          i += 1
        }
      }
      if (freq.isEmpty) done = true
      else {
        // most frequent pair; ties break on the smaller key (deterministic)
        val (bestKey, bestF) = freq.foldLeft((0L, -1L)) {
          case ((bk, bf), (k, f)) =>
            if (f > bf || (f == bf && k < bk)) (k, f) else (bk, bf)
        }
        if (bestF < 2) done = true // nothing left worth merging
        else {
          merges += bestKey
          val a = (bestKey >>> 32).toInt
          val b = bestKey.toInt
          val newSym = 0x110000 + rank
          words = words.map { case (syms, f) =>
            var i = 0
            var out = 0
            val res = new Array[Int](syms.length)
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
                res(out) = newSym; i += 2
              } else {
                res(out) = syms(i); i += 1
              }
              out += 1
            }
            (java.util.Arrays.copyOf(res, out), f)
          }
          rank += 1
        }
      }
    }
    val keys = merges.toArray
    val order = keys.indices.sortBy(keys(_))
    new BpeModel(order.map(keys(_)).toArray, order.toArray)
  }
}
