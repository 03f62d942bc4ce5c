package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Per-row compute kernels, written as static methods so the thin
  * Catalyst Expression wrappers can emit a single static call from
  * `doGenCode` and stay inside whole-stage codegen.
  *
  * All hashing is self-contained (FNV-1a base hash + splitmix64
  * finalizer + affine 64-bit permutations) so results are deterministic
  * across JVMs and partitions.
  */
object Kernels {

  /** FNV-1a 64-bit over UTF-8 bytes, strengthened with splitmix64. */
  def hash64(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    splitmix64(h)
  }

  def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** MinHash signature: for each of `numPerms` affine permutations
    * (a*h+b with odd a), the minimum over all token hashes.
    * Empty input → Long.MaxValue per slot (never matches a non-empty sig).
    */
  def minhash(tokens: ArrayData, numPerms: Int, seed: Long): ArrayData = {
    val n = tokens.numElements()
    val base = new Array[Long](n)
    var i = 0
    while (i < n) {
      base(i) = if (tokens.isNullAt(i)) 0L else hash64(tokens.getUTF8String(i))
      i += 1
    }
    val sig = new Array[Long](numPerms)
    var p = 0
    while (p < numPerms) {
      val a = splitmix64(seed + 2L * p) | 1L
      val b = splitmix64(seed + 2L * p + 1L)
      var m = Long.MaxValue
      i = 0
      while (i < n) {
        val v = a * base(i) + b
        if (v < m) m = v
        i += 1
      }
      sig(p) = m
      p += 1
    }
    new GenericArrayData(sig)
  }

  /** 64-bit SimHash over token hashes (unweighted). Empty input → 0. */
  def simhash64(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = hash64(tokens.getUTF8String(i))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Cosine similarity between two float vectors (double accumulation,
    * sequential order — deterministic). Zero-norm or length-mismatch → 0.
    */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    if (n != b.numElements() || n == 0) return 0.0
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Long, Int, Int), Array[Array[Double]]]()

  /** Deterministic pseudo-random Gaussian hyperplanes (seed, numBits, dim). */
  def hyperplanes(seed: Long, numBits: Int, dim: Int): Array[Array[Double]] =
    planeCache.computeIfAbsent((seed, numBits, dim), { key =>
      val (s, nb, d) = key
      Array.tabulate(nb) { i =>
        val rnd = new java.util.Random(splitmix64(s + i))
        Array.fill(d)(rnd.nextGaussian())
      }
    })

  /** Random-hyperplane LSH: sign bit of <vec, r_i> for i < numBits.
    * Similar (cosine) vectors collide with prob 1 - theta/pi per bit.
    */
  def hyperplaneBits(vec: ArrayData, numBits: Int, seed: Long): Long = {
    val dim = vec.numElements()
    if (dim == 0) return 0L
    val planes = hyperplanes(seed, numBits, dim)
    var out = 0L
    var i = 0
    while (i < numBits) {
      val p = planes(i)
      var dot = 0.0
      var j = 0
      while (j < dim) {
        dot += vec.getFloat(j).toDouble * p(j)
        j += 1
      }
      if (dot >= 0) out |= (1L << i)
      i += 1
    }
    out
  }

  /** One bucket id per LSH table, all computed in a single pass over the
    * vector (one expression → one scan, instead of numTables plan branches
    * re-reading the source). Table t uses an independent plane set derived
    * from seed + t.
    */
  def hyperplaneMulti(vec: ArrayData, numBits: Int, numTables: Int, seed: Long): ArrayData = {
    val out = new Array[Long](numTables)
    var t = 0
    while (t < numTables) {
      out(t) = hyperplaneBits(vec, numBits, splitmix64(seed + t))
      t += 1
    }
    new GenericArrayData(out)
  }

  /** Winnowing document fingerprint (Schleimer et al., SIGMOD 2003):
    * rolling hash over char k-grams, minimum per window of w, distinct
    * selected hashes sorted ascending. Robust to local edits; the
    * standard scalable doc-fingerprint for near-dup detection.
    */
  def winnow(text: UTF8String, k: Int, w: Int): ArrayData = {
    val s = text.toString
    if (s.length < k) return new GenericArrayData(Array.empty[Long])
    val nGrams = s.length - k + 1
    val hashes = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      var h = 0xcbf29ce484222325L
      var j = 0
      while (j < k) {
        h ^= s.charAt(i + j).toLong
        h *= 0x100000001b3L
        j += 1
      }
      hashes(i) = splitmix64(h)
      i += 1
    }
    val selected = new java.util.TreeSet[java.lang.Long]()
    val win = math.min(w, nGrams)
    i = 0
    while (i + win <= nGrams) {
      var m = Long.MaxValue
      var j = i
      while (j < i + win) {
        if (hashes(j) < m) m = hashes(j)
        j += 1
      }
      selected.add(m)
      i += 1
    }
    val out = new Array[Long](selected.size())
    val it = selected.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }
}
