package graft

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Kernels, LangIdHits, LangLookup}
import graft.operators.{Bpe, Relational}

/** Property-based checks over the pure kernels — randomized inputs pin
  * the invariants the example-based specs only sample.
  */
class KernelPropertiesSpec extends AnyFunSuite {

  private def check(prop: Prop, tests: Int = 200): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(tests)
        .withInitialSeed(org.scalacheck.rng.Seed(42L)), prop)
    assert(res.passed, res.status.toString)
  }

  test("cents arithmetic is exact for every 2-decimal money value") {
    // the invariant behind every *_cents oracle column: a clean 2-decimal
    // double times 100 rounds back to the exact integer
    check(Prop.forAll(Gen.chooseNum(0L, 1000000000L)) { c =>
      Math.round(c / 100.0 * 100) == c
    })
  }

  test("TableName parse/print roundtrip with arbitrary padding") {
    val part = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
    val pad = Gen.listOf(Gen.const(' ')).map(_.mkString)
    check(Prop.forAll(part, part, part, pad, pad) { (a, b, c, p1, p2) =>
      TableName.parse(s"$p1$a$p2.$p1$b$p2.$p1$c$p2").toString == s"$a.$b.$c"
    })
  }

  test("presort parser emits one sort column per term, any case/padding") {
    val name = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
    val dir = Gen.oneOf("", " asc", " desc", " ASC", " DESC")
    check(Prop.forAll(Gen.nonEmptyListOf(Gen.zip(name, dir))) { terms =>
      val s = terms.map { case (n, d) => s" $n$d " }.mkString(",")
      Relational.parsePresort(s).size == terms.size
    })
  }

  test("BPE counts: empty model counts chars; training never inflates") {
    val word = Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar)).map(_.mkString)
    val text = Gen.choose(1, 30).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    val empty = Bpe.trainOnTexts(Seq("a"), numMerges = 0)
    check(Prop.forAll(text) { t =>
      val chars = t.count(_ != ' ')
      val words = t.split(" ").count(_.nonEmpty)
      val untrained = Kernels.bpeTokenCount(UTF8String.fromString(t), empty)
      val trained = Kernels.bpeTokenCount(UTF8String.fromString(t),
        Bpe.trainOnTexts(Seq(t, t), numMerges = 40))
      untrained == chars && trained <= chars && trained >= words
    }, tests = 60)
  }

  test("langid kernel equals ASCII-boundary regex counts on random text") {
    val lookup = LangIdHits.defaultLangs
    val patterns = lookup.map(ws =>
      java.util.regex.Pattern.compile(
        "(?<![a-z0-9_])(" + ws.mkString("|") + ")(?![a-z0-9_])"))
    val frag = Gen.oneOf(
      Gen.oneOf(lookup.flatten), // real stopwords
      Gen.nonEmptyListOf(Gen.alphaChar).map(_.mkString),
      Gen.oneOf("的", "中文", "_", "a1", ".", ",", "\n", "\t", "  "))
    val text = Gen.listOf(frag).map(_.mkString(" "))
    val ll = LangLookup.build(lookup)
    check(Prop.forAll(text) { t =>
      val hits = Kernels.langIdHits(UTF8String.fromString(t), ll).toIntArray()
      val lower = t.toLowerCase(java.util.Locale.ROOT)
      val expected = patterns.map { p =>
        val m = p.matcher(lower); var n = 0; while (m.find()) n += 1; n
      }
      val cjk = t.count(c => c >= 0x4E00 && c <= 0x9FFF)
      hits.toSeq == (expected :+ cjk)
    })
  }

  test("normalizeText is idempotent, trimmed, and single-spaced") {
    val c = Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(' ', '\t', '\n', 'É', 'ß', '中'))
    val text = Gen.listOf(c).map(_.mkString)
    check(Prop.forAll(text) { t =>
      val once = Kernels.normalizeText(UTF8String.fromString(t)).toString
      val twice = Kernels.normalizeText(UTF8String.fromString(once)).toString
      once == twice && !once.contains("  ") && once.trim == once
    })
  }

  test("winnowing guarantee: a shared substring of >= k+w-1 chars shares a fingerprint") {
    val k = 8; val w = 4
    val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
    val shared = Gen.choose(k + w - 1, 40)
      .flatMap(n => Gen.listOfN(n, Gen.alphaLowerChar)).map(_.mkString)
    check(Prop.forAll(shared, word, word) { (mid, pre, post) =>
      def fp(s: String) =
        Kernels.winnow(UTF8String.fromString(s), k, w).toLongArray().toSet
      fp(s"$pre$mid").intersect(fp(s"$mid$post")).nonEmpty
    })
  }
}
