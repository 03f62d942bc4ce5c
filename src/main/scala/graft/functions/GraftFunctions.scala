package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.functions.call_function

/** Registers graft's native expressions in a session's function registry
  * and exposes a typed Column API on top of `call_function` (the stable
  * public route from registered functions to Columns in Spark 4).
  *
  * Registration is idempotent and cheap; operators call `ensure(spark)`
  * before building plans.
  */
object GraftFunctions {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _)  => v
    case Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(s"$what must be an int literal, got $other")
  }

  private def longLit(e: Expression, what: String): Long = e match {
    case Literal(v: Int, _)  => v.toLong
    case Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(s"$what must be a long literal, got $other")
  }

  /** One builder list shared by session-level registration (`ensure`) and
    * the SparkSessionExtensions route ([[graft.GraftExtensions]]) — the two
    * surfaces cannot drift.
    */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_word_ngrams" ->
      ((args: Seq[Expression]) => WordNgramHashes(args.head, intLit(args(1), "n"))),
    "graft_char_ngrams" ->
      ((args: Seq[Expression]) => CharNgramHashes(args.head, intLit(args(1), "n"))),
    "graft_word_ngrams_tf" ->
      ((args: Seq[Expression]) => WordNgramHashesTf(args.head, intLit(args(1), "n"))),
    "graft_icws_minhash" ->
      ((args: Seq[Expression]) =>
        IcwsMinHashSig(args.head, intLit(args(1), "n"),
          intLit(args(2), "numPerms"), longLit(args(3), "seed"))),
    "graft_minhash" ->
      ((args: Seq[Expression]) =>
        MinHashSig(args.head, intLit(args(1), "numPerms"), longLit(args(2), "seed"))),
    "graft_simhash64" ->
      ((args: Seq[Expression]) => SimHash64(args.head)),
    "graft_simhash_tf" ->
      ((args: Seq[Expression]) => SimHashTf(args.head, intLit(args(1), "n"))),
    "graft_cosine" ->
      ((args: Seq[Expression]) => CosineSim(args.head, args(1))),
    "graft_jaro_winkler" ->
      ((args: Seq[Expression]) => JaroWinkler(args.head, args(1))),
    "graft_rake_topk" ->
      ((args: Seq[Expression]) =>
        RakeKeywords(args.head, intLit(args(1), "k"),
          LangIdHits.defaultStopwords("en"))),
    "graft_hyperplane_lsh_multi" ->
      ((args: Seq[Expression]) =>
        HyperplaneLshMulti(args.head, intLit(args(1), "numBits"),
          intLit(args(2), "numTables"), longLit(args(3), "seed"))),
    "graft_langid_hits" ->
      ((args: Seq[Expression]) => LangIdHits(args.head, LangIdHits.defaultLangs)),
    "graft_quality_counts" ->
      ((args: Seq[Expression]) =>
        QualityCounts(args.head, LangIdHits.defaultStopwords("en"))),
    "graft_normalize" ->
      ((args: Seq[Expression]) => NormalizeText(args.head)),
    "graft_soundex" ->
      ((args: Seq[Expression]) => SoundexCode(args.head)),
    "graft_repetition_stats" ->
      ((args: Seq[Expression]) => RepetitionStats(args.head, intLit(args(1), "n"))),
    "graft_winnow" ->
      ((args: Seq[Expression]) =>
        WinnowFingerprint(args.head, intLit(args(1), "k"), intLit(args(2), "w"))),
    "graft_winnow_pos" ->
      ((args: Seq[Expression]) =>
        WinnowPositions(args.head, intLit(args(1), "k"), intLit(args(2), "w"))),
    "graft_extend_match" ->
      ((args: Seq[Expression]) =>
        ExtendMatch(args.head, args(1), args(2), args(3), intLit(args(4), "k"))),
    "graft_pq_adc_score" ->
      ((args: Seq[Expression]) => PqAdcScore(args.head, args(1))),
    "graft_topk" ->
      ((args: Seq[Expression]) =>
        TopKAgg(args.head, args(1), intLit(args(2), "k")).toAggregateExpression()),
    "graft_heavy_hitters" ->
      ((args: Seq[Expression]) =>
        MisraGriesAgg(args.head, intLit(args(1), "k")).toAggregateExpression())
  )

  def ensure(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (name, builder) =>
      reg.createOrReplaceTempFunction(name, builder, "scala_udf")
    }
  }

  // Column API ------------------------------------------------------------

  import org.apache.spark.sql.functions.lit

  def wordNgrams(text: Column, n: Int): Column =
    call_function("graft_word_ngrams", text, lit(n))

  def charNgrams(text: Column, n: Int): Column =
    call_function("graft_char_ngrams", text, lit(n))

  def minhash(tokens: Column, numPerms: Int, seed: Long): Column =
    call_function("graft_minhash", tokens, lit(numPerms), lit(seed))

  /** Occurrence-indexed gram hashes: set ops on these = TF-weighted ops. */
  def wordNgramsTf(text: Column, n: Int): Column =
    call_function("graft_word_ngrams_tf", text, lit(n))

  /** ICWS weighted-MinHash signature of raw text (Ioffe, ICDM 2010). */
  def icwsMinhash(text: Column, n: Int, numPerms: Int, seed: Long): Column =
    call_function("graft_icws_minhash", text, lit(n), lit(numPerms), lit(seed))

  def simhash64(tokens: Column): Column =
    call_function("graft_simhash64", tokens)

  /** TF-weighted simhash of raw text (word n-grams, occurrences vote). */
  def simhashTf(text: Column, n: Int): Column =
    call_function("graft_simhash_tf", text, lit(n))

  def cosineSim(a: Column, b: Column): Column =
    call_function("graft_cosine", a, b)

  /** Jaro-Winkler similarity, byte-exact with DuckDB's builtin. */
  def jaroWinkler(a: Column, b: Column): Column =
    call_function("graft_jaro_winkler", a, b)

  /** RAKE top-k keyword phrases (en stopwords), sorted. */
  def rakeTopK(text: Column, k: Int): Column =
    call_function("graft_rake_topk", text, lit(k))

  def hyperplaneLshMulti(vec: Column, numBits: Int, numTables: Int, seed: Long): Column =
    call_function("graft_hyperplane_lsh_multi", vec, lit(numBits), lit(numTables), lit(seed))

  /** [h_en, h_de, h_fr, h_es, h_zh] stopword/CJK hit counts, one scan. */
  def langIdHits(text: Column): Column =
    call_function("graft_langid_hits", text)

  /** [n_chars, n_tokens, stop_hits, punct_hits], one scan. */
  def qualityCounts(text: Column): Column =
    call_function("graft_quality_counts", text)

  /** NFC + lowercase + whitespace-collapse canonical text, one scan. */
  def normalizeText(text: Column): Column =
    call_function("graft_normalize", text)

  /** American Soundex phonetic code; NULL when no ASCII letters. */
  def soundex(text: Column): Column =
    org.apache.spark.sql.functions.nullif(
      call_function("graft_soundex", text), lit(""))

  /** struct(n_words, n_distinct_words, n_grams, n_distinct_grams,
    * top_word, top_word_cnt, top_ngram, top_ngram_cnt), one scan.
    */
  def repetitionStats(text: Column, n: Int): Column =
    call_function("graft_repetition_stats", text, lit(n))

  def winnow(text: Column, k: Int, w: Int): Column =
    call_function("graft_winnow", text, lit(k), lit(w))

  /** selected winnowing minima with 1-based positions:
    * array<struct<pos:int, h:bigint>>.
    */
  def winnowPos(text: Column, k: Int, w: Int): Column =
    call_function("graft_winnow_pos", text, lit(k), lit(w))

  /** maximal exact shared span around a candidate anchor:
    * struct(start_a, start_b, len), null if the anchor k-grams differ.
    */
  def extendMatch(ta: Column, tb: Column, pa: Column, pb: Column, k: Int): Column =
    call_function("graft_extend_match", ta, tb, pa, pb, lit(k))

  /** top-k (id, score) pairs per group, best first. */
  def topK(id: Column, score: Column, k: Int): Column =
    call_function("graft_topk", id, score, lit(k))

  def heavyHitters(item: Column, k: Int): Column =
    call_function("graft_heavy_hitters", item, lit(k))

  /** BPE token count under a trained model. The model is a parameter
    * object (not SQL-expressible), so each model registers its own
    * function name. Names come from an identity map + counter —
    * guaranteed unique per live model (identityHashCode alone can
    * collide, which would silently rebind an earlier model's column) and
    * idempotent per model instance. Note the registry entry's builder
    * closure strongly references the model for the session's lifetime:
    * a session training unboundedly many models accumulates one registry
    * entry each — train once and reuse the model, as q_token_bpe does.
    */
  def bpeCount(spark: SparkSession, text: Column, model: BpeModel): Column = {
    val name = bpeNames.synchronized {
      bpeNames.computeIfAbsent(model, _ => s"graft_bpe_count_${bpeCounter.incrementAndGet()}")
    }
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, (args: Seq[Expression]) => BpeCount(args.head, model), "scala_udf")
    call_function(name, text)
  }

  private val bpeNames = new java.util.IdentityHashMap[BpeModel, String]()
  private val bpeCounter = new java.util.concurrent.atomic.AtomicLong()

  /** TF-IDF top-k terms under a trained [[DfModel]] — model-parameterized
    * function, registered per model instance exactly like [[bpeCount]]
    * (same uniqueness and lifetime caveats).
    */
  def tfidfTopK(spark: SparkSession, text: Column, model: DfModel, k: Int): Column = {
    // k is part of the NAME (not just the builder closure): re-using one
    // model with another k must not silently rebind a previously built
    // column's registration (call_function resolves at analysis time).
    val name = dfNames.synchronized {
      dfNames.computeIfAbsent(model, _ => s"graft_tfidf_topk_${dfCounter.incrementAndGet()}")
    } + s"_$k"
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, (args: Seq[Expression]) => TfidfTopK(args.head, model, k), "scala_udf")
    call_function(name, text)
  }

  private val dfNames = new java.util.IdentityHashMap[DfModel, String]()
  private val dfCounter = new java.util.concurrent.atomic.AtomicLong()

  /** Gram-set membership under a trained [[GramSetModel]] —
    * model-parameterized registration exactly like [[bpeCount]] (same
    * uniqueness and lifetime caveats). The shingling parameters live IN
    * the model, so one registered name per model suffices.
    */
  def gramSetContains(spark: SparkSession, text: Column,
      model: GramSetModel): Column = {
    val name = gramSetNames.synchronized {
      gramSetNames.computeIfAbsent(model,
        _ => s"graft_gram_set_contains_${gramSetCounter.incrementAndGet()}")
    }
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, (args: Seq[Expression]) => GramSetContains(args.head, model),
      "scala_udf")
    call_function(name, text)
  }

  private val gramSetNames = new java.util.IdentityHashMap[GramSetModel, String]()
  private val gramSetCounter = new java.util.concurrent.atomic.AtomicLong()

  /** Semantic (embedding-cosine) hit count under a trained
    * [[VecSetModel]] — model-parameterized registration exactly like
    * [[gramSetContains]]; the threshold is part of the registered name
    * so differently-thresholded probes of one model cannot collide.
    */
  def semanticHits(spark: SparkSession, vec: Column,
      model: VecSetModel, tE3: Int): Column = {
    val base = vecSetNames.synchronized {
      vecSetNames.computeIfAbsent(model,
        _ => s"graft_semantic_hits_${vecSetCounter.incrementAndGet()}")
    }
    val name = s"${base}_t$tE3"
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, (args: Seq[Expression]) => SemanticHitCount(args.head, model, tE3),
      "scala_udf")
    call_function(name, vec)
  }

  private val vecSetNames = new java.util.IdentityHashMap[VecSetModel, String]()
  private val vecSetCounter = new java.util.concurrent.atomic.AtomicLong()

  /** Blocklist statistics `[total_hits, distinct, first_pos, first_pat]`
    * under a trained Aho-Corasick [[AcModel]] — model-parameterized
    * registration exactly like [[gramSetContains]].
    */
  def blocklistStats(spark: SparkSession, text: Column,
      model: AcModel): Column = {
    val name = acNames.synchronized {
      acNames.computeIfAbsent(model,
        _ => s"graft_blocklist_stats_${acCounter.incrementAndGet()}")
    }
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, (args: Seq[Expression]) => BlocklistStats(args.head, model),
      "scala_udf")
    call_function(name, text)
  }

  private val acNames = new java.util.IdentityHashMap[AcModel, String]()
  private val acCounter = new java.util.concurrent.atomic.AtomicLong()

  /** Bloom gram membership under a trained [[GramBloomModel]] —
    * model-parameterized registration exactly like [[gramSetContains]].
    */
  def gramBloomContains(spark: SparkSession, text: Column,
      model: GramBloomModel): Column = {
    val name = gramBloomNames.synchronized {
      gramBloomNames.computeIfAbsent(model,
        _ => s"graft_gram_bloom_contains_${gramBloomCounter.incrementAndGet()}")
    }
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, (args: Seq[Expression]) => GramBloomContains(args.head, model),
      "scala_udf")
    call_function(name, text)
  }

  private val gramBloomNames = new java.util.IdentityHashMap[GramBloomModel, String]()
  private val gramBloomCounter = new java.util.concurrent.atomic.AtomicLong()

  /** Long-key Bloom membership probe — sketch-parameterized registration
    * like [[gramBloomContains]], but with BOUNDED retention: unlike the
    * few long-lived trained gram models, these filters are PER-CALL
    * throwaways (one fresh ~MB sketch per [[graft.operators.Relational.bloomPrefilteredJoin]]),
    * so pinning each forever in the function registry would leak the
    * driver dry on a long-lived session. Names are unique per call and
    * the oldest registrations beyond the last 64 are DROPPED — safe
    * because classic DataFrames analyze EAGERLY at construction (the
    * resolved plan embeds the expression + filter; the registry entry is
    * only needed until then), and a plan somehow left unanalyzed past 64
    * later bloom joins fails RESOLUTION loudly instead of running with
    * the wrong filter.
    */
  def bloomContainsLong(spark: SparkSession, keyHash: Column,
      bloom: org.apache.spark.util.sketch.BloomFilter): Column = {
    val name = s"graft_bloom_contains_long_${bloomLongCounter.incrementAndGet()}"
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, (args: Seq[Expression]) => BloomContainsLong(args.head, bloom),
      "scala_udf")
    bloomLongQueue.synchronized {
      bloomLongQueue.addLast(name)
      while (bloomLongQueue.size > 64) {
        val old = bloomLongQueue.removeFirst()
        spark.sessionState.functionRegistry.dropFunction(
          org.apache.spark.sql.catalyst.FunctionIdentifier(old))
      }
    }
    call_function(name, keyHash)
  }

  private val bloomLongQueue = new java.util.ArrayDeque[String]()
  private val bloomLongCounter = new java.util.concurrent.atomic.AtomicLong()

  /** Bigram-LM fluency under a trained [[LmModel]] — model-parameterized
    * registration exactly like [[bpeCount]] (same uniqueness and lifetime
    * caveats).
    */
  def lmFluency(spark: SparkSession, text: Column, model: LmModel): Column = {
    val name = lmNames.synchronized {
      lmNames.computeIfAbsent(model,
        _ => s"graft_lm_fluency_${lmCounter.incrementAndGet()}")
    }
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, (args: Seq[Expression]) => LmFluencyScore(args.head, model),
      "scala_udf")
    call_function(name, text)
  }

  private val lmNames = new java.util.IdentityHashMap[LmModel, String]()
  private val lmCounter = new java.util.concurrent.atomic.AtomicLong()

  /** Quality-classifier margin under a trained [[QualityLrModel]] —
    * model-parameterized registration exactly like [[lmFluency]].
    */
  def qualityLrScore(spark: SparkSession, text: Column, model: QualityLrModel): Column = {
    val name = qualityLrNames.synchronized {
      qualityLrNames.computeIfAbsent(model,
        _ => s"graft_quality_lr_${qualityLrCounter.incrementAndGet()}")
    }
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, (args: Seq[Expression]) => QualityLrScoreExpr(args.head, model),
      "scala_udf")
    call_function(name, text)
  }

  private val qualityLrNames = new java.util.IdentityHashMap[QualityLrModel, String]()
  private val qualityLrCounter = new java.util.concurrent.atomic.AtomicLong()

  /** All hashed DSIR gram buckets (multiset) of a text column —
    * registration keyed by the bucket-space size.
    */
  def dsirBuckets(spark: SparkSession, text: Column, d: Int): Column = {
    val name = s"graft_dsir_buckets_$d"
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, (args: Seq[Expression]) => DsirBucketsExpr(args.head, d),
      "scala_udf")
    call_function(name, text)
  }

  /** DSIR importance sum under a trained [[DsirModel]] —
    * model-parameterized registration exactly like [[qualityLrScore]].
    */
  def dsirScore(spark: SparkSession, text: Column, model: DsirModel): Column = {
    val name = dsirNames.synchronized {
      dsirNames.computeIfAbsent(model,
        _ => s"graft_dsir_${dsirCounter.incrementAndGet()}")
    }
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, (args: Seq[Expression]) => DsirScoreExpr(args.head, model),
      "scala_udf")
    call_function(name, text)
  }

  private val dsirNames = new java.util.IdentityHashMap[DsirModel, String]()
  private val dsirCounter = new java.util.concurrent.atomic.AtomicLong()

  /** Character-distribution entropy of a string column
    * ([[Kernels.charEntropy]]) — fixed-name registration like
    * [[ilog2FpCol]].
    */
  def charEntropy(spark: SparkSession, text: Column): Column = {
    val name = "graft_char_entropy"
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, (args: Seq[Expression]) => CharEntropyExpr(args.head), "scala_udf")
    call_function(name, text)
  }

  /** Content-defined chunks of a string column ([[Kernels.cdcChunks]]) —
    * parameter-suffixed registration so distinct configurations coexist
    * in one session.
    */
  def cdcChunks(spark: SparkSession, text: Column, maskBits: Int,
      minLen: Int, maxLen: Int): Column = {
    val name = s"graft_cdc_chunks_${maskBits}_${minLen}_$maxLen"
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, (args: Seq[Expression]) =>
        CdcChunksExpr(args.head, maskBits, minLen, maxLen), "scala_udf")
    call_function(name, text)
  }

  /** Fixed-point log2 of a positive bigint column ([[Kernels.ilog2Fp]]
    * as a codegen scalar) — registered once per session under a fixed
    * name like the other kernel functions.
    */
  def ilog2FpCol(spark: SparkSession, n: Column): Column = {
    val name = "graft_ilog2_fp"
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, (args: Seq[Expression]) => Ilog2Fp(args.head), "scala_udf")
    call_function(name, n)
  }

  /** PQ byte codes of a float-vector column under a trained [[PqModel]] —
    * model-parameterized registration exactly like [[bpeCount]] (same
    * uniqueness and lifetime caveats).
    */
  def pqEncode(spark: SparkSession, vec: Column, model: PqModel): Column = {
    val name = pqNames.synchronized {
      pqNames.computeIfAbsent(model,
        _ => s"graft_pq_${pqCounter.incrementAndGet()}")
    } + "_encode"
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, (args: Seq[Expression]) => PqEncode(args.head, model), "scala_udf")
    call_function(name, vec)
  }

  /** Per-query ADC lookup table under a trained [[PqModel]] —
    * model-parameterized registration exactly like [[bpeCount]].
    */
  def pqQueryTable(spark: SparkSession, vec: Column, model: PqModel): Column = {
    val name = pqNames.synchronized {
      pqNames.computeIfAbsent(model,
        _ => s"graft_pq_${pqCounter.incrementAndGet()}")
    } + "_table"
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, (args: Seq[Expression]) => PqQueryTable(args.head, model), "scala_udf")
    call_function(name, vec)
  }

  /** ADC score of (codes, query table) — model-free, statically
    * registered.
    */
  def pqAdcScore(codes: Column, table: Column): Column =
    call_function("graft_pq_adc_score", codes, table)

  private val pqNames = new java.util.IdentityHashMap[PqModel, String]()
  private val pqCounter = new java.util.concurrent.atomic.AtomicLong()
}
