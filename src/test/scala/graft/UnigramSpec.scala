package graft

import org.apache.spark.sql.functions._

import graft.operators.{Bpe, CorpusOps, Unigram}

/** Unigram-LM tokenizer (hard EM, integer micro-nat Viterbi): seed
  * arithmetic small enough to check by hand, the deterministic DP tie
  * rule, full-corpus coverage, and train/encode determinism. */
class UnigramSpec extends SparkTestBase {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("seed scores and first Viterbi round match the hand " +
      "arithmetic on a two-word corpus") {
    // corpus: "ab ab b" -> words ab(2), b(1)
    // seed pieces: a(2), b(3), ab(2); T=7, V=3
    val d = docs(1L -> "ab ab b")
    val m = Unigram.train(d, vocabSize = 3, iters = 1)
    // Viterbi on "ab": [ab] scores ln(3/10) vs [a,b] ln(3/10)+ln(4/10)
    // -> one piece wins; counts after E-step: ab=2, b=1, a=0
    val byPiece = m.pieces.map(p => p._1 -> ((p._2, p._3))).toMap
    assert(byPiece("ab")._1 === 2L)
    assert(byPiece("b")._1 === 1L)
    assert(byPiece("a")._1 === 0L) // char coverage keeps it at 0
    // kept set = {ab, b, a}; T'=3, V'=3: score(ab)=round(ln(3/6)*1e6)
    def q(x: Double) = BigDecimal(x)
      .setScale(0, scala.math.BigDecimal.RoundingMode.HALF_UP).toLong
    assert(byPiece("ab")._2 === q(math.log(3.0 / 6.0) * 1e6))
    assert(byPiece("b")._2 === q(math.log(2.0 / 6.0) * 1e6))
    assert(byPiece("a")._2 === q(math.log(1.0 / 6.0) * 1e6))
    // ranking: cnt DESC then piece ASC
    assert(m.pieces.map(_._1) === Seq("ab", "b", "a"))

    // encoding segments with the kept scores: "ab" -> [ab]
    val enc = Unigram.encode(docs(1L -> "ab b ab"), m)
      .select($"toks").as[Seq[String]].head()
    assert(enc === Seq("ab", "b", "ab"))
  }

  test("DP tie rule: equal scores prefer fewer pieces, then the " +
      "longer last piece") {
    // hand-built score maps drive viterbiPieces directly
    def seg(w: String, scores: Map[String, Long]): Seq[String] = {
      val entries = scores.toSeq.sortBy(_._1)
        .flatMap { case (p, s) => Seq(lit(p), lit(s)) }
      val litMap = map(entries: _*)
      def wordMap(c: org.apache.spark.sql.Column) =
        map_from_entries(filter(
          flatten(transform(sequence(lit(1), length(c)), i =>
            transform(sequence(lit(1), lit(Unigram.MaxPieceLen)), l =>
              struct((i * 8 + l).as("k"),
                when(i + l - 1 <= length(c),
                  element_at(litMap, c.substr(i, l))).as("v"))))),
          e => e.getField("v").isNotNull))
      Seq(w).toDF("w")
        .select(Unigram.viterbiPieces($"w", wordMap($"w")).as("ps"))
        .as[Seq[String]].head()
    }
    // "aa": [aa] = -200 ties [a,a] = -200 -> fewer pieces wins
    assert(seg("aa", Map("a" -> -100L, "aa" -> -200L)) === Seq("aa"))
    // "aaa": [aa,a] and [a,aa] tie on score AND piece count ->
    // longer LAST piece wins -> [a, aa]
    assert(seg("aaa", Map("a" -> -100L, "aa" -> -200L))
      === Seq("a", "aa"))
    // strictly better split beats the single piece
    assert(seg("aa", Map("a" -> -100L, "aa" -> -300L))
      === Seq("a", "a"))
  }

  test("corpus coverage: every document's tokens concatenation-" +
      "round-trip to its eligible words; train and encode are " +
      "deterministic") {
    val d = Tables.t(spark, sf001, "documents")
    // DELTA-based leak check (round-19 lesson: the global
    // `getPersistentRDDs.isEmpty` assert was order-dependent — any
    // earlier suite's barrier leak in the shared session failed THIS
    // operator's contract): snapshot before, assert no NEW pinned
    // storage survives this test's own work + a Materialize.release.
    val persistedBefore = spark.sparkContext.getPersistentRDDs.keySet
    val m1 = Unigram.train(d, vocabSize = 16, iters = 2)
    val m2 = Unigram.train(d, vocabSize = 16, iters = 2)
    assert(m1 === m2, "training is not deterministic")
    // single chars always kept -> no [UNK], exact round-trip
    val enc = Unigram.encode(d, m1)
    val bad = enc
      .select($"doc_id", concat_ws("", $"toks").as("c"))
      .join(d.select($"doc_id", concat_ws("",
        filter(CorpusOps.tokens($"text"),
          w => w.rlike(Bpe.WordRegex))).as("e")), Seq("doc_id"))
      .filter($"c" =!= $"e").count()
    assert(bad === 0L, s"$bad documents fail the coverage round-trip")
    // the model actually segments: multi-char pieces dominate the
    // kept vocab and appear in encodings
    assert(m1.pieces.count(_._1.length > 1) >= 8)
    val multi = enc.select(explode($"toks").as("t"))
      .filter(length($"t") > 1).count()
    assert(multi > 0L, "no multi-char piece ever emitted")
    // no persisted storage leaks out of training/encoding beyond what
    // the documented release lifecycle reclaims
    graft.Materialize.release(spark)
    val leaked =
      spark.sparkContext.getPersistentRDDs.keySet -- persistedBefore
    assert(leaked.isEmpty,
      s"unigram train/encode leaked cached storage: rdd ids $leaked")
  }

  test("soft EM: quantized forward-backward expectations match the " +
      "hand arithmetic on the two-word corpus") {
    // corpus "ab ab b": words ab(2), b(1); seed a(2), b(3), ab(2);
    // T=7, V=3. Weights (D=256): q_a = halfup(256*3/10) = 77,
    // q_b = halfup(256*4/10) = 102, q_ab = 77.
    // "ab": A2 = 77*102 + 77 = 7931;
    //   ec(a@1) = ec(b@2) = floor(77*102*1e6/7931) = 990291,
    //   ec(ab)  = floor(77*1e6/7931) = 9708.
    // "b": ec(b) = 1e6. Micro counts: a=1980582, b=2980582, ab=19416.
    val d = docs(1L -> "ab ab b")
    val m = Unigram.trainSoft(d, vocabSize = 3, iters = 1)
    val byPiece = m.pieces.map(p => p._1 -> p._2).toMap
    assert(byPiece("a") === 1980582L)
    assert(byPiece("b") === 2980582L)
    assert(byPiece("ab") === 19416L)
    // rank order: (cnt DESC, piece ASC)
    assert(m.pieces.map(_._1) === Seq("b", "a", "ab"))
  }

  test("soft EM on the corpus: deterministic, expectations bounded, " +
      "kept vocab close to hard EM") {
    val d = Tables.t(spark, sf001, "documents")
    val s1 = Unigram.trainSoft(d, vocabSize = 16, iters = 1)
    val s2 = Unigram.trainSoft(d, vocabSize = 16, iters = 1)
    assert(s1 === s2, "soft training is not deterministic")
    // per-word expectation mass: S*E[#pieces] lies in [S - slack, n*S]
    val words = Bpe.wordCounts(d).persist()
    try {
      val weights = graft.operators.Unigram.softWeights(
        graft.operators.Unigram.positionPieces(words)
          .groupBy($"piece").agg(sum($"cnt").as("c"))
          .select($"piece"),
        graft.operators.Unigram.positionPieces(words)
          .groupBy($"piece").agg(sum($"cnt").as("c")),
        1L)
      val perWord = graft.operators.Unigram
        .softExpectedCounts(words.withColumn("cnt", lit(1L)), weights)
      // total expected pieces across all DISTINCT words: each word
      // contributes between ~1 and wordLen expected pieces
      val total = perWord.agg(sum($"c")).head().getLong(0)
      val nWords = words.count()
      assert(total >= nWords * (1000000L - 64),
        s"expectation mass too low: $total for $nWords words")
      assert(total <= nWords * 8L * 1000000L)
    } finally { words.unpersist(); () }
    // the soft and hard kept vocabs agree on most pieces (same
    // corpus, same seed, argmax vs expectation)
    val h = Unigram.train(d, vocabSize = 16, iters = 2)
    val overlap = s1.pieces.map(_._1).toSet
      .intersect(h.pieces.map(_._1).toSet).size.toDouble /
      h.pieces.size
    assert(overlap >= 0.6, f"soft/hard vocab overlap $overlap%.2f")
  }

  test("literal-map encode tier: no join below the piece threshold, " +
      "and both tiers agree bit-for-bit") {
    val d = Tables.t(spark, sf001, "documents")
    val tiny = Unigram.train(d, vocabSize = 4, iters = 1)
    // map-only tier: plan has NO join, NO aggregate — pure projection
    val mapOnly = Unigram.encode(d, tiny,
      mapOnlyMaxPieces = tiny.pieces.size)
    val mapPlan = mapOnly.queryExecution.optimizedPlan.toString
    assert(!mapPlan.contains("Join"),
      s"literal-map tier still plans a join:\n$mapPlan")
    assert(!mapPlan.contains("Aggregate"),
      s"literal-map tier still plans an aggregate:\n$mapPlan")
    // join tier (threshold 0 forces it) must plan the distinct-word join
    val joined = Unigram.encode(d, tiny, mapOnlyMaxPieces = 0)
    assert(joined.queryExecution.optimizedPlan.toString.contains("Join"))
    // identical output: the same DP expression runs per occurrence vs
    // per distinct word
    assert(mapOnly.exceptAll(joined).isEmpty &&
      joined.exceptAll(mapOnly).isEmpty)
    // the map-only tier must be OPT-IN: the default encode plans the
    // distinct-word join even for a model under the suggested ceiling
    // (the round-16 scale probe caught a corpus whose trained model
    // slipped under the old size-gated default and turned a 5 s
    // encode into a 20+ CPU-minute per-occurrence grind — model size
    // cannot see the corpus/vocabulary occurrence ratio)
    assert(tiny.pieces.size <= Unigram.MapOnlyMaxPieces)
    val defaulted = Unigram.encode(d, tiny)
    assert(defaulted.queryExecution.optimizedPlan.toString
      .contains("Join"),
      "default encode took the per-occurrence map-only tier")
  }
}
