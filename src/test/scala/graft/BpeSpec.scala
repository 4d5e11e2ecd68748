package graft

import org.apache.spark.sql.functions._

import graft.operators.Bpe

/** BPE tokenizer training + encoding: hand-computed merges on a
  * constructed corpus, the overlapping-adjacency rewrite semantics,
  * the detokenization identity, and determinism. */
class BpeSpec extends SparkTestBase {
  import spark.implicits._

  test("train learns the hand-computed merge sequence") {
    // words: aaab x3, aab x2.
    // iter 1: (a,a) = 2*3 + 1*2 = 8 (overlapping adjacencies both
    //   counted), (a,b) = 3 + 2 = 5 -> merge (a,a).
    // iter 2: aaab = [aa, a, b] (leftmost non-overlapping), aab =
    //   [aa, b]; (aa,a) = 3, (a,b) = 3, (aa,b) = 2 -> tie broken
    //   lexicographically: "a" < "aa", so (a,b) wins.
    // iter 3: aaab = [aa, ab], aab = [aa, b]; (aa,ab) = 3,
    //   (aa,b) = 2 -> merge (aa, ab).
    val docs = Seq("aaab aaab aaab aab aab").toDF("text")
    val model = Bpe.train(docs, numMerges = 3)
    assert(model.merges ===
      Seq(("a", "a"), ("a", "b"), ("aa", "ab")))
  }

  test("train stops early when the vocabulary is fully merged") {
    val docs = Seq("ab ab ab").toDF("text")
    val model = Bpe.train(docs, numMerges = 10)
    assert(model.merges === Seq(("a", "b")))
  }

  test("fertility: chars/token and tokens/word at 1e3 with floors") {
    // model merges (a,a): doc "aaaa aaa zz!" -> eligible words
    // [aaaa, aaa] (zz! fails the word gate): 2 words, 7 chars,
    // tokens [aa, aa, aa, a] = 4 -> chars/token 1750, tokens/word
    // 2000
    val model = graft.operators.BpeModel(Seq(("a", "a")))
    val docs = Seq((1L, "aaaa aaa zz!")).toDF("doc_id", "text")
    val got = Bpe.fertility(docs, model)
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    assert(got === ((1L, 2L, 7L, 4L, 1750L, 2000L)), got.toString)
  }

  test("encodeWord rewrites adjacent runs leftmost non-overlapping") {
    val model = graft.operators.BpeModel(Seq(("a", "a")))
    val got = Seq("aaaa", "aaa", "a")
      .toDF("w")
      .select($"w", Bpe.encodeWord($"w", model).as("toks"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1))
      .toMap
    assert(got("aaaa") === Seq("aa", "aa"))
    assert(got("aaa") === Seq("aa", "a"))
    assert(got("a") === Seq("a"))
  }

  test("encode concat-roundtrips to the filtered word stream") {
    val docs = Tables.t(spark, sf001, "documents")
    val model = Bpe.trainCached(s"$sf001/documents#bpespec8",
      docs, numMerges = 8)
    val enc = Bpe.encode(docs, model)
      .select($"doc_id", concat_ws("", $"toks").as("joined"))
    val raw = docs.select($"doc_id",
      concat_ws("",
        filter(graft.operators.CorpusOps.tokens($"text"),
          w => w.rlike(Bpe.WordRegex))).as("joined"))
    assert(enc.exceptAll(raw).isEmpty && raw.exceptAll(enc).isEmpty,
      "BPE tokens must concatenate back to the original words")
  }

  test("wordpieceEncode: greedy longest-match, single-char fallback, " +
      "concat round-trip") {
    val model = graft.operators.BpeModel(Seq(("a", "a"), ("a", "b")))
    // vocab = {aa, ab}: "aabab" -> aa | b (no piece at 'ba') | ab
    val got = Bpe.wordpieceEncode(
        Seq((1L, "aabab xaa")).toDF("doc_id", "text"), model)
      .select($"toks").as[Seq[String]].head()
    assert(got === Seq("aa", "b", "ab", "x", "aa"))
    // corpus round-trip: pieces concatenate back to the word stream
    val docs = Tables.t(spark, sf001, "documents")
    val m = Bpe.trainCached(s"$sf001/documents#bpespec8",
      docs, numMerges = 8)
    val enc = Bpe.wordpieceEncode(docs, m)
      .select($"doc_id", concat_ws("", $"toks").as("joined"))
    val raw = docs.select($"doc_id",
      concat_ws("",
        filter(graft.operators.CorpusOps.tokens($"text"),
          w => w.rlike(Bpe.WordRegex))).as("joined"))
    assert(enc.exceptAll(raw).isEmpty && raw.exceptAll(enc).isEmpty,
      "wordpiece tokens must concatenate back to the original words")
  }

  test("train releases every checkpoint it creates (no storage leak)") {
    val docs = Tables.t(spark, sf001, "documents")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    // driver path checkpoints the word table once; the distributed
    // path additionally re-checkpoints every MaterializeEvery merges
    Bpe.train(docs, numMerges = 6)
    Bpe.train(docs, numMerges = Bpe.MaterializeEvery + 4,
      driverWordLimit = 0L)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty,
      s"train leaked persistent RDDs: $leaked — in a long-lived " +
        "session these pin memory for the JVM lifetime")
  }

  test("training is deterministic across runs") {
    val docs = Tables.t(spark, sf001, "documents")
    val a = Bpe.train(docs, numMerges = 6).merges
    val b = Bpe.train(docs, numMerges = 6).merges
    assert(a === b)
    assert(a.size === 6)
  }

  test("driver-side and distributed training learn identical merges") {
    val docs = Tables.t(spark, sf001, "documents")
    val local = Bpe.train(docs, numMerges = 20).merges
    val dist = Bpe.train(docs, numMerges = 20,
      driverWordLimit = 0L).merges
    assert(local === dist)
    assert(local.size === 20)
  }

  test("a merge that recreates its own pair stays mergeable") {
    // word "aaaa" x2: merge 1 = (a,a) -> [aa,aa]; merge 2 = (aa,aa)
    // -> [aaaa]; and "aaa" keeps an (aa,a) pair alive. Both paths
    // must agree on the recreated-pair bookkeeping.
    val docs = Seq("aaaa aaaa aaa").toDF("text")
    val local = Bpe.train(docs, numMerges = 3).merges
    val dist = Bpe.train(docs, numMerges = 3,
      driverWordLimit = 0L).merges
    assert(local === dist)
  }

  test("merged tokens shorten the stream, never below word count") {
    val docs = Tables.t(spark, sf001, "documents")
    val model = Bpe.trainCached(s"$sf001/documents#bpespec8",
      docs, numMerges = 8)
    val row = Bpe.encode(docs, model)
      .select(
        sum(size($"toks")).as("n_tok"),
        sum(length(concat_ws("", $"toks"))).as("n_chars"))
      .collect()(0)
    val nWords = docs.select(
      sum(size(filter(graft.operators.CorpusOps.tokens($"text"),
        w => w.rlike(Bpe.WordRegex)))))
      .collect()(0).getLong(0)
    assert(row.getLong(0) < row.getLong(1),
      "some merges must have fired")
    assert(row.getLong(0) >= nWords,
      "a word cannot encode to fewer than one token")
  }
}
