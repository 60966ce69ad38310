package graft

import org.apache.spark.sql.functions._
import graft.text.Bpe
import graft.text.Bpe.Merge

/** BPE training + encoding: hand-derived merge sequences, the
  * training/encoding consistency contract, determinism, bounds. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // the classic subword example: histogram small enough to derive the
  // full merge sequence (and its tie-breaks) by hand
  private val hist = Seq(
    ("hug", 10L), ("pug", 5L), ("pun", 12L), ("bun", 4L), ("hugs", 5L))

  private val expectedMerges = Seq(
    Merge(0, "u", "g"),    // 20
    Merge(1, "u", "n"),    // 16
    Merge(2, "h", "ug"),   // 15
    Merge(3, "p", "un"),   // 12
    Merge(4, "hug", "s"),  // 5 — tie with (p,ug); "hug" < "p"
    Merge(5, "p", "ug"),   // 5
    Merge(6, "b", "un"))   // 4

  test("trainOnHistogram reproduces the hand-derived merge sequence, " +
       "including count ties broken lexicographically") {
    assert(Bpe.trainOnHistogram(hist, numMerges = 50) == expectedMerges)
  }

  test("training stops early when the best pair falls under minPairCount") {
    assert(Bpe.trainOnHistogram(Seq(("ab", 1L), ("cd", 1L)),
      numMerges = 10, minPairCount = 2L).isEmpty)
    // numMerges caps even when pairs remain
    assert(Bpe.trainOnHistogram(hist, numMerges = 3) ==
      expectedMerges.take(3))
  }

  test("encodeWord applies merges in rank order, leftmost-greedy — the " +
       "segmentation the training loop itself produced") {
    val pairs = expectedMerges.map(m => (m.left, m.right)).toArray
    assert(Bpe.encodeWord("hug", pairs).toSeq == Seq("hug"))
    assert(Bpe.encodeWord("hugs", pairs).toSeq == Seq("hugs"))
    assert(Bpe.encodeWord("hugging", pairs).toSeq ==
      Seq("hug", "g", "i", "n", "g"))
    assert(Bpe.encodeWord("punbun", pairs).toSeq == Seq("pun", "bun"))
    // unseen symbols pass through as single code points
    assert(Bpe.encodeWord("zq", pairs).toSeq == Seq("z", "q"))
    assert(Bpe.encodeWord("", pairs).toSeq == Seq.empty)
    // the min-rank encoder's equivalence to rank-order application
    // rests on the training invariant (each pair side is a single
    // codepoint or an earlier merge's result) — a violating hand-built
    // list must fail loudly, not silently segment differently
    val bad = Array(("ab", "c"), ("a", "b"))
    val e = intercept[IllegalArgumentException] {
      Bpe.encodeWord("abc", bad)
    }
    assert(e.getMessage.contains("training invariant"), e.getMessage)
  }

  test("df-level training equals the histogram twin and is deterministic") {
    // expand the histogram into a document corpus (weights as repeats)
    val docs = hist.flatMap { case (w, c) =>
      Seq.fill(c.toInt)(w)
    }.grouped(4).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
      .toSeq.toDF("doc_id", "text")
    val a = Bpe.trainMerges(docs, "text", numMerges = 50)
    val b = Bpe.trainMerges(docs, "text", numMerges = 50)
    assert(a == expectedMerges)
    assert(a == b)
  }

  test("encode roundtrips every document and emits only vocabulary " +
       "tokens (random corpus, unseen words included)") {
    val rnd = new scala.util.Random(41L)
    val abc = "abcde"
    def word() = (0 until (1 + rnd.nextInt(8)))
      .map(_ => abc(rnd.nextInt(abc.length))).mkString
    val train = (0 until 60).map(i =>
      (i.toLong, (0 until 6).map(_ => word()).mkString(" "))).toDF("doc_id", "text")
    val merges = Bpe.trainMerges(train, "text", numMerges = 30)
    assert(merges.nonEmpty)
    val test = ((0 until 40).map(i =>
      (i.toLong, (0 until 5).map(_ => word()).mkString(" "))) :+
      (99L, "zzz unseen éé")).toDF("doc_id", "text")
    val vocab = merges.map(_.merged).toSet
    val rows = Bpe.encode(test, "doc_id", "text", merges)
      .join(test, "doc_id")
      .select(col("text"), col("tokens")).as[(String, Seq[String])]
      .collect()
    assert(rows.length == 41)
    rows.foreach { case (text, toks) =>
      assert(toks.mkString("") ==
        text.trim.split("\\s+").filter(_.nonEmpty).mkString(""))
      toks.foreach(t =>
        assert(t.codePointCount(0, t.length) == 1 || vocab.contains(t),
          s"token '$t' not in vocabulary"))
    }
  }

  test("null text encodes to null; tokenStats counts tokens and word chars") {
    val docs = Seq((1L, "aa ab aa"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val merges = Seq(Merge(0, "a", "a"))
    val enc = Bpe.encode(docs, "doc_id", "text", merges)
      .orderBy("doc_id").collect()
    assert(enc(0).getSeq[String](1) == Seq("aa", "a", "b", "aa"))
    assert(enc(1).isNullAt(1))
    val st = Bpe.tokenStats(docs, "doc_id", "text", merges)
      .orderBy("doc_id").collect()
    assert(st(0).getLong(1) == 4L && st(0).getLong(2) == 6L)
  }

  test("encoder tokenization matches TextAnalysis.tokens on control " +
       "chars (Java trim would strip them; Spark trim must win)") {
    // U+0001 is NOT regex whitespace but IS <= U+0020 — a Java
    // String.trim in the encoder would silently drop it
    val docs = Seq((1L, "\u0001abc def\u0001"), (2L, "  padded  "))
      .toDF("doc_id", "text")
    val rows = graft.text.Bpe.encode(docs, "doc_id", "text", Seq.empty)
      .join(docs, "doc_id")
      .select(col("doc_id"), concat_ws("", col("tokens")),
        concat_ws("", graft.text.TextAnalysis.tokens(col("text"))))
      .collect()
    rows.foreach(r => assert(r.getString(1) == r.getString(2),
      s"doc ${r.getLong(0)}: '${r.getString(1)}' != '${r.getString(2)}'"))
  }

  test("degenerate vocabCap conf is rejected loudly, not an index crash") {
    val docs = Seq((1L, "aa bb")).toDF("doc_id", "text")
    spark.conf.set("graft.bpe.vocabCap", "0")
    try {
      val e = intercept[IllegalArgumentException] {
        Bpe.trainMerges(docs, "text", numMerges = 5)
      }
      assert(e.getMessage.contains("vocabCap"))
    } finally spark.conf.unset("graft.bpe.vocabCap")
  }

  test("merges persist and reload in order (train once, encode forever)") {
    Bpe.saveMerges(spark, expectedMerges, "bpe_vocab_t1")
    assert(Bpe.loadMerges(spark, "bpe_vocab_t1") == expectedMerges)
  }

  test("vocab: stable contiguous ids (alphabet then merges), id " +
       "encoding with unk, save/load round-trip") {
    val docs = hist.flatMap { case (w, c) => Seq.fill(c.toInt)(w) }
      .grouped(4).zipWithIndex
      .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
      .toSeq.toDF("doc_id", "text")
    val v = Bpe.trainVocab(docs, "text", numMerges = 50)
    assert(v.merges == expectedMerges)
    // alphabet = sorted distinct code points of the training words
    assert(v.alphabet == Seq("b", "g", "h", "n", "p", "s", "u"))
    assert(v.tokens.take(7) == v.alphabet &&
      v.tokens(7) == "ug" && v.size == 7 + expectedMerges.size)
    val enc = Bpe.encodeIds(
      Seq((1L, "hugs zz"), (2L, null.asInstanceOf[String]))
        .toDF("doc_id", "text"),
      "doc_id", "text", v).orderBy("doc_id").collect()
    // "hugs" -> one merged token; "zz" -> two unknown code points
    assert(enc(0).getSeq[Int](1) ==
      Seq(v.idOf("hugs"), -1, -1))
    assert(enc(1).isNullAt(1))
    Bpe.saveVocab(spark, v, "bpe_vocab_t2")
    assert(Bpe.loadVocab(spark, "bpe_vocab_t2") == v)
  }

  test("vocabCap truncation emits a driver warning (and 0-cap conf read)") {
    val docs = Seq((1L, "aa bb cc dd ee ff aa bb")).toDF("doc_id", "text")
    Bpe.trainMerges(docs, "text", numMerges = 5, vocabCap = 2)
    assert(graft.functions.Warnings.recentDriverWarnings
      .exists(_.contains("bpe: word histogram truncated to top 2")))
    // conf fallback path: session knob respected when vocabCap <= 0
    spark.conf.set("graft.bpe.vocabCap", "3")
    try {
      Bpe.trainMerges(docs, "text", numMerges = 5)
      assert(graft.functions.Warnings.recentDriverWarnings
        .exists(_.contains("top 3")))
    } finally spark.conf.unset("graft.bpe.vocabCap")
  }

  test("merges.txt import (r16): GPT-2 format round-trips, imported " +
       "ranks segment the classic example, malformed lines fail loud") {
    // the textbook Sennrich merges, in the GPT-2 file format
    val txt = Seq("#version: 0.2", "e r", "er s", "l o", "lo w", "")
    val merges = Bpe.parseMergesTxt(txt.iterator)
    assert(merges == Seq(Bpe.Merge(0, "e", "r"), Bpe.Merge(1, "er", "s"),
      Bpe.Merge(2, "l", "o"), Bpe.Merge(3, "lo", "w")))
    val pairs = merges.map(m => (m.left, m.right)).toArray
    assert(Bpe.encodeWord("lowers", pairs).toSeq == Seq("low", "ers"))
    // file round-trip through the Hadoop FS path
    val p = java.nio.file.Files.createTempDirectory("mrg")
      .resolve("merges.txt").toString
    Bpe.writeMergesTxt(spark, merges, p)
    assert(Bpe.loadMergesTxt(spark, p) == merges)
    // malformed line → loud, with the line number
    val e = intercept[IllegalArgumentException] {
      Bpe.parseMergesTxt(Seq("e r", "three part line").iterator)
    }
    assert(e.getMessage.contains("line 2"), e.getMessage)
    // GPT-2 byte alphabet: 256 distinct single-char symbols, printable
    // bytes keep themselves, others shift past U+0100
    assert(Bpe.Gpt2ByteAlphabet.size == 256 &&
      Bpe.Gpt2ByteAlphabet.distinct.size == 256)
    assert(Bpe.Gpt2ByteAlphabet('A'.toInt) == "A")
    assert(Bpe.Gpt2ByteAlphabet(0).head >= 0x100.toChar)
    val v = Bpe.vocabFromMerges(merges, Bpe.Gpt2ByteAlphabet)
    assert(v.alphabet.size == 256 && // e,r,s,l,o,w are printable bytes
      v.tokens.takeRight(4) == Seq("er", "ers", "lo", "low"))
  }

  test("merges.txt: '#'-leading MERGES survive (only a leading " +
       "#version header is a comment) — real GPT-2 tables build the " +
       "##/### tokens from them") {
    val txt = Seq("#version: 0.2", "# #", "## #", "e r")
    val merges = Bpe.parseMergesTxt(txt.iterator)
    assert(merges == Seq(Bpe.Merge(0, "#", "#"), Bpe.Merge(1, "##", "#"),
      Bpe.Merge(2, "e", "r")),
      s"'#'-leading merges must parse as data: $merges")
    // a #version line NOT at the head is data and fails loudly (it
    // splits into two fields only by accident of its spacing)
    val mid = Bpe.parseMergesTxt(Seq("a b", "#version: 0.2").iterator)
    assert(mid == Seq(Bpe.Merge(0, "a", "b"),
      Bpe.Merge(1, "#version:", "0.2")))
  }

  test("encodeIdsGpt2: GPT-2 segmentation parity — pre-tokenizer " +
       "keeps the leading space so word-initial \u0120-merges fire, " +
       "bytes map through the alphabet, contractions split") {
    // space byte 32 maps to \u0120 ('G-dot': 256 + 32)
    val gDot = Bpe.Gpt2ByteAlphabet(32)
    assert(gDot == "\u0120", s"byte 32 must map to U+0120, got $gDot")
    val merges = Bpe.parseMergesTxt(Seq(
      "t h", "th e",                       // builds 'the'
      s"$gDot c", s"${gDot}c a", s"${gDot}ca t" // builds ' cat'
    ).iterator)
    val vocab = Bpe.vocabFromMerges(merges, Bpe.Gpt2ByteAlphabet)
    val docs = Seq((1L, "the cat"), (2L, "don't"), (3L, "caf\u00e9"),
      (4L, null: String)).toDF("doc_id", "text")
    val ids = Bpe.encodeIdsGpt2(docs, "doc_id", "text", vocab)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[Int](1))).toMap
    def toks(ds: Seq[Int]) = ds.map(vocab.tokens(_)).toList
    // 'the cat' → pre-tokens ['the', ' cat'] → ['the', '\u0120cat']
    assert(toks(ids(1L)) == List("the", s"${gDot}cat"),
      s"got ${toks(ids(1L))}")
    // contraction splits off: ['don', ''t'] — no merges apply, so
    // raw byte symbols (all printable ASCII keeps itself)
    assert(toks(ids(2L)) == List("d", "o", "n", "'", "t"))
    // non-ASCII goes through UTF-8 BYTES: the é of 'café' becomes
    // C3 A9 → two alphabet symbols (printable keep-range: Ã ©) after
    // the ASCII prefix — never unk
    assert(toks(ids(3L)) == List("c", "a", "f", "\u00c3", "\u00a9"))
    // roundtrip: concatenate token STRINGS then decode ONCE — the
    // split multi-byte char reassembles; per-token decoding would
    // yield U+FFFD pairs
    assert(Bpe.gpt2ByteDecode(toks(ids(3L)).mkString) == "caf\u00e9")
    assert(ids(4L) == null)
  }

  test("q90 twin under an imported production vocab: tokenBudget " +
       "ordered by BPE id counts matches the hand-computed cut") {
    // docs with known BPE token counts under the imported merges
    val docs = Seq(
      (1L, "s1", "lowers lowers"),     // 2 words x 2 ids = 4
      (2L, "s1", "low low low"),       // 3 words x 1 id  = 3
      (3L, "s1", "lowers low lowers"), // 2+1+2           = 5
      (4L, "s2", "low"))               // 1
      .toDF("doc_id", "source", "text")
    val merges = Bpe.parseMergesTxt(
      Seq("#version: 0.2", "e r", "er s", "l o", "lo w",
        "low er", "lower s").iterator)
    val vocab = Bpe.vocabFromMerges(merges)
    // under these merges 'lowers' → one id? no: l o w e r s →
    // er, ers, lo, low, (low er? needs 'low','er' adjacency: low ers
    // — 'ers' not 'er', so no) → [low, ers] = 2 ids; 'low' → 1
    val withIds = Bpe.encodeIds(docs, "doc_id", "text", vocab)
      .withColumn("n_bpe", size(col("token_ids")).cast("long"))
    assert(withIds.filter(col("doc_id") === 1L).collect()(0)
      .getAs[Long]("n_bpe") == 4L)
    val joined = docs.join(withIds.select("doc_id", "n_bpe"), "doc_id")
    val kept = graft.text.Curation.tokenBudget(joined, "source",
      "doc_id", "text", budgetPerStratum = 6L,
      tokenCountCol = Some("n_bpe"))
      .select("doc_id", "n_tokens", "cum_tokens")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    // s1 cumulative under BPE counts: d1=4 (keep, prev 0), d2=7 (keep,
    // prev 4 < 6), d3 (prev 7 >= 6 → cut); s2: d4 kept
    assert(kept.toSeq == Seq((1L, 4L, 4L), (2L, 3L, 7L), (4L, 1L, 1L)))
    // the whitespace heuristic would have kept d3 too (2+3+... words:
    // prev cum 5 < 6) — the production tokenizer changes the cut,
    // which is exactly why the budget must run under it
    val ws = graft.text.Curation.tokenBudget(docs, "source",
      "doc_id", "text", budgetPerStratum = 6L)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(ws.toSeq == Seq(1L, 2L, 3L, 4L))
  }
}
