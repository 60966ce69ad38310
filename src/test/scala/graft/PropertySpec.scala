package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed
import graft.text.Dedup

/** Property-based differential tests (ScalaCheck). Each test generates
  * ONE seeded batch of random inputs and runs ONE Spark job over it, so
  * randomized coverage doesn't cost a job per sample. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int, seed: Long): List[A] =
    Gen.listOfN(n, g).apply(Gen.Parameters.default, Seed(seed)).get

  test("cast of arbitrary strings to int/double never throws; valid ints round-trip") {
    val junk = Gen.oneOf(
      Gen.alphaNumStr, Gen.asciiPrintableStr,
      Gen.chooseNum(Int.MinValue, Int.MaxValue).map(_.toString),
      Gen.chooseNum(-1e9, 1e9).map(_.toString),
      Gen.const(""), Gen.const("  42  "), Gen.const("1e3"),
      Gen.const("0x1F"), Gen.const("NaN"), Gen.const("-"))
    val strs = samples(junk, 400, seed = 7L)
    // Pig bytearray lazy-cast semantics (§1.4): malformed → null, never
    // an error. ANSI is off via GraftSession.tune.
    val rows = strs.toDF("s")
      .select(col("s"), col("s").cast("int").as("i"),
        col("s").cast("double").as("d"))
      .collect()
    rows.foreach { r =>
      val s = r.getString(0)
      val expected = s.toIntOption
      val got = if (r.isNullAt(1)) None else Some(r.getInt(1))
      // Spark also accepts trimmed/decimal forms; only assert agreement
      // where scala-side parsing succeeds
      if (expected.isDefined) assert(got == expected, s"cast('$s' as int)")
    }
  }

  test("dropRepeatedSpans matches a driver brute-force twin on random " +
       "small-vocab corpora (repeats guaranteed by the tiny vocab)") {
    val k = 3
    val word = Gen.oneOf("a", "b", "c", "d", "e")
    val doc = Gen.chooseNum(0, 14).flatMap(n => Gen.listOfN(n, word))
      .map(_.mkString(" "))
    val docs = samples(doc, 50, seed = 23L).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    // driver twin: same semantics, computed independently
    val toks = docs.map { case (id, t) =>
      id -> t.trim.split("\\s+").filter(_.nonEmpty).toSeq }.toMap
    val occ = for {
      (id, ts) <- toks.toSeq
      i <- 0 to ts.length - k
      if ts.length >= k
    } yield (ts.slice(i, i + k).mkString(" "), id, i)
    val removed = occ.groupBy(_._1).values.filter(_.size > 1).flatMap { os =>
      val canon = os.minBy(o => (o._2, o._3))
      os.filterNot(_ == canon).map(o => (o._2, o._3))
    }
    val remIdx = removed.groupBy(_._1).view
      .mapValues(_.flatMap(o => o._2 until o._2 + k).toSet).toMap
    val want = toks.map { case (id, ts) =>
      val rem = remIdx.getOrElse(id, Set.empty[Int])
      val kept = ts.zipWithIndex.collect { case (t, i) if !rem(i) => t }
      id -> (kept.mkString(" "), (ts.length - kept.length).toLong)
    }
    val got = Dedup.dropRepeatedSpans(docs.toDF("doc_id", "text"),
        "doc_id", "text", k)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2)))
      .toMap
    assert(got == want)
    // the tiny vocab must actually have produced removals, or the
    // property is vacuous
    assert(want.values.exists(_._2 > 0))
  }

  test("minhash signature agreement tracks exact jaccard (random docs)") {
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps", "zeta",
      "eta", "theta", "iota", "kappa")
    val doc = Gen.chooseNum(8, 40).flatMap(n => Gen.listOfN(n, word))
      .map(_.mkString(" "))
    val docs = samples(doc, 60, seed = 11L).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val df = docs.toDF("doc_id", "text")
    val sh = df.select(col("doc_id"), Dedup.wordNgrams(col("text"), 2).as("g"))
    val sigs = Dedup.minhashSignaturesFromGrams(
      sh.select(col("doc_id"), explode(col("g")).as("gram")),
      "doc_id", "gram", numHashes = 128)
    val a = sh.select(col("doc_id").as("id_a"), col("g").as("ga"))
      .join(sigs.select(col("doc_id").as("id_a"), col("sig").as("sa")), "id_a")
    val b = sh.select(col("doc_id").as("id_b"), col("g").as("gb"))
      .join(sigs.select(col("doc_id").as("id_b"), col("sig").as("sb")), "id_b")
    val pairs = a.join(b, col("id_a") < col("id_b"))
      .select(Dedup.jaccard(col("ga"), col("gb")).as("jac"),
        (size(filter(zip_with(col("sa"), col("sb"), (x, y) =>
          when(x === y, 1).otherwise(0)), _ === 1)).cast("double") / 128)
          .as("est"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    assert(pairs.nonEmpty)
    // 128 hashes: P[|est - jac| > 0.25] per pair < 2e-9 (Hoeffding);
    // seeded data makes this deterministic in practice
    pairs.foreach { case (jac, est) =>
      assert(math.abs(jac - est) <= 0.25, s"jac=$jac est=$est")
    }
  }

  test("simhash banding finds EVERY pair within hamming distance 3") {
    // random 64-bit signatures + planted close pairs: the 4x16-bit
    // banding must recall d<=3 pairs with probability 1 (pigeonhole)
    val rnd = new scala.util.Random(13)
    val base = Seq.fill(80)(rnd.nextLong())
    val planted = base.take(20).map { s =>
      var t = s
      (0 until rnd.nextInt(4)).foreach { _ =>
        t = t ^ (1L << rnd.nextInt(64)) }
      t
    }
    val sigs = (base ++ planted).zipWithIndex
      .map { case (s, i) => (i.toLong, s) }
      .toDF("doc_id", "simhash")
    val exact = Dedup.exactHammingPairs(sigs, "doc_id", 3)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val banded = Dedup.simhashNearDups(sigs, "doc_id", maxDistance = 3)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty && banded == exact)
  }

  test("exactJaccardPairs matches the HOF cross-join reference (random corpora)") {
    val word = Gen.oneOf("w1", "w2", "w3", "w4", "w5", "w6")
    val doc = Gen.chooseNum(5, 25).flatMap(n => Gen.listOfN(n, word))
      .map(_.mkString(" "))
    val docs = samples(doc, 40, seed = 17L).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val df = docs.toDF("doc_id", "text")
    val g = df.select(col("doc_id"), Dedup.wordNgrams(col("text"), 2).as("g"))
    val ref = g.select(col("doc_id").as("id_a"), col("g").as("ga"))
      .join(g.select(col("doc_id").as("id_b"), col("g").as("gb")),
        col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(Dedup.jaccard(col("ga"), col("gb")), 6).as("jaccard"))
      .filter(col("jaccard") >= 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val got = Dedup.exactJaccardPairs(df, "doc_id", "text", n = 2,
        threshold = 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == ref && got.nonEmpty)
  }

  test("rankBy equals window rank/dense_rank on random keyed data") {
    import org.apache.spark.sql.expressions.Window
    val pair = for {
      k <- Gen.chooseNum(0, 5)
      v <- Gen.chooseNum(0L, 1000L)
    } yield (k, v)
    val data = samples(pair, 300, seed = 23L)
    val df = data.toDF("k", "v")
    for (dense <- Seq(true, false)) {
      val w = Window.orderBy(col("k").asc)
      val r = if (dense) dense_rank() else rank()
      val expect = df.withColumn("rank", r.over(w).cast("long"))
        .select("k", "rank").distinct()
        .collect().map(x => (x.getInt(0), x.getLong(1))).toSet
      val got = graft.operators.Rank.rankBy(df, Seq(col("k") -> true), dense)
        .select("k", "rank").distinct()
        .collect().map(x => (x.getInt(0), x.getLong(1))).toSet
      assert(got == expect, s"dense=$dense")
    }
  }

  test("connectedComponents equals union-find on random graphs") {
    // one Spark run over a disjoint union of random graphs (node ids
    // offset per graph), checked against driver union-find
    val edgeGen = for {
      a <- Gen.chooseNum(0L, 59L); b <- Gen.chooseNum(0L, 59L)
    } yield (a, b)
    val all = (0 until 8).flatMap { g =>
      val off = g * 1000L
      samples(edgeGen, 70, seed = 100L + g).map {
        case (a, b) => (a + off, b + off) }
    }
    // BOTH paths: the driver union-find fast path (default threshold)
    // and the distributed star-contraction (forced, driverMaxEdges=0)
    val got = Dedup.connectedComponents(
        all.toDF("id_a", "id_b"), "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val gotDist = Dedup.connectedComponents(
        all.toDF("id_a", "id_b"), "id_a", "id_b", driverMaxEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == gotDist)

    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElseUpdate(r, r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    all.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = parent.keys.map(k => k -> find(k)).toMap
    assert(got == want)
  }

  test("paragraphDedup: every distinct paragraph survives exactly once " +
       "(random corpora)") {
    val rnd = new scala.util.Random(20260814L)
    // small paragraph vocabulary → plenty of cross-doc repeats
    val vocab = Vector.tabulate(12)(i => s"para body number $i")
    (1 to 3).foreach { _ =>
      val docs = (0L until 40L).map { id =>
        val n = 1 + rnd.nextInt(4)
        (id, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString("\n\n"))
      }
      val df = docs.toDF("doc_id", "text")
      val out = graft.text.Curation.paragraphDedup(df, "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getString(1))).toMap
      // multiset of kept paragraphs == set of distinct input paragraphs
      val kept = out.values.filter(_.nonEmpty)
        .flatMap(_.split("\n\n")).toSeq.sorted
      val distinct = docs.flatMap(_._2.split("\n\n")).distinct.sorted
      assert(kept == distinct)
      // and each survives at its FIRST (id, idx) occurrence
      val firstOwner = docs.flatMap { case (id, t) =>
        t.split("\n\n").zipWithIndex.map { case (p, i) => (p, id, i) } }
        .groupBy(_._1).map { case (p, occ) => p -> occ.minBy(o => (o._2, o._3))._2 }
      firstOwner.foreach { case (p, owner) =>
        assert(out(owner).split("\n\n").contains(p),
          s"paragraph '$p' missing from its first owner doc $owner") }
    }
  }
}
