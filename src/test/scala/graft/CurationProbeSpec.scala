package graft

import org.apache.spark.sql.functions._
import graft.text.Curation

/** Probe battery over the r9 curation surface: nulls, empties, and
  * hostile ids — the corners the sf-corpus gate can't reach. */
class CurationProbeSpec extends SparkSpec {
  import spark.implicits._

  test("stratifiedSample: negative ids still land in [0,1000) " +
       "(hash-derived ids must sample at the configured rate)") {
    val df = (-2000L until 0L).map(i => (i, "en")).toDF("doc_id", "lang")
    val n = Curation.stratifiedSample(df, "doc_id", "lang",
      Map("en" -> 100)).count()
    // a sign-preserving mod would keep ~100% of negative ids; the
    // operator must keep ~10%
    assert(n > 100 && n < 330, s"negative-id sample rate broken: $n/2000")
  }

  test("stratifiedSample: null stratum falls to the default rate") {
    val df = (0L until 1000L).map(i => (i, null: String))
      .toDF("doc_id", "lang")
    val all = Curation.stratifiedSample(df, "doc_id", "lang",
      Map("en" -> 0), defaultPermille = 1000).count()
    assert(all == 1000L)
    val none = Curation.stratifiedSample(df, "doc_id", "lang",
      Map("en" -> 1000), defaultPermille = 0).count()
    assert(none == 0L)
  }

  test("paragraphDedup: null / empty / whitespace-only text rows " +
       "survive with zero counts") {
    val df = Seq((1L, "real para"), (2L, null: String), (3L, ""),
      (4L, "  \n\n  ")).toDF("doc_id", "text")
    val out = Curation.paragraphDedup(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getLong(2), r.getLong(3))).sortBy(_._1)
    assert(out.length == 4)
    assert(out(0) == ((1L, "real para", 1L, 1L)))
    assert(out(1) == ((2L, "", 0L, 0L)), s"null text: ${out(1)}")
    assert(out(2) == ((3L, "", 0L, 0L)))
    assert(out(3) == ((4L, "", 0L, 0L)))
  }

  test("lineFilter: null text yields empty clean and zero counts, " +
       "not nulls") {
    val df = Seq((1L, "A complete sentence with enough words present."),
      (2L, null: String)).toDF("doc_id", "text")
    val out = Curation.lineFilter(df, "doc_id", "text", 5, 1)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4))).sortBy(_._1)
    assert(out(0)._5 && out(0)._4 == 1L)
    assert(out(1) == ((2L, "", 0L, 0L, false)), s"null text: ${out(1)}")
  }

  test("paragraphDedup: paragraphs differing only by reversal are NOT " +
       "merged (double-hash key)") {
    val df = Seq((1L, "ab"), (2L, "ba")).toDF("doc_id", "text")
    val out = Curation.paragraphDedup(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(out.toSeq == Seq((1L, "ab"), (2L, "ba")))
  }

  test("ARITY: multi-arg call is the static arg count; null fields " +
       "don't change it (reference ARITY.java semantics)") {
    val dir = java.nio.file.Files.createTempDirectory("arity").toString
    Seq(("a", 1, 2.0), (null, 2, 3.0)).toDF("name", "age", "gpa")
      .write.mode("overwrite").parquet(s"$dir/in")
    val r = frontend.PigRunner(spark)
    r.run(s"""
      a = load '$dir/in' using BinStorage() as (name:chararray, age:int, gpa:double);
      b = foreach a generate ARITY(name, age, gpa) as n;
    """)
    val got = r.apply("b").df.select("n").as[Int].collect().toSeq
    assert(got == Seq(3, 3))
  }

  test("packSequences: chunk boundaries, crossing docs, empty and null " +
       "text take zero tokens") {
    val df = Seq(
      (1L, "s", "a b c d e"),          // 5 toks, start 0  → pack 0 off 0
      (2L, "s", "f g h i j k l"),      // 7 toks, start 5  → pack 0 off 5
      (3L, "s", null: String),         // 0 toks, start 12 → pack 1 off 2
      (4L, "s", "m n"),                // 2 toks, start 12 → pack 1 off 2
      (5L, "t", "x y z")               // other stratum restarts at 0
    ).toDF("doc_id", "source", "text")
    val out = Curation.packSequences(df, "source", "doc_id", "text", 10L)
      .select("doc_id", "n_tokens", "pack_id", "pack_offset")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, 5L, 0L, 0L), (2L, 7L, 0L, 5L), (3L, 0L, 1L, 2L),
      (4L, 2L, 1L, 2L), (5L, 3L, 0L, 0L)))
  }

  test("packSequences: every pack except a stratum's last is filled to " +
       "at least seqTokens by its members' spans") {
    val docs = sf("documents").select("doc_id", "source", "text")
    val out = Curation.packSequences(docs, "source", "doc_id", "text", 512L)
    // within (source, pack): max(start+n_tokens) must cross the pack's
    // start boundary for every non-final pack — no empty packs
    val packs = out
      .groupBy("source", "pack_id")
      .agg(max(col("pack_offset") + col("n_tokens")).as("fill"),
           count(lit(1)).as("n"))
    val lastPack = out.groupBy("source")
      .agg(max("pack_id").as("last_pack"))
    val short = packs.join(lastPack, Seq("source"))
      .filter(col("pack_id") < col("last_pack") && col("fill") < 512)
      .count()
    assert(short == 0L)
  }

  test("shuffleDeterministic: same seed reproduces, new seed reorders, " +
       "positions are dense per shard, negative ids still shard") {
    val df = (0L until 1000L).map(i => (i, "s")).toDF("doc_id", "source")
    def run(seed: Long) = Curation
      .shuffleDeterministic(df, "doc_id", seed, numShards = 4)
      .select("doc_id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val a = run(42L); val b = run(42L); val c = run(7L)
    assert(a.toSeq == b.toSeq)                    // reproducible
    assert(a.toSeq != c.toSeq)                    // epoch reshuffles
    // every shard's positions are exactly 0..count-1
    val perShard = a.groupBy(_._2).values
    assert(perShard.forall(g =>
      g.map(_._3).sorted.toSeq == (0L until g.length).toSeq))
    // hash-derived negative ids: pmod keeps shard in range
    val neg = (-500L until 0L).map(i => (i, "s")).toDF("doc_id", "source")
    val shards = Curation
      .shuffleDeterministic(neg, "doc_id", 42L, numShards = 4)
      .select("shard").distinct().collect().map(_.getLong(0)).sorted
    assert(shards.forall(sh => sh >= 0 && sh < 4))
  }

  test("stratifiedTakeN: exact n per stratum, short strata kept whole, " +
       "seed-reproducible and seed-sensitive") {
    val df = ((0L until 100L).map(i => (i, "big")) ++
      (100L until 105L).map(i => (i, "tiny"))).toDF("doc_id", "lang")
    def run(seed: Long) = Curation
      .stratifiedTakeN(df, "doc_id", "lang", n = 10, seed = seed)
      .collect().map(r => (r.getString(1), r.getLong(0))).sorted.toSeq
    val a = run(7L)
    assert(a.count(_._1 == "big") == 10)
    assert(a.count(_._1 == "tiny") == 5)      // short stratum kept whole
    assert(a == run(7L))                      // reproducible
    assert(a != run(8L))                      // a new seed picks new docs
  }

  test("stratifiedTakeN plan: top-n per stratum is a WindowGroupLimit") {
    val df = (0L until 100L).map(i => (i, "s")).toDF("doc_id", "lang")
    val p = Curation.stratifiedTakeN(df, "doc_id", "lang", 5)
      .queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("samplePermille covers all residues: rate 1 keeps ~0.1% and " +
       "rate 999 actually drops (review: mod-1000 of the raw LCG " +
       "product only hit multiples of 5)") {
    val df = (0L until 100000L).map(i => (i, "en")).toDF("doc_id", "lang")
    val n1 = Curation.stratifiedSample(df, "doc_id", "lang",
      Map("en" -> 1)).count()
    assert(n1 > 20 && n1 < 300, s"rate-1 kept $n1/100000 (expect ~100)")
    val n999 = Curation.stratifiedSample(df, "doc_id", "lang",
      Map("en" -> 999)).count()
    assert(n999 < 100000L, "rate 999 must drop a sliver, not keep all")
  }

  test("lcgMix is sensitive to high id bits: ids congruent mod 2^31 " +
       "make independent sample decisions (review: pre-fold fold)") {
    // pairs (i, i + k*2^31) collide under a plain pmod(id, 2^31)
    // reduction; with the xor-fold their permille mixes must disagree
    // for most pairs, not be perfectly correlated
    val ids = (0L until 2000L).flatMap(i => Seq(i, i + (1L << 31)))
    val df = ids.map(i => (i, "en")).toDF("doc_id", "lang")
    val kept = Curation.stratifiedSample(df, "doc_id", "lang",
      Map("en" -> 500)).collect().map(_.getLong(0)).toSet
    val both = (0L until 2000L).count(i =>
      kept(i) == kept(i + (1L << 31)))
    // perfectly correlated would be 2000/2000 agreement; independence
    // gives ~50% at rate 500 — gate generously below the correlated case
    assert(both < 1400, s"high-bit-congruent pairs agree $both/2000")
  }

  test("dropLowQualityDomains: a degraded domain loses ALL its docs " +
       "(even its individually-fine pages), the spam-farm doc cap " +
       "trips, and URL-less docs are never dropped") {
    val good = "the quick brown fox jumps over the lazy dog and that " +
      "dog would have stayed with all of the other dogs to be found"
    val junk = "00000 11111 22222 33333 44444 55555 66666 77777 " * 8
    val df = Seq(
      // ok.com: two good docs
      (1L, good, "https://ok.com/a"), (2L, good + " again", "https://ok.com/b"),
      // spam.com: one good-LOOKING doc hiding among junk — domain
      // aggregate must take it down anyway
      (3L, good, "https://spam.com/sneaky"),
      (4L, junk, "https://spam.com/x"), (5L, junk, "https://spam.com/y"),
      (6L, junk, "https://spam.com/z"),
      // no URL: no signal, always kept
      (7L, good, null.asInstanceOf[String])
    ).toDF("doc_id", "text", "url")
    val kept = graft.text.Curation.dropLowQualityDomains(
        df, "url", "text", minMeanQuality = 0.5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 7L), kept.toString)
    // the farm cap: ok.com exceeds maxDocsPerDomain=1 and dies whole
    val capped = graft.text.Curation.dropLowQualityDomains(
        df.filter(col("doc_id") <= 2 || col("doc_id") === 7),
        "url", "text", minMeanQuality = 0.0, maxDocsPerDomain = 1L)
      .select("doc_id").as[Long].collect().toSet
    assert(capped == Set(7L), capped.toString)
    // the stats frame itself: one row per domain (null URL → "")
    val stats = graft.text.Curation.domainQuality(df, "url", "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stats == Map("ok.com" -> 2L, "spam.com" -> 4L, "" -> 1L))
  }

  test("temperatureMixture: tau=1 reproduces natural proportions, " +
       "tau=0 is uniform, tau=0.5 sits between (upsamples the small " +
       "source); deterministic") {
    // 60 / 22 / 18 docs — every stratum holds enough to fill its
    // quota at all three taus (the under-populated cap is
    // resampleToMixture's own spec'd behavior, not under test here)
    val docs = (0L until 100L).map(i =>
      (i, if (i < 60) "big" else if (i < 82) "mid" else "tiny"))
      .toDF("doc_id", "source")
    def quotas(tau: Double) = Curation.temperatureMixture(
        docs, "doc_id", "source", tau, totalTarget = 50L)
      .groupBy("source").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    // tau=1: exact natural proportions → 30/11/9
    assert(quotas(1.0) == Map("big" -> 30L, "mid" -> 11L, "tiny" -> 9L))
    // tau=0: uniform thirds of 50 → 17/17/16 (equal fracs, name
    // tiebreak gives big and mid the +1s)
    assert(quotas(0.0) == Map("big" -> 17L, "mid" -> 17L, "tiny" -> 16L))
    // tau=0.5: ∝ sqrt(60,22,18) → shares 23.22/14.06/12.72 →
    // quotas 23/14/13 — tiny upsampled 13 vs natural 9, big 23 vs 30
    val half = quotas(0.5)
    assert(half == Map("big" -> 23L, "mid" -> 14L, "tiny" -> 13L), half)
    // deterministic id selection across runs
    val a = Curation.temperatureMixture(docs, "doc_id", "source", 0.5, 50L)
      .select("doc_id").as[Long].collect().toSet
    val b = Curation.temperatureMixture(docs, "doc_id", "source", 0.5, 50L)
      .select("doc_id").as[Long].collect().toSet
    assert(a == b && a.size == 50)
  }

  test("resampleToMixture: exact quotas, deterministic selection, " +
       "under-populated cap, unmapped strata dropped") {
    val docs = (0L until 100L).map(i =>
      (i, if (i < 60) "a" else if (i < 70) "b" else "c"))
      .toDF("doc_id", "source")
    // weights over a (60 docs), b (10 docs), c unmapped (30 docs)
    val out = Curation.resampleToMixture(docs, "doc_id", "source",
      Map("a" -> 0.5, "b" -> 0.5), totalTarget = 40L)
    val byStratum = out.groupBy("source").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(byStratum == Map("a" -> 20L, "b" -> 10L)) // b capped at 10
    // deterministic: identical id set across runs
    val ids1 = out.select("doc_id").as[Long].collect().toSet
    val ids2 = Curation.resampleToMixture(docs, "doc_id", "source",
        Map("a" -> 0.5, "b" -> 0.5), totalTarget = 40L)
      .select("doc_id").as[Long].collect().toSet
    assert(ids1 == ids2 && ids1.size == 30)
    // a different seed selects a different (same-sized) set
    val ids3 = Curation.resampleToMixture(docs, "doc_id", "source",
        Map("a" -> 0.5, "b" -> 0.5), totalTarget = 40L, seed = 7L)
      .select("doc_id").as[Long].collect().toSet
    assert(ids3.size == 30 && ids3 != ids1)
    intercept[IllegalArgumentException] {
      Curation.resampleToMixture(docs, "doc_id", "source",
        Map("a" -> 0.0), totalTarget = 10L)
    }
    // largest-remainder apportionment: equal thirds of 10 -> floors
    // 3+3+3, the leftover unit goes to the name tie-break winner "a";
    // the kept total equals totalTarget EXACTLY
    val thirds = Curation.resampleToMixture(docs, "doc_id", "source",
      Map("a" -> 1.0, "b" -> 1.0, "c" -> 1.0), totalTarget = 10L)
    val byS = thirds.groupBy("source").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(byS == Map("a" -> 4L, "b" -> 3L, "c" -> 3L))
  }

  test("paragraphDedup splits CRLF paragraph breaks too") {
    val df = Seq(
      (1L, "shared para\r\n\r\nunique one"),
      (2L, "shared para\n\nunique two")).toDF("doc_id", "text")
    val out = Curation.paragraphDedup(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    // doc2's "shared para" is a repeat of doc1's CRLF-separated copy
    assert(out(0).getLong(3) == 2L)       // doc1 keeps both paras
    assert(out(1).getLong(3) == 1L,       // doc2 keeps only the unique one
      s"CRLF paragraph not deduped: ${out.mkString(";")}")
  }

  test("tokenBalancedShards (r16): shard token mass is bounded by " +
       "target+maxDoc, assignment is reproducible across input " +
       "partitionings, null text carries zero mass") {
    import graft.text.Curation
    val docs = (1L to 400L).map { i =>
      val words = 1 + (i % 37).toInt
      (i, if (i % 97 == 0) null else Seq.fill(words)("w").mkString(" "))
    }.toDF("doc_id", "text")
    val target = 500L
    val a = Curation.tokenBalancedShards(docs.repartition(3),
      "doc_id", "text", target, seed = 7L)
    val b = Curation.tokenBalancedShards(docs.repartition(11),
      "doc_id", "text", target, seed = 7L)
    val mapA = a.select("doc_id", "shard").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val mapB = b.select("doc_id", "shard").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(mapA == mapB,
      "shard assignment must not depend on the input partitioning")
    // every shard's token mass is in [1, target + maxDoc): token-
    // contiguous quotient packing can overshoot by at most one doc
    val mass = a.groupBy("shard").agg(sum("n_tokens").as("m"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val maxDoc = 37L
    assert(mass.values.forall(m => m > 0 && m < target + maxDoc),
      s"unbalanced shards: $mass")
    // shards are contiguous 0..K with only the last one light
    val ids = mass.keySet
    assert(ids == (0L until ids.size).toSet, s"non-contiguous: $ids")
    assert(mass.filter(_._2 < target - maxDoc).keySet.subsetOf(
      Set(ids.max)), "only the tail shard may run light")
    // null text = zero mass, still assigned
    assert(mapA.contains(97L) && mapA.contains(194L))
    // different seed = different order
    val c = Curation.tokenBalancedShards(docs, "doc_id", "text",
      target, seed = 8L)
    val mapC = c.select("doc_id", "shard").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(mapC != mapA, "a new seed must reorder")
    // appended-column collisions fail loudly up front
    val e = intercept[IllegalArgumentException] {
      Curation.tokenBalancedShards(
        docs.withColumn("shard", lit(0)), "doc_id", "text", target)
    }
    assert(e.getMessage.contains("shard"))
  }
}
