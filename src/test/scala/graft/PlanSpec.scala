package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Plan-shape assertions (BASELINE.md: "our DSL plans should match
  * hand-written Spark DataFrame code"). These lock in the scale-critical
  * properties: filter/column pushdown to the parquet scan, broadcast for
  * replicated joins, partial aggregation, top-k instead of global sort,
  * semi/anti join planning.
  */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString

  test("q01: filters and column pruning reach the parquet scan") {
    val p = plan("q01_filter")
    assert(p.contains("PushedFilters: ["))
    assert(p.contains("l_quantity") && p.contains("IsNotNull"))
    // scan schema carries only the 5 referenced columns, not all 11
    assert(!p.contains("l_shipdate") && !p.contains("l_tax"))
  }

  test("q08: replicated strategy plans a BroadcastHashJoin") {
    assert(plan("q08_join_broadcast").contains("BroadcastHashJoin"))
  }

  test("q74 merge-sparse: sparse probe keys PUSH into the indexed " +
       "side's scan (index-seek analog); forced bloom agrees") {
    val p = plan("q74_merge_sparse")
    // the big side's parquet scan carries the probe keys as a pushed
    // In filter — row groups outside the key range are never read
    assert(p.contains("PushedFilters: [In(l_orderkey"), p.take(4000))
    val seek = SparkEntry.queries("q74_merge_sparse")(spark, dir)
      .collect().map(_.toSeq).toSet
    spark.conf.set("graft.sparsejoin.maxKeys", "0") // force the bloom form
    try {
      val q = SparkEntry.queries("q74_merge_sparse")(spark, dir)
      assert(!q.queryExecution.executedPlan.toString
        .contains("PushedFilters: [In(l_orderkey"))
      assert(q.collect().map(_.toSeq).toSet == seek)
    } finally spark.conf.unset("graft.sparsejoin.maxKeys")
  }

  test("q03: fused group-agg does partial aggregation, no bags") {
    val p = plan("q03_group_agg")
    assert(p.contains("partial_")) // map-side combine (Pig's combiner)
    assert(!p.contains("collect_list"))
  }

  test("FuseBagSizeToCount elides bags consumed only via size()") {
    GraftSession.tune(spark)
    val o = sf("orders")
    val bagged = o.groupBy("o_custkey")
      .agg(collect_list(struct(o.columns.map(col): _*)).as("b"))
      .select(col("o_custkey"), size(col("b")).as("n"))
    val optimized = bagged.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("collect_list"))
    assert(optimized.contains("count"))
    // results identical to a plain count
    val expect = o.groupBy("o_custkey").count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val got = bagged.collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong)).toMap
    assert(got == expect)
    // and NOT applied when the bag has another consumer
    val both = o.groupBy("o_custkey")
      .agg(collect_list(struct(o.columns.map(col): _*)).as("b"))
      .select(col("o_custkey"), size(col("b")).as("n"), col("b"))
    assert(both.queryExecution.optimizedPlan.toString.contains("collect_list"))
  }

  test("FuseBagSizeToCount: size(array_distinct(bag[.field])) fuses to " +
       "count(DISTINCT) and null field values still count as one") {
    GraftSession.tune(spark)
    import spark.implicits._
    // doc 1: values a, a, null, b → distinct {a, b, null} = 3
    // doc 2: values null, null     → distinct {null} = 1
    // doc 3: values c              → 1
    val df = Seq((1L, Some("a")), (1L, Some("a")), (1L, None),
      (1L, Some("b")), (2L, None), (2L, None), (3L, Some("c")))
      .toDF("k", "v")
    val viaStructBag = df.groupBy("k")
      .agg(collect_list(struct(col("k"), col("v"))).as("b"))
      .select(col("k"), size(array_distinct(col("b.v"))).as("n"))
    val opt = viaStructBag.queryExecution.optimizedPlan.toString
    assert(!opt.contains("collect_list"), s"bag not elided:\n$opt")
    assert(opt.contains("count(distinct"), s"no distinct count:\n$opt")
    val got = viaStructBag.collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(got == Map(1L -> 3, 2L -> 1, 3L -> 1))
    // bare collect_list(x): nulls never enter the bag, plain fusion
    val viaBag = df.groupBy("k")
      .agg(collect_list(col("v")).as("b"))
      .select(col("k"), size(array_distinct(col("b"))).as("n"))
    assert(!viaBag.queryExecution.optimizedPlan.toString
      .contains("collect_list"))
    assert(viaBag.collect().map(r => (r.getLong(0), r.getInt(1))).toMap ==
      Map(1L -> 2, 2L -> 0, 3L -> 1))
  }

  test("q05: bag query (size-only consumer) gets the fused count plan") {
    val p = plan("q05_group_bag")
    assert(!p.contains("collect_list")) // FuseBagSizeToCount applied
  }

  test("q53: frontend GROUP+FOREACH fuses to partial aggregation, no bags") {
    val p = plan("q53_piglatin")
    assert(p.contains("partial_"))      // map-side combine (Pig's combiner)
    assert(!p.contains("collect_list")) // bag never materialized
  }

  test("q67: frontend GROUP ALL fuses — no whole-relation bag") {
    val p = plan("q67_piglatin_groupall")
    assert(p.contains("partial_"))
    assert(!p.contains("collect_list"))
  }

  test("q14/q15: rank plans have no single-partition stage") {
    // the 2-pass rank design (PORank analog) must never collapse the data
    // to one partition the way rank() OVER (ORDER BY …) does
    assert(!plan("q14_rank").contains("SinglePartition"))
    assert(!plan("q15_rank_dense").contains("SinglePartition"))
  }

  test("q14/q15/q16: rank stays in Catalyst — no RDD scan node") {
    // the POCounter/PORank 2-pass runs on monotonically_increasing_id +
    // broadcast offsets, not a df.rdd round-trip (which would exit
    // codegen/Tungsten into Row serde twice)
    for (q <- Seq("q14_rank", "q15_rank_dense", "q16_rank_rownum"))
      assert(!plan(q).contains("ExistingRDD"), s"$q plans an RDD scan")
  }

  test("rank over a shuffle-free scan skips the two-pass persist") {
    // deterministicNarrow fast path (ADVICE r8 #7): file splits replay
    // identically across the count and join jobs, so the pid-stamped
    // frame need not be cached — at 100 TB that is the difference
    // between caching the table and caching nothing
    GraftSession.unpersistAll()
    val scan = spark.read.parquet(s"$dir/lineitem.parquet")
    val ranked = graft.operators.Rank.rowNumber(scan, "r")
    assert(!ranked.queryExecution.executedPlan.toString
      .contains("InMemoryTableScan"), "narrow rank should not persist")
    // correctness of the unpersisted path: contiguous 1..n
    val n = scan.count()
    val stats = ranked.agg(min(col("r")), max(col("r")),
      countDistinct(col("r"))).head()
    assert(stats.getLong(0) == 1L && stats.getLong(1) == n &&
      stats.getLong(2) == n)
    // a shuffle-rooted input must still persist (two jobs would race
    // mapper completion order otherwise)
    val shuffled = scan.repartition(7, col("l_orderkey"))
    val rankedShuffled = graft.operators.Rank.rowNumber(shuffled, "r")
    assert(rankedShuffled.queryExecution.executedPlan.toString
      .contains("InMemoryTableScan"), "shuffled rank must persist")
    GraftSession.unpersistAll()
  }

  test("entry: order+limit plans TakeOrderedAndProject (no global sort)") {
    val p = SparkEntry.entry(spark).queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("q25/q26: semi and anti joins plan as such") {
    assert(plan("q25_semijoin").contains("LeftSemi"))
    assert(plan("q26_antijoin").contains("LeftAnti"))
  }

  test("q27: scalar projection broadcasts the 1-row aggregate") {
    assert(plan("q27_scalar").contains("BroadcastNestedLoopJoin") ||
           plan("q27_scalar").contains("BroadcastExchange"))
  }

  test("q13: order-by + limit avoids a full global sort") {
    assert(plan("q13_order_limit").contains("TakeOrderedAndProject"))
  }

  test("ann brute-force: single scan, no shuffle before the top-k") {
    val emb = sf("embeddings")
    val q = Seq.fill(64)(0.1f)
    val p = graft.ml.Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, 5)
      .queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("Exchange hashpartitioning"))
  }

  test("minhash signatures partial-aggregate before the exchange") {
    val df = sf("documents")
    val shingled = df.select(col("doc_id"),
      graft.text.Dedup.wordNgrams(col("text"), 3).as("shingles"))
    val p = graft.text.Dedup.minhashSignatures(shingled, "doc_id", 16)
      .queryExecution.executedPlan.toString
    assert(p.contains("partial_min") || p.contains("partial_"))
  }

  test("map-key pruning: literal lookups parse a struct of used keys") {
    import org.apache.spark.sql.catalyst.expressions.JsonToStructs
    import org.apache.spark.sql.types.{MapType, StringType, LongType, StructType}
    // non-foldable source (a literal Seq would constant-fold the parse)
    val df = spark.range(2).select(
      when(col("id") === 0, """{"a":1,"b":2,"c":3}""")
        .otherwise("""{"a":4}""").as("js"))
    def m = from_json(col("js"), MapType(StringType, LongType))
    val q = df.select(element_at(m, "a").as("a"), element_at(m, "b").as("b"))
    val jsons = q.queryExecution.optimizedPlan.expressions
      .flatMap(_.collect { case j: JsonToStructs => j })
    assert(jsons.nonEmpty)
    assert(jsons.forall(_.schema.isInstanceOf[StructType]))
    assert(jsons.forall(
      _.schema.asInstanceOf[StructType].fieldNames.toSeq == Seq("a", "b")))
    // semantics preserved: present keys read, absent keys null
    assert(q.collect().map(r => (Option(r.get(0)), Option(r.get(1)))).toSeq ==
      Seq((Some(1L), Some(2L)), (Some(4L), None)))
  }

  test("map-key pruning bails when the whole map is also used") {
    import org.apache.spark.sql.catalyst.expressions.JsonToStructs
    import org.apache.spark.sql.types.{MapType, StringType, LongType}
    val df = spark.range(1).select(
      concat(lit("""{"a":1,"b":"""), col("id") + 2, lit("}")).as("js"))
    def m = from_json(col("js"), MapType(StringType, LongType))
    val q = df.select(element_at(m, "a").as("a"), map_keys(m).as("ks"))
    val jsons = q.queryExecution.optimizedPlan.expressions
      .flatMap(_.collect { case j: JsonToStructs => j })
    assert(jsons.exists(_.schema.isInstanceOf[MapType]))
    assert(q.head().getSeq[String](1).sorted == Seq("a", "b"))
  }

  test("q38: map lookup parses only the accessed key (pruned struct)") {
    import org.apache.spark.sql.catalyst.expressions.JsonToStructs
    import org.apache.spark.sql.types.StructType
    val q = graft.SparkEntry.queries("q38_map_lookup")(
      spark, "/root/testdata/sf0.001")
    val jsons = q.queryExecution.optimizedPlan.expressions
      .flatMap(_.collect { case j: JsonToStructs => j })
    assert(jsons.nonEmpty && jsons.forall(_.schema.isInstanceOf[StructType]))
  }

  test("flatten past join: explode moves above the join it feeds") {
    import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join => LJoin}
    // PigMix L1/L2 pattern: FLATTEN a bag column, then join on a per-row
    // key — the join must see the pre-explode rows
    val docs = sf("orders")
      .select(col("o_custkey"), col("o_orderkey"),
        array(col("o_orderkey"), -col("o_orderkey")).as("bag"))
      .select(col("o_custkey"), col("o_orderkey"),
        explode(col("bag")).as("elem"))
    val dim = sf("customer").select(col("c_custkey"), col("c_mktsegment"))
    val q = docs.join(dim, col("o_custkey") === col("c_custkey"))
    val opt = q.queryExecution.optimizedPlan
    // the Generate must sit ABOVE the Join in the optimized plan
    val genDepth = opt.collect { case g: Generate => g }
    val joinAboveGen = opt.collectFirst { case g: Generate =>
      g.find { case _: LJoin => true; case _ => false }.isDefined
    }
    assert(genDepth.nonEmpty && joinAboveGen.contains(true),
      s"explode did not move above the join:\n$opt")
    // and the rewritten plan computes the same result as explode-first
    val expected = sf("orders")
      .select(col("o_custkey"), col("o_orderkey"),
        array(col("o_orderkey"), -col("o_orderkey")).as("bag"))
      .join(dim, col("o_custkey") === col("c_custkey"))
      .select(col("o_custkey"), col("o_orderkey"),
        explode(col("bag")).as("elem"), col("c_custkey"),
        col("c_mktsegment"))
    assert(q.columns.toSeq ==
      Seq("o_custkey", "o_orderkey", "elem", "c_custkey", "c_mktsegment"))
    assert(q.exceptAll(expected).isEmpty && expected.exceptAll(q).isEmpty)
  }

  test("flatten stays put when the join key IS the exploded element") {
    import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join => LJoin}
    val docs = sf("orders")
      .select(array(col("o_custkey")).as("bag"))
      .select(explode(col("bag")).as("k"))
    val dim = sf("customer").select(col("c_custkey"))
    val q = docs.join(dim, col("k") === col("c_custkey"))
    val opt = q.queryExecution.optimizedPlan
    // the join condition references the generator output — no reorder
    val genWithJoinInside = opt.collectFirst { case g: Generate =>
      g.find { case _: LJoin => true; case _ => false }.isDefined
    }
    assert(!genWithJoinInside.contains(true))
    assert(q.count() == sf("orders").join(
      dim, col("o_custkey") === col("c_custkey")).count())
  }

  test("q83: eval grams broadcast — the corpus probe side never shuffles " +
       "on gram") {
    val p = plan("q83_decontaminate")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q81: top-gram counts partial-aggregate; no per-row gram quadratic") {
    val p = plan("q81_repetition")
    // both (id, gram) count stages combine map-side before the exchange,
    // and the dup-line side is pure column work (no extra shuffle): the
    // only exchanges are the two gram aggs + the doc_id joins
    assert(p.contains("partial_count") || p.contains("partial_"))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"))
  }

  test("q84: bloom pre-filter probes big side natively; AQE broadcasts " +
       "the genuinely small side at runtime") {
    val df = SparkEntry.queries("q84_bloom_join")(spark, dir)
    val p0 = df.queryExecution.executedPlan.toString
    // the codegen might_contain predicate sits on the lineitem scan side
    // (the pre-shuffle cut is the operator's whole point at 100 TB)…
    assert(p0.contains("might_contain"), s"no native bloom probe:\n$p0")
    // …and static planning must NOT have broadcast from estimates (the
    // engine turns estimate-based broadcasts off — garbage estimates
    // behind HOF aggregates once elected a 21M-row build); the small
    // side broadcasts at RUNTIME from its real size instead
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"AQE should convert to broadcast from real sizes:\n$p")
  }

  test("q87: stratified sample is a pure scan-side filter (no exchange)") {
    val p = plan("q87_stratified_sample")
    assert(!p.contains("Exchange"), s"sampling must not shuffle:\n$p")
    assert(p.contains("*("), "filter should be whole-stage codegen")
    // the LCG filter reaches the scan as a data filter; only the three
    // referenced columns are read
    assert(p.contains("DataFilters: [isnotnull(doc_id"), p)
    assert(p.contains("ReadSchema: struct<doc_id:bigint,lang:string,source:string>"))
  }

  test("q88: paragraph dedup shuffles digests, never paragraph text") {
    val p = plan("q88_paragraph_dedup")
    // the first-occurrence reduction partial-aggregates before its
    // exchange (map-side combine on the 128-bit digest pair)
    assert(p.contains("partial_min") || p.contains("partial_"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"))
    // hash partitioning is on the digest columns, not the text
    assert(p.contains("hashpartitioning(pkey"), s"expected digest-keyed shuffle:\n$p")
  }

  test("q89: line filter is one codegen pass, zero shuffles") {
    val p = plan("q89_line_filter")
    assert(!p.contains("Exchange"), s"line filter must not shuffle:\n$p")
    assert(p.contains("*("), "projection should be whole-stage codegen")
  }

  test("q91: BM25 prunes postings to the broadcast query vocabulary " +
       "before the (doc,term) shuffle; top-k is a group-limit") {
    val p = plan("q91_bm25")
    assert(p.contains("BroadcastHashJoin"), p)
    // the query-term semi prune must sit BELOW the partial aggregate:
    // the broadcast join appears after (deeper than) the first partial_
    val aggAt = p.indexOf("partial_count")
    val bjAt = p.lastIndexOf("BroadcastHashJoin")
    assert(aggAt >= 0 && bjAt > aggAt,
      s"query-vocab prune should be below the tf partial agg:\n$p")
    // per-query top-k never globally sorts the scored set
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("q92: LM training counts partial-aggregate; V broadcasts back") {
    val p = plan("q92_lm_score")
    assert(p.contains("partial_count"), p)
    assert(p.contains("BroadcastExchange"), p)  // the 1-row vsize frame
    // the only nested-loop join allowed is the 1-row vsize cross frame
    assert(!p.contains("CartesianProduct"), p)
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1, p)
  }

  test("q94: sequence packing is one per-stratum sort, no global sort") {
    val p = plan("q94_seq_pack")
    // exactly one exchange: the hash partition by stratum for the window
    assert("Exchange hashpartitioning\\(source".r
      .findAllIn(p).size == 1, p)
    assert(!p.contains("rangepartitioning"),
      s"packing must not globally sort:\n$p")
  }
}
