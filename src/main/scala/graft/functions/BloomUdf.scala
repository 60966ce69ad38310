package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graft.bridge
import org.apache.spark.util.sketch.BloomFilter

/** The user-facing BuildBloom / Bloom UDF pair (reference:
  * P/builtin/BuildBloom.java:54 + P/builtin/Bloom.java:72 — an algebraic
  * filter builder stored to a file, probed by a later FilterFunc; the
  * nightly `Bloom` e2e group, which the reference itself can only run on
  * mapred/tez because of PIG-5117).
  *
  * Spark-first realization: the build side is Catalyst's own
  * [[BloomFilterAggregate]] over `xxhash64(key)` — a true partial
  * aggregate (per-partition sketches merged at the final stage, exactly
  * the shape Spark's injected runtime filters use), so `GROUP ALL;
  * GENERATE BuildBloom(b.key)` builds distributed with no bag
  * materialization at any scale. The probe side is the codegen-native
  * [[BloomFilterMightContain]] predicate over the same hash — one hash +
  * one bit-test per row, no UDF boundary on the 100 TB side.
  *
  * Divergences (documented): the serialized form is Spark's sketch
  * format rendered as base64 chararray (the reference writes raw
  * DataByteArray bytes; base64 survives any text/parquet STORE
  * round-trip), and the hash-kind ctor argument ('Hash.JENKINS_HASH' /
  * 'Hash.MURMUR_HASH') is accepted but ignored — membership semantics
  * (no false negatives, bounded false positives) are preserved, bit
  * layout is not. Nulls hash to the xxhash64 seed on BOTH sides, so a
  * null key behaves as one ordinary key rather than erroring.
  */
object BloomUdf {

  /** Ctor forms (BuildBloomBase ctors, BuildBloom.java:54):
    *  - (hashType, 'fixed', vectorSize, nbHash) → m = vectorSize bits
    *  - (hashType, numElements, desiredFalsePositive) → optimal m
    * Returns (estimatedItems, numBits) for [[BloomFilterAggregate]]
    * (which derives its own hash count — nbHash is advisory here). */
  def buildParams(ctor: Seq[String]): (Long, Long) = ctor.map(_.trim) match {
    case Seq(_, mode, bits, _) if mode.equalsIgnoreCase("fixed") =>
      val m = math.max(bits.toLong, 64L)
      (m, m)
    case Seq(_, n, fpp) =>
      val items = math.max(n.toLong, 1L)
      val p = fpp.toDouble
      require(p > 0 && p < 1, s"BuildBloom: false-positive rate $p not in (0,1)")
      // optimalNumOfBits: m = -n·ln(p) / (ln 2)²
      val m = math.max(64L,
        math.ceil(-items * math.log(p) / (math.log(2) * math.log(2))).toLong)
      (items, m)
    case other => throw new IllegalArgumentException(
      "BuildBloom expects ctor args (hashType, 'fixed', vectorSize, nbHash) " +
        s"or (hashType, numElements, fpp); got ${other.mkString(", ")}")
  }

  /** Aggregate column: distributed bloom build over the key(s), emitted
    * as base64 chararray so any STORE format round-trips it. */
  def buildBloom(keys: Seq[Column], ctor: Seq[String]): Column = {
    val (items, bits) = buildParams(ctor)
    val agg = new BloomFilterAggregate(
      bridge.expression(xxhash64(keys: _*)),
      Literal(items), Literal(bits))
    // strip MIME chunking CRLFs: the payload must stay a single line so
    // a PigStorage text STORE round-trips it
    regexp_replace(base64(bridge.column(agg.toAggregateExpression())),
      "[\\r\\n]", "")
  }

  /** Fallback for the non-fused (bag-materialized) path: build the
    * filter per row from an already-collected bag of xxhash64 longs.
    * Same membership semantics as the aggregate (putLong on the same
    * hash), used only when GROUP+FOREACH fusion aborted. */
  def buildBloomFromHashes(hashes: Column, ctor: Seq[String]): Column = {
    val (items, bits) = buildParams(ctor)
    val build = udf { hs: Seq[java.lang.Long] =>
      val bf = BloomFilter.create(items, bits)
      hs.foreach(h => if (h != null) bf.putLong(h))
      val bos = new ByteArrayOutputStream()
      bf.writeTo(bos)
      java.util.Base64.getEncoder.encodeToString(bos.toByteArray)
    }
    build(hashes)
  }

  def deserialize(b64: String): BloomFilter =
    // MIME decoder: Spark's base64() chunks with CRLF every 76 chars
    // (getMimeDecoder also accepts the unchunked basic form)
    BloomFilter.readFrom(new ByteArrayInputStream(
      java.util.Base64.getMimeDecoder.decode(b64.trim)))

  /** Merge 1+ serialized filters (part files of a stored build) into the
    * single binary literal the probe predicate embeds. */
  def mergedBytes(parts: Seq[String]): Array[Byte] = {
    require(parts.nonEmpty, "Bloom: no serialized filter values found")
    val merged = parts.map(deserialize).reduce { (a, b) =>
      a.mergeInPlace(b); a
    }
    val bos = new ByteArrayOutputStream()
    merged.writeTo(bos)
    bos.toByteArray
  }

  /** Probe predicate: codegen-native might-contain over the driver-held
    * filter bytes (rides into the plan as one BinaryType literal). */
  def probe(filterBytes: Array[Byte], keys: Seq[Column]): Column =
    bridge.column(BloomFilterMightContain(
      bridge.expression(lit(filterBytes)),
      bridge.expression(xxhash64(keys: _*))))

  /** Probe with empty-build semantics: a build over ZERO keys (empty
    * GROUP ALL input → no aggregate row / null scalar) means "no key is
    * a member" — match nothing, never error. BloomFilterAggregate
    * itself returns null for an empty buffer, so this is the only
    * faithful reading of an absent filter. */
  def probeOrEmpty(parts: Seq[String], keys: Seq[Column]): Column =
    if (parts.forall(p => p == null || p.trim.isEmpty)) lit(false)
    else probe(mergedBytes(parts.filter(p => p != null && p.trim.nonEmpty)),
      keys)
}
