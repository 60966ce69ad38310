package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector hot path (SURVEY §4.3 #4:
  * promote hot builtins to codegen'd Expressions). The array-HOF form of
  * cosine similarity (`zip_with` + `aggregate`) evaluates interpreted
  * lambdas per element; this expression compiles to a tight primitive
  * float loop inside whole-stage codegen — no per-element boxing, no
  * closure dispatch. Accumulation order matches the HOF form (index
  * order, double accumulator), so results are bit-identical.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_similarity"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toFloatArray()
    val y = b.asInstanceOf[ArrayData].toFloatArray()
    val n = math.min(x.length, y.length)
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      dot += x(i).toDouble * y(i).toDouble
      nx += x(i).toDouble * x(i).toDouble
      ny += y(i).toDouble * y(i).toDouble
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) 0.0
    else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      s"""
        float[] $x = $a.toFloatArray();
        float[] $y = $b.toFloatArray();
        int $n = Math.min($x.length, $y.length);
        double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $dot += (double) $x[$i] * (double) $y[$i];
          $nx  += (double) $x[$i] * (double) $x[$i];
          $ny  += (double) $y[$i] * (double) $y[$i];
        }
        ${ev.value} = ($nx == 0.0 || $ny == 0.0)
          ? 0.0 : $dot / (Math.sqrt($nx) * Math.sqrt($ny));
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Dot product twin (same codegen shape), for pre-normalized embeddings —
  * at 100 TB you normalize once at ingest and rank by dot alone. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toFloatArray()
    val y = b.asInstanceOf[ArrayData].toFloatArray()
    val n = math.min(x.length, y.length)
    var dot = 0.0; var i = 0
    while (i < n) { dot += x(i).toDouble * y(i).toDouble; i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
        float[] $x = $a.toFloatArray();
        float[] $y = $b.toFloatArray();
        int $n = Math.min($x.length, $y.length);
        double $dot = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $dot += (double) $x[$i] * (double) $y[$i];
        }
        ${ev.value} = $dot;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Random-hyperplane LSH signature: bit p is the sign of the projection of
  * the vector onto pseudo-random hyperplane p. The hyperplane's ±1
  * components are derived per (plane, dim) from a stateless SplitMix64-ish
  * bit-mix — no RNG state, so the same signature is computed on every
  * executor AND on the driver ([[VectorExpressions.signatureOf]] is the
  * bit-identical Scala twin used to bucket a literal query vector).
  *
  * Native expression (not array HOFs) because `zip_with`/`aggregate`
  * lambdas are interpreted per element: for a 64-dim vector and 32 planes
  * that is ~2k closure dispatches per row vs one tight primitive loop in
  * whole-stage codegen here.
  */
case class HyperplaneSignature(child: Expression, numPlanes: Int,
                               planeOffset: Int = 0)
    extends UnaryExpression {
  require(numPlanes >= 1 && numPlanes <= 63,
    s"numPlanes must be in [1, 63], got $numPlanes")
  require(planeOffset >= 0, s"planeOffset must be >= 0, got $planeOffset")

  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_signature"

  override def nullSafeEval(v: Any): Any =
    VectorExpressions.signatureOfArray(
      v.asInstanceOf[ArrayData].toFloatArray(), numPlanes, planeOffset)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val x = ctx.freshName("x"); val sig = ctx.freshName("sig")
      val p = ctx.freshName("p"); val i = ctx.freshName("i")
      val proj = ctx.freshName("proj"); val h = ctx.freshName("h")
      s"""
        float[] $x = $a.toFloatArray();
        long $sig = 0L;
        for (int $p = 0; $p < $numPlanes; $p++) {
          double $proj = 0.0;
          for (int $i = 0; $i < $x.length; $i++) {
            long $h = ($p + $planeOffset) * 0x9E3779B97F4A7C15L + $i * 0xC2B2AE3D27D4EB4FL;
            $h ^= ($h >>> 33); $h *= 0xFF51AFD7ED558CCDL; $h ^= ($h >>> 33);
            $proj += ((($h & 1L) == 1L) ? 1.0 : -1.0) * (double) $x[$i];
          }
          if ($proj >= 0.0) $sig |= (1L << $p);
        }
        ${ev.value} = $sig;
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Top-`probes` k-means cells of a vector by centroid cosine, as ONE
  * primitive loop over a flattened centroid matrix. The HOF alternative
  * (`transform` over k centroid literals + array_sort) evaluates k
  * INTERPRETED cosine lambdas plus a k-element struct sort PER ROW —
  * with auto-k (k ∝ corpus size) that made cell assignment the
  * quadratic term of SemDedup/IVF (measured r12: 100× corpus → 155×
  * wall, ~13 min of a 790 s q93 run in assignment alone). Here the
  * matrix rides the expression as one reference object (one broadcast
  * per task), centroid norms are precomputed once, and top-p selection
  * is p passes over the sim array (p ≤ ~8).
  *
  * Order: descending similarity, ties by LOWER cell id; NaN sims are
  * skipped; an unassignable vector (k = 0 or all-NaN) gets cell 0 —
  * the same fallbacks as the small-k literal argmax chain. */
case class NearestCells(child: Expression, centroids: Array[Array[Float]],
                        probes: Int) extends UnaryExpression {
  require(probes >= 1, s"probes must be >= 1, got $probes")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_cells"

  // flattened row-major matrix + per-centroid squared norms, built once
  @transient private lazy val packed: (Array[Float], Array[Double], Int) = {
    val k = centroids.length
    val dim = if (k == 0) 0 else centroids.map(_.length).max
    val flat = new Array[Float](k * dim)
    val norms = new Array[Double](k)
    var c = 0
    while (c < k) {
      val ct = centroids(c)
      var i = 0; var nn = 0.0
      while (i < ct.length) {
        flat(c * dim + i) = ct(i)
        nn += ct(i).toDouble * ct(i).toDouble
        i += 1
      }
      norms(c) = nn
      c += 1
    }
    (flat, norms, dim)
  }

  override def nullSafeEval(v: Any): Any = {
    val (flat, norms, dim) = packed
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      VectorExpressions.nearestCellsOf(
        v.asInstanceOf[ArrayData].toFloatArray(), flat, norms, dim,
        centroids.length, probes))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (flat, norms, dim) = packed
    val flatRef = ctx.addReferenceObj("cellsFlat", flat, "float[]")
    val normsRef = ctx.addReferenceObj("cellsNorms", norms, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      s"""
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
          graft.functions.VectorExpressions.nearestCellsOf(
            $a.toFloatArray(), $flatRef, $normsRef, $dim,
            ${centroids.length}, $probes));
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** SimHash signature of a token-HASH array, in one row-local pass: bit
  * i of the result is set iff Σ over tokens (with multiplicity) of
  * (±1 by bit i of the token hash) is > 0 — bit-for-bit the classic
  * 64-conditional-sum aggregation, WITHOUT the token explode or the
  * 64-column groupBy shuffle (per-doc signatures are row-local; only
  * the relational form needed a shuffle). Empty or null arrays yield
  * NULL — zero-token docs emit no signature, the documented
  * [[graft.text.Dedup.simhash]] contract. Long counters: a document
  * cannot overflow them. */
case class SimhashSign(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash_sign"

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) null
    else {
      val cnt = new Array[Long](64)
      var j = 0
      while (j < n) {
        val h = arr.getLong(j)
        var i = 0
        while (i < 64) {
          cnt(i) += (((h >>> i) & 1L) * 2 - 1); i += 1
        }
        j += 1
      }
      var sig = 0L
      var i = 0
      while (i < 64) { if (cnt(i) > 0) sig |= (1L << i); i += 1 }
      sig
    }
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cnt = ctx.freshName("cnt"); val h = ctx.freshName("h")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val sig = ctx.freshName("sig"); val n = ctx.freshName("n")
      s"""
        int $n = $a.numElements();
        if ($n == 0) {
          ${ev.isNull} = true;
        } else {
          long[] $cnt = new long[64];
          for (int $j = 0; $j < $n; $j++) {
            long $h = $a.getLong($j);
            for (int $i = 0; $i < 64; $i++) {
              $cnt[$i] += ((($h >>> $i) & 1L) * 2 - 1);
            }
          }
          long $sig = 0L;
          for (int $i = 0; $i < 64; $i++) {
            if ($cnt[$i] > 0) $sig |= (1L << $i);
          }
          ${ev.value} = $sig;
        }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorExpressions {
  import org.apache.spark.sql.graft.bridge

  def cosine_sim(a: Column, b: Column): Column =
    bridge.column(CosineSimilarity(bridge.expression(a), bridge.expression(b)))

  /** Row-local SimHash signature of a token-hash array (see
    * [[SimhashSign]]); NULL for empty/null input. */
  def simhash_sign(tokenHashes: Column): Column =
    bridge.column(SimhashSign(bridge.expression(tokenHashes)))

  /** Array of the `probes` nearest cell ids (descending cosine, ties →
    * lower id) — the scale path for cell assignment at auto-k. */
  def nearest_cells(vec: Column, centroids: Array[Seq[Float]],
                    probes: Int): Column =
    bridge.column(NearestCells(bridge.expression(vec),
      centroids.map(_.toArray), probes))

  /** Primitive-loop top-p cell selection (see [[NearestCells]]); also
    * the driver-side twin for literal query vectors. */
  def nearestCellsOf(x: Array[Float], flat: Array[Float],
                     norms: Array[Double], dim: Int, k: Int,
                     probes: Int): Array[Int] = {
    if (k == 0) return Array(0)
    var nx = 0.0
    var i = 0
    while (i < x.length) { nx += x(i).toDouble * x(i).toDouble; i += 1 }
    val sims = new Array[Double](k)
    var c = 0
    while (c < k) {
      var dot = 0.0
      val d = math.min(dim, x.length)
      var j = 0
      val base = c * dim
      while (j < d) { dot += flat(base + j).toDouble * x(j).toDouble; j += 1 }
      sims(c) =
        if (nx == 0.0 || norms(c) == 0.0) 0.0
        else dot / (math.sqrt(nx) * math.sqrt(norms(c)))
      c += 1
    }
    val p = math.min(probes, k)
    val out = new Array[Int](p)
    val taken = new Array[Boolean](k)
    var r = 0
    while (r < p) {
      var best = -1
      var bestSim = Double.NegativeInfinity
      var cc = 0
      while (cc < k) {
        if (!taken(cc) && sims(cc) > bestSim) { best = cc; bestSim = sims(cc) }
        cc += 1
      }
      if (best < 0) { out(r) = 0 } // all remaining NaN: cell-0 fallback
      else { out(r) = best; taken(best) = true }
      r += 1
    }
    out
  }

  def dot_product(a: Column, b: Column): Column =
    bridge.column(DotProduct(bridge.expression(a), bridge.expression(b)))

  def hyperplane_signature(vec: Column, numPlanes: Int,
                           planeOffset: Int = 0): Column =
    bridge.column(
      HyperplaneSignature(bridge.expression(vec), numPlanes, planeOffset))

  /** Driver-side twin of [[HyperplaneSignature]] — same mix constants,
    * same index-order double accumulation, bit-identical results. Used to
    * compute the probe bucket(s) of a literal query vector without a
    * Spark job. `planeOffset` shifts the plane indices, so a BAND's
    * bucket (planes [b·ppb, (b+1)·ppb)) is itself a signature — this is
    * what lifts the 63-plane packed-long cap for banded pipelines. */
  def signatureOfArray(x: Array[Float], numPlanes: Int,
                       planeOffset: Int = 0): Long = {
    var sig = 0L
    var p = 0
    while (p < numPlanes) {
      var proj = 0.0
      var i = 0
      while (i < x.length) {
        var h = (p + planeOffset).toLong * 0x9E3779B97F4A7C15L +
          i.toLong * 0xC2B2AE3D27D4EB4FL
        h ^= (h >>> 33); h *= 0xFF51AFD7ED558CCDL; h ^= (h >>> 33)
        proj += (if ((h & 1L) == 1L) 1.0 else -1.0) * x(i).toDouble
        i += 1
      }
      if (proj >= 0.0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  def signatureOf(vec: Seq[Float], numPlanes: Int): Long =
    signatureOfArray(vec.toArray, numPlanes)

  /** SQL registration (DEFINE-style). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val cs = spark.sessionState.functionRegistry
    cs.createOrReplaceTempFunction("cosine_similarity",
      exprs => CosineSimilarity(exprs(0), exprs(1)), "built-in")
    cs.createOrReplaceTempFunction("dot_product",
      exprs => DotProduct(exprs(0), exprs(1)), "built-in")
  }
}
