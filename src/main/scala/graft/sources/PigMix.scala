package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The PigMix performance suite's wire format (reference:
  * test/perf/pigmix/src/java/org/apache/pig/test/pigmix/udf/
  * PigPerformanceLoader.java and datagen/DataGenerator.java:writeCol):
  * rows are ^A-delimited text; a map field is `k^Dv` entries joined
  * with ^C; a bag field is elements joined with ^B, each element a
  * one-byte type tag (i/l/f/d/s/m/b) followed by its payload.
  *
  * The reference decodes lazily in the loader's LoadCaster; here the
  * same decode happens when a script CASTS the bytearray field to a
  * complex type — pure Column work (split / str_to_map / transform),
  * fully codegen, no UDF.
  */
object PigMix {

  private val ElemSep = "\u0002"    // ^B between bag elements
  private val EntrySep = "\u0003"   // ^C between map entries
  private val KeyValSep = "\u0004"  // ^D between map key and value

  /** Decode a PigMix-format text column to the target complex type.
    * Malformed input follows the LoadCaster contract: null, not error. */
  def decode(c: Column, target: DataType): Column = target match {
    case MapType(_, StringType, _) =>
      when(c.isNotNull && length(c) > 0,
        str_to_map(c, lit(EntrySep), lit(KeyValSep)))
    case MapType(k, vt, n) =>
      decode(c, MapType(k, StringType, n)) // parse as strings, then cast
        .cast(target)
    case ArrayType(st: StructType, _) if st.size == 1 =>
      when(c.isNotNull && length(c) > 0,
        transform(split(c, ElemSep),
          e => struct(element(e, st.fields(0).dataType)
            .as(st.fields(0).name))))
    case other => throw new IllegalArgumentException(
      s"PigMix format has no encoding for $other")
  }

  /** One bag element: a type-tag byte then the payload. A tag that
    * doesn't match the declared element type yields null (cast-failure
    * contract), so a mis-declared schema degrades instead of erroring. */
  private def element(e: Column, dt: DataType): Column = {
    val tag = e.substr(1, 1)
    val body = e.substr(lit(2), length(e))
    val want = dt match {
      case IntegerType => "i"
      case LongType => "l"
      case FloatType => "f"
      case DoubleType => "d"
      case StringType => "s"
      case _: MapType => "m"
      case _: ArrayType => "b"
      case other => throw new IllegalArgumentException(
        s"PigMix bags cannot hold $other")
    }
    val decoded = dt match {
      case _: MapType | _: ArrayType => decode(body, dt)
      case StringType => body
      case scalar => body.cast(scalar)
    }
    when(tag === want, decoded)
  }
}
