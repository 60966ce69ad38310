package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Pig's text→complex-type cast (reference: Utf8StorageConverter.java —
  * consumeBag/consumeTuple/consumeMap): parses the Pig literal syntax a
  * delimited store writes — `{(…),(…)}` bag, `(a,b)` tuple, `[k#v,…]`
  * map, nested to any depth — into the declared Catalyst type. Malformed
  * input yields NULL, the LoadCaster contract (§1.4: cast failure →
  * null + warning, never an error). Used when an AS schema declares a
  * complex type over a text loader's string column. CodegenFallback:
  * this runs once per field at LOAD, not in hot expression paths. */
case class PigTextParse(child: Expression, targetType: DataType)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = targetType
  override def nullable: Boolean = true
  override def prettyName: String = "pig_text_parse"

  override def nullSafeEval(v: Any): Any =
    try PigTextParse.parse(v.toString.trim, targetType)
    catch { case _: Exception => null }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PigTextParse {

  def column(c: Column, dt: DataType): Column = {
    import org.apache.spark.sql.graft.bridge
    bridge.column(PigTextParse(bridge.expression(c), dt))
  }

  /** Parse one value in Pig literal text syntax into Catalyst internal
    * form; null for malformed input. */
  private[functions] def parse(s: String, dt: DataType): Any = {
    if (s == null || s.isEmpty) return null
    val p = new P(s)
    val out = p.value(dt)
    out
  }

  /** Tiny recursive-descent reader over the literal text. */
  private final class P(s: String) {
    private var i = 0
    private def peek: Char = if (i < s.length) s.charAt(i) else ' '
    private def eat(c: Char): Unit = {
      if (peek != c) throw new IllegalArgumentException(s"expected $c")
      i += 1
    }

    def value(dt: DataType): Any = dt match {
      case ArrayType(st: StructType, _) => bag(st)
      case st: StructType               => tuple(st)
      case MapType(StringType, vt, _)   => map(vt)
      case leaf                         => scalar(until(Set()), leaf)
    }

    private def bag(st: StructType): GenericArrayData = {
      eat('{')
      val items = scala.collection.mutable.ArrayBuffer.empty[Any]
      if (peek == '}') { i += 1; return new GenericArrayData(items.toArray) }
      var more = true
      while (more) {
        items += tuple(st)
        if (peek == ',') i += 1 else { eat('}'); more = false }
      }
      new GenericArrayData(items.toArray)
    }

    private def tuple(st: StructType): InternalRow = {
      eat('(')
      val vals = new Array[Any](st.size)
      var k = 0
      while (k < st.size) {
        vals(k) = st.fields(k).dataType match {
          case nested @ (_: StructType | _: ArrayType | _: MapType) =>
            value(nested)
          case leaf => scalar(until(Set(',', ')')), leaf)
        }
        if (k < st.size - 1) eat(',')
        k += 1
      }
      eat(')')
      InternalRow.fromSeq(vals.toIndexedSeq)
    }

    private def map(vt: DataType): ArrayBasedMapData = {
      eat('[')
      val keys = scala.collection.mutable.ArrayBuffer.empty[Any]
      val vals = scala.collection.mutable.ArrayBuffer.empty[Any]
      if (peek == ']') i += 1
      else {
        var more = true
        while (more) {
          val k = until(Set('#'))
          eat('#')
          keys += UTF8String.fromString(k)
          vals += (vt match {
            case nested @ (_: StructType | _: ArrayType | _: MapType) =>
              value(nested)
            case leaf => scalar(until(Set(',', ']')), leaf)
          })
          if (peek == ',') i += 1 else { eat(']'); more = false }
        }
      }
      new ArrayBasedMapData(new GenericArrayData(keys.toArray),
        new GenericArrayData(vals.toArray))
    }

    /** Scalar text up to (not including) a delimiter at THIS nesting
      * level; empty → null like the reference's empty-field rule. */
    private def until(stop: Set[Char]): String = {
      val b = new StringBuilder
      while (i < s.length && !stop.contains(s.charAt(i))) {
        b.append(s.charAt(i)); i += 1
      }
      b.toString
    }

    private def scalar(raw: String, dt: DataType): Any = {
      val t = raw.trim
      if (t.isEmpty) return null
      dt match {
        case StringType  => UTF8String.fromString(t)
        case IntegerType => t.toInt
        case LongType    => stripSuffix(t, "lL").toLong
        case FloatType   => stripSuffix(t, "fF").toFloat
        case DoubleType  => t.toDouble
        case BooleanType => t.toBoolean
        case BinaryType  => t.getBytes("UTF-8")
        case other => throw new IllegalArgumentException(s"leaf $other")
      }
    }
    // Pig literal numeric suffixes (5L, 3.2f) — bytesToLong/bytesToFloat
    private def stripSuffix(t: String, cs: String): String =
      if (t.nonEmpty && cs.contains(t.last)) t.dropRight(1) else t
  }

  /** The write-side twin of [[parse]]: render a complex column in Pig
    * literal text (`{(…),(…)}` bag, `(a,b)` tuple, `[k#v,…]` map) so a
    * delimited STORE round-trips through the text→complex LoadCaster
    * (reference: PigStorage.putNext → DataType.toString). Pure
    * `functions._` composition — stays in codegen. */
  def unparse(c: Column, dt: DataType): Column = {
    import org.apache.spark.sql.functions._
    // null VALUES inside a complex value render as empty — Pig writes
    // "(a,)" for a null tuple field; concat_ws/array_join would
    // otherwise silently DROP them, changing arity/size on round-trip
    def orEmpty(x: Column): Column = coalesce(x, lit(""))
    dt match {
      case ArrayType(st: StructType, _) =>
        concat(lit("{"),
               array_join(transform(c, t => unparse(t, st)), ",", ""),
               lit("}"))
      case ArrayType(et, _) => // bag of plain values → 1-field tuples
        concat(lit("{"),
               array_join(transform(c, x =>
                 concat(lit("("), orEmpty(unparse(x, et)), lit(")"))),
                 ",", ""),
               lit("}"))
      case st: StructType =>
        concat(lit("("), concat_ws(",",
          st.fields.map(f => orEmpty(unparse(c.getField(f.name), f.dataType)))
            .toIndexedSeq: _*), lit(")"))
      case MapType(_, vt, _) =>
        concat(lit("["), array_join(transform(map_entries(c), e =>
          concat(e.getField("key").cast(StringType), lit("#"),
                 orEmpty(unparse(e.getField("value"), vt)))), ",", ""),
          lit("]"))
      case _ => c.cast(StringType)
    }
  }
}
