package graft.functions

import org.apache.spark.sql.{Column, Row}
import org.apache.spark.sql.api.java.{UDF0, UDF1, UDF2, UDF3, UDF4}
import org.apache.spark.sql.functions.{struct, udf}
import org.apache.spark.sql.types._

/** Reflection-bridge UDFs — the reference's `Invoke*` family
  * (P/builtin/Invoker.java:62, InvokeForString/Int/Long/Float/Double) lets a
  * script call any public Java method without writing a UDF class, and
  * `MonitoredUDF` (P/builtin/MonitoredUDFExecutor.java) wraps a UDF in a
  * timeout that yields a default instead of hanging the job.
  *
  * Here an [[Invoker]] resolves the `Method` lazily ONCE PER EXECUTOR JVM
  * (`@transient lazy val` — `Method` is not serializable, and per-row lookup
  * would dominate the call cost), and is exposed as a Spark Java-UDF of the
  * matching arity. These are codegen boundaries by construction (arbitrary
  * reflective calls can't be expressed as Catalyst expressions) — documented
  * as cold-path escape hatches, same stance as the reference.
  *
  * Pig usage this reproduces (frontend: DEFINE alias InvokeForX(...)):
  * {{{
  *   DEFINE UpperName InvokeForString('java.lang.String.toUpperCase', 'String', 'false');
  *   B = FOREACH A GENERATE UpperName(name);
  * }}}
  */
object Invoke {

  /** `isStatic` ctor literal: the reference accepts `'static'` as well as
    * `'true'` (Invoker.java:81 `"static".equalsIgnoreCase || "true".equals`). */
  def parseIsStatic(s: String): Boolean =
    s.equalsIgnoreCase("static") || s.equalsIgnoreCase("true")

  /** Method-handle holder: serializable config, per-JVM lazy resolution.
    *
    * Instance methods (`isStatic=false`): the FIRST udf argument is the
    * receiver, and — matching Invoker.java:86-90, where
    * `selfClass_ = paramClasses_[0]` is dropped before `getMethod` — the
    * FIRST `paramSpec` entry names the receiver's type; the remaining
    * entries are the method's own parameters. So Pig's documented
    * `InvokeForString('java.lang.String.toUpperCase', 'String', 'false')`
    * is a 1-arg call. An empty spec on an instance method is also accepted
    * as "receiver only" (graft leniency; the reference indexes
    * `paramClasses_[0]` and would throw). The reference's `dropFirstClass`
    * (Invoker.java:99) also drops the LAST spec entry — a
    * `copyOfRange(1, length-1)` off-by-one that makes instance methods
    * with >0 declared params unresolvable there; not replicated. */
  final class Invoker(fullName: String, paramSpec: String,
                      isStatic: Boolean) extends Serializable {
    private val dot = fullName.lastIndexOf('.')
    require(dot > 0, s"Invoke method name must be fully qualified: $fullName")
    private val className  = fullName.substring(0, dot)
    private val methodName = fullName.substring(dot + 1)
    private val specs: Array[String] =
      paramSpec.trim match {
        case "" => Array.empty
        case s  => s.split("[\\s,]+")
      }
    /** Method-parameter types: for instance methods the first spec entry is
      * the receiver's type, not a parameter. */
    private val paramNames: Array[String] =
      if (isStatic) specs else specs.drop(1)

    /** udf arity: one column per spec entry (the receiver's entry covers the
      * receiver column); instance methods always take at least the receiver. */
    def arity: Int =
      if (isStatic) specs.length else math.max(specs.length, 1)

    @transient private lazy val method: java.lang.reflect.Method = {
      val klass = Class.forName(className)
      val wanted = paramNames.map(paramClass)
      try klass.getMethod(methodName, wanted: _*)
      catch { case e: NoSuchMethodException =>
        // exact lookup misses methods declared with supertype params
        // (String.replace takes CharSequence) — fall back to the widest
        // assignable public overload, like MethodUtils' accessible match
        def boxed(c: Class[_]): Class[_] =
          if (!c.isPrimitive) c else c.getName match {
            case "int" => classOf[java.lang.Integer]
            case "long" => classOf[java.lang.Long]
            case "float" => classOf[java.lang.Float]
            case "double" => classOf[java.lang.Double]
            case "boolean" => classOf[java.lang.Boolean]
            case _ => c
          }
        klass.getMethods.find { m =>
          m.getName == methodName &&
          m.getParameterCount == wanted.length &&
          m.getParameterTypes.zip(wanted).forall { case (decl, got) =>
            boxed(decl).isAssignableFrom(boxed(got)) }
        }.getOrElse(throw e)
      }
    }

    // type names are case-insensitive, like Invoker.stringToClass
    private def paramClass(n: String): Class[_] = n.toLowerCase match {
      case "string" | "chararray" => classOf[String]
      case "int"      => java.lang.Integer.TYPE
      case "long"     => java.lang.Long.TYPE
      case "float"    => java.lang.Float.TYPE
      case "double"   => java.lang.Double.TYPE
      case "boolean"  => java.lang.Boolean.TYPE
      case "int[]"    => classOf[Array[Int]]
      case "long[]"   => classOf[Array[Long]]
      case "float[]"  => classOf[Array[Float]]
      case "double[]" => classOf[Array[Double]]
      case "string[]" => classOf[Array[String]]
      case other => throw new IllegalArgumentException(
        s"unsupported Invoke param type '$other' " +
        "(String|int|long|float|double|boolean and []-arrays)")
    }

    /** Null receiver or null required-primitive arg → null result (Pig UDF
      * convention: nulls propagate, never throw). Bags/arrays arrive from
      * Spark as Seq — converted to the declared primitive array. */
    def call(args: Seq[AnyRef]): AnyRef = {
      val (receiver, rest) =
        if (isStatic) (null: AnyRef, args) else (args.head, args.tail)
      if (!isStatic && receiver == null) return null
      val conv = rest.zip(paramNames).map { case (a, t) => coerce(a, t) }
      if (conv.exists(a => a == null)) return null
      try method.invoke(receiver, conv: _*)
      catch { case _: java.lang.reflect.InvocationTargetException => null }
    }

    private def coerce(a: AnyRef, t: String): AnyRef = (a, t.toLowerCase) match {
      case (null, _) => null
      case (s: Seq[_], "int[]")    => s.map(_.asInstanceOf[Number].intValue).toArray
      case (s: Seq[_], "long[]")   => s.map(_.asInstanceOf[Number].longValue).toArray
      case (s: Seq[_], "float[]")  => s.map(_.asInstanceOf[Number].floatValue).toArray
      case (s: Seq[_], "double[]") => s.map(_.asInstanceOf[Number].doubleValue).toArray
      case (s: Seq[_], "string[]") => s.map(String.valueOf).toArray
      case (n: Number, "int")    => Int.box(n.intValue)
      case (n: Number, "long")   => Long.box(n.longValue)
      case (n: Number, "float")  => Float.box(n.floatValue)
      case (n: Number, "double") => Double.box(n.doubleValue)
      case (v, _) => v
    }
  }

  private def returnType(kind: String): DataType = kind match {
    case "String" => StringType
    case "Int"    => IntegerType
    case "Long"   => LongType
    case "Float"  => FloatType
    case "Double" => DoubleType
    case other => throw new IllegalArgumentException(
      s"unknown Invoke return kind $other")
  }

  /** Build the Column for `InvokeForX(callArgs…)`. `kind` ∈
    * String/Int/Long/Float/Double (the five reference classes). */
  def column(kind: String, fullName: String, paramSpec: String,
             isStatic: Boolean, args: Seq[Column]): Column = {
    val inv = new Invoker(fullName, paramSpec, isStatic)
    require(args.length == inv.arity,
      s"InvokeFor$kind('$fullName', '$paramSpec') expects ${inv.arity} " +
      s"args, got ${args.length}")
    val rt = returnType(kind)
    val f = args.length match {
      case 0 => udf(new UDF0[AnyRef] {
        def call(): AnyRef = inv.call(Nil) }, rt)
      case 1 => udf(new UDF1[AnyRef, AnyRef] {
        def call(a: AnyRef): AnyRef = inv.call(Seq(a)) }, rt)
      case 2 => udf(new UDF2[AnyRef, AnyRef, AnyRef] {
        def call(a: AnyRef, b: AnyRef): AnyRef = inv.call(Seq(a, b)) }, rt)
      case 3 => udf(new UDF3[AnyRef, AnyRef, AnyRef, AnyRef] {
        def call(a: AnyRef, b: AnyRef, c: AnyRef): AnyRef =
          inv.call(Seq(a, b, c)) }, rt)
      case 4 => udf(new UDF4[AnyRef, AnyRef, AnyRef, AnyRef, AnyRef] {
        def call(a: AnyRef, b: AnyRef, c: AnyRef, d: AnyRef): AnyRef =
          inv.call(Seq(a, b, c, d)) }, rt)
      // 5+: pack the args into one struct and unpack the Row — the
      // reference's Invoker is arity-unbounded (Invoker.java:62), so no
      // fixed UDFn ladder can be parity-complete
      case _ => val g = udf(new UDF1[Row, AnyRef] {
          def call(r: Row): AnyRef =
            inv.call(Seq.tabulate(r.length)(i => r.get(i).asInstanceOf[AnyRef]))
        }, rt)
        return g(struct(args: _*))
    }
    f(args: _*)
  }

  // -------------------------------------------------------------- monitored

  /** Shared daemon pool for monitored calls — bounded, never blocks JVM
    * exit. Sized to the executor's task slots is unnecessary: calls are
    * short and the pool grows on demand. */
  @transient private lazy val monitorPool =
    java.util.concurrent.Executors.newCachedThreadPool(r => {
      val t = new Thread(r, "graft-monitored-udf")
      t.setDaemon(true)
      t
    })

  /** MonitoredUDF semantics (reference: P/builtin/MonitoredUDF annotation +
    * MonitoredUDFExecutor — run the UDF body under a timeout; on timeout or
    * error return the declared default instead of failing the task).
    *
    * NOTE a timed-out body keeps running until it observes interruption —
    * same caveat as the reference's Future-based executor. Use for flaky
    * external calls (the reference's stated purpose), not hot paths. */
  def monitored[A, T](timeoutMs: Long, default: T)(f: A => T): A => T = {
    a =>
      val fut = monitorPool.submit(new java.util.concurrent.Callable[T] {
        def call(): T = f(a)
      })
      try fut.get(timeoutMs, java.util.concurrent.TimeUnit.MILLISECONDS)
      catch {
        case _: java.util.concurrent.TimeoutException =>
          fut.cancel(true); default
        case _: java.util.concurrent.ExecutionException => default
      }
  }
}
