package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Pure-JVM hash kernels, shared by interpreted eval and generated code.
  * Being a static object keeps doGenCode a one-line static call — the
  * expression stays inside whole-stage codegen (no virtual dispatch, no
  * boxing) while the kernel itself is plain branch-free long arithmetic.
  */
object GraftHashes {
  /** 64-bit polynomial rolling hash (Rabin-Karp style, base 1099511628211L —
    * the FNV prime — over UTF-8 bytes). Deterministic document fingerprint;
    * O(n) per row, embarrassingly parallel — no shuffle at any scale.
    */
  def rollingHash64(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = 0xcbf29ce484222325L // FNV offset basis
    var i = 0
    while (i < bytes.length) {
      h = h * 1099511628211L + (bytes(i) & 0xffL)
      i += 1
    }
    h
  }

  /** Stafford variant 13 of the splitmix64 finalizer — cheap, well-mixed
    * per-token 64-bit hash (public-domain constant set).
    */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private def tokenHash(bytes: Array[Byte], from: Int, until: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    while (i < until) {
      h = (h ^ (bytes(i) & 0xffL)) * 1099511628211L
      i += 1
    }
    mix64(h)
  }

  /** 64-bit SimHash over whitespace-delimited tokens: each token votes its
    * hash bits +1/-1; the sign vector is the fingerprint. Near-duplicate
    * docs land within small Hamming distance. Single pass over the bytes,
    * no tokens array allocated.
    */
  def simhash64(s: UTF8String): Long = {
    val bytes = s.getBytes
    val votes = new Array[Int](64)
    var start = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' '.toByte) {
        if (i > start) {
          val h = tokenHash(bytes, start, i)
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
            b += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

/** Base for string→long hash expressions with codegen via a static call. */
abstract class HashExpr extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument")
  }
  protected def kernel: String // static method name on GraftHashes

  override protected def nullSafeEval(input: Any): Any = input match {
    case s: UTF8String =>
      if (kernel == "rollingHash64") GraftHashes.rollingHash64(s)
      else GraftHashes.simhash64(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.GraftHashes.$kernel($c)")
}

/** Rolling-hash document fingerprint (SURVEY §7.2 item 8: text analysis /
  * document fingerprinting). Reference has no equivalent — extension op.
  */
case class RollingHash64(child: Expression) extends HashExpr {
  override def prettyName: String = "rolling_hash64"
  override protected def kernel: String = "rollingHash64"
  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** SimHash near-duplicate fingerprint (SURVEY §7.2 item 8: dedup). */
case class SimHash64(child: Expression) extends HashExpr {
  override def prettyName: String = "simhash64"
  override protected def kernel: String = "simhash64"
  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** Column wrappers + SQL registration for the custom expressions. */
object GraftFunctions {
  import org.apache.spark.sql.graftshim.GraftShim

  def rolling_hash64(c: Column): Column =
    GraftShim.column(RollingHash64(GraftShim.expression(c)))
  def simhash64(c: Column): Column =
    GraftShim.column(SimHash64(GraftShim.expression(c)))

  /** Make the functions callable from spark.sql text. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "rolling_hash64", es => RollingHash64(es.head), "scala_udf")
    reg.createOrReplaceTempFunction(
      "simhash64", es => SimHash64(es.head), "scala_udf")
  }
}
