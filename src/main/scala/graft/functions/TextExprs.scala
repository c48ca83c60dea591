package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Text-pipeline kernels callable from generated code. */
object TextKernels {

  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val hexDigits = "0123456789abcdef".toCharArray

  /** 64-bit SimHash of the whitespace tokens of `text`, as 16 lowercase hex
    * chars: token hash = first 64 bits of md5, per-bit ±1 vote, bit set when
    * the vote sum is positive. Single pass per document — the distributed
    * plan stays a shuffle-free scan (vs token explode + 64-way groupBy).
    */
  def simHash64Hex(text: String): String = {
    val counts = new Array[Int](64)
    var start = 0
    val n = text.length
    var i = 0
    while (i <= n) {
      if (i == n || text.charAt(i) == ' ') {
        if (i > start) {
          val digest = md.get()
          digest.reset()
          val tok = text.substring(start, i)
          val h = digest.digest(tok.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          // first 8 bytes, big-endian = first 16 hex chars of md5
          var v = 0L
          var k = 0
          while (k < 8) { v = (v << 8) | (h(k) & 0xffL); k += 1 }
          var b = 0
          while (b < 64) {
            counts(b) += (if (((v >>> b) & 1L) == 1L) 1 else -1)
            b += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) fp |= 1L << b; b += 1 }
    val out = new Array[Char](16)
    var j = 0
    while (j < 16) {
      out(j) = hexDigits(((fp >>> (4 * (15 - j))) & 0xfL).toInt)
      j += 1
    }
    new String(out)
  }
}

/** `simhash64(text)` → 16-hex-char fingerprint; codegen stays a single
  * static call inside WholeStageCodegen.
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(text: Any): Any =
    UTF8String.fromString(TextKernels.simHash64Hex(text.toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, t =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.TextKernels.simHash64Hex($t.toString()))")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}
