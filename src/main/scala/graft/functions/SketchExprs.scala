package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_might_contain(key_bigint, sketch_binary)` → boolean.
  *
  * The right child must be a foldable binary literal holding a serialized
  * `org.apache.spark.util.sketch.BloomFilter` (built once from the small
  * side's keys, e.g. a replication diff's entity ids). The probe is a
  * per-row hash test with no shuffle and no join: rows of a huge scan
  * that cannot be in the key set are dropped before any exchange, and an
  * exact semi-join downstream clears the false positives. This is the
  * manual form of Spark's runtime semi-join reduction, usable where the
  * optimizer's automatic bloom injection doesn't fire (pre-computed key
  * sets, multi-step pipelines).
  *
  * Codegen: the sketch is deserialized once per plan and shipped as a
  * codegen reference object — the generated code is a single
  * `mightContainLong` call, keeping the probe inside WholeStageCodegen.
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  @transient private lazy val bloom: BloomFilter = {
    val bytes = right.eval(null).asInstanceOf[Array[Byte]]
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
  }

  override protected def nullSafeEval(v: Any, ignored: Any): Any =
    bloom.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloom", bloom,
      classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, (v, _) => s"$ref.mightContainLong($v)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}
