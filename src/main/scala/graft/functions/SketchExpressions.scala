package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.{BloomFilter, CountMinSketch}

/** Native probes over SERIALIZED sketch bytes — the codegen'd
  * replacement for the per-row Scala-UDF closures that previously
  * screened full fact/corpus scans (a ScalaUDF on the scan side
  * breaks whole-stage codegen and boxes every row through the
  * encoder machinery).
  *
  * The sketch argument must be FOLDABLE (a binary literal — the
  * driver builds the sketch from a bounded sizing pass and inlines
  * its bytes, exactly the "tiny broadcast model" pattern used for
  * IVF centroids and PQ codebooks). The expression deserializes it
  * ONCE per executor into a transient lazy field; generated code
  * calls straight into the probe method through a reference object —
  * no closure, no encoder, no per-row deserialization.
  *
  * Exactness contract unchanged: CMS overestimates (superset
  * prefilter, no false negatives), Bloom has no false negatives;
  * both operators confirm exactly downstream, so answers stay
  * ground-truth and the DuckDB oracles never see the sketch.
  */
case class CmsEstimate(sketch: Expression, item: Expression)
    extends BinaryExpression {

  override def left: Expression = sketch
  override def right: Expression = item
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_cms_estimate"

  override def checkInputDataTypes(): TypeCheckResult =
    InputChecks.firstFailure(
      InputChecks.expect(prettyName, 0, sketch,
        dt => dt == BinaryType && sketch.foldable,
        "a literal binary serialized CountMinSketch"),
      InputChecks.expect(prettyName, 1, item, _ == LongType, "a bigint key"))

  @transient private lazy val cms: CountMinSketch =
    CountMinSketch.readFrom(new ByteArrayInputStream(
      sketch.eval(null).asInstanceOf[Array[Byte]]))

  /** Called from both interpreted and generated code. */
  def estimate(v: Long): Long = cms.estimateCount(java.lang.Long.valueOf(v))

  override def nullSafeEval(s: Any, v: Any): Any = estimate(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (_, v) => {
      val ref = ctx.addReferenceObj("cmsProbe", this,
        classOf[CmsEstimate].getName)
      s"${ev.value} = $ref.estimate($v);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(sketch = newLeft, item = newRight)
}

/** True iff ANY element of a bigint array might be in the Bloom
  * filter — the map-side document screen: a doc whose shingle array
  * has zero Bloom hits never shuffles a single shingle.
  */
case class BloomAnyContain(sketch: Expression, arr: Expression)
    extends BinaryExpression {

  override def left: Expression = sketch
  override def right: Expression = arr
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_any"

  override def checkInputDataTypes(): TypeCheckResult =
    InputChecks.firstFailure(
      InputChecks.expect(prettyName, 0, sketch,
        dt => dt == BinaryType && sketch.foldable,
        "a literal binary serialized BloomFilter"),
      InputChecks.expect(prettyName, 1, arr, InputChecks.isLongArray,
        "an array<bigint> of element hashes"))

  @transient private lazy val bf: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(
      sketch.eval(null).asInstanceOf[Array[Byte]]))

  /** Called from both interpreted and generated code. */
  def probeAny(a: ArrayData): Boolean = {
    val n = a.numElements()
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && bf.mightContainLong(a.getLong(i))) return true
      i += 1
    }
    false
  }

  override def nullSafeEval(s: Any, a: Any): Any =
    probeAny(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (_, a) => {
      val ref = ctx.addReferenceObj("bloomProbe", this,
        classOf[BloomAnyContain].getName)
      s"${ev.value} = $ref.probeAny($a);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(sketch = newLeft, arr = newRight)
}
