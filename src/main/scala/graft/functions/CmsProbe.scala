package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression,
  Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}
import org.apache.spark.util.sketch.CountMinSketch

/** Codegen'd per-row probe of a driver-built Count-Min sketch —
  * `cms_probe_long(sketchBytes, key)` estimates how often `key` occurs
  * in the stream the sketch summarizes, with the CMS one-sided
  * guarantee: the estimate is NEVER below the true count (each counter
  * the key hashes to was incremented by every one of its occurrences;
  * the min over depth rows can only add collision mass). That hard
  * direction is what makes the vocabulary df-cap prefilter LOSSLESS
  * (see ngramPairs in queries/LLMOps.scala): rows whose estimate stays
  * under the cap are PROVABLY under it and skip the exact df
  * aggregation entirely — the corpus-wide groupBy over a
  * billion-distinct vocabulary collapses to a groupBy over the small
  * maybe-hot band, the same sketch-then-exact tier shape
  * q_dedup_incremental uses with Bloom.
  *
  * The sketch argument must be a foldable BINARY (the serialized form
  * `count_min_sketch(...)` aggregates to, passed back in via `lit`);
  * it is deserialized ONCE per executor (transient lazy), never per
  * row, and the generated code calls back into this instance via a
  * codegen reference — no UDF, no per-row serialization. */
case class CmsProbeLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) if left.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckFailure(
        "cms_probe_long requires a FOLDABLE sketch argument (pass the " +
          "serialized sketch as a literal)")
      case (s, k) => TypeCheckResult.TypeCheckFailure(
        s"cms_probe_long requires (BINARY sketch, BIGINT key), got " +
          s"(${s.sql}, ${k.sql})")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "cms_probe_long"

  @transient private lazy val cms: CountMinSketch = {
    val bytes = left.eval().asInstanceOf[Array[Byte]]
    CountMinSketch.readFrom(new ByteArrayInputStream(bytes))
  }

  /** Called per row from both eval paths — sketch-local array reads. */
  def probe(k: Long): Long = cms.estimateCount(java.lang.Long.valueOf(k))

  override protected def nullSafeEval(sk: Any, k: Any): Any =
    probe(k.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cmsProbe", this,
      classOf[CmsProbeLong].getName)
    defineCodeGen(ctx, ev, (_, k) => s"$ref.probe($k)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): CmsProbeLong = copy(newLeft, newRight)
}
