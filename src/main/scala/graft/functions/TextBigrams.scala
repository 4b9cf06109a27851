package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes,
  Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, StringType, StructField,
  StructType}
import org.apache.spark.unsafe.types.UTF8String

/** `text_bigrams(text)` — a custom GENERATOR expression (the §4.2
  * ladder's table-function rung, beyond the scalar/aggregate rungs
  * vec_dot / kmv_sketch_agg cover): one input row fans out to one
  * output row per adjacent whitespace token pair.
  *
  * The point is the PLAN it buys. The builtin route to bigrams
  * (E155 q_ngram_freq) is posexplode → window lead per doc_id — a
  * per-document sort and shuffle just to pair each token with its
  * neighbor. A generator forms the pairs ROW-LOCALLY inside
  * GenerateExec: no window, no shuffle before the counting aggregate,
  * and the whole pipeline stays partition-parallel however many
  * documents a partition holds (PlanSuite pins the no-Window shape).
  * At 100 TB the difference is a full extra shuffle of the tokenized
  * corpus.
  *
  * Whitespace-split on the trimmed text, consistent with the corpus
  * tokenizer used across the LLM family (X5); empty tokens from runs
  * of spaces are skipped, matching E155's non-empty filter. Generator
  * eval is once-per-row over a small array — CodegenFallback is the
  * conventional choice for generators (Spark's own Stack/Inline
  * generators do the same). */
case class TextBigramsExpr(child: Expression)
  extends Generator with ExpectsInputTypes with CodegenFallback
  with UnaryLike[Expression] {

  override def prettyName: String = "text_bigrams"
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def elementSchema: StructType =
    StructType(StructField("bigram", StringType, nullable = false)
      :: Nil)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val raw = child.eval(input)
    if (raw == null) Nil
    else {
      val toks = raw.asInstanceOf[UTF8String].toString.trim
        .split(" ").filter(_.nonEmpty)
      if (toks.length < 2) Nil
      else (0 until toks.length - 1).iterator.map { i =>
        InternalRow(UTF8String.fromString(
          toks(i) + " " + toks(i + 1)))
      }
    }
  }

  override protected def withNewChildInternal(
      newChild: Expression): TextBigramsExpr = copy(child = newChild)
}
