package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.LeafExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, JavaCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** A long constant that rides generated code as a REFERENCE OBJECT
  * instead of an inlined literal — the codegen-cache-stability twin of
  * [[BloomBit]]'s bitmap reference.
  *
  * Why it exists (guide §1 measurement, optimization round): every
  * per-micro-batch maintainer plan (IVM aggregate/join, SCD2 history,
  * dedup-index registration, feature-store merge) stamps its events
  * with `lit(batchId + 1)`. A plain `Literal` is INLINED into the
  * whole-stage-codegen source, so two structurally identical triggers
  * generate different Java text and EVERY generated class recompiles
  * every micro-batch — measured ~150 janino compilations (~3-4 s of
  * driver time) per maintainer trigger, the dominant fixed cost of the
  * engine-E2E bench cells and of any high-frequency production trigger.
  * With the value loaded from `references[]`, the generated source is
  * byte-identical across batches and the codegen cache hits: the class
  * compiles once per plan SHAPE, not once per batch.
  *
  * Non-foldable by design (folding would re-inline it); therefore use
  * it for PROJECTED output constants (version stamps), not for filter
  * predicates that should constant-fold or push down to a scan.
  */
case class StableLong(value: Long) extends LeafExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def eval(input: InternalRow): Any = value
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftStableLong", value, "java.lang.Long")
    ExprCode.forNonNullValue(JavaCode.expression(s"$ref.longValue()", LongType))
  }
  override def prettyName: String = "stable_long"
}

object StableLit {
  /** `lit(v)` with codegen-cache-stable generated source (see
    * [[StableLong]]); value semantics identical to `lit(v)`.
    */
  def long(v: Long): Column = org.apache.spark.sql.graft.SparkInternals.column(StableLong(v))
}
