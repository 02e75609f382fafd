package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic schema-driven binary framing for wire records — the
  * engine's compact alternative to the Debezium JSON envelope (the
  * reference ecosystem's binary converters, e.g. Kafka Connect Avro,
  * play the same role: `InformixChangeRecordEmitter` output is
  * converter-agnostic; JSON is just the default). At 10^10 events the
  * wire bytes dominate topic cost: this framing carries a token array
  * as 4 bytes/token instead of JSON's ~6 chars/token, with zero
  * parse-time string scanning.
  *
  * Format (big-endian, schema-driven — the reader supplies the same
  * schema the writer used, like Avro writer/reader schemas):
  *   frame   := magic 0x47 'G' | version 0x01 | value(schema)
  *   value   := struct | array | string | long | int | byte-bool
  *   struct  := for each field in schema order: nullflag(1B) + value
  *   array   := count(int32) | per element: nullflag(1B) + value
  *   string  := len(int32) | utf8 bytes
  *   long/int/bool := 8B / 4B / 1B
  * Field order is the schema's; no field names or type tags on the
  * wire (the schema carries them), so encoding is bijective given the
  * schema and a byte-identical record always produces byte-identical
  * frames — frames are safe to fingerprint/dedup.
  *
  * Supported leaf types cover the engine's envelope (string, long,
  * int, boolean, arrays, nested structs). Both directions are pure
  * per-row projections (zero shuffle, zero driver work);
  * CodegenFallback for the usual reason — one virtual call per row
  * around tight loops.
  */
object WireBin {
  val Magic: Byte = 0x47
  val Version: Byte = 0x01

  private[plans] def checkSupported(dt: DataType): Option[String] = dt match {
    case StringType | LongType | IntegerType | BooleanType => None
    case at: ArrayType => checkSupported(at.elementType)
    case st: StructType =>
      st.fields.iterator.map(f => checkSupported(f.dataType)).collectFirst {
        case Some(e) => e
      }
    case other => Some(s"wirebin does not support ${other.simpleString}")
  }

  /** Register an encode/decode pair for one envelope schema (names
    * must encode the schema — the registry closures capture it).
    */
  def register(spark: SparkSession, encName: String, decName: String,
      schema: StructType): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      encName, exprs => WireBinEncode(exprs(0)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      decName, exprs => WireBinDecode(exprs(0), schema), "built-in")
  }
}

/** `<name>(env)` -> binary frame of the struct under the WireBin
  * format. Null input -> null frame (the tombstone contract lives a
  * level up, like `to_json`).
  */
case class WireBinEncode(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "wirebin_encode"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case st: StructType => WireBin.checkSupported(st) match {
        case None => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case Some(e) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(e)
      }
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"wirebin_encode requires a struct, got ${dt.simpleString}")
    }

  private def write(out: java.io.DataOutputStream, dt: DataType, v: Any): Unit = dt match {
    case StringType =>
      val b = v.asInstanceOf[UTF8String].getBytes
      out.writeInt(b.length); out.write(b)
    case LongType => out.writeLong(v.asInstanceOf[Long])
    case IntegerType => out.writeInt(v.asInstanceOf[Int])
    case BooleanType => out.writeBoolean(v.asInstanceOf[Boolean])
    case st: StructType =>
      val row = v.asInstanceOf[InternalRow]
      var i = 0
      while (i < st.length) {
        if (row.isNullAt(i)) out.writeByte(0)
        else {
          out.writeByte(1)
          write(out, st.fields(i).dataType, row.get(i, st.fields(i).dataType))
        }
        i += 1
      }
    case at: ArrayType =>
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      out.writeInt(n)
      var i = 0
      while (i < n) {
        if (arr.isNullAt(i)) out.writeByte(0)
        else { out.writeByte(1); write(out, at.elementType, arr.get(i, at.elementType)) }
        i += 1
      }
    case other => throw new IllegalStateException(s"unreachable: $other")
  }

  protected override def nullSafeEval(input: Any): Any = {
    val bos = new java.io.ByteArrayOutputStream(256)
    val out = new java.io.DataOutputStream(bos)
    out.writeByte(WireBin.Magic)
    out.writeByte(WireBin.Version)
    write(out, child.dataType, input)
    out.flush()
    bos.toByteArray
  }

  override protected def withNewChildInternal(newChild: Expression): WireBinEncode =
    copy(child = newChild)
}

/** `<name>(frame)` -> the envelope struct, or NULL when the frame is
  * malformed (bad magic/version, truncated, trailing bytes, negative
  * length) — the PERMISSIVE `from_json` contract: a crawl-scale topic
  * always carries garbage and a poisoned record must not kill the job.
  */
case class WireBinDecode(child: Expression, schema: StructType)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType =
    graft.stream.MergeApply.asNullable(schema)
  override def nullable: Boolean = true
  override def prettyName: String = "wirebin_decode"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType => WireBin.checkSupported(schema) match {
        case None => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case Some(e) => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(e)
      }
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"wirebin_decode requires binary, got ${dt.simpleString}")
    }

  private final class Malformed extends RuntimeException(null, null, false, false)

  private def read(buf: java.nio.ByteBuffer, dt: DataType): Any = dt match {
    case StringType =>
      val n = buf.getInt
      if (n < 0 || n > buf.remaining()) throw new Malformed
      val b = new Array[Byte](n); buf.get(b)
      UTF8String.fromBytes(b)
    case LongType => buf.getLong
    case IntegerType => buf.getInt
    case BooleanType => buf.get != 0
    case st: StructType =>
      val vals = new Array[Any](st.length)
      var i = 0
      while (i < st.length) {
        val flag = buf.get
        vals(i) = if (flag == 0) null else read(buf, st.fields(i).dataType)
        i += 1
      }
      new GenericInternalRow(vals)
    case at: ArrayType =>
      val n = buf.getInt
      // each element costs >= 1 byte (its nullflag): cheap sanity bound
      if (n < 0 || n > buf.remaining()) throw new Malformed
      val vals = new Array[Any](n)
      var i = 0
      while (i < n) {
        val flag = buf.get
        vals(i) = if (flag == 0) null else read(buf, at.elementType)
        i += 1
      }
      new GenericArrayData(vals)
    case other => throw new IllegalStateException(s"unreachable: $other")
  }

  protected override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    try {
      val buf = java.nio.ByteBuffer.wrap(bytes)
      if (buf.remaining() < 2 || buf.get != WireBin.Magic || buf.get != WireBin.Version)
        return null
      val v = read(buf, schema)
      if (buf.remaining() != 0) null else v
    } catch {
      case _: Malformed | _: java.nio.BufferUnderflowException => null
    }
  }

  override protected def withNewChildInternal(newChild: Expression): WireBinDecode =
    copy(child = newChild)
}
