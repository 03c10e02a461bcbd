package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types._

/** Content-defined chunking (CDC) over a binary column — the dedup
  * primitive for byte payloads (media blobs, crawl snapshots, nightly
  * re-scrapes) where an INSERTED byte shifts every fixed-width block
  * but leaves all content-defined chunk boundaries after the edit
  * region intact. Gear-style rolling hash (Xia et al., FastCDC,
  * USENIX ATC '16 — public spec): per input byte
  *
  *   h = (h * 2 + gear(b)) mod 2^32
  *
  * and a boundary is declared when the TOP `maskBits` bits of `h` are
  * all zero (expected chunk length 2^maskBits from `minLen`), subject
  * to FastCDC's min/max clamps: no test before `minLen` bytes, forced
  * cut at `maxLen`. The rolling state resets at each cut, so a chunk's
  * boundaries depend only on bytes since the previous cut — fully
  * content-local, which is also what keeps the cross-engine oracle a
  * per-position recursion instead of a whole-stream carry.
  *
  * The 256-entry gear table derives from md5 (`gear(b)` = first 8 hex
  * chars of `md5(b.toString)` as an unsigned 32-bit value) so an
  * external engine can reproduce it from its own md5 — no table to
  * ship, nothing engine-specific.
  *
  * Output: `array<struct<off:int, len:int>>` covering the input
  * exactly (tail chunk may be shorter than `minLen`); empty input →
  * empty array; null → null. Fingerprinting the chunk BYTES is left
  * to the caller (md5 over a hex-string slice is the engine-portable
  * idiom — see CLAUDE.md: DuckDB BLOB substring).
  *
  * Codegen: the generated code calls the static [[GearChunks.chunk]]
  * helper — one invocation per ROW keeps the projection inside
  * whole-stage codegen while the per-byte loop runs as compiled JVM
  * code either way (the per-element interpreted-lambda tax that
  * motivated [[DotProduct]]'s inline loop does not apply to a
  * once-per-row scan).
  */
@ExpressionDescription(
  usage = "gear_chunks(bin, maskBits, minLen, maxLen) - content-defined chunk offsets")
case class GearChunks(child: Expression, maskBits: Int, minLen: Int,
    maxLen: Int) extends UnaryExpression {

  require(maskBits >= 1 && maskBits <= 31,
    s"maskBits must be in [1, 31]: $maskBits")
  require(minLen >= 1, s"minLen must be >= 1: $minLen")
  require(maxLen >= minLen, s"maxLen ($maxLen) must be >= minLen ($minLen)")

  override def dataType: DataType = GearChunks.outType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case BinaryType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"gear_chunks expects a binary argument, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    GearChunks.chunk(input.asInstanceOf[Array[Byte]], maskBits, minLen,
      maxLen)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expr.GearChunks.chunk($c, $maskBits, " +
        s"$minLen, $maxLen);")

  override protected def withNewChildInternal(
      newChild: Expression): GearChunks = copy(child = newChild)
}

object GearChunks {

  val outType: ArrayType = ArrayType(
    StructType(Seq(
      StructField("off", IntegerType, nullable = false),
      StructField("len", IntegerType, nullable = false))),
    containsNull = false)

  /** gear(b) = first 8 hex chars of md5(b.toString) as unsigned 32-bit
    * — reproducible in any engine with md5 (the oracle computes the
    * same value inline: `('0x' || substr(md5(CAST(b AS VARCHAR)), 1,
    * 8))::UBIGINT`).
    */
  private[graft] val gearTable: Array[Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until 256).map { b =>
      md.reset()
      val hx = md.digest(b.toString.getBytes("UTF-8"))
        .take(4).map(x => f"${x & 0xff}%02x").mkString
      java.lang.Long.parseLong(hx, 16)
    }.toArray
  }

  /** Static per-row kernel shared by eval and generated code. */
  def chunk(bytes: Array[Byte], maskBits: Int, minLen: Int,
      maxLen: Int): ArrayData = {
    val n = bytes.length
    val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
    val shift = 32 - maskBits
    var h = 0L
    var start = 0
    var i = 0
    while (i < n) {
      h = ((h << 1) + gearTable(bytes(i) & 0xff)) & 0xffffffffL
      val len = i - start + 1
      if ((len >= minLen && (h >>> shift) == 0L) || len >= maxLen) {
        out += InternalRow(start, len)
        start = i + 1
        h = 0L
      }
      i += 1
    }
    if (start < n) out += InternalRow(start, n - start)
    new GenericArrayData(out.toArray[Any])
  }
}

object CdcFunctions {

  /** Column API over [[GearChunks]]; argument must be binary
    * (`encode(text, 'UTF-8')` for text payloads).
    */
  def gearChunks(bin: Column, maskBits: Int, minLen: Int,
      maxLen: Int): Column =
    Bridge.column(GearChunks(Bridge.expression(bin), maskBits, minLen,
      maxLen))
}
