package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Gear rolling-hash content-defined chunking (the FastCDC kernel, Xia
  * 2016) as ONE codegen-compatible expression: a single pass over the
  * document's UTF-8 bytes — per byte ONE table lookup + shift for the
  * boundary hash and one FNV-1a fold for the chunk fingerprint, both in
  * the same loop. This is the production-scale path next to
  * [[graft.dedup.CdcChunks.chunks]]'s relational form: that one pays an
  * md5 per window position so a DuckDB oracle can replay every boundary
  * (the cross-engine-semantics pin); this one is the kernel you run on
  * 100 TB, ~50× less hashing work per byte, and it expresses the
  * min/max chunk bounds real CDC needs — inherently SEQUENTIAL rules
  * (a forced cut moves every later boundary) that the relational form
  * cannot state without a per-document recursion.
  *
  * Boundary rule: cut after byte i when the chunk is ≥ `minLen` bytes
  * and the low `maskBits` bits of the gear hash are zero (expected
  * chunk ≈ minLen + 2^maskBits), or at `maxLen` unconditionally. The
  * gear hash resets per chunk (FastCDC's choice), so chunking
  * self-synchronizes after an edit: boundaries beyond the first
  * re-found cut are identical, which is the shift-invariance that makes
  * chunk dedup robust to head/tail boilerplate edits (spec-pinned).
  *
  * Returns `array<struct<start:int, len:int, hash:long>>` with BYTE
  * offsets (== char offsets on ASCII); empty input → empty array.
  */
case class GearChunks(child: Expression, minLen: Int, maxLen: Int, maskBits: Int)
    extends UnaryExpression {
  require(minLen >= 1, s"minLen must be >= 1, got $minLen")
  require(maxLen >= minLen, s"maxLen $maxLen < minLen $minLen")
  require(maskBits >= 1 && maskBits <= 48, s"maskBits must be in [1, 48], got $maskBits")

  override def dataType: DataType = GearChunks.OutType

  override def nullSafeEval(s: Any): Any =
    GearChunks.compute(s.asInstanceOf[UTF8String], minLen, maxLen, maskBits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // the loop lives in one static JIT'd method; codegen emits the call
    // so the expression stays inside whole-stage codegen (no fallback)
    nullSafeCodeGen(
      ctx,
      ev,
      c => s"${ev.value} = graft.functions.GearChunks.compute($c, $minLen, $maxLen, $maskBits);")

  override protected def withNewChildInternal(newChild: Expression): GearChunks =
    copy(child = newChild)
}

object GearChunks {

  val OutType: DataType = ArrayType(
    StructType(Seq(
      StructField("start", IntegerType, nullable = false),
      StructField("len", IntegerType, nullable = false),
      StructField("hash", LongType, nullable = false))),
    containsNull = false)

  // deterministic 256-entry gear table (splitmix64 of the index): the
  // per-byte random constants the rolling hash shifts through
  private val table: Array[Long] = {
    val t = new Array[Long](256)
    var i = 0
    while (i < 256) { t(i) = splitmix64(0x9E3779B97F4A7C15L * (i + 1)); i += 1 }
    t
  }

  private def splitmix64(seed: Long): Long = {
    var z = seed + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private val FnvOffset = 0xcbf29ce484222325L
  private val FnvPrime = 0x100000001b3L

  /** One pass: gear boundaries + FNV-1a chunk fingerprints. Public
    * because generated code calls it.
    */
  def compute(s: UTF8String, minLen: Int, maxLen: Int, maskBits: Int): GenericArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val mask = (1L << maskBits) - 1
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var start = 0
    var h = 0L
    var fnv = FnvOffset
    var i = 0
    while (i < n) {
      val b = bytes(i) & 0xff
      h = (h << 1) + table(b)
      fnv = (fnv ^ b) * FnvPrime
      val len = i - start + 1
      if ((len >= minLen && (h & mask) == 0L) || len >= maxLen || i == n - 1) {
        out += InternalRow(start, len, fnv)
        start = i + 1
        h = 0L
        fnv = FnvOffset
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  def gearChunks(c: Column, minLen: Int = 16, maxLen: Int = 256, maskBits: Int = 5): Column =
    Bridge.column(GearChunks(Bridge.expr(c), minLen, maxLen, maskBits))
}
