package graft.functions.cat

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `conv(substring(md5(s), start, len), 16, 10)` as one native
  * expression: hash once, read `len` nibbles straight off the digest
  * bytes.  Bit-identical to the composed form (which is what every
  * DuckDB oracle still computes), but skips the 32-char hex string
  * materialization, the substring copy, and the string→long radix
  * parse — this is the per-token/per-shingle hot hash under minhash
  * signatures, simhash, fingerprints, and hash sampling.
  *
  * `start` is 1-based in hex characters; `start-1+len ≤ 32`;
  * `len ≤ 15` so the value stays positive in a signed int64.
  */
case class Md5HexSlice(child: Expression, start: Int, len: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(start >= 1 && len >= 1 && len <= 15 && start - 1 + len <= 32,
    s"bad md5 hex slice [$start, +$len)")

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_md5_slice"

  override protected def nullSafeEval(input: Any): Any =
    Md5HexSlice.compute(input.asInstanceOf[UTF8String], start, len)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.cat.Md5HexSlice.compute($c, $start, $len)")

  override protected def withNewChildInternal(newChild: Expression): Md5HexSlice =
    copy(child = newChild)
}

object Md5HexSlice {
  // one digest instance per task thread: getInstance allocates (SPI
  // lookup + state) and this kernel runs once per shingle/token —
  // digest() leaves the instance reset for the next call
  private val localMd5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Static per-row kernel (called from generated code). */
  def compute(s: UTF8String, start: Int, len: Int): Long = {
    val d = localMd5.get().digest(s.getBytes)
    var v = 0L
    var i = start - 1
    val end = start - 1 + len
    while (i < end) {
      val b = d(i >> 1) & 0xff
      val nibble = if ((i & 1) == 0) b >> 4 else b & 0xf
      v = (v << 4) | nibble
      i += 1
    }
    v
  }
}
