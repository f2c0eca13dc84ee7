package graft

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{MinHashSig, ShingleSet}

/** Pins the shingle kernels' BYTE-PATH construction (shingle bytes
  * assembled directly from the tokens' UTF-8 bytes with 0x20 separators
  * into a reusable scratch buffer) against the definitional string form
  * (space-join the tokens, UTF-8 encode, hash) — the two must agree on
  * every reachable token shape, because the DuckDB oracles re-derive the
  * portable hashes from `md5(string)` of exactly the joined string. The
  * suite's oracle gate covers the fixture corpus (ASCII); this spec pins
  * the cases the fixture can't reach: multi-byte UTF-8 (2-, 3-, 4-byte
  * sequences), empty tokens, null tokens (the old StringBuilder path
  * appended nothing for a null, separator still emitted), and arrays
  * shorter than the shingle width (single whole-text shingle).
  */
class ShingleBytePathSpec extends AnyFunSuite {

  private val lit = org.apache.spark.sql.catalyst.expressions.Literal(null)

  /** Definitional reference: space-join (nulls → ""), md5, first 15 hex
    * digits as a long — the exact recipe the oracle SQL uses.
    */
  private def refPortableShingles(tokens: Seq[String], n: Int): Seq[Long] = {
    val count = math.max(1, tokens.length - n + 1)
    (0 until count).map { i =>
      val s = tokens.slice(i, math.min(i + n, tokens.length))
        .map(t => if (t == null) "" else t).mkString(" ")
      val d = MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.nio.ByteBuffer.wrap(d).getLong >>> 4
    }
  }

  private def arr(tokens: Seq[String]): GenericArrayData =
    new GenericArrayData(tokens.map(t =>
      if (t == null) null else UTF8String.fromString(t)).toArray[Any])

  private val shapes: Seq[Seq[String]] = Seq(
    Seq("plain", "ascii", "tokens", "only", "here"),
    // 2-byte (é, ß), 3-byte (中, 文, €), 4-byte (𝕊, 😀) UTF-8 sequences
    Seq("café", "straße", "中文", "tokens", "€uro", "𝕊et", "😀grin"),
    Seq("", "empty", "", "tokens", ""),
    Seq(null, "null", null, "tokens", "x"),
    Seq("short"),
    Seq("two", "toks"),
    Seq.empty[String])

  test("ShingleSet portable: byte path == md5(space-joined string) on " +
      "multi-byte/empty/null/short token shapes") {
    shapes.foreach { toks =>
      val got = ShingleSet(lit, shingleN = 3, portable = true)
        .nullSafeEval(arr(toks))
        .asInstanceOf[GenericArrayData].toLongArray().toSeq
      val want = refPortableShingles(toks, 3).distinct.sorted
      assert(got == want, s"tokens=$toks")
    }
  }

  test("MinHashSig portable: signature over byte-path hashes == signature " +
      "over reference hashes") {
    val coeffs = graft.functions.MinHashSig.coefficients(32, 42L)
    val Mask = 0xffffffffL
    shapes.foreach { toks =>
      val got = MinHashSig(lit, shingleN = 3, portable = true)
        .nullSafeEval(arr(toks))
        .asInstanceOf[GenericArrayData].toLongArray().toSeq
      val want = (0 until 32).map { j =>
        val (a, b) = coeffs(j)
        refPortableShingles(toks, 3)
          .map(h => (a * (h & Mask) + b) & Mask)
          .foldLeft(Long.MaxValue)(math.min)
      }
      assert(got == want, s"tokens=$toks")
    }
  }

  test("xxh64 path: byte-path shingle hash == hash of the joined string's " +
      "UTF-8 bytes") {
    // non-portable kernels hash the same joined-string bytes with XXH64
    shapes.foreach { toks =>
      val got = ShingleSet(lit, shingleN = 3)
        .nullSafeEval(arr(toks))
        .asInstanceOf[GenericArrayData].toLongArray().toSeq
      val count = math.max(1, toks.length - 3 + 1)
      val want = (0 until count).map { i =>
        val s = toks.slice(i, math.min(i + 3, toks.length))
          .map(t => if (t == null) "" else t).mkString(" ")
        val u = UTF8String.fromString(s)
        org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
      }.distinct.sorted
      assert(got == want, s"tokens=$toks")
    }
  }
}
