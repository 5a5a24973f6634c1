package graft.plans

import graft.SparkSpec
import org.apache.spark.unsafe.types.UTF8String

/** The normalization kernels implement the Unicode standard forms: NFC
  * fuses decomposed sequences, accent folding drops exactly the
  * non-spacing marks, standalone letters survive, and the ASCII fast
  * path is zero-copy. The q184 oracle checks the same claims against
  * DuckDB's independent implementation; this pins the kernel-level
  * contract directly. All non-ASCII material is written as \u escapes —
  * a source file saved through a normalizing editor would otherwise
  * silently fuse the decomposed fixtures.
  */
class TextNormalizeSpec extends SparkSpec {

  private def u(s: String) = UTF8String.fromString(s)

  private val PreE = "caf\u00e9"          // precomposed é
  private val DecE = "cafe\u0301"         // e + combining acute

  test("NFC fuses decomposed sequences to their precomposed twins") {
    assert(TextNormalizeImpl.nfc(u(DecE)).toString == PreE)
    assert(TextNormalizeImpl.nfc(u("u\u0308ber")).toString == "\u00fcber")
    // already-NFC input is a fixed point
    assert(TextNormalizeImpl.nfc(u(PreE)).toString == PreE)
  }

  test("strip_accents drops marks but keeps standalone letters") {
    assert(TextNormalizeImpl.stripAccents(
      u("caf\u00e9 r\u00e9sum\u00e9")).toString == "cafe resume")
    assert(TextNormalizeImpl.stripAccents(u(DecE)).toString == "cafe")
    assert(TextNormalizeImpl.stripAccents(
      u("n\u00f1o\u0303no")).toString == "nnono")
    // ø, œ, ß are letters, not combining marks — they must survive
    val letters = "s\u00f8ster \u0153uvre stra\u00dfe"
    assert(TextNormalizeImpl.stripAccents(u(letters)).toString == letters)
  }

  test("ASCII fast path returns the SAME UTF8String instance (zero-copy)") {
    val s = u("plain ascii text")
    assert(TextNormalizeImpl.nfc(s) eq s)
    assert(TextNormalizeImpl.stripAccents(s) eq s)
  }

  test("supplementary-plane combining marks strip at CODEPOINT level") {
    // U+1D165 MUSICAL SYMBOL COMBINING STEM (category Mc) encodes as a
    // surrogate pair; a per-char loop would type each half SURROGATE and
    // keep it, diverging from DuckDB's codepoint-level mark strip
    val withMark = "ab" + new String(Character.toChars(0x1D165)) + "cd"
    assert(TextNormalizeImpl.stripAccents(u(withMark)).toString == "abcd")
    // non-mark supplementary chars survive (e.g. U+1D11E G CLEF, category So)
    val clef = new String(Character.toChars(0x1D11E))
    assert(TextNormalizeImpl.stripAccents(u("a" + clef + "b")).toString
      == "a" + clef + "b")
  }

  test("both are idempotent on their own output") {
    val messy = u("caf\u00e9 stra\u00dfe u\u0308ber n\u00f1o")
    val n1 = TextNormalizeImpl.nfc(messy)
    assert(TextNormalizeImpl.nfc(n1).toString == n1.toString)
    val f1 = TextNormalizeImpl.stripAccents(messy)
    assert(TextNormalizeImpl.stripAccents(f1).toString == f1.toString)
  }

  test("SQL surface: codegen path, null-safe, composes with md5 fingerprints") {
    import spark.implicits._
    val df = Seq(Some(PreE), Some(DecE), None).toDF("s")
      .selectExpr("s", "nfc_normalize(s) AS n", "strip_accents(s) AS f",
        "md5(cast(nfc_normalize(s) AS binary)) AS fp")
    val rows = df.collect()
    // the two spellings fingerprint IDENTICALLY after NFC — the dedup point
    assert(rows(0).getString(1) == rows(1).getString(1))
    assert(rows(0).getString(3) == rows(1).getString(3))
    assert(rows(0).getString(2) == "cafe" && rows(1).getString(2) == "cafe")
    assert(rows(2).isNullAt(1) && rows(2).isNullAt(2))
  }
}
