package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** All non-ASCII content spelled with explicit \\u escapes: source
  * files travel through editors/tools that silently NFC-normalize,
  * which would rewrite a decomposed test vector into its composed
  * form and hollow the test out. */
class NfcNormalizeSpec extends SparkSpec {
  import spark.implicits._

  private val Acute = "\u0301" // combining acute
  private val Ring = "\u030A" // combining ring above
  private val EAcute = "\u00e9"
  private val ARing = "\u00c5"

  test("canonical composition vectors through the codegen path; " +
    "composed text and ASCII pass through; idempotent") {
    val docs = Seq(
      (1L, "e" + Acute),            // decomposed
      (2L, EAcute),                 // precomposed
      (3L, "A" + Ring),             // decomposed
      (4L, "plain ascii"),
      (5L, ""),
      (6L, s"mixed e$Acute and $EAcute text")).toDF("id", "t")
    val got = docs.select(col("id"), NfcNormalize(col("t")).as("n"))
      .as[(Long, String)].collect().toMap
    assert(got(1L) == EAcute)
    assert(got(2L) == EAcute)
    assert(got(3L) == ARing)
    assert(got(4L) == "plain ascii")
    assert(got(5L) == "")
    assert(got(6L) == s"mixed $EAcute and $EAcute text")
    // idempotence: normalizing the output changes nothing
    val twice = docs.select(col("id"),
        NfcNormalize(NfcNormalize(col("t"))).as("n"))
      .as[(Long, String)].collect().toMap
    assert(twice == got)
    // null propagates
    val n = Seq((7L, null: String)).toDF("id", "t")
      .select(NfcNormalize(col("t"))).collect().head
    assert(n.isNullAt(0))
  }

  test("fast path: already-normalized input returns the SAME " +
    "UTF8String instance — zero allocation on the hot path") {
    val s = UTF8String.fromString("already normalized ascii")
    assert(NfcNormalize.normalize(s, "NFC") eq s)
    val composed = UTF8String.fromString("caf" + EAcute)
    assert(NfcNormalize.normalize(composed, "NFC") eq composed)
    val decomposed = UTF8String.fromString("cafe" + Acute)
    val out = NfcNormalize.normalize(decomposed, "NFC")
    assert(!(out eq decomposed) && out.toString == "caf" + EAcute)
  }

  test("exact dedup motivation: decomposed and composed spellings " +
    "hash apart until normalized, together after") {
    val docs = Seq((1L, "cafe" + Acute), (2L, "caf" + EAcute))
      .toDF("id", "t")
    val raw = docs.select(md5(col("t"))).distinct().count()
    val norm = docs.select(md5(NfcNormalize(col("t")))).distinct().count()
    assert(raw == 2L && norm == 1L)
  }

  test("NFKC folds compatibility characters (ligature, fullwidth, " +
    "superscript) that NFC leaves alone") {
    val fi = "\ufb01"        // latin small ligature fi
    val fullA = "\uff21"     // fullwidth A
    val sup2 = "\u00b2"      // superscript two
    val docs = Seq((1L, s"$fi le $fullA $sup2")).toDF("id", "t")
    val nfc = docs.select(NfcNormalize(col("t"), "NFC"))
      .as[String].head()
    val nfkc = docs.select(NfcNormalize(col("t"), "NFKC"))
      .as[String].head()
    assert(nfc == s"$fi le $fullA $sup2", "NFC must not compat-fold")
    assert(nfkc == "fi le A 2", s"NFKC must fold: $nfkc")
    // NFD decomposes what NFC composes
    val nfd = Seq((1L, EAcute)).toDF("id", "t")
      .select(NfcNormalize(col("t"), "NFD")).as[String].head()
    assert(nfd == "e" + Acute)
    intercept[IllegalArgumentException] {
      NfcNormalize(col("t"), "NFX")
    }
  }
}
