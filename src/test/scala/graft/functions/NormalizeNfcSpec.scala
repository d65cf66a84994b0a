package graft.functions

import graft.testkit.SparkSpec
import graft.text.TextAnalysis
import org.apache.spark.sql.functions._

class NormalizeNfcSpec extends SparkSpec {
  import spark.implicits._

  private val Decomposed = "e\u0301" // e + combining acute
  private val Composed = "\u00e9"   // precomposed

  test("nfc composes decomposed sequences and is identity on ascii/composed") {
    val d = Seq(
      (1L, s"caf$Decomposed"),
      (2L, s"caf$Composed"),
      (3L, "Å"),                 // angstrom sign -> NFC U+00C5
      (4L, "plain ascii stays put"),
      (5L, "ｆullwidth survives nfc")) // NFKC would fold it; NFC must not
      .toDF("id", "s")
    val out = d.select(col("id"), TextAnalysis.normalizeNfc(col("s")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == s"caf$Composed")
    assert(out(2L) == s"caf$Composed")
    assert(out(3L) == "\u00c5")
    assert(out(4L) == "plain ascii stays put")
    assert(out(5L) == "ｆullwidth survives nfc")
  }

  test("normalized dedup keys converge where raw ones diverge") {
    val d = Seq((1L, s"caf$Decomposed"), (2L, s"caf$Composed"))
      .toDF("doc_id", "text")
    val raw = d.select(Hashing.hash60(col("text")).as("h")).distinct().count()
    val norm = d.select(
      Hashing.hash60(TextAnalysis.normalizeNfc(col("text"))).as("h"))
      .distinct().count()
    assert(raw == 2L && norm == 1L)
  }
}
