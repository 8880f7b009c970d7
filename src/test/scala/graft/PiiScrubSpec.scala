package graft

import org.apache.spark.sql.functions._
import graft.pipeline.PiiScrub

/** Pins the PII-scrub contracts: per-kind detection, shape-exclusive
  * digit patterns (a dotted phone is not an IP and vice versa),
  * fixed-order redaction, and the drop-don't-redact filter. */
class PiiScrubSpec extends SparkSpec {
  import spark.implicits._

  private def one(text: String) = Seq(text).toDF("t")

  private def counts(text: String): Map[String, Int] = {
    val row = one(text).select(
      PiiScrub.patterns.map(p =>
        PiiScrub.count(col("t"), p._1).as(p._1)): _*).head()
    PiiScrub.patterns.map(_._1).zipWithIndex
      .map { case (k, i) => k -> row.getInt(i) }.toMap
  }

  test("each kind detects its own shape and only it") {
    assert(counts("mail a.b+c@test.org now") ==
      Map("email" -> 1, "card" -> 0, "ssn" -> 0, "phone" -> 0, "ip" -> 0))
    assert(counts("card 4111-1111-1111-1234.") ==
      Map("email" -> 0, "card" -> 1, "ssn" -> 0, "phone" -> 0, "ip" -> 0))
    assert(counts("ssn 123-45-6789 ok") ==
      Map("email" -> 0, "card" -> 0, "ssn" -> 1, "phone" -> 0, "ip" -> 0))
    assert(counts("call 555-010-1234 or 555.010.4321") ==
      Map("email" -> 0, "card" -> 0, "ssn" -> 0, "phone" -> 2, "ip" -> 0))
    assert(counts("host 10.0.3.25 up") ==
      Map("email" -> 0, "card" -> 0, "ssn" -> 0, "phone" -> 0, "ip" -> 1))
  }

  test("digit shapes are mutually exclusive") {
    // dotted phone (3.3.4) is not a dotted quad; an IP is not a phone
    assert(counts("x 555.123.4567 y")("ip") == 0)
    assert(counts("x 10.0.3.25 y")("phone") == 0)
    // a 9-digit run without separators matches nothing
    assert(counts("ref 123456789").values.sum == 0)
  }

  test("redact masks every kind and leaves clean text alone") {
    val dirty = "ask a@b.co or 555-010-1234, ssn 123-45-6789, " +
      "ip 10.0.0.1, card 4111 1111 1111 1111"
    val out = one(dirty).select(PiiScrub.redact(col("t"))).head().getString(0)
    assert(out == "ask [EMAIL] or [PHONE], ssn [SSN], ip [IP], card [CARD]")
    val clean = "no personal data here, just 42 words"
    assert(one(clean).select(PiiScrub.redact(col("t")))
      .head().getString(0) == clean)
  }

  test("cleanEnough implements drop-don't-redact") {
    val df = Seq("clean text", "mail a@b.co", "a@b.co and 10.0.0.1")
      .toDF("t")
    assert(df.filter(PiiScrub.cleanEnough(col("t"))).count() == 1)
    assert(df.filter(PiiScrub.cleanEnough(col("t"), maxHits = 1))
      .count() == 2)
  }
}
