package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Adversarial cases for the PII scrubber: crafted strings that the
  * three patterns must fully mask, plus shapes that must survive
  * untouched (version numbers, bare '@' mentions, short digit runs). */
class PiiScrubSpec extends SparkSpec {

  private def scrubAll(texts: Seq[String]): Seq[String] = {
    import spark.implicits._
    texts.toDF("t").select(TextAnalysis.scrubPii(col("t")).as("c"))
      .collect().map(_.getString(0)).toSeq
  }

  test("emails, IPv4s and phone numbers are fully masked") {
    val out = scrubAll(Seq(
      "mail me at first.last+tag@sub.example.co.uk today",
      "server 192.168.0.1 and 10.0.255.7 are up",
      "call 555-867-5309 or 800-555-0100",
      "mixed: a_b%c@x.io from 8.8.8.8 dial 123-456-7890"))
    assert(out(0) == "mail me at <EMAIL> today")
    assert(out(1) == "server <IP> and <IP> are up")
    assert(out(2) == "call <PHONE> or <PHONE>")
    assert(out(3) == "mixed: <EMAIL> from <IP> dial <PHONE>")
    // nothing pattern-shaped survives in any output
    assert(out.forall(s => !s.contains("@") || s.contains("<EMAIL>")))
  }

  test("non-PII look-alikes survive unscathed") {
    val out = scrubAll(Seq(
      "version 1.2.3 released",        // 3-part dotted — not an IPv4
      "thanks @handle for the report", // bare mention, no domain TLD
      "order 123-45 shipped",          // short digit run
      "pi is 3.14159"))
    assert(out == Seq(
      "version 1.2.3 released",
      "thanks @handle for the report",
      "order 123-45 shipped",
      "pi is 3.14159"))
  }
}
