package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.text.RedactOps

class RedactSpec extends AnyFunSuite {
  lazy val spark = GraftSession.builder("4").getOrCreate()

  private def scrub(s: String): String = {
    import spark.implicits._
    Seq(s).toDF("t").select(RedactOps.redactPii(col("t"))).head().getString(0)
  }

  test("redactPii handles each category and leaves clean text alone") {
    assert(scrub("mail a.b+c@ex-ample.co.uk now") == "mail [EMAIL] now")
    assert(scrub("see https://ex.com/a?b=1#c end") == "see [URL] end")
    assert(scrub("host 192.168.001.1 up") == "host [IP] up")
    assert(scrub("call 555-0142 or 020 7946 0958.") ==
      "call [PHONE] or [PHONE].")
    assert(scrub("no pii here, just 42 words.") ==
      "no pii here, just 42 words.")
  }

  test("ordering: URL swallows its host IP; emails keep digits from phones") {
    assert(scrub("at http://10.1.2.3/x page") == "at [URL] page")
    // digits inside an email must not be phone-matched post-redaction
    assert(scrub("user555.0142@ex.com") == "[EMAIL]")
  }

  test("piiProfile counts per category") {
    import spark.implicits._
    val row = Seq("a@b.co c@d.io https://e.fr 1.2.3.4 555-0100")
      .toDF("t").select(RedactOps.piiProfile(col("t")).as("p"))
      .select("p.n_emails", "p.n_urls", "p.n_ips", "p.n_phones").head()
    assert((row.getInt(0), row.getInt(1), row.getInt(2), row.getInt(3)) ==
      ((2, 1, 1, 1)))
  }
}
