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

  test("Luhn card redaction: valid cards redact, invalid and short " +
    "digit runs survive") {
    import spark.implicits._
    import graft.text.RedactOps
    // 4111111111111111 is the classic Luhn-valid test number
    val df = Seq(
      ("plain", "pay 4111111111111111 now"),
      ("dashed", "pay 4111-1111-1111-1111 now"),
      ("spaced", "pay 4111 1111 1111 1111 now"),
      ("invalid", "ref 4111111111111112 now"),
      ("short", "id 123456789012 now"),
      ("none", "no digits at all")).toDF("name", "t")
    val out = df.select(col("name"),
        RedactOps.redactCards(col("t")).as("r"),
        size(RedactOps.extractCards(col("t"))).as("n"))
      .collect().map(r => r.getString(0) ->
        (r.getString(1), r.getInt(2))).toMap
    assert(out("plain") == (("pay [CARD] now", 1)))
    assert(out("dashed") == (("pay [CARD] now", 1)))
    assert(out("spaced") == (("pay [CARD] now", 1)))
    assert(out("invalid") == (("ref 4111111111111112 now", 0)))
    assert(out("short") == (("id 123456789012 now", 0)))
    assert(out("none") == (("no digits at all", 0)))
    // luhnValid directly
    val lv = Seq("4111111111111111", "4111111111111112", "79927398713")
      .toDF("d").select(RedactOps.luhnValid(col("d")))
      .collect().map(_.getBoolean(0))
    assert(lv(0) && !lv(1) && lv(2)) // 79927398713: canonical example
  }
}
