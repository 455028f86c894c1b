package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PII redaction: emails/URLs/IPs/phones → typed tokens, pattern order
  * (URL before IP, email before phone), untouched clean text.
  */
class RedactSpec extends SparkSpec {

  private def redact(s: String): String = {
    import spark.implicits._
    Seq(s).toDF("t").select(TextAnalysis.redactPii(col("t")).as("r"))
      .collect().head.getString(0)
  }

  test("email, url, ip, phone each redact to their token") {
    assert(redact("mail a.b+c@ex-1.org now") == "mail <EMAIL> now")
    assert(redact("see https://ex.org/a?b=1 ok") == "see <URL> ok")
    assert(redact("host 192.168.0.1 up") == "host <IP> up")
    assert(redact("call +1 (555) 123-4567 today") == "call <PHONE> today")
  }

  test("order: URL with embedded host/IP wins; email digits are not phones") {
    assert(redact("http://10.0.0.7/x") == "<URL>")
    assert(redact("a12345678901@ex.org") == "<EMAIL>")
  }

  test("clean text is untouched") {
    val s = "an ordinary sentence with numbers 42 and 7."
    assert(redact(s) == s)
  }
}
