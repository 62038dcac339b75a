package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RedactSpec extends SparkSpec {
  import spark.implicits._

  private def run(texts: Seq[String]) = {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val cols = col("id") +:
      Redact.piiCounts(col("text")).map { case (n, c) => c.as(n) } :+
      Redact.redact(col("text")).as("red")
    df.select(cols: _*).orderBy("id").collect().toSeq
  }

  test("emails, IPs, and phones are redacted and counted") {
    val out = run(Seq(
      "write to alice.smith+tag@example.co.uk today",
      "server at 192.168.0.1 and backup 10.0.0.255",
      "call 555-123-4567 or 555.987.6543",
      "no pii here at all"))
    assert(out(0).getAs[String]("red") === "write to <EMAIL> today")
    assert(out(0).getAs[Int]("n_emails") === 1)
    assert(out(1).getAs[String]("red") === "server at <IP> and backup <IP>")
    assert(out(1).getAs[Int]("n_ips") === 2)
    assert(out(2).getAs[String]("red") === "call <PHONE> or <PHONE>")
    assert(out(2).getAs[Int]("n_phones") === 2)
    assert(out(3).getAs[String]("red") === "no pii here at all")
    assert(out(3).getAs[Int]("n_emails") === 0)
    assert(out(3).getAs[Int]("n_ips") === 0)
    assert(out(3).getAs[Int]("n_phones") === 0)
  }

  test("mixed pii in one document; counts measured on the original text") {
    val out = run(Seq("mail a@b.io ip 1.2.3.4 tel 111-222-3333 end"))
    val r = out.head
    assert(r.getAs[String]("red") === "mail <EMAIL> ip <IP> tel <PHONE> end")
    assert(r.getAs[Int]("n_emails") === 1)
    assert(r.getAs[Int]("n_ips") === 1)
    assert(r.getAs[Int]("n_phones") === 1)
  }

  test("word boundaries: versions and long digit runs are not IPs/phones") {
    val out = run(Seq(
      "version 1.2.3.4567 stays",   // last octet 4 digits -> \\b fails
      "id 123456789012 stays"))
    assert(out(0).getAs[Int]("n_ips") === 0)
    assert(out(1).getAs[Int]("n_phones") === 0)
    assert(out(0).getAs[String]("red") === "version 1.2.3.4567 stays")
  }

  test("null text propagates null") {
    val df = Seq((1L, null: String)).toDF("id", "text")
    val cols = Redact.piiCounts(col("text")).map { case (n, c) => c.as(n) } :+
      Redact.redact(col("text")).as("red")
    val r = df.select(cols: _*).collect().head
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3))
  }
}
