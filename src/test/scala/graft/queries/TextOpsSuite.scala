package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class TextOpsSuite extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("PII scrub redacts planted emails and phone numbers") {
    val docs = Seq(
      (1L, "contact me at alice.smith+spam@example.co.uk or 555-123-4567 thanks"),
      (2L, "no pii here just plain words"),
      (3L, "two mails a@b.io c@d.org and phone 111.222.3333")).toDF("doc_id", "text")
    val scrubbed = regexp_replace(
      regexp_replace(col("text"), TextOps.emailRe, "<EMAIL>"), TextOps.phoneRe, "<PHONE>")
    val out = docs.select(col("doc_id"), scrubbed.as("s"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) === "contact me at <EMAIL> or <PHONE> thanks")
    assert(out(2L) === "no pii here just plain words")
    assert(out(3L) === "two mails <EMAIL> <EMAIL> and phone <PHONE>")
  }

  test("PII scrub is an exact no-op on the clean fixture corpus") {
    val dir = SparkTestSession.sfDir
    val row = TextOps.d08PiiScrub.run(spark, dir)
      .agg(sum("n_emails"), sum("n_phones")).head()
    assert(row.getLong(0) === 0L)
    assert(row.getLong(1) === 0L)
  }

  test("language-id scores are deterministic and argmax picks the max") {
    val dir = SparkTestSession.sfDir
    val rows = TextOps.d05LangId.run(spark, dir)
      .select("s_de", "s_en", "s_es", "s_fr", "s_zh", "predicted_lang")
      .collect()
    rows.foreach { r =>
      val scores = Map(
        "de" -> r.getInt(0), "en" -> r.getInt(1), "es" -> r.getInt(2),
        "fr" -> r.getInt(3), "zh" -> r.getInt(4))
      val best = scores.maxBy { case (l, s) => (s, -l.head.toInt) } // max score, lex-smallest tie
      val maxScore = scores.values.max
      val lexFirstMax = scores.filter(_._2 == maxScore).keys.min
      assert(r.getString(5) === lexFirstMax, s"scores=$scores")
      assert(best._2 === maxScore)
    }
  }
}
