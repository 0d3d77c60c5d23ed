package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** PII redaction + pseudonymization (q62's operators). */
class PrivacySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("redact replaces EVERY numeric-id match and counts them") {
    import spark.implicits._
    val df = Seq((1L, "acct 12345 then 999 then 42")).toDF("id", "t")
    val r = df.select(
      Privacy.redact(col("t"), Privacy.NumericIdPattern, "[ID]").as("m"),
      Privacy.redactionCount(col("t"), Privacy.NumericIdPattern).as("n")).collect()(0)
    assert(r.getString(0) == "acct [ID] then [ID] then 42") // 42 is < 3 digits
    assert(r.getLong(1) == 2L)
  }

  test("email pattern hits addresses, not bare domains") {
    import spark.implicits._
    val df = Seq((1L, "mail a.b@example.com or see example.com")).toDF("id", "t")
    val r = df.select(
      Privacy.redact(col("t"), Privacy.EmailPattern, "[EMAIL]").as("m")).collect()(0)
    assert(r.getString(0) == "mail [EMAIL] or see example.com")
  }

  test("pseudonymize is deterministic, collision-free on a dense id range, and joinable") {
    import spark.implicits._
    val ids = (0L until 2000L).toDF("id")
    val p = ids.select(col("id"), Privacy.pseudonymize(col("id")).as("p"))
    assert(p.select(countDistinct(col("p"))).head.getLong(0) == 2000L)
    // same id hashes identically in a second, differently-partitioned pass
    val p2 = ids.repartition(7).select(col("id"), Privacy.pseudonymize(col("id")).as("p2"))
    assert(p.join(p2, Seq("id")).where(col("p") =!= col("p2")).count() == 0)
  }
}
