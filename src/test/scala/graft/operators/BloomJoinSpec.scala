package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class BloomJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Independent bit-by-bit reference of the whole filter: the same
    * double-hashing contract re-derived from the portable hash in plain
    * Scala (no Columns shared with the implementation). */
  private def refHash(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }
  private def refPositions(key: String, m: Int, j: Int): Seq[Long] = {
    val log2m = java.lang.Integer.numberOfTrailingZeros(m)
    val h = refHash(key)
    val h1 = h & (m - 1)
    val h2 = ((h >> log2m) & (m - 1)) | 1L
    (0 until j).map(i => (h1 + i * h2) & (m - 1))
  }
  private def refMight(key: String, words: Array[Long], m: Int, j: Int): Boolean =
    refPositions(key, m, j).forall(p => ((words((p >> 6).toInt) >> (p & 63)) & 1L) == 1L)

  private val m = 1 << 12
  private val j = 4

  test("bloomWords matches an independently built bitset (set semantics, any partitioning)") {
    val keys = (0L until 400L).map(k => k * 37 % 1000)
    val dim = keys.toDF("k").repartition(7) // dups + odd partitioning
    val got = BloomJoin.bloomWords(dim, col("k"), m, j)

    val want = new Array[Long](m / 64)
    keys.distinct.foreach { k =>
      refPositions(k.toString, m, j).foreach(p => want((p >> 6).toInt) |= 1L << (p & 63))
    }
    assert(got.toSeq == want.toSeq)
  }

  test("mightContain: zero false negatives; false-positive rate within a sane bound") {
    val dimKeys = (0L until 300L).map(_ * 13 + 7)
    val words = BloomJoin.bloomWords(dimKeys.toDF("k"), col("k"), m, j)

    val probe = (0L until 5000L).toDF("k")
      .select(col("k"), BloomJoin.mightContain(col("k"), words.toSeq, m, j).as("hit"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap

    val inSet = dimKeys.toSet
    // every member passes
    assert(dimKeys.forall(k => probe.getOrElse(k, false)))
    // spark probe == independent reference on EVERY key (members and not)
    probe.foreach { case (k, hit) =>
      assert(hit == refMight(k.toString, words, m, j), s"key $k")
    }
    // fp rate: expected ~(1-e^(-j*n/m))^j ≈ 0.4% here; assert an order above
    val nonMembers = probe.filterNot { case (k, _) => inSet(k) }
    val fp = nonMembers.count(_._2).toDouble / nonMembers.size
    assert(fp < 0.05, s"false-positive rate $fp")
  }

  test("positionsJvm is interchangeable with the Column path: same bitset from either side") {
    val keys = (0L until 250L).map(k => k * 91 % 700)
    val colWords = BloomJoin.bloomWords(keys.toDF("k"), col("k"), m, j)
    val jvmWords = new Array[Long](m / 64)
    keys.distinct.foreach { k =>
      BloomJoin.positionsJvm(k.toString, m, j)
        .foreach(p => jvmWords((p >> 6).toInt) |= 1L << (p & 63))
    }
    assert(colWords.toSeq == jvmWords.toSeq)
  }

  test("bloomSemiJoin == plain semi join (exactness), and the prefilter actually prunes") {
    val dir = "/root/testdata/sf0.001"
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val dim = spark.read.parquet(s"$dir/customer.parquet")
      .where(col("c_mktsegment") === "BUILDING")

    val got = BloomJoin.bloomSemiJoin(orders, "o_custkey", dim, "c_custkey", m, j)
      .select("o_orderkey").as[Long].collect().sorted
    val want = orders
      .join(dim.select("c_custkey"), col("o_custkey") === col("c_custkey"), "left_semi")
      .select("o_orderkey").as[Long].collect().sorted
    assert(got.toSeq == want.toSeq)

    // the prefilter alone must reject most non-matching rows
    val words = BloomJoin.bloomWords(dim, col("c_custkey"), m, j)
    val pre = orders.where(BloomJoin.mightContain(col("o_custkey"), words.toSeq, m, j)).count()
    val total = orders.count()
    assert(pre < total, "prefilter rejected nothing")
    assert(pre >= want.length, "prefilter dropped true matches")
  }

  test("mightContainSql replicates the probe in DuckDB-compatible SQL (string form parity)") {
    // We cannot run DuckDB here; instead assert the generated SQL embeds the
    // same constants the Scala probe uses (mask, log2m, word indices), and
    // that the Spark-side filter is deterministic under repartitioning.
    val words = BloomJoin.bloomWords((0L until 50L).toDF("k"), col("k"), m, j)
    val sql = BloomJoin.mightContainSql("o_custkey", words, m, j)
    assert(sql.contains(s"& ${m - 1}"))
    assert(sql.contains(s">> ${java.lang.Integer.numberOfTrailingZeros(m)}"))

    val a = (0L until 2000L).toDF("k").repartition(3)
      .where(BloomJoin.mightContain(col("k"), words.toSeq, m, j))
      .as[Long].collect().sorted.toSeq
    val b = (0L until 2000L).toDF("k").repartition(11)
      .where(BloomJoin.mightContain(col("k"), words.toSeq, m, j))
      .as[Long].collect().sorted.toSeq
    assert(a == b)
  }
}
