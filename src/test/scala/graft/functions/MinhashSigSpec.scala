package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Codegen minhash expression properties. */
class MinhashSigSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("signature is set-order invariant and monotone under union") {
    import spark.implicits._
    val a = Seq(Tuple1(Seq(1L, 2L, 3L))).toDF("s")
    val b = Seq(Tuple1(Seq(3L, 1L, 2L))).toDF("s")
    val u = Seq(Tuple1(Seq(1L, 2L, 3L, 4L))).toDF("s")
    def sig(df: org.apache.spark.sql.DataFrame) =
      df.select(expr("graft_minhash(s, 64)")).head.getSeq[Long](0)
    assert(sig(a) == sig(b), "order invariant")
    // union minima are elementwise <= subset minima
    assert(sig(u).zip(sig(a)).forall { case (x, y) => x <= y })
  }

  test("identical sets share the full signature; disjoint sets differ in most positions") {
    import spark.implicits._
    val x = Seq(Tuple1((1L to 50L).toSeq)).toDF("s")
    val y = Seq(Tuple1((100L to 150L).toSeq)).toDF("s")
    def sig(df: org.apache.spark.sql.DataFrame) =
      df.select(expr("graft_minhash(s, 64)")).head.getSeq[Long](0)
    assert(sig(x) == sig(x))
    val agree = sig(x).zip(sig(y)).count { case (a, b) => a == b }
    assert(agree <= 8, s"disjoint sets agreed on $agree/64 positions")
  }

  test("positions >= 64 are independent of their j-64 mirrors (block re-seeding)") {
    import spark.implicits._
    val df = Seq(Tuple1((1L to 40L).toSeq)).toDF("s")
    val sig = df.select(expr("graft_minhash(s, 128)")).head.getSeq[Long](0)
    val (first, second) = (sig.take(64), sig.drop(64))
    // before block re-seeding the halves were bit-identical (rotl period 64)
    assert(first != second)
    val agree = first.zip(second).count { case (a, b) => a == b }
    assert(agree <= 8, s"mirror positions agreed on $agree/64")
  }

  test("interpreted eval equals the codegen path, incl. the multi-block (>64) loop") {
    import spark.implicits._
    for (numHashes <- Seq(32, 128)) {
      val df = Seq(Tuple1(Seq(5L, 17L, 99L, -3L))).toDF("s")
      val viaCodegen = df.select(expr(s"graft_minhash(s, $numHashes)")).head.getSeq[Long](0)
      val e = MinhashSig(org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(5L, 17L, 99L, -3L),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType)), numHashes)
      val viaEval = e.eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toLongArray().toSeq
      assert(viaCodegen == viaEval, s"numHashes=$numHashes")
    }
  }
}
