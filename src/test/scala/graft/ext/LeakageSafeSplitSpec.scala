package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** [[Dedup.leakageSafeSplit]] — the dedup-aware train/val/test split.
  * Pins the LEAKAGE-FREEDOM property (every member of a connected
  * near-dup cluster shares one split), the singleton degeneration (no
  * pairs ⇒ identical to the per-document [[Sampling.splitColumn]]
  * assignment), determinism/partition invariance, and stability of a
  * cluster's split under corpus growth restricted to other clusters. */
class LeakageSafeSplitSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def split(ids: Seq[Long], pairs: Seq[(Long, Long)])
      : Map[Long, (Long, String)] =
    Dedup.leakageSafeSplit(ids.toDF("doc_id"), "doc_id",
        pairs.toDF("a_id", "b_id"), 80, 10)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2))))
      .toMap

  test("every member of a cluster shares the cluster root's split") {
    val rnd = new scala.util.Random(151)
    val ids = (1L to 120L)
    val pairs = Seq.fill(60)((rnd.nextInt(60).toLong + 1, rnd.nextInt(60).toLong + 1))
      .collect { case (x, y) if x != y => (math.min(x, y), math.max(x, y)) }
      .distinct
    val got = split(ids, pairs)
    assert(got.keySet == ids.toSet)
    // clusters: union-find ground truth
    val parent = scala.collection.mutable.Map((1L to 120L).map(i => i -> i): _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    ids.groupBy(find).foreach { case (root, members) =>
      val splits = members.map(m => got(m)._2).toSet
      assert(splits.size == 1, s"cluster of $root spans splits $splits")
      members.foreach(m => assert(got(m)._1 == root, s"$m root"))
    }
  }

  test("no pairs: degenerates to the per-document split exactly") {
    val ids = (1L to 200L)
    val got = split(ids, Seq.empty)
    val plain = ids.toDF("doc_id")
      .select(col("doc_id"), Sampling.splitColumn(col("doc_id"), 80, 10).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    ids.foreach(i => assert(got(i) == ((i, plain(i)))))
    // and the buckets are real: at n = 200 every split is non-empty
    assert(got.values.map(_._2).toSet == Set("train", "val", "test"))
  }

  test("a cluster's split is stable under growth in OTHER clusters; repartition invariant") {
    val pairsA = Seq((1L, 2L), (2L, 3L))
    val before = split(Seq(1L, 2L, 3L, 50L), pairsA)
    val after = split((1L to 40L) ++ Seq(50L), pairsA ++ Seq((10L, 11L), (20L, 21L)))
    Seq(1L, 2L, 3L).foreach(i => assert(before(i) == after(i)))
    val rep = Dedup.leakageSafeSplit(
        (1L to 40L).toDF("doc_id").repartition(7), "doc_id",
        (pairsA ++ Seq((10L, 11L), (20L, 21L))).toDF("a_id", "b_id").repartition(5),
        80, 10)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    (1L to 40L).foreach(i => assert(rep(i) == after(i)))
  }

  test("groupKFold: no cluster straddles folds; dup-free ≡ plain id folds; folds in [0,k)") {
    val rnd = new scala.util.Random(77)
    val ids = (1L to 150L)
    val pairs = Seq.fill(80)((rnd.nextInt(70).toLong + 1, rnd.nextInt(70).toLong + 1))
      .collect { case (x, y) if x != y => (math.min(x, y), math.max(x, y)) }
      .distinct
    val got = Dedup.groupKFold(ids.toDF("doc_id"), "doc_id",
        pairs.toDF("a_id", "b_id"), k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.forall(t => t._3 >= 0L && t._3 < 5L))
    // every member of a cluster shares its root's fold
    val byId = got.map(t => t._1 -> t).toMap
    got.groupBy(_._2).foreach { case (root, members) =>
      assert(members.map(_._3).toSet.size == 1, s"cluster $root straddles folds")
    }
    // dup-free: identical to the plain per-id fold hash
    val plain = Dedup.groupKFold((1L to 50L).toDF("doc_id"), "doc_id",
        Seq.empty[(Long, Long)].toDF("a_id", "b_id"), k = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val direct = (1L to 50L).toDF("doc_id")
      .select(col("doc_id"), Sampling.foldColumn(col("doc_id"), 5).as("f"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    (1L to 50L).foreach(i => assert(plain(i) == direct(i)))
    assert(byId.nonEmpty)
  }
}
