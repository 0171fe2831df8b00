package graft

import scala.util.Random
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Skew}
import graft.dedup.NearDup
import graft.text.TextFunctions

/** Seeded randomized invariants: operators checked against
  * brute-force Scala reference implementations on generated data.
  * Deterministic (fixed seed) so failures reproduce. */
class InvariantSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new Random(42)

  test("keepFirst/keepLatest match brute-force per-key extremes") {
    for (_ <- 1 to 5) {
      val rows = Seq.fill(200)((rnd.nextInt(20).toLong, rnd.nextInt(1000), rnd.nextInt(100)))
        .distinct // (ver, payload) collisions would make the survivor ambiguous
      val df = rows.toDF("k", "ver", "payload")
      val first = Dedup.keepFirst(df, Seq("k"), "ver", "payload")
        .as[(Long, Int, Int)].collect().toSet
      val latest = Dedup.keepLatest(df, Seq("k"), "ver", "payload")
        .as[(Long, Int, Int)].collect().toSet
      val byKey = rows.groupBy(_._1)
      val expFirst = byKey.values.map(_.minBy(r => (r._2, r._3))).toSet
      val expLatest = byKey.values.map(_.maxBy(r => (r._2, r._3))).toSet
      assert(first === expFirst)
      assert(latest === expLatest)
    }
  }

  test("saltedJoin equals plain inner join for any salt count") {
    for (nSalts <- Seq(1, 3, 16)) {
      val big = Seq.fill(300)((rnd.nextInt(10), rnd.nextInt(10000)))
        .zipWithIndex.map { case ((k, v), i) => (i.toLong, k, v) }
        .toDF("pk", "k", "v")
      val small = Seq.tabulate(10)(k => (k, s"dim_$k")).toDF("k", "name")
      val plain = big.join(small, "k").select("pk", "name")
        .as[(Long, String)].collect().toSet
      val salted = Skew.saltedJoin(big, small, Seq("k"), nSalts, Seq("pk"))
        .select("pk", "name").as[(Long, String)].collect().toSet
      assert(salted === plain, s"nSalts=$nSalts")
    }
  }

  test("ShinglesExpr matches a naive sliding window incl. distinct order") {
    val words = Vector("a", "bb", "ccc", "dd", "e", "ff")
    for (_ <- 1 to 30) {
      val text = Seq.fill(rnd.nextInt(12))(words(rnd.nextInt(words.size))).mkString(" ")
      val n = 1 + rnd.nextInt(4)
      val toks = text.trim.split("\\s+").filter(_.nonEmpty)
      val expected = if (toks.length < n) Seq.empty[String]
        else toks.sliding(n).map(_.mkString(" ")).toSeq
      val df = Seq(text).toDF("t")
      val got = df.select(TextFunctions.shingles(col("t"), n)).as[Seq[String]].head()
      assert(got === expected, s"text='$text' n=$n")
      val gotD = df.select(TextFunctions.shinglesDistinct(col("t"), n))
        .as[Seq[String]].head()
      assert(gotD === expected.distinct, s"distinct text='$text' n=$n")
    }
  }

  test("ngramJaccardPairs matches brute-force pairwise jaccard") {
    val words = Vector("w1", "w2", "w3", "w4", "w5")
    val docs = Seq.tabulate(40) { i =>
      (i.toLong, Seq.fill(3 + rnd.nextInt(10))(words(rnd.nextInt(words.size))).mkString(" "))
    }
    val t = 0.4
    def shingleSet(s: String): Set[String] = {
      val toks = s.trim.split("\\s+")
      if (toks.length < 3) Set.empty
      else toks.sliding(3).map(_.mkString(" ")).toSet
    }
    val expected = (for {
      (ia, ta) <- docs; (ib, tb) <- docs if ia < ib
      sa = shingleSet(ta); sb = shingleSet(tb)
      if sa.nonEmpty && sb.nonEmpty
      j = sa.intersect(sb).size.toDouble / sa.union(sb).size
      if j >= t
    } yield (ia, ib)).toSet
    val got = NearDup.ngramJaccardPairs(docs.toDF("doc_id", "text"), "doc_id", "text",
        shingleSize = 3, threshold = t)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got === expected)
  }

  test("simHashPairs banded join equals the O(n^2) cross-join reference") {
    val words = Vector("x1", "x2", "x3", "x4")
    val docs = Seq.tabulate(60) { i =>
      (i.toLong, Seq.fill(2 + rnd.nextInt(8))(words(rnd.nextInt(words.size))).mkString(" "))
    }.toDF("doc_id", "text")
    val hashes = docs.select(col("doc_id"), NearDup.simHash(col("text")).as("h"))
      .filter(col("h").isNotNull).as[(Long, Long)].collect()
    val expected = (for {
      (ia, ha) <- hashes; (ib, hb) <- hashes if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 6
    } yield (ia, ib, d.toLong)).toSet
    val got = NearDup.simHashPairs(docs, "doc_id", "text", maxDist = 6)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === expected)
  }
}
