package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TextQueries

/** Misra-Gries candidate-superset guarantee behind t15_heavy_hitters
  * (SURVEY.md §2.13): any token with in-stream count > n/(m+1) must
  * survive the summary, for every arrival order. The confirm pass then
  * makes the final output exact — these tests pin the part the oracle
  * cannot see (that the sketch never drops a true heavy hitter).
  */
class HeavyHitterSpec extends AnyFunSuite {

  private def exactCounts(xs: Seq[String]): Map[String, Int] =
    xs.groupBy(identity).view.mapValues(_.size).toMap

  test("MG summary keeps every token with count > n/(m+1), any order") {
    (0 until 40).foreach { seed =>
      val rng = new scala.util.Random(seed)
      val m = 1 + rng.nextInt(8)
      // skewed stream: few heavy keys over a long tail
      val heavy = (0 until 3).flatMap(i => Seq.fill(30 + rng.nextInt(40))(s"H$i"))
      val tail = Seq.fill(200)(s"t${rng.nextInt(150)}")
      val stream = rng.shuffle(heavy ++ tail)
      val survivors = TextQueries.misraGries(stream.iterator, m).toSet
      val n = stream.size
      val mustSurvive = exactCounts(stream).collect {
        case (k, c) if c > n.toDouble / (m + 1) => k
      }
      assert(mustSurvive.forall(survivors.contains),
        s"seed=$seed m=$m dropped ${mustSurvive.toSet -- survivors}")
    }
  }

  test("MG summary is bounded by its capacity m") {
    (0 until 20).foreach { seed =>
      val rng = new scala.util.Random(seed)
      val m = 1 + rng.nextInt(6)
      val stream = Seq.fill(500)(s"k${rng.nextInt(80)}")
      assert(TextQueries.misraGries(stream.iterator, m).size <= m)
    }
  }

  test("per-partition union is a superset of global heavy hitters") {
    // split a stream into P "partitions"; a token heavy GLOBALLY
    // (count > N/(m+1)) must survive in at least one partition
    (0 until 20).foreach { seed =>
      val rng = new scala.util.Random(seed)
      val m = 4
      val heavy = Seq.fill(120)("HOT")
      val tail = Seq.fill(300)(s"t${rng.nextInt(200)}")
      val stream = rng.shuffle(heavy ++ tail)
      val parts = stream.grouped(math.max(1, stream.size / 4)).toSeq
      val union = parts.flatMap(p => TextQueries.misraGries(p.iterator, m)).toSet
      val n = stream.size
      exactCounts(stream).collect { case (k, c) if c > n.toDouble / (m + 1) => k }
        .foreach(k => assert(union.contains(k), s"seed=$seed dropped $k"))
    }
  }
}
