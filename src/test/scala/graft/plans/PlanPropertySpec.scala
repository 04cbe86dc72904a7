package graft.plans

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property coverage for the custom Catalyst pieces: the as-of merge
  * (buffer reuse, candidate-key tracking, tie-breaks) against a
  * brute-force reference, and Hash-to-Min clustering against
  * union-find — random inputs exercise corner shapes (duplicate
  * timestamps, keys on one side only, singleton partitions) that
  * hand-written cases miss.
  */
object PlanPropertySpec extends Properties("plans") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = graft.SparkSpec.session
  import spark.implicits._

  property("as-of join equals brute-force latest-at-or-before") = {
    val rows = for {
      nl <- Gen.chooseNum(0, 25)
      nr <- Gen.chooseNum(0, 25)
      ls <- Gen.listOfN(nl, Gen.zip(
        Gen.chooseNum(0, 4), Gen.chooseNum(0L, 20L)))
      rs <- Gen.listOfN(nr, Gen.zip(
        Gen.chooseNum(0, 4), Gen.chooseNum(0L, 20L)))
    } yield (ls, rs)

    forAll(rows) { case (ls, rs) =>
      val left = ls.zipWithIndex.map { case ((k, t), i) =>
        (s"k$k", t, i.toLong)
      }
      val right = rs.zipWithIndex.map { case ((k, t), i) =>
        (s"k$k", t, (1000 + i).toLong)
      }
      val expected = left.flatMap { case (k, lt, lid) =>
        val cands = right.filter { case (rk, rt, _) => rk == k && rt <= lt }
        if (cands.isEmpty) None
        else {
          // max time, then max id — mirrors rightTieBreak = Seq(id)
          val best = cands.maxBy { case (_, rt, rid) => (rt, rid) }
          Some((lid, best._3))
        }
      }.sorted

      val got =
        if (left.isEmpty) Seq.empty
        else AsofJoin.asof(
          left.toDF("k", "lts", "lid"),
          right.toDF("k", "rts", "rid"),
          Seq("k"), "lts", "rts", rightTieBreak = Seq("rid"))
          .select("lid", "rid")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted

      Prop(got == expected) :|
        s"got=${got.take(5)} expected=${expected.take(5)}"
    }
  }

  property("clustering equals union-find components") = {
    val edges = for {
      n <- Gen.chooseNum(1, 12)
      es <- Gen.listOfN(n, Gen.zip(Gen.chooseNum(0L, 15L), Gen.chooseNum(0L, 15L)))
    } yield es.filter { case (a, b) => a != b }

    forAll(edges) { es =>
      if (es.isEmpty) Prop(true)
      else {
        // reference: union-find
        val parent = scala.collection.mutable.Map[Long, Long]()
        def find(x: Long): Long = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        es.foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        val expected = parent.keys.map(x => x -> find(x)).toMap

        val got = graft.operators.DedupClusters
          .components(es.toDF("a", "b"), "a", "b")
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        Prop(got == expected) :| s"got=$got expected=$expected"
      }
    }
  }
}
