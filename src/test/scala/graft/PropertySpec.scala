package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** ScalaCheck invariants for sort/dedup/join/concat/explode — the
  * properties the reference pins by example (SURVEY.md §5 port strategy
  * item 3), checked over randomized small frames.
  */
class PropertySpec extends SparkSuite {

  private val params = SCTest.Parameters.default
    .withMinSuccessfulTests(8)
    .withWorkers(1)

  private def check(name: String, p: Prop): Unit =
    assert(SCTest.check(params, p).passed, s"property failed: $name")

  private val smallInts: Gen[List[Int]] =
    Gen.chooseNum(1, 12).flatMap(n => Gen.listOfN(n, Gen.chooseNum(-5, 5)))

  test("sort_values returns an ordered permutation") {
    check("sort-perm", Prop.forAll(smallInts) { xs =>
      val df = MDFrame(frame("a" -> xs))
      val got = collectCol[Int](df.sortValues(Seq("a")).ds, "a")
      got == xs.sorted
    })
  }

  test("drop_duplicates: distinct keys, survivors drawn from original rows, all keys kept") {
    check("dedup", Prop.forAll(smallInts) { xs =>
      val df = MDFrame(frame("a" -> xs, "b" -> xs.indices.toList))
      val got = df.dropDuplicates(Seq("a"), orderCols = Seq("b")).ds.collect()
        .map(r => (r.getInt(0), r.getInt(1)))
      val keys = got.map(_._1).toList
      keys == keys.distinct.sorted &&
        keys.toSet == xs.toSet &&
        got.forall { case (a, b) => xs.indices.contains(b) && xs(b) == a }
    })
  }

  test("join key semantics: inner=intersection, left=left keys, outer=union (unique keys)") {
    check("join-keys", Prop.forAll(smallInts, smallInts) { (l0, r0) =>
      val l = l0.distinct; val r = r0.distinct
      val lf = MDFrame(frame("i" -> l, "a" -> l.map(_ * 2)), Seq("i"))
      val rf = MDFrame(frame("i" -> r, "b" -> r.map(_ * 3)), Seq("i"))
      def keys(how: String) =
        collectCol[Int](MDFrame.join(how, Seq(lf, rf)).ds, "i").toList
      keys("inner") == l.toSet.intersect(r.toSet).toList.sorted &&
        keys("left") == l.sorted &&
        keys("outer") == (l.toSet ++ r.toSet).toList.sorted
    })
  }

  test("concat strict preserves total row count and multiset") {
    check("concat", Prop.forAll(smallInts, smallInts) { (xs, ys) =>
      val c = MDFrame.concat(Seq(MDFrame(frame("a" -> xs)), MDFrame(frame("a" -> ys))))
      collectCol[Int](c.ds.orderBy("a"), "a").toList == (xs ++ ys).sorted
    })
  }

  test("explode emits exactly sum-of-array-sizes rows, values preserved") {
    check("explode", Prop.forAll(Gen.listOfN(4, smallInts)) { lists =>
      val df = MDFrame(frame(
        "a" -> lists.map(l => l: Any),
        "b" -> lists.indices.toList))
      val got = df.explodeCol("a").ds.collect().map(r => (r.getInt(1), r.getInt(0)))
      got.length == lists.map(_.size).sum &&
        lists.indices.forall(i =>
          got.filter(_._1 == i).map(_._2).sorted.toList == lists(i).sorted)
    })
  }
}
