package graft

/** Golden values ported from the reference's tests/test_join.py
  * (n-way joins on the index, J1-J5 in SURVEY.md §2.4).
  */
class JoinSpec extends SparkSuite {

  private def df1 = MDFrame(frame("i" -> Seq(0, 1, 2), "a" -> Seq(3, 4, 5)), Seq("i"))
  private def df2 = MDFrame(frame("i" -> Seq(2, 1, 0), "b" -> Seq(6, 7, 8)), Seq("i"))
  private def df3 = MDFrame(frame("i" -> Seq(1, 2, 7), "c" -> Seq("a", "b", "c")), Seq("i"))

  test("3-way left join: keys from first frame, zero-fill, key-sorted (test_join.py:101-146)") {
    val j = MDFrame.join("left", Seq(df1, df2, df3))
    assert(collectCol[Int](j.ds, "i") == Seq(0, 1, 2))
    assert(collectCol[Int](j.ds, "a") == Seq(3, 4, 5))
    assert(collectCol[Int](j.ds, "b") == Seq(8, 7, 6))
    assert(collectCol[String](j.ds, "c") == Seq("", "a", "b"))
  }

  test("3-way inner join: keys present in all frames") {
    val j = MDFrame.join("inner", Seq(df1, df2, df3))
    assert(collectCol[Int](j.ds, "i") == Seq(1, 2))
    assert(collectCol[Int](j.ds, "a") == Seq(4, 5))
    assert(collectCol[String](j.ds, "c") == Seq("a", "b"))
  }

  test("3-way outer join: union of keys, dtype-zero fill (ints→0, strings→\"\")") {
    val j = MDFrame.join("outer", Seq(df1, df2, df3))
    assert(collectCol[Int](j.ds, "i") == Seq(0, 1, 2, 7))
    assert(collectCol[Int](j.ds, "a") == Seq(3, 4, 5, 0))
    assert(collectCol[Int](j.ds, "b") == Seq(8, 7, 6, 0))
    assert(collectCol[String](j.ds, "c") == Seq("", "a", "b", "c"))
  }

  test("right join = reversed left (dataframe.py:1134-1135)") {
    val j = MDFrame.join("right", Seq(df1, df2, df3))
    assert(collectCol[Int](j.ds, "i") == Seq(1, 2, 7))
    assert(collectCol[Int](j.ds, "a") == Seq(4, 5, 0))
    assert(collectCol[String](j.ds, "c") == Seq("a", "b", "c"))
  }

  test("join by index position: differing index names unify to the first frame's (test_join.py:224-241)") {
    val left = MDFrame(frame("a" -> Seq(2, 1, 1), "c" -> Seq(0, 1, 2)), Seq("a"))
    val right = MDFrame(frame("A" -> Seq(1), "b" -> Seq("x")), Seq("A"))
    val j = MDFrame.join("left", Seq(left, right))
    // duplicate keys in the first frame repeat rows; output key-sorted
    val got = rows(j.ds.orderBy("a", "c"))
    assert(got == Seq(Seq(1, 1, "x"), Seq(1, 2, "x"), Seq(2, 0, "")))
    assert(j.ds.columns.toSeq == Seq("a", "c", "b"))
  }

  test("unsuffixed same-named columns: rightmost frame wins (test_join.py:160-178)") {
    val l = MDFrame(frame("i" -> Seq(0, 1), "v" -> Seq(1, 2)), Seq("i"))
    val r = MDFrame(frame("i" -> Seq(0, 1), "v" -> Seq(30, 40)), Seq("i"))
    val j = MDFrame.join("left", Seq(l, r))
    assert(collectCol[Int](j.ds, "v") == Seq(30, 40))
  }

  test("suffixes rename per-frame value columns (test_join.py:160-178)") {
    val l = MDFrame(frame("i" -> Seq(0, 1), "v" -> Seq(1, 2)), Seq("i"))
    val r = MDFrame(frame("i" -> Seq(0, 1), "v" -> Seq(30, 40)), Seq("i"))
    val j = MDFrame.join("left", Seq(l, r), Seq(None, Some("_r")))
    assert(collectCol[Int](j.ds, "v") == Seq(1, 2))
    assert(collectCol[Int](j.ds, "v_r") == Seq(30, 40))
  }

  test("multi-level index join (test_join.py:149-157)") {
    val l = MDFrame(
      frame("i1" -> Seq(0, 1, 2), "i2" -> Seq(0, -1, -2), "a" -> Seq(1, 2, 3)),
      Seq("i1", "i2"))
    val r = MDFrame(
      frame("i1" -> Seq(1, 2, 3), "i2" -> Seq(-1, -2, -3), "b" -> Seq(10, 20, 30)),
      Seq("i1", "i2"))
    val j = MDFrame.join("inner", Seq(l, r))
    assert(rows(j.ds) == Seq(Seq(1, -1, 2, 10), Seq(2, -2, 3, 20)))
  }

  test("object columns fill with null, not zero, on outer join") {
    val l = MDFrame(frame("i" -> Seq(0), "a" -> Seq(1)), Seq("i"))
    val r = MDFrame(frame("i" -> Seq(1), "s" -> Seq("x")), Seq("i"), Set("s"))
    val j = MDFrame.join("outer", Seq(l, r))
    val got = rows(j.ds)
    assert(got == Seq(Seq(0, 1, null), Seq(1, 0, "x")))
  }

  test("mismatched index dtypes raise (dataframe.py:1164-1170, test_join.py:30-51)") {
    val intIdx = MDFrame(frame("i" -> Seq(0, 1), "a" -> Seq(1, 2)), Seq("i"))
    val strIdx = MDFrame(frame("i" -> Seq("0", "1"), "b" -> Seq(3, 4)), Seq("i"))
    intercept[IllegalArgumentException](MDFrame.join("left", Seq(intIdx, strIdx)))
  }

  test("join with an empty right frame zero-fills everything (test_join.py empties)") {
    val l = MDFrame(frame("i" -> Seq(0, 1), "a" -> Seq(1, 2)), Seq("i"))
    val r = MDFrame(frame("i" -> Seq(9), "b" -> Seq(7)), Seq("i"))
      .take(org.apache.spark.sql.functions.lit(false)) // empty, same schema
    val j = MDFrame.join("left", Seq(l, r))
    assert(collectCol[Int](j.ds, "i") == Seq(0, 1))
    assert(collectCol[Int](j.ds, "b") == Seq(0, 0))
  }

  test("Index.diff = left-anti on index (dataframe.py:169-186)") {
    val d = df1.indexDiff(df3)
    assert(collectCol[Int](d.ds.orderBy("i"), "i") == Seq(0))
  }
}
