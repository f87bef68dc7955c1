package graft

import org.apache.spark.sql.functions._

/** Second wave of golden values ported from the reference's per-operator
  * tests (test_isin.py, test_sort_values.py, test_index.py,
  * test_explode.py) — the cases not already pinned in OpsSpec/JoinSpec.
  */
class GoldenSpec extends SparkSuite {

  // ---- test_isin.py ------------------------------------------------------

  test("isin: double haystack truncates into an int column (test_isin.py:20-23)") {
    val df = MDFrame(frame("a" -> Seq(1, 2, 3)))
    val got = collectCol[Int](df.filterIsin("a", Seq(2.1, 3.2, 4.3)).ds.orderBy("a"), "a")
    assert(got == Seq(2, 3))
  }

  test("isin: unknown column and un-castable haystack raise (test_isin.py:10-17)") {
    val df = MDFrame(frame("a" -> Seq(1, 2, 3)))
    intercept[IllegalArgumentException](df.isinMask("b", Seq(1, 2)))
    intercept[IllegalArgumentException](df.isinMask("a", Seq("x", "y")))
  }

  test("isin invert keeps null cells (None is not in the haystack)") {
    val df = MDFrame(frame("a" -> Seq[Any]("a", null, "b")), Nil, Set("a"))
    assert(df.filterIsin("a", Seq("a"), invert = true).ds.count() == 2)
    assert(df.filterIsin("a", Seq("a")).ds.count() == 1)
  }

  test("isin: string column with string haystack (test_isin.py:30-33)") {
    val df = MDFrame(frame("a" -> Seq("1", "2", "3")))
    assert(collectCol[String](df.filterIsin("a", Seq("2", "3", "4")).ds.orderBy("a"), "a")
      == Seq("2", "3"))
    assert(collectCol[String](df.filterIsin("a", Seq("2", "3", "4"), invert = true).ds, "a")
      == Seq("1"))
  }

  // ---- test_sort_values.py ----------------------------------------------

  test("descending sort with null placement (test_sort_values.py:23-30)") {
    val df = MDFrame(frame("a" -> Seq[Any](1.0, null, 2.0)))
    val first = collectCol[Any](
      df.sortValues(Seq("a"), ascending = false, naPosition = "first").ds, "a")
    assert(first == Seq(null, 2.0, 1.0))
    val last = collectCol[Any](
      df.sortValues(Seq("a"), ascending = false, naPosition = "last").ds, "a")
    assert(last == Seq(2.0, 1.0, null))
  }

  test("two-column sort with non-mergeable (object) second key (test_sort_values.py:64-68)") {
    val df = MDFrame(frame(
      "a" -> Seq(3, 2, 2, 1),
      "b" -> Seq("0", "0", "1", "2")), Nil, Set("b"))
    val sorted = df.sortValues(Seq("a", "b"))
    assert(collectCol[Int](sorted.ds, "a") == Seq(1, 2, 2, 3))
    assert(collectCol[String](sorted.ds, "b") == Seq("2", "0", "1", "0"))
  }

  test("sort keeps the index metadata; empty frame sorts to empty (test_sort_values.py:34-40,104-107)") {
    val df = MDFrame(frame("a" -> Seq(3, 2, 1), "i" -> Seq(0, 1, 2)), Seq("i"))
    val s = df.sortValues(Seq("a"))
    assert(s.index == Seq("i"))
    assert(collectCol[Int](s.ds, "i") == Seq(2, 1, 0))

    val empty = MDFrame(frame("a" -> Seq[Any]()).limit(0))
    assert(empty.sortValues(Seq("a")).ds.count() == 0)
  }

  test("sort with empty by raises (test_sort_values.py:98-101)") {
    val df = MDFrame(frame("a" -> Seq(3, 2, 1)))
    intercept[IllegalArgumentException](df.sortValues(Nil))
    intercept[IllegalArgumentException](df.sortValues(Seq("zz")))
  }

  // ---- test_index.py -----------------------------------------------------

  test("index properties on a unique frame (test_index.py:9-16)") {
    val df = MDFrame(frame("a" -> Seq(0, 1, 2)), Seq("a"))
    assert(df.index.size == 1)
    assert(df.indexIsUnique)
    assert(df.duplicated(df.index).filter(col("_dup")).count() == 0)
  }

  test("set_index of an unknown column raises (test_index.py:29-32)") {
    val df = MDFrame(frame("a" -> Seq(0, 1, 2)))
    intercept[IllegalArgumentException](df.setIndex("b"))
  }

  test("2-level monotonicity is lexicographic (test_index.py:214-220)") {
    // (1,2) <= (2,1): second level may decrease when the first increases
    val df = MDFrame(frame(
      "pos" -> Seq(1, 2), "i1" -> Seq(1, 2), "i2" -> Seq(2, 1)), Seq("i1", "i2"))
    assert(df.indexIsMonotonic(Seq("pos")))
    val bad = MDFrame(frame(
      "pos" -> Seq(1, 2), "i1" -> Seq(2, 1), "i2" -> Seq(1, 2)), Seq("i1", "i2"))
    assert(!bad.indexIsMonotonic(Seq("pos")))
  }

  test("sort with NaT timestamps honors na_position (test_sort_values.py:78-94)") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("t", TimestampType, nullable = true)))
    def ts(s: Long) = new java.sql.Timestamp(s * 1000)
    val rows = Seq(Row(ts(3)), Row(ts(1)), Row(null), Row(ts(2)))
    val df = MDFrame(spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema))
    val last = collectCol[java.sql.Timestamp](df.sortValues(Seq("t")).ds, "t")
    assert(last.take(3) == Seq(ts(1), ts(2), ts(3)) && last(3) == null)
    val first = collectCol[java.sql.Timestamp](
      df.sortValues(Seq("t"), naPosition = "first").ds, "t")
    assert(first(0) == null && first.drop(1) == Seq(ts(1), ts(2), ts(3)))
  }

  test("4-way join chains with mixed how-independent value columns (test_join.py n-way)") {
    val a = MDFrame(frame("i" -> Seq(1, 2, 3), "va" -> Seq(10, 20, 30)), Seq("i"))
    val b = MDFrame(frame("i" -> Seq(2, 3, 4), "vb" -> Seq(200, 300, 400)), Seq("i"))
    val c = MDFrame(frame("i" -> Seq(3, 4, 5), "vc" -> Seq(3000, 4000, 5000)), Seq("i"))
    val d = MDFrame(frame("i" -> Seq(1, 3), "vd" -> Seq(7, 9)), Seq("i"))
    val inner = MDFrame.join("inner", Seq(a, b, c, d))
    assert(rows(inner.ds) == Seq(Seq(3, 30, 300, 3000, 9)))
    val outer = MDFrame.join("outer", Seq(a, b, c, d))
    assert(collectCol[Int](outer.ds, "i") == Seq(1, 2, 3, 4, 5))
    assert(collectCol[Int](outer.ds, "vd") == Seq(7, 0, 9, 0, 0))
  }

  // ---- test_explode.py ---------------------------------------------------

  test("explode drops rows whose cell is an empty array (test_explode.py)") {
    val df = MDFrame(frame(
      "a" -> Seq(Seq(1, 2), Seq.empty[Int], Seq(3)),
      "b" -> Seq(9, 8, 7)))
    val got = df.explodeCol("a")
    assert(rows(got.ds.orderBy(col("b").desc, col("a"))) ==
      Seq(Seq(1, 9), Seq(2, 9), Seq(3, 7)))
  }

  test("explode passes a null cell through as one row (test_explode.py:10-21)") {
    // reference: [[1,2],[3],[4,5,6],None] explodes to [1,2,3,4,5,6,None]
    // with the index [9,9,8,7,7,7,6] — None is not list-like, so it is a
    // passthrough row, NOT a dropped one
    val df = MDFrame(frame(
      "a" -> Seq(Seq(1, 2), Seq(3), Seq(4, 5, 6), null),
      "b" -> Seq(9, 8, 7, 6)), Seq("b"))
    val got = df.explodeCol("a")
    assert(got.ds.count() == 7)
    assert(rows(got.ds.orderBy(col("b").desc, col("a"))) ==
      Seq(Seq(1, 9), Seq(2, 9), Seq(3, 8), Seq(4, 7), Seq(5, 7), Seq(6, 7),
        Seq(null, 6)))
    assert(got.index == Seq("b"))
  }

  // ---- test_init.py:63-67 — unnamed external index levels ----------------

  test("""set_index with external arrays materializes _index{i} (test_init.py:63-67)""") {
    val df = MDFrame(frame("a" -> Seq(1, 2, 3)))
    val got = df.setIndexArrays(Seq(col("a") * 2))
    assert(got.index == Seq("_index0"))
    assert(collectCol[Int](got.ds.orderBy("a"), "_index0") == Seq(2, 4, 6))
    // two levels → _index0, _index1
    val two = df.setIndexArrays(Seq(col("a") * 2, col("a") + 10))
    assert(two.index == Seq("_index0", "_index1"))
    // reference raises when the synthetic name already exists
    intercept[IllegalArgumentException](got.setIndexArrays(Seq(col("a"))))
  }

  test("concat loose: dtype of the first frame carrying a column wins (test_concat.py:96-111)") {
    val a = MDFrame(frame("k" -> Seq(0, 1), "v" -> Seq(1L, 2L)))
    val b = MDFrame(frame("k" -> Seq(2, 3), "v" -> Seq("4", "5")))
    val c = MDFrame.concat(Seq(a, b), strict = false)
    assert(c.ds.schema("v").dataType == org.apache.spark.sql.types.LongType)
    assert(collectCol[Long](c.ds.orderBy("k"), "v") == Seq(1L, 2L, 4L, 5L))
  }

  // ---- test_concat.py extras --------------------------------------------

  test("concat of a frame with itself doubles every row (test_concat.py:9-20)") {
    val df = MDFrame(frame("a" -> Seq(1, 2), "i" -> Seq(0, 1)), Seq("i"))
    val c = MDFrame.concat(Seq(df, df))
    assert(c.ds.count() == 4)
    assert(collectCol[Int](c.ds.orderBy("i", "a"), "a") == Seq(1, 1, 2, 2))
  }

  test("concat ignore_index drops the index metadata (test_concat.py)") {
    val df = MDFrame(frame("a" -> Seq(1), "i" -> Seq(0)), Seq("i"))
    assert(MDFrame.concat(Seq(df, df), ignoreIndex = true).index.isEmpty)
  }
}
