package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Golden values ported from the reference's per-operator tests:
  * concat (test_concat.py), dedup (test_duplicates.py), sorting
  * (test_sort_values.py), nulls (test_isnull.py), explode
  * (test_explode.py), groupby (test_groupby.py), plus projection /
  * index bookkeeping (test_init.py).
  */
class OpsSpec extends SparkSuite {

  test("concat strict: vertical union keeps duplicates (test_concat.py)") {
    val a = MDFrame(frame("i" -> Seq(0, 1), "a" -> Seq(1, 2)), Seq("i"))
    val b = MDFrame(frame("i" -> Seq(1, 2), "a" -> Seq(2, 3)), Seq("i"))
    val c = MDFrame.concat(Seq(a, b))
    assert(collectCol[Int](c.ds.orderBy("i", "a"), "a") == Seq(1, 2, 2, 3))
    assert(c.index == Seq("i"))
  }

  test("concat strict rejects differing column sets") {
    val a = MDFrame(frame("a" -> Seq(1)))
    val b = MDFrame(frame("b" -> Seq(2)))
    intercept[IllegalArgumentException](MDFrame.concat(Seq(a, b)))
  }

  test("concat loose: missing ints→0, missing object strings→null (test_concat.py:96-111)") {
    val a = MDFrame(frame("a" -> Seq(1, 2, 3)))
    val b = MDFrame(frame("b" -> Seq("x", "y")), Nil, Set("b"))
    val c = MDFrame.concat(Seq(a, b), strict = false)
    val got = rows(c.ds.orderBy(col("a"), col("b")))
    assert(got == Seq(
      Seq(0, "x"), Seq(0, "y"), Seq(1, null), Seq(2, null), Seq(3, null)))
  }

  test("drop_duplicates keep=first (test_duplicates.py:9-24)") {
    val df = MDFrame(frame("a" -> Seq(1, 2, 2, 3), "b" -> Seq(0, 1, 2, 3)))
    val got = df.dropDuplicates(Seq("a"))
    assert(collectCol[Int](got.ds, "a") == Seq(1, 2, 3))
    assert(collectCol[Int](got.ds, "b") == Seq(0, 1, 3))
  }

  test("drop_duplicates keep=last, key-sorted output (test_duplicates.py:31-45)") {
    val df = MDFrame(frame(
      "a" -> Seq(1, 2, 2, 3, 5, 3, 6),
      "b" -> Seq(0, 1, 2, 3, 4, 5, 6)))
    val got = df.dropDuplicates(Seq("a"), keep = "last")
    assert(collectCol[Int](got.ds, "a") == Seq(1, 2, 3, 5, 6))
    assert(collectCol[Int](got.ds, "b") == Seq(0, 2, 5, 4, 6))
  }

  test("concat dtype rule is a CONTRACT: first-frame-wins cast, ANSI raise on " +
      "lossy values (divergence from numpy promotion, test_concat.py:96-111)") {
    import org.apache.spark.sql.types.{IntegerType, LongType}
    // fits: int32 first + int64 second → unioned as int32 (reference
    // would promote to int64 — pinned divergence, see MIGRATION.md)
    val small = MDFrame(frame("a" -> Seq(1, 2)))
    val fits = MDFrame(MDFrame.concat(Seq(small,
      MDFrame(frame("a" -> Seq(3L))))).ds)
    assert(fits.ds.schema("a").dataType == IntegerType)
    assert(collectCol[Int](fits.ds.orderBy(col("a")), "a") == Seq(1, 2, 3))
    // lossy: a second-frame value that cannot fit the first frame's int32
    // must RAISE at execution (ANSI cast), never truncate silently
    val big = MDFrame(frame("a" -> Seq(3000000003L)))
    val lossy = MDFrame.concat(Seq(small, big))
    intercept[Throwable](lossy.ds.collect())
    // first frame's dtype also wins in the other direction: int64 first
    // absorbs int32 chunks losslessly (the common append case)
    val wide = MDFrame.concat(Seq(big, small))
    assert(wide.ds.schema("a").dataType == LongType)
    assert(collectCol[Long](wide.ds.orderBy(col("a")), "a") == Seq(1L, 2L, 3000000003L))
  }

  test("drop_duplicates with no subset = all columns (test_duplicates.py:88-94)") {
    // reference: {"a": [1,2,2], "b": [0,3,4]} has no full-row dup → noop
    val df = MDFrame(frame("a" -> Seq(1, 2, 2), "b" -> Seq(0, 3, 4)))
    val kept = df.dropDuplicates()
    assert(rows(kept.ds.orderBy(col("a"), col("b"))) ==
      Seq(Seq(1, 0), Seq(2, 3), Seq(2, 4)))
    // after b[-1] = 3 the last two rows are identical → first survives
    val df2 = MDFrame(frame("a" -> Seq(1, 2, 2), "b" -> Seq(0, 3, 3)))
    val kept2 = df2.dropDuplicates()
    assert(rows(kept2.ds.orderBy(col("a"), col("b"))) ==
      Seq(Seq(1, 0), Seq(2, 3)))
  }

  test("groupby iteration: sorted-key order, positional order within groups " +
      "(test_groupby.py:8-14,43-48 Grouper.__iter__)") {
    val df = MDFrame(frame(
      "a" -> Seq(1, 1, 2, 2, 3, 3, 3),
      "b" -> Seq(4, 5, 6, 7, 8, 9, 10)))
    val groups = df.iterGroups("a").toSeq
    assert(groups.map(_._1) == Seq(Seq(1), Seq(2), Seq(3)))
    assert(groups.map(_._2.map(_.getAs[Int]("b"))) ==
      Seq(Seq(4, 5), Seq(6, 7), Seq(8, 9, 10)))
    // keys arrive out of order: iteration still ascends keys, rows keep
    // their original positions within each group (reduceat fixture)
    val shuffled = MDFrame(frame(
      "a" -> Seq(3, 3, 3, 2, 2, 1, 1),
      "b" -> Seq(9, 10, 7, 8, 4, 5, 6)))
    val g2 = shuffled.iterGroups("a").toSeq
    assert(g2.map(_._1) == Seq(Seq(1), Seq(2), Seq(3)))
    assert(g2.map(_._2.map(_.getAs[Int]("b"))) ==
      Seq(Seq(5, 6), Seq(8, 4), Seq(9, 10, 7)))
    intercept[IllegalArgumentException](df.iterGroups("zz"))
  }

  test("iterGroups on a binary key column groups by VALUE (ADVICE r03)") {
    // Array[Byte] == is reference equality; without normalization every
    // row would become its own single-row group
    val df = MDFrame(frame("b" -> Seq(1, 2, 3, 4))
      .withColumn("k", org.apache.spark.sql.functions.unhex(
        when(col("b") % 2 === 0, "0a0b").otherwise("0c"))))
    val groups = MDFrame(df.ds).iterGroups("k").toSeq
    // byte-lexicographic key order: 0x0a0b sorts before 0x0c
    assert(groups.map(_._2.map(_.getAs[Int]("b"))) == Seq(Seq(2, 4), Seq(1, 3)))
    assert(groups.map(_._1) ==
      Seq(Seq(Seq(0x0a.toByte, 0x0b.toByte)), Seq(Seq(0x0c.toByte))))
  }

  test("drop_duplicates/duplicated: derived all-columns keys exclude " +
      "orderCols; temp names dodge collisions (ADVICE r03)") {
    // subset=Nil + orderCols: the order column must NOT join the key set,
    // else every row is its own group and dedup is a no-op
    val df = MDFrame(frame("a" -> Seq(1, 1, 2), "ord" -> Seq(10, 20, 30)))
    val kept = df.dropDuplicates(orderCols = Seq("ord"))
    assert(rows(kept.ds.orderBy(col("a")).select(col("a"), col("ord"))) ==
      Seq(Seq(1, 10), Seq(2, 30)))
    val mask = collectCol[Boolean](df.duplicated(orderCols = Seq("ord")), "_dup")
    assert(mask == Seq(false, true, false))
    // orderCols covering ALL columns leaves zero key columns: no-op like
    // dropDuplicates, not a mark-everything global window
    val all = df.duplicated(orderCols = Seq("a", "ord"))
    assert(collectCol[Boolean](all, "_dup") == Seq(false, false, false))
    assert(df.dropDuplicates(orderCols = Seq("a", "ord")).ds.count() == 3)
    // a frame that already HAS _pos/_rn columns still dedups correctly
    val clash = MDFrame(frame(
      "_pos" -> Seq(9, 8, 7), "_rn" -> Seq(5, 5, 6), "a" -> Seq(1, 1, 1)))
    val k2 = clash.dropDuplicates(Seq("a"))
    assert(k2.ds.count() == 1)
    assert(k2.ds.columns.toSeq == Seq("_pos", "_rn", "a"))
    assert(rows(k2.ds) == Seq(Seq(9, 5, 1)))
  }

  test("duplicated mask in original order (test_duplicates.py:26-28)") {
    val df = MDFrame(frame("a" -> Seq(3, 3, 1, 2, 2, 3)))
    val got = collectCol[Boolean](df.duplicated(Seq("a")), "_dup")
    assert(got == Seq(false, true, false, false, true, true))
  }

  test("sort_values: NaN placement via na_position (test_sort_values.py:69-86)") {
    val df = MDFrame(frame(
      "a" -> Seq[Any](3.0, 2.0, 2.0, 1.0, Double.NaN, -2.0, -1.0)))
    val last = df.sortValues(Seq("a"), naPosition = "last")
    val gl = collectCol[Double](last.ds, "a")
    assert(gl.take(6) == Seq(-2.0, -1.0, 1.0, 2.0, 2.0, 3.0) && gl(6).isNaN)
    val first = df.sortValues(Seq("a"), naPosition = "first")
    val gf = collectCol[Double](first.ds, "a")
    assert(gf(0).isNaN && gf.drop(1) == Seq(-2.0, -1.0, 1.0, 2.0, 2.0, 3.0))
  }

  test("sort_values: multi-column with negatives, global descending (test_sort_values.py:50-59)") {
    val df = MDFrame(frame("a" -> Seq(3, 2, 2, 1), "b" -> Seq(0, 0, -1, 2)))
    val asc = df.sortValues(Seq("a", "b"))
    assert(rows(asc.ds) == Seq(Seq(1, 2), Seq(2, -1), Seq(2, 0), Seq(3, 0)))
    val desc = df.sortValues(Seq("a", "b"), ascending = false)
    assert(rows(desc.ds) == Seq(Seq(3, 0), Seq(2, 0), Seq(2, -1), Seq(1, 2)))
  }

  test("isnull matrix: float NaN yes, ints/native strings never (test_isnull.py:15-39)") {
    val df = MDFrame(
      frame("f" -> Seq[Any](1.0, Double.NaN), "i" -> Seq(1, 2),
        "s" -> Seq("x", "y"), "o" -> Seq[Any]("a", null)),
      Nil, Set("o"))
    val f = df.ds.select(df.isnullMask("f").as("m"))
    assert(collectCol[Boolean](f, "m") == Seq(false, true))
    val i = df.ds.select(df.isnullMask("i").as("m"))
    assert(collectCol[Boolean](i, "m") == Seq(false, false))
    val s = df.ds.select(df.isnullMask("s").as("m"))
    assert(collectCol[Boolean](s, "m") == Seq(false, false))
    val o = df.ds.select(df.isnullMask("o").as("m"))
    assert(collectCol[Boolean](o, "m") == Seq(false, true))
  }

  test("fillna replaces NaN and null (dataframe.py:1006-1030)") {
    val df = MDFrame(frame("f" -> Seq[Any](1.0, Double.NaN), "o" -> Seq[Any]("a", null)), Nil, Set("o"))
    val got = df.fillna(0.0, Seq("f")).fillna("?", Seq("o"))
    assert(collectCol[Double](got.ds, "f") == Seq(1.0, 0.0))
    assert(collectCol[String](got.ds, "o") == Seq("a", "?"))
  }

  test("fillna over all columns skips dtype-incompatible ones (fill-where-applicable)") {
    val df = MDFrame(frame(
      "f" -> Seq[Any](Double.NaN, 2.0),
      "o" -> Seq[Any]("a", null),
      "i" -> Seq(1, 2)), Nil, Set("o"))
    val filledStr = df.fillna("?")
    assert(collectCol[String](filledStr.ds, "o") == Seq("a", "?"))
    assert(collectCol[Double](filledStr.ds, "f")(0).isNaN) // string can't fill a double
    val filledNum = df.fillna(-1.0)
    assert(collectCol[Double](filledNum.ds, "f") == Seq(-1.0, 2.0))
    // object columns accept ANY fill value (test_fillna.py fills an object
    // str column with int 5) — rendered as its string form here
    assert(collectCol[String](filledNum.ds, "o") == Seq("a", "-1.0"))
  }

  test("nonemin/nonemax skip NaN; all-NaN → null (dataframe.py:980-1004)") {
    val df = MDFrame(frame("f" -> Seq[Any](3.0, Double.NaN, 1.0)))
    assert(df.nonemin("f") == 1.0)
    assert(df.nonemax("f") == 3.0)
    val allNaN = MDFrame(frame("f" -> Seq[Any](Double.NaN, Double.NaN)))
    assert(allNaN.nonemin("f") == null)
  }

  test("explode flattens arrays replicating other columns (test_explode.py:10-21)") {
    val df = MDFrame(frame(
      "a" -> Seq(Seq(1, 2), Seq(3), Seq(4, 5, 6)),
      "b" -> Seq(9, 8, 7)))
    val got = df.explodeCol("a")
    assert(rows(got.ds.orderBy(col("b").desc, col("a"))) == Seq(
      Seq(1, 9), Seq(2, 9), Seq(3, 8), Seq(4, 7), Seq(5, 7), Seq(6, 7)))
  }

  test("explode on a scalar column is a plain copy (scalar passthrough, T1)") {
    val df = MDFrame(frame("a" -> Seq(1, 2), "b" -> Seq(9, 8)))
    assert(rows(df.explodeCol("a").ds) == rows(df.ds))
  }

  test("groupby sums match the reference golden (test_groupby.py:43-47)") {
    val df = MDFrame(frame(
      "a" -> Seq(1, 1, 2, 2, 3, 3, 3),
      "b" -> Seq(4, 5, 6, 7, 8, 9, 10)))
    val got = df.groupby("a").agg(sum("b").as("s")).orderBy("a")
    assert(collectCol[Long](got, "s") == Seq(9L, 13L, 27L))
  }

  test("select drags index columns along (dataframe.py:388-392)") {
    val df = MDFrame(frame("i" -> Seq(0, 1), "a" -> Seq(1, 2), "b" -> Seq(3, 4)), Seq("i"))
    assert(df.select("a").ds.columns.toSeq == Seq("a", "i"))
  }

  test("deleting an index column is forbidden (dataframe.py:434-435)") {
    val df = MDFrame(frame("i" -> Seq(0), "a" -> Seq(1)), Seq("i"))
    intercept[IllegalArgumentException](df.drop("i"))
    assert(df.drop("a").ds.columns.toSeq == Seq("i"))
  }

  test("deleting an unknown column raises (tests/test_columns.py KeyError parity)") {
    val df = MDFrame(frame("a" -> Seq(0, 1)))
    intercept[IllegalArgumentException](df.drop("nope"))
  }

  test("rename updates index names; unknown columns raise (dataframe.py:789-821)") {
    val df = MDFrame(frame("i" -> Seq(0), "a" -> Seq(1)), Seq("i"))
    val r = df.rename(Map("i" -> "j", "a" -> "b"))
    assert(r.index == Seq("j") && r.ds.columns.toSeq == Seq("j", "b"))
    intercept[IllegalArgumentException](df.rename(Map("zz" -> "q")))
    assert(df.rename(Map("zz" -> "q"), errors = "ignore").ds.columns.toSeq == Seq("i", "a"))
  }

  test("astype casts per-column; errors raise/ignore (dataframe.py:550-579)") {
    val df = MDFrame(frame("a" -> Seq(1, 2)))
    val got = df.astype(Map("a" -> DoubleType))
    assert(got.ds.schema("a").dataType == DoubleType)
    intercept[IllegalArgumentException](df.astype(Map("zz" -> DoubleType)))
    assert(df.astype(Map("zz" -> DoubleType), errors = "ignore")
      .ds.schema("a").dataType != DoubleType)
  }

  test("sampleN returns exactly n rows, deterministic per seed (R4 n=)") {
    val df = MDFrame(frame("a" -> (1 to 100)))
    val s1 = collectCol[Int](df.sampleN(10, seed = 5L).ds.orderBy("a"), "a")
    val s2 = collectCol[Int](df.sampleN(10, seed = 5L).ds.orderBy("a"), "a")
    assert(s1.size == 10 && s1 == s2)
  }

  test("isin + invert (test_isin.py)") {
    val df = MDFrame(frame("a" -> Seq(1, 2, 3, 4)))
    assert(collectCol[Int](df.filterIsin("a", Seq(2, 4)).ds.orderBy("a"), "a") == Seq(2, 4))
    assert(collectCol[Int](df.filterIsin("a", Seq(2, 4), invert = true).ds.orderBy("a"), "a") == Seq(1, 3))
  }

  test("unique distinct values, SORTED by default like np.unique (tests/test_unique.py)") {
    val df = MDFrame(frame("a" -> Seq(3, 1, 3, 2, 1)))
    assert(collectCol[Int](df.unique("a"), "a") == Seq(1, 2, 3)) // sorted default
    assert(collectCol[Int](df.unique("a", unordered = true), "a").sorted == Seq(1, 2, 3))
  }

  test("set_index/reset_index are metadata-only (dataframe.py:719-787)") {
    val df = MDFrame(frame("i" -> Seq(0), "a" -> Seq(1)))
    val withIdx = df.setIndex("i")
    assert(withIdx.index == Seq("i"))
    assert(withIdx.resetIndex().index.isEmpty)
    assert(withIdx.resetIndex(drop = true).ds.columns.toSeq == Seq("a"))
  }

  test("error contracts: arity mismatch, >255 frames, empty concat/subset (negative tests)") {
    val a = MDFrame(frame("i" -> Seq(0), "v" -> Seq(1)), Seq("i"))
    val multi = MDFrame(frame("i" -> Seq(0), "j" -> Seq(1), "v" -> Seq(2)), Seq("i", "j"))
    intercept[IllegalArgumentException](MDFrame.join("left", Seq(a, multi)))
    intercept[IllegalArgumentException](MDFrame.join("left", Seq.fill(256)(a)))
    intercept[IllegalArgumentException](MDFrame.join("cross", Seq(a, a)))
    intercept[IllegalArgumentException](MDFrame.concat(Nil))
    intercept[IllegalArgumentException](a.dropDuplicates(Seq("zz")))
    intercept[IllegalArgumentException](a.iloc(0, Nil))
  }

  test("index is_unique (dataframe.py:65-72)") {
    assert(MDFrame(frame("i" -> Seq(0, 1, 2)), Seq("i")).indexIsUnique)
    assert(!MDFrame(frame("i" -> Seq(0, 1, 1)), Seq("i")).indexIsUnique)
  }

  test("index monotonicity over an explicit order (dataframe.py:73-110)") {
    val df = MDFrame(frame("pos" -> Seq(1, 2, 3), "i" -> Seq(10, 20, 30)), Seq("i"))
    assert(df.indexIsMonotonic(Seq("pos")))
    assert(!df.indexIsMonotonic(Seq("pos"), increasing = false))
    val dec = MDFrame(frame("pos" -> Seq(1, 2), "i" -> Seq(9, 3)), Seq("i"))
    assert(!dec.indexIsMonotonic(Seq("pos")))
    assert(dec.indexIsMonotonic(Seq("pos"), increasing = false))
  }

  test("composite-index monotonicity is LEXICOGRAPHIC over the levels " +
      "(test_index.py:122-201 2d/3d/empty goldens)") {
    def mk(cols: (String, Seq[Any])*)(index: String*) =
      MDFrame(frame(("pos" -> Seq[Any](1, 2, 3, 4).take(cols.head._2.size)) +: cols: _*),
        index.toSeq)
    // increasing 2d: ties on level 0 defer to level 1; a level-0 step
    // RESETS level 1 ((0,50) <= (1,5) lexicographically)
    assert(mk("a" -> Seq(0, 1, 1), "b" -> Seq(50, 5, 6))("a", "b")
      .indexIsMonotonic(Seq("pos")))
    assert(mk("a" -> Seq(0, 1, 1), "b" -> Seq(50, 5, 5))("a", "b")
      .indexIsMonotonic(Seq("pos")))
    assert(!mk("a" -> Seq(0, 1, 1), "b" -> Seq(50, 6, 5))("a", "b")
      .indexIsMonotonic(Seq("pos")))
    // 3d with mixed numeric/string levels
    assert(mk("a" -> Seq(0, 1, 1, 2), "b" -> Seq(50.3, 5.1, 5.1, 0.0),
        "c" -> Seq("x", "a", "b", ""))("a", "b", "c")
      .indexIsMonotonic(Seq("pos")))
    assert(!mk("a" -> Seq(0, 1, 1, 2), "b" -> Seq(50.3, 5.1, 5.1, 0.0),
        "c" -> Seq("x", "b", "a", ""))("a", "b", "c")
      .indexIsMonotonic(Seq("pos")))
    // decreasing 2d
    assert(mk("a" -> Seq(1, 1, 0), "b" -> Seq(6, 5, 50))("a", "b")
      .indexIsMonotonic(Seq("pos"), increasing = false))
    assert(mk("a" -> Seq(2, 1, 0), "b" -> Seq(5, 6, 50))("a", "b")
      .indexIsMonotonic(Seq("pos"), increasing = false))
    assert(!mk("a" -> Seq(1, 1, 0), "b" -> Seq(5, 6, 50))("a", "b")
      .indexIsMonotonic(Seq("pos"), increasing = false))
    // single row and empty frames are trivially monotonic both ways
    val one = MDFrame(frame("pos" -> Seq(1), "a" -> Seq(7)), Seq("a"))
    assert(one.indexIsMonotonic(Seq("pos")))
    assert(one.indexIsMonotonic(Seq("pos"), increasing = false))
    val empty = MDFrame(frame("pos" -> Seq(1), "a" -> Seq(7)).filter(lit(false)), Seq("a"))
    assert(empty.indexIsMonotonic(Seq("pos")))
    assert(empty.indexIsMonotonic(Seq("pos"), increasing = false))
  }

  test("iloc positional access incl. negative index (dataframe.py:264-287)") {
    val df = MDFrame(frame("i" -> Seq(3, 1, 2), "v" -> Seq(30, 10, 20)), Seq("i"))
    assert(df.iloc(0, Seq("i")).getAs[Int]("v") == 10)
    assert(df.iloc(2, Seq("i")).getAs[Int]("v") == 30)
    assert(df.iloc(-1, Seq("i")).getAs[Int]("v") == 30)
    val sl = df.ilocSlice(1, 3, Seq("i"))
    assert(collectCol[Int](sl.ds, "v") == Seq(20, 30))
  }

  test("iloc out-of-range raises, zero-length slice is empty " +
      "(test_iloc.py:20-25,42-46 IndexError parity)") {
    val df = MDFrame(frame("a" -> Seq(1, 2), "b" -> Seq(3, 4)))
    intercept[NoSuchElementException](df.iloc(2, Seq("a")))
    intercept[NoSuchElementException](df.iloc(-3, Seq("a")))
    assert(df.ilocSlice(1, 1, Seq("a")).ds.count() == 0)
  }

  test("weighted sample favors heavy weights (dataframe.py:523-548 weights=)") {
    val df = MDFrame(frame(
      "id" -> (1 to 200),
      "w" -> (1 to 200).map(i => if (i <= 100) 0.000001 else 1000.0)))
    val got = df.sampleWeighted(20, "w", seed = 7L)
    val heavy = got.ds.filter(org.apache.spark.sql.functions.col("id") > 100).count()
    assert(heavy >= 18, s"expected heavy ids to dominate, got $heavy/20")
  }

  test("weighted sample WITH replacement: n draws ∝ weight, single pass (R4 replace=True)") {
    import org.apache.spark.sql.functions.col
    val df = MDFrame(frame(
      "id" -> Seq(1, 2, 3),
      "w" -> Seq(1.0e12, 1.0e-12, 1.0e-12)))
    val got = df.sampleWeightedReplace(5, "w", seed = 3L)
    assert(got.ds.count() == 5) // replacement: n rows from 3 source rows
    assert(collectCol[Int](got.ds, "id").forall(Set(1, 2, 3)))
    // weight ratio 1e24 → every draw lands on id=1 (p(other) ≈ 1e-24/draw)
    assert(collectCol[Int](got.ds, "id").forall(_ == 1))
    // frac= delegates: round(frac·len) rows without replacement
    val fr = df.sampleFracWeighted(2.0 / 3.0, "w", replace = false, seed = 3L)
    assert(fr.ds.count() == 2)
  }

  test("takePositions: range partition + parallel zipWithIndex (R1 at scale)") {
    import org.apache.spark.sql.functions.col
    val df = MDFrame(frame("k" -> (1 to 100).reverse, "v" -> (1 to 100).map(_ * 2)))
    val got = df.takePositions(Seq(0L, 50L, 99L), Seq("k"))
    // order by k ascending: pos 0 → k=1, pos 50 → k=51, pos 99 → k=100
    assert(rows(got.ds.select(col("pos"), col("k")).orderBy("pos")) ==
      Seq(Seq(0L, 1), Seq(50L, 51), Seq(99L, 100)))
  }

  test("deterministic Bernoulli sample: same rows every run, ~frac kept (R4 oracle path)") {
    val df = MDFrame(frame("id" -> (1 to 2000)))
    val a = collectCol[Int](df.sampleDeterministic(0.1, "id").ds.orderBy("id"), "id")
    val b = collectCol[Int](df.sampleDeterministic(0.1, "id").ds.orderBy("id"), "id")
    assert(a == b) // reproducible — no RNG state anywhere
    assert(a.size > 120 && a.size < 280, s"${a.size} kept of 2000 at frac=0.1")
  }

  test("iterrows yields rows lazily in the requested projection (R5)") {
    val df = MDFrame(frame("a" -> Seq(1, 2), "b" -> Seq("x", "y")))
    val it = df.iterrows("b")
    assert(it.map(_.getString(0)).toSet == Set("x", "y"))
  }

  test("per-group iteration via typed mapGroups matches groupBy (G4)") {
    import spark.implicits._
    val df = frame("g" -> Seq(1, 1, 2, 2, 2), "v" -> Seq(10, 20, 1, 2, 3))
    // the reference's `for idx in grouper` group-wise apply → mapGroups
    val custom = df.select(col("g"), col("v")).as[(Int, Int)]
      .groupByKey(_._1)
      .mapGroups { (g, rows) =>
        val vs = rows.map(_._2).toSeq.sorted
        (g, vs.size, vs.last - vs.head) // count + range, arbitrary group logic
      }
      .toDF("g", "n", "range")
      .orderBy("g").collect().map(_.toSeq)
    assert(custom.toSeq == Seq(Seq(1, 2, 10), Seq(2, 3, 2)))
  }

  test("groupby: unknown column raises eagerly; external key expressions group (test_groupby.py)") {
    import org.apache.spark.sql.functions.{col, count, lit, pmod}
    val df = MDFrame(frame("a" -> Seq(1, 1, 2, 2, 3, 3, 3), "b" -> Seq(4, 5, 6, 7, 8, 9, 10)))
    intercept[IllegalArgumentException](df.groupby("c"))
    // groupby([0,1,0,1,0,1,0]) ≡ grouping by the parity expression
    val g = df.groupbyExpr(pmod(col("b"), lit(2)).as("k"))
      .agg(count(lit(1)).as("n")).orderBy("k")
    assert(rows(g) == Seq(Seq(0, 4), Seq(1, 3)))
  }

  test("joins with an empty frame: left zero-fills, inner empties (test_join.py:54-78)") {
    val a = MDFrame(frame("i" -> Seq(1, 2), "v" -> Seq(10, 20)), Seq("i"))
    val empty = MDFrame(a.ds.filter(org.apache.spark.sql.functions.lit(false))
      .select(org.apache.spark.sql.functions.col("i"),
        org.apache.spark.sql.functions.col("v").as("w")), Seq("i"))
    val left = MDFrame.join("left", Seq(a, empty))
    assert(rows(left.ds.orderBy("i")) == Seq(Seq(1, 10, 0), Seq(2, 20, 0)))
    assert(MDFrame.join("inner", Seq(a, empty)).ds.count() == 0)
    assert(rows(MDFrame.join("outer", Seq(a, empty)).ds.orderBy("i")) ==
      Seq(Seq(1, 10, 0), Seq(2, 20, 0)))
  }

  test("frameEquals: multiset equality, order-insensitive, schema-strict") {
    val a = MDFrame(frame("x" -> Seq(1, 2, 2), "y" -> Seq("p", "q", "q")))
    val b = MDFrame(frame("x" -> Seq(2, 1, 2), "y" -> Seq("q", "p", "q")))
    assert(a.frameEquals(b)) // same multiset, different order
    val c = MDFrame(frame("x" -> Seq(1, 2), "y" -> Seq("p", "q")))
    assert(!a.frameEquals(c)) // multiplicity matters
    val d = MDFrame(frame("x" -> Seq(1L, 2L, 2L), "y" -> Seq("p", "q", "q")))
    assert(!a.frameEquals(d)) // schema (int vs long) matters
  }

  test("64-frame concat chain stays correct (deep-plan stress, U1)") {
    val frames = (0 until 64).map(i =>
      MDFrame(frame("a" -> Seq(i, i + 100), "src" -> Seq(i, i))))
    val c = MDFrame.concat(frames)
    assert(c.ds.count() == 128)
    assert(collectCol[Int](c.ds.orderBy("a").limit(3), "a") == Seq(0, 1, 2))
  }

  test("10-frame index-join chain stays correct (deep-plan stress, J1)") {
    val frames = (0 until 10).map(i =>
      MDFrame(frame("i" -> Seq(1, 2, 3), s"v$i" -> Seq(i, i * 10, i * 100)), Seq("i")))
    val j = MDFrame.join("inner", frames)
    assert(j.ds.count() == 3)
    assert(j.ds.columns.length == 11) // index + 10 value columns
    val r = j.ds.orderBy("i").collect()(2) // i=3
    (0 until 10).foreach(i => assert(r.getAs[Int](s"v$i") == i * 100))
  }

  test("NoneMin/NoneMax Aggregator: NaN-ignoring, null on empty (G2/G8)") {
    import graft.functions.Aggregators
    val df = frame("g" -> Seq(1, 1, 2), "v" -> Seq[Any](3.0, Double.NaN, Double.NaN))
    val got = df.groupBy("g")
      .agg(Aggregators.noneMin(col("v")).as("mn"), Aggregators.noneMax(col("v")).as("mx"))
      .orderBy("g").collect()
    assert(got(0).getAs[Double]("mn") == 3.0 && got(0).getAs[Double]("mx") == 3.0)
    assert(got(1).isNullAt(1) && got(1).isNullAt(2))
  }

  test("Index accessor sugar: name/values 1-D arity rules, " +
      "levelValues/levels projections, assert_index_equal twin " +
      "(ref dataframe.py:113-153, testing.py:33-37)") {
    val f2 = MDFrame(frame("a" -> Seq(1, 2, 2), "b" -> Seq("x", "y", "z"),
      "v" -> Seq(10, 20, 30)), index = Seq("a", "b"))
    assert(f2.indexNames == Seq("a", "b"))
    intercept[IllegalArgumentException](f2.indexName)
    intercept[IllegalArgumentException](f2.indexValues)
    assert(collectCol[Int](f2.levelValues(0).orderBy("a"), "a") == Seq(1, 2, 2))
    assert(collectCol[String](f2.levelValues(1).orderBy("b"), "b") ==
      Seq("x", "y", "z"))
    intercept[IllegalArgumentException](f2.levelValues(2))
    assert(f2.indexLevels.size == 2)

    val f1 = f2.copy(index = Seq("a"))
    assert(f1.indexName == "a")
    assert(collectCol[Int](f1.indexValues.orderBy("a"), "a") == Seq(1, 2, 2))

    // index equality: names AND multiset level rows; value columns differ
    val g = MDFrame(frame("a" -> Seq(2, 2, 1), "b" -> Seq("z", "y", "x"),
      "v" -> Seq(0, 0, 0)), index = Seq("a", "b"))
    assert(f2.indexEquals(g), "order/value differences must not matter")
    assert(!f2.indexEquals(f2.copy(index = Seq("b", "a"))),
      "level names are ordered")
    assert(!f2.indexEquals(MDFrame(frame("a" -> Seq(1, 2, 3),
      "b" -> Seq("x", "y", "z"), "v" -> Seq(0, 0, 0)), Seq("a", "b"))),
      "multiset row difference must be detected")
  }
}
