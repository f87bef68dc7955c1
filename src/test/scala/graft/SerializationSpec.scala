package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** The reference's serialize/deserialize surface (SURVEY.md §2.1 S2-S4)
  * maps to Parquet persistence. This round-trips the "everything frame"
  * (tests/test_serialization.py:44-79 fixture, FIXTURES.md A1): every
  * supported dtype incl. nested arrays, binary, map-as-json, all-null
  * timestamps.
  */
class SerializationSpec extends SparkSuite {

  test("everything-frame parquet round-trip preserves schema and values") {
    val schema = StructType(Seq(
      StructField("a", StringType),                       // object str
      StructField("b", LongType, nullable = false),       // int64
      StructField("c", BinaryType),                       // S3 bytes
      StructField("d", StringType),                       // str + None
      StructField("e", LongType),                         // int + None
      StructField("f", ArrayType(StringType)),            // ndarray of str
      StructField("g", ArrayType(BinaryType)),            // ndarray of S3
      StructField("h", ArrayType(LongType)),              // ndarray int64
      StructField("i", MapType(StringType, StringType)),  // JSON dict
      StructField("k", TimestampType)))                   // all-NaT
    val rows = Seq(
      Row("x", 1L, "aaa".getBytes, null, java.lang.Long.valueOf(101L),
        Seq("x", "yy"), Seq("b1".getBytes), Seq(1L, 2002L),
        Map("k" -> "v"), null),
      Row("yy", 2002L, "bb".getBytes, "mom", null,
        Seq("zzz"), Seq("b2".getBytes, "b3".getBytes), Seq(3000000003L),
        Map("n" -> "m", "o" -> "p"), null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)

    val dir = java.nio.file.Files.createTempDirectory("everything").toString
    df.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)

    assert(back.schema.map(f => (f.name, f.dataType)).toSet ==
      df.schema.map(f => (f.name, f.dataType)).toSet)
    val orig = df.orderBy("b").collect()
    val got = back.orderBy("b").collect()
    assert(got.length == 2)
    (orig.zip(got)).foreach { case (o, g) =>
      assert(o.getAs[String]("a") == g.getAs[String]("a"))
      assert(java.util.Arrays.equals(o.getAs[Array[Byte]]("c"), g.getAs[Array[Byte]]("c")))
      assert(o.getSeq[String](o.fieldIndex("f")).toList == g.getSeq[String](g.fieldIndex("f")).toList)
      assert(o.getSeq[Long](o.fieldIndex("h")).toList == g.getSeq[Long](g.fieldIndex("h")).toList)
      assert(o.getMap[String, String](o.fieldIndex("i")).toMap == g.getMap[String, String](g.fieldIndex("i")).toMap)
      assert(g.isNullAt(g.fieldIndex("k")))
    }
  }

  test("truncated parquet raises instead of returning garbage (CorruptedBuffer parity, S3)") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("trunc").toString
    frame("a" -> (1 to 1000), "b" -> (1 to 1000).map(_.toString))
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val file = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val bytes = java.nio.file.Files.readAllBytes(file.toPath)
    java.nio.file.Files.write(file.toPath,
      java.util.Arrays.copyOf(bytes, bytes.length / 2)) // chop the footer off
    intercept[Throwable] {
      spark.read.parquet(dir).agg(sum(col("a"))).collect()
    }
  }

  test("EVERY truncation offset of a parquet file raises, never partial rows " +
      "(test_serialization.py:82-97 CorruptedBuffer fuzz)") {
    import org.apache.spark.sql.functions._
    // the reference fixture: 3 rows, mixed str/int/bytes/None columns
    val dir = java.nio.file.Files.createTempDirectory("fuzz").toString
    frame(
      "a" -> Seq("x", "yy", "zzz"),
      "b" -> Seq(1L, 2002L, 3000000003L),
      "d" -> Seq[Any](null, "mom", "dad"))
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val file = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val bytes = java.nio.file.Files.readAllBytes(file.toPath)
    val full = spark.read.parquet(dir).orderBy("b").collect()
    assert(full.length == 3 && bytes.length > 100)
    // drop the Hadoop local-FS .crc sidecar: with it present, ANY byte
    // change fails the checksum before parquet footer validation runs, so
    // the loop would pass without exercising the footer/end-magic contract
    new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".crc")).foreach(f => assert(f.delete()))

    def readAll(): Array[org.apache.spark.sql.Row] =
      spark.read.parquet(dir).orderBy(col("b")).collect()
    // every strict prefix chops the footer → the read MUST raise; a
    // prefix that silently returned fewer/garbage rows would be the
    // CorruptedBuffer contract violation the reference fuzzes for
    (0 until bytes.length).foreach { i =>
      java.nio.file.Files.write(file.toPath, java.util.Arrays.copyOf(bytes, i))
      val r = scala.util.Try(readAll())
      val detail = r.fold(_ => "", rows => s"got ${rows.length} rows")
      assert(r.isFailure, s"truncation at offset $i did not raise: $detail")
    }
    // one stray trailing byte breaks the end-magic → must also raise
    java.nio.file.Files.write(file.toPath,
      java.util.Arrays.copyOf(bytes, bytes.length + 1))
    assert(scala.util.Try(readAll()).isFailure, "trailing-byte corruption did not raise")
    // restoring the exact bytes reads the exact rows again
    java.nio.file.Files.write(file.toPath, bytes)
    assert(readAll().map(_.toSeq).toSeq == full.map(_.toSeq).toSeq)
  }

  test("Arrow IPC round-trip: per-partition files, schema + values + nulls (S4)") {
    import graft.sources.ArrowInterop
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("i32", IntegerType),
      StructField("f64", DoubleType),
      StructField("s", StringType),        // incl. null
      StructField("bin", BinaryType),
      StructField("flag", BooleanType),
      StructField("ts", TimestampType),    // micros UTC, incl. null
      StructField("dur", DayTimeIntervalType()))) // timedelta64 parity
    val t0 = java.sql.Timestamp.valueOf("2024-05-01 12:34:56.123456")
    val d0 = java.time.Duration.ofSeconds(3601, 250000000L)
    val rows = Seq(
      Row(1L, 10, 1.5, "alpha", "b1".getBytes, true, t0, d0),
      Row(2L, null, 2.5, null, "b2".getBytes, false, null, null),
      Row(3L, 30, Double.NaN, "γδ", Array.emptyByteArray, true, t0, d0.negated()))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)

    val dir = java.nio.file.Files.createTempDirectory("arrow_ipc").toString
    ArrowInterop.writeIpc(df, dir)
    assert(new java.io.File(dir).listFiles().count(_.getName.endsWith(".arrow")) >= 1)

    val back = ArrowInterop.readIpc(spark, dir)
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      df.schema.map(f => (f.name, f.dataType)))
    val o = df.orderBy("id").collect()
    val g = back.orderBy("id").collect()
    assert(g.length == 3)
    o.zip(g).foreach { case (a, b) =>
      assert(a.getLong(0) == b.getLong(0))
      assert(a.isNullAt(1) == b.isNullAt(1))
      if (!a.isNullAt(1)) assert(a.getInt(1) == b.getInt(1))
      assert(a.getDouble(2) == b.getDouble(2) ||
        (a.getDouble(2).isNaN && b.getDouble(2).isNaN))
      assert(a.getAs[String]("s") == b.getAs[String]("s"))
      assert(java.util.Arrays.equals(a.getAs[Array[Byte]]("bin"), b.getAs[Array[Byte]]("bin")))
      assert(a.getBoolean(5) == b.getBoolean(5))
      assert(a.getAs[java.sql.Timestamp]("ts") == b.getAs[java.sql.Timestamp]("ts"))
      assert(a.getAs[java.time.Duration]("dur") == b.getAs[java.time.Duration]("dur"))
    }
  }

  test("JSONL corpus round-trip: plain and gzip, schema-pinned read, " +
      "hostile unicode survives (the LLM-corpus interchange format)") {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("doc_id") < 50)
      // prove escaping end-to-end, not just clean corpus text
      .withColumn("text", concat(col("text"), lit(" \"q\" \\b\u0001 閆")))
    val plain = java.nio.file.Files.createTempDirectory("jsonl").toString
    val gz = java.nio.file.Files.createTempDirectory("jsonl_gz").toString
    docs.write.mode("overwrite").json(plain)
    docs.write.mode("overwrite").option("compression", "gzip").json(gz)
    assert(new java.io.File(gz).listFiles().exists(_.getName.endsWith(".json.gz")))
    // ALWAYS read JSONL with an explicit schema at scale: schema inference
    // is a full extra pass over 100 TB before the real read starts
    for (dir <- Seq(plain, gz)) {
      val back = spark.read.schema(docs.schema).json(dir)
      assert(back.schema == docs.schema)
      assert(back.orderBy("doc_id").collect().map(_.toSeq).toSeq ==
        docs.orderBy("doc_id").collect().map(_.toSeq).toSeq)
    }
    // corrupt line policy: PERMISSIVE nulls it, FAILFAST raises — both
    // explicit, neither silently drops data
    java.nio.file.Files.write(java.nio.file.Paths.get(plain, "junk.json"),
      "not json at all\n".getBytes("UTF-8"))
    val permissive = spark.read.schema(docs.schema).json(plain)
    assert(permissive.count() == docs.count() + 1)
    assert(permissive.filter(col("doc_id").isNull).count() == 1)
    intercept[Throwable] {
      spark.read.schema(docs.schema).option("mode", "FAILFAST").json(plain).count()
    }
  }

  test("Arrow source raises on garbage input, never yields rows " +
      "(test_arrow.py:29-31 from_arrow TypeError parity)") {
    import graft.sources.ArrowInterop
    val dir = java.nio.file.Files.createTempDirectory("arrow_bad").toString
    // an empty directory is a usage error
    intercept[IllegalArgumentException](ArrowInterop.readIpc(spark, dir))
    // bytes that are not an Arrow IPC file must raise at open, not decode
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "junk.arrow"),
      "definitely not arrow".getBytes("UTF-8"))
    intercept[Throwable](ArrowInterop.readIpc(spark, dir))
  }

  test("json encode of nested struct matches the reference's canonical form (S5)") {
    import org.apache.spark.sql.functions._
    val df = frame("a" -> Seq(1), "b" -> Seq("x"))
    val js = df.select(to_json(struct(col("a"), col("b"))).as("j")).head().getString(0)
    assert(js == """{"a":1,"b":"x"}""")
  }

  test("json torture: pathological unicode/escapes round-trip to_json→from_json " +
      "(test_serialization.py:19-22 json_dumps torture contract)") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    import spark.implicits._
    // reference feeds json_dumps a fixture of hostile strings: every JSON
    // escape class, C0 controls, CJK/Hangul, astral-plane surrogate pairs,
    // quote/backslash storms, keys as hostile as values. We synthesize the
    // same classes (the fixture itself stays in the reference).
    val nasty = Seq(
      "quote\" backslash\\ slash/ bell newline\n tab\t return\r",
      "controls \u0001\u0006\u001f end",
      "閆崬밺뀫颒myj츥휘 薈mY햚 玭V㭢뾿愴Y ᮉ푊垡㐭룝 厓ᔧḅ^Sqpv媫",
      "astral 😀🤖 pair 𐀀",
      "⤽걒 ˽Ἆ ꇆ䬔未tv{DV鯀Tἆl凸g\\㈭ĭ즿UH㽤 ;:{}[]()<>&#%$@!~`'",
      "6.908319653520691E8")
    val schema = StructType(Seq(
      StructField("k", StringType), StructField("v", StringType),
      StructField("arr", ArrayType(StringType)),
      StructField("m", MapType(StringType, StringType))))
    val df = nasty.zipWithIndex.map { case (s, i) =>
      (s, nasty((i + 1) % nasty.size), Seq(s, s.reverse), Map(s -> nasty((i + 2) % nasty.size)))
    }.toDF("k", "v", "arr", "m")
    val encoded = df.select(to_json(struct(col("k"), col("v"), col("arr"), col("m"))).as("j"))
    // 1) every encoded line must be parseable JSON (the torture contract)
    // 2) parsing back yields the exact original values — no lossy escaping
    val back = encoded.select(from_json(col("j"), schema).as("s")).select("s.*")
    assert(back.collect().map(r => (r.getString(0), r.getString(1),
        r.getSeq[String](2), r.getMap[String, String](3).toMap)).toSeq ==
      df.collect().map(r => (r.getString(0), r.getString(1),
        r.getSeq[String](2), r.getMap[String, String](3).toMap)).toSeq)
    // and jackson-independent sanity: no raw control bytes survive encoding
    encoded.collect().map(_.getString(0)).foreach { j =>
      assert(!j.exists(c => c < ' '), s"unescaped control char in: $j")
    }
  }
}
