package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Source-layer behaviors that carry the 100 TB story: hive-partitioned
  * directory layout with partition pruning at the scan, and schema
  * evolution across parquet parts (mergeSchema).
  */
class SourcesSpec extends SparkSuite {

  test("partitioned parquet: a partition filter prunes directories at the scan") {
    val dir = java.nio.file.Files.createTempDirectory("part_layout").toString
    Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "user_id", "value", "event_type")
      .write.mode("overwrite").partitionBy("event_type").parquet(dir)

    val q = spark.read.parquet(dir).filter(col("event_type") === "click")
    // correctness: only the one partition's rows
    val want = Tables.events(spark, "/root/testdata/sf0.001")
      .filter(col("event_type") === "click").count()
    assert(q.count() == want && want > 0)
    // plan: the filter must reach the scan as a PARTITION filter (directory
    // pruning), not a post-scan data filter
    val scan = q.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: FileSourceScanExec => f
    }.get
    assert(scan.partitionFilters.nonEmpty,
      s"expected partition filters, got: ${scan.partitionFilters}")
    assert(scan.relation.location.inputFiles.forall(_.contains("event_type=click")) ||
      scan.metadata.get("PartitionFilters").exists(_.contains("event_type")))
  }

  test("schema evolution: mergeSchema unions columns across parquet parts") {
    val dir = java.nio.file.Files.createTempDirectory("evolve").toString
    frame("id" -> Seq(1, 2), "a" -> Seq(10L, 20L))
      .write.mode("overwrite").parquet(s"$dir/v=1")
    frame("id" -> Seq(3), "a" -> Seq(30L), "b" -> Seq("new"))
      .write.mode("overwrite").parquet(s"$dir/v=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet == Set("id", "a", "b", "v"))
    assert(merged.count() == 3)
    // old rows surface the new column as null
    assert(merged.filter(col("v") === 1 && col("b").isNull).count() == 2)
    assert(collectCol[String](merged.filter(col("v") === 2), "b") == Seq("new"))
  }

  test("writePreSharded: custom shard column returns the true count, drops " +
      "internal columns, and truncates stale shards under dynamic overwrite") {
    val dir = java.nio.file.Files.createTempDirectory("presharded").toString
    // plant a stale shard dir from a "previous larger run"
    val staleDocs = frame("doc_id" -> Seq(999L), "bucket" -> Seq(99L))
    staleDocs.write.mode("overwrite").partitionBy("bucket").parquet(dir)
    assert(new java.io.File(dir, "bucket=99").exists())

    val docs = frame(
      "doc_id" -> Seq(1L, 2L, 3L, 4L),
      "text" -> Seq("a", "b", "c", "d"),
      "bucket" -> Seq(0L, 0L, 1L, 1L),
      "_internal" -> Seq(10L, 20L, 30L, 40L))
    // ADVICE r05: with a non-default shard column the count must come from
    // the '<shardCol>=' dirs, not a hard-coded 'shard=' prefix
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    val n = try graft.ops.Packing.writePreSharded(docs, dir,
        shardCol = "bucket", orderCol = "doc_id", dropCols = Seq("_internal"))
      finally prev match {
        case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    assert(n == 2, s"expected 2 bucket dirs, got $n")
    // static overwrite truncated the stale dir even under a dynamic default
    assert(!new java.io.File(dir, "bucket=99").exists(),
      "stale shard from a previous run survived the overwrite")
    val back = spark.read.parquet(dir)
    assert(back.count() == 4)
    // no internal columns in the shipped files
    assert(back.columns.toSet == Set("doc_id", "text", "bucket"),
      s"internal columns leaked: ${back.columns.mkString(",")}")
  }

  test("writeTokenShards: token-mass contract per shard, sparse ids when a " +
      "document straddles whole shards, assignment map shipped next to shards") {
    val dir = java.nio.file.Files.createTempDirectory("tokshards").toString
    def words(n: Int, tag: String): String =
      (0 until n).map(i => s"$tag$i").mkString(" ")
    // doc 2 (300 tokens > 100/shard) straddles shards 1 and 2 entirely:
    // ids 1 and 2 are skipped in the layout
    val docs = frame(
      "doc_id" -> Seq(1L, 2L, 3L),
      "text" -> Seq(words(50, "a"), words(300, "b"), words(40, "c")))
    val (n, assign) = graft.ops.Packing.writeTokenShards(docs, dir, 100L)
    assert(n == 4, s"max shard id + 1 should be 4, got $n") // doc 3 starts at 350
    assert(graft.ops.Packing.shardIds(spark, dir) == Seq(0L, 3L),
      "expected sparse occupied shards {0, 3}")
    assert(graft.ops.Packing.countShardDirs(spark, dir) == 2)

    // the returned assignment is the parquet-backed seek map (no lineage)
    val rowsA = assign.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(rowsA == Seq((1L, 50L, 0L, 0L), (2L, 300L, 50L, 0L), (3L, 40L, 350L, 3L)))
    assert(new java.io.File(dir, "_assignment").exists())

    // layout: each doc sits in the shard owning its first token; files hold
    // no internal columns; in-file order ascending by id
    val back = spark.read.parquet(dir)
    assert(back.columns.toSet == Set("doc_id", "text", "shard"))
    // partition-column values come back type-inferred (int), so read as Number
    val byShard = back.select("doc_id", "shard").collect()
      .map(r => (r.getLong(0), r.getAs[Number]("shard").longValue())).toSet
    assert(byShard == Set((1L, 0L), (2L, 0L), (3L, 3L)))
    // per-shard start_tok window: every doc's first token inside its shard
    val joined = byShard.toMap
    rowsA.foreach { case (id, _, start, shard) =>
      assert(joined(id) == shard)
      assert(start >= shard * 100L && start < (shard + 1) * 100L,
        s"doc $id start_tok $start outside shard $shard window")
    }
    // reading the shard root ignores the _-prefixed assignment dir
    assert(back.count() == 3)
  }

  test("writeTokenShards on the real documents table: layout agrees with " +
      "the oracle-checked x55 assignment map") {
    val dir = java.nio.file.Files.createTempDirectory("tokshards_docs").toString
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val (n, assign) = graft.ops.Packing.writeTokenShards(docs, dir, 512L)
    // the shipped assignment == the pure tokenShardAssignment (x55 surface)
    val pure = graft.ops.Packing.tokenShardAssignment(docs, 512L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val shipped = assign
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("start_tok"), r.getAs[Long]("shard"))).toSet
    assert(shipped == pure)
    // every written doc sits where the map says; count covers the max id
    val back = spark.read.parquet(dir).select("doc_id", "shard").collect()
      .map(r => r.getLong(0) -> r.getAs[Number]("shard").longValue()).toMap
    val want = shipped.map(t => t._1 -> t._4).toMap
    assert(back == want)
    assert(n == back.values.max + 1)
  }

  test("readTokenShards: round-trips the writeTokenShards layout, reports " +
      "per-shard token mass, and rejects a layout/assignment mismatch") {
    val dir = java.nio.file.Files.createTempDirectory("tokreader").toString
    def words(n: Int, tag: String): String =
      (0 until n).map(i => s"$tag$i").mkString(" ")
    // same planted straddler as the writer spec: occupied shards {0, 3}
    val docs = frame(
      "doc_id" -> Seq(1L, 2L, 3L),
      "text" -> Seq(words(50, "a"), words(300, "b"), words(40, "c")))
    graft.ops.Packing.writeTokenShards(docs, dir, 100L)

    val (back, report) = graft.ops.Packing.readTokenShards(spark, dir)
    assert(back.count() == 3)
    val rep = report.orderBy("shard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // shard 0: docs 1+2 start there (50+300 tokens, first token 0);
    // shard 3: doc 3 (40 tokens, first token 350). Shards 1,2 are the
    // straddled holes — absent from layout AND report, never iterated.
    assert(rep == Seq((0L, 2L, 350L, 0L), (3L, 1L, 40L, 350L)), rep.toString)

    // a partial/stale layout (missing occupied dir) must fail loudly
    val gone = new java.io.File(dir, "shard=3")
    assert(gone.exists())
    gone.listFiles().foreach(_.delete()); gone.delete()
    intercept[IllegalArgumentException] {
      graft.ops.Packing.readTokenShards(spark, dir)
    }
  }

  test("shardManifest: digest recomputed from the read-back shards equals " +
      "the producer manifest (order-independent); tampering surfaces") {
    import org.apache.spark.sql.functions.{col, count, expr, lit, sum}
    val dir = java.nio.file.Files.createTempDirectory("manifest").toString
    def words(n: Int, tag: String): String =
      (0 until n).map(i => s"$tag$i").mkString(" ")
    val docs = frame(
      "doc_id" -> Seq(1L, 2L, 3L),
      "text" -> Seq(words(50, "a"), words(300, "b"), words(40, "c")))
    val manifest = graft.ops.Packing.shardManifest(docs, 100L)
      .orderBy("shard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(manifest.map(_._1) == Seq(0L, 3L), "sparse ids must carry over")

    graft.ops.Packing.writeTokenShards(docs, dir, 100L)
    val (back, _) = graft.ops.Packing.readTokenShards(spark, dir)
    // consumer-side digest over WHATEVER ORDER the shard scan yields
    val dig = expr(graft.ops.TextAnalysis.hexToIntSql("md5(text)", 8))
    val recomputed = back.groupBy(col("shard").cast("long").as("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(expr("CAST(size(split(text, ' ')) AS BIGINT)")).as("token_mass"),
        sum(dig).as("content_digest"))
      .orderBy("shard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(recomputed == manifest,
      s"read-back digest drifted: $recomputed vs $manifest")
    // a tampered doc flips the digest (the integrity property)
    val tampered = back.withColumn("text",
      org.apache.spark.sql.functions.when(col("doc_id") === 3L,
        lit("corrupted payload")).otherwise(col("text")))
    val tDig = tampered.groupBy(col("shard").cast("long").as("shard"))
      .agg(sum(dig).as("d"))
      .orderBy("shard").collect().map(_.getLong(1)).toSeq
    assert(tDig != manifest.map(_._4), "tamper must change the digest")
  }

  test("readMedia: binary files round-trip byte-exact through the " +
      "binaryFile source with ids from file names, types from extensions") {
    val dir = java.nio.file.Files.createTempDirectory("media_in")
    val bmp = graft.ops.Multimodal.synthBmp(20, 10)
    val wav = graft.ops.Multimodal.synthWav(400, 8000, 1)
    java.nio.file.Files.write(dir.resolve("00007.bmp"), bmp)
    java.nio.file.Files.write(dir.resolve("12.wav"), wav)
    java.nio.file.Files.write(dir.resolve("notes.txt"), "hello".getBytes("UTF-8"))
    val media = graft.ops.Multimodal.readMedia(spark, dir.toString)
      .collect().map(m => m.doc_id -> m).toMap
    assert(media.keySet == Set(7L, 12L, "notes.txt".hashCode.toLong & 0x7fffffffL))
    assert(media(7L).media_type == "media/bmp" &&
      media(7L).payload.sameElements(bmp))
    assert(media(12L).media_type == "media/wav" &&
      media(12L).payload.sameElements(wav))
    // the glob filter narrows ingestion to one modality
    val onlyBmp = graft.ops.Multimodal.readMedia(spark, dir.toString, "*.bmp")
    assert(onlyBmp.count() == 1)
    // and the real decoders run unchanged over file-sourced payloads
    import org.apache.spark.sql.functions.col
    val feats = graft.ops.Multimodal.extractFeatures(
      graft.ops.Multimodal.readMedia(spark, dir.toString, "*.bmp")).toDF()
    assert(feats.select("width", "height").collect().map(r =>
      (r.getInt(0), r.getInt(1))).toSeq == Seq((20, 10)))
  }

  test("writeShards: one file per shard, contiguous id ranges in order, " +
      "last shard partial, shard count returned") {
    val dir = java.nio.file.Files.createTempDirectory("shards").toString
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val ids = docs.select("doc_id").collect().map(_.getLong(0)).sorted
    val per = 64L
    val nShards = graft.ops.Packing.writeShards(docs, dir, per)
    assert(nShards == (ids.length + per - 1) / per)
    val shardDirs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("shard=")).sortBy(
        _.getName.stripPrefix("shard=").toLong)
    assert(shardDirs.length == nShards)
    shardDirs.foreach { d =>
      val k = d.getName.stripPrefix("shard=").toLong
      val files = d.listFiles().filter(_.getName.endsWith(".parquet"))
      assert(files.length == 1, s"shard $k has ${files.length} data files")
      // read the single file directly: in-file order must be id-ascending
      // and its content exactly the k-th contiguous slice of the id order
      val got = spark.read.parquet(files.head.getPath)
        .select("doc_id").collect().map(_.getLong(0))
      assert(got.toSeq == got.sorted.toSeq, s"shard $k not id-ordered in file")
      val want = ids.slice((k * per).toInt,
        math.min(ids.length.toLong, (k + 1) * per).toInt)
      assert(got.sorted.toSeq == want.toSeq, s"shard $k wrong id slice")
      val expected = if (k == nShards - 1) ids.length - (nShards - 1) * per
        else per
      assert(got.length == expected, s"shard $k size ${got.length}")
    }
  }

  test("events loader vintage split: nanos-long and micros-timestamp parquet " +
      "produce identical (ts, ts_ns) through Tables.events AND the stream " +
      "reader (the round-8 silent-loss regression)") {
    import org.apache.spark.sql.types._
    // one instant, expressed in both physical vintages
    val micros = Seq(1700000000000001L, 1700000123456789L)
    val schemaCommon = Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("event_type", StringType), StructField("value", DoubleType),
      StructField("props", StringType))
    def row(i: Int, ts: Any) = org.apache.spark.sql.Row(
      i.toLong, ts, 7L, "click", 1.5, "{}")
    // vintage A: ts as a plain int64 of NANOS (what nanosAsLong yields)
    val dirA = java.nio.file.Files.createTempDirectory("ev_nanos").toString
    spark.createDataFrame(
        spark.sparkContext.parallelize(
          micros.zipWithIndex.map { case (m, i) => row(i, m * 1000L) }),
        StructType(StructField("event_id", LongType) +:
          StructField("ts", LongType) +: schemaCommon.tail))
      .write.mode("overwrite").parquet(s"$dirA/events.parquet")
    // vintage B: ts as a micros TIMESTAMP_NTZ (the regenerated testdata)
    val dirB = java.nio.file.Files.createTempDirectory("ev_micros").toString
    spark.createDataFrame(
        spark.sparkContext.parallelize(
          micros.zipWithIndex.map { case (m, i) =>
            row(i, java.time.LocalDateTime.ofEpochSecond(
              m / 1000000L, (m % 1000000L).toInt * 1000,
              java.time.ZoneOffset.UTC)) }),
        StructType(StructField("event_id", LongType) +:
          StructField("ts", TimestampNTZType) +: schemaCommon.tail))
      .write.mode("overwrite").parquet(s"$dirB/events.parquet")
    def dump(dir: String) = Tables.events(spark, dir)
      .select("event_id", "ts", "ts_ns").orderBy("event_id")
      .collect().map(_.toSeq).toSeq
    assert(dump(dirA) == dump(dirB),
      s"vintages diverge:\n A ${dump(dirA)}\n B ${dump(dirB)}")
    assert(dump(dirA).map(_(2)) == micros.map(_ * 1000L),
      "ts_ns must be exact nanos")
    // the streaming reader must agree with the batch loader on BOTH
    def streamDump(dir: String) = {
      val q = graft.streaming.StreamingWindows.readEventsStream(spark, dir)
        .select("event_id", "ts", "ts_ns")
        .writeStream.outputMode("append").format("memory")
        .queryName("ev_vintage").start()
      try { q.processAllAvailable()
        spark.table("ev_vintage").orderBy("event_id")
          .collect().map(_.toSeq).toSeq
      } finally q.stop()
    }
    assert(streamDump(dirA) == dump(dirA))
    assert(streamDump(dirB) == dump(dirB))
  }

  test("Jsonl shards: escape-hostile text round-trips byte-exact, shard " +
      "id is the directory key (never a line field), within-shard order " +
      "is the md5 permutation") {
    import org.apache.spark.sql.functions._
    val docs = frame(
      "doc_id" -> Seq[Any](1L, 2L, 3L, 4L, 5L),
      "text" -> Seq(
        "plain ordinary text",
        "quotes \" and \\ backslash and / slash",
        "tabs\tnewline\nand carriage\rreturn",
        "unicode é中😀 mixed",
        "{\"looks\": \"like json\", \"n\": [1,2]}"))
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl").toString
    val nShards = graft.sources.Jsonl.writeJsonlShards(docs, dir,
      docsPerShard = 2L)
    assert(nShards == 3, s"5 docs / 2 per shard -> 3 dirs, got $nShards")
    val schema = new org.apache.spark.sql.types.StructType()
      .add("doc_id", org.apache.spark.sql.types.LongType)
      .add("text", org.apache.spark.sql.types.StringType)
    val back = graft.sources.Jsonl.readJsonlShards(spark, dir, schema)
    // byte-exact content round-trip
    assert(back.select("doc_id", "text").collect().map(_.toSeq).toSet
      == docs.collect().map(_.toSeq).toSet, "text mutated in transit")
    // the shard column came from the DIRECTORY, and every line is free of it
    assert(back.groupBy("shard").count().collect().map(_.getLong(1)).sum == 5)
    val rawLines = spark.read.text(s"$dir/shard=*/").collect()
      .map(_.getString(0))
    assert(rawLines.forall(!_.contains("\"shard\"")),
      "shard leaked into JSONL lines")
    // within-shard order: the file order equals the md5 permutation order
    val expected = docs
      .withColumn("_k", md5(concat(lit("shuf:"), col("doc_id"))))
      .orderBy("_k", "doc_id").select("doc_id")
      .collect().map(_.getLong(0)).toSeq
    val firstShardIds = graft.ops.Packing.shardIds(spark, dir)
    assert(firstShardIds == Seq(0L, 1L, 2L))
    val inFileOrder = firstShardIds.flatMap { sid =>
      spark.read.schema(schema).json(s"$dir/shard=$sid")
        .collect().map(_.getLong(0)).toSeq
    }
    assert(inFileOrder == expected,
      s"file order $inFileOrder != permutation $expected")
  }

  test("Jsonl gzip shards: .json.gz parts, contents identical to the " +
      "uncompressed layout, reader decompresses transparently") {
    val docs = frame(
      "doc_id" -> Seq[Any](1L, 2L, 3L),
      "text" -> Seq("alpha beta", "gamma \"quoted\"", "delta\nnewline"))
    val plainDir = java.nio.file.Files.createTempDirectory("graft_jl").toString
    val gzDir = java.nio.file.Files.createTempDirectory("graft_jlgz").toString
    graft.sources.Jsonl.writeJsonlShards(docs, plainDir, docsPerShard = 2L)
    graft.sources.Jsonl.writeJsonlShards(docs, gzDir, docsPerShard = 2L,
      compression = Some("gzip"))
    val gzParts = java.nio.file.Files.walk(java.nio.file.Paths.get(gzDir))
      .filter(p => p.getFileName.toString.startsWith("part-"))
      .map[String](_.getFileName.toString).toArray.map(_.toString)
    assert(gzParts.nonEmpty && gzParts.forall(_.endsWith(".json.gz")),
      s"expected .json.gz parts, got ${gzParts.toSeq}")
    val schema = new org.apache.spark.sql.types.StructType()
      .add("doc_id", org.apache.spark.sql.types.LongType)
      .add("text", org.apache.spark.sql.types.StringType)
    val a = graft.sources.Jsonl.readJsonlShards(spark, plainDir, schema)
      .collect().map(_.toSeq).toSet
    val b = graft.sources.Jsonl.readJsonlShards(spark, gzDir, schema)
      .collect().map(_.toSeq).toSet
    assert(a == b && a.size == 3, "gzip layout diverged from plain layout")
  }

  test("Jsonl corrupt line: FAILFAST default raises on read, PERMISSIVE " +
      "opt-in salvages the parseable lines") {
    val docs = frame(
      "doc_id" -> Seq[Any](1L, 2L),
      "text" -> Seq("good line one", "good line two"))
    val dir = java.nio.file.Files.createTempDirectory("graft_jlbad").toString
    graft.sources.Jsonl.writeJsonlShards(docs, dir, docsPerShard = 10L)
    // simulate a truncated upload: a torn .json file LANDS in the shard
    // dir (as from a crawler/object-store upload — no Hadoop .crc
    // sidecar; mutating a Spark-written part would instead trip the
    // local filesystem's checksum, a different failure)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "shard=0", "part-upload.json"),
      "{\"doc_id\": 3, \"tex\n")
    val schema = new org.apache.spark.sql.types.StructType()
      .add("doc_id", org.apache.spark.sql.types.LongType)
      .add("text", org.apache.spark.sql.types.StringType)
    // default: loud failure — a truncated shard must never silently
    // feed null documents to training
    intercept[org.apache.spark.SparkException] {
      graft.sources.Jsonl.readJsonlShards(spark, dir, schema).collect()
    }
    // explicit PERMISSIVE: the two intact lines survive
    val salvaged = graft.sources.Jsonl.readJsonlShards(spark, dir, schema,
        mode = "PERMISSIVE")
      .collect().flatMap(r => Option(r.get(1)).map(_ => r.getLong(0)))
    assert(salvaged.sorted.toSeq == Seq(1L, 2L), s"got ${salvaged.toSeq}")
  }

  test("appendShards: existing shards stay byte-immutable, the batch lands " +
      "in fresh ids past max(existing), read-back is the union (parquet " +
      "and json)") {
    import org.apache.spark.sql.functions.col
    for (fmt <- Seq("parquet", "json")) {
      val base = frame(
        "doc_id" -> Seq[Any](1L, 2L, 3L, 4L, 5L),
        "text" -> Seq("one a", "two b", "three c", "four d", "five e"))
      val batch = frame(
        "doc_id" -> Seq[Any](10L, 11L, 12L),
        "text" -> Seq("ten x", "eleven y", "twelve z"))
      val dir = java.nio.file.Files.createTempDirectory(s"graft_app_$fmt").toString
      graft.ops.Packing.writePreSharded(
        graft.ops.Pipeline.shardAssignment(base, 2L), dir,
        orderCol = "_shufkey", dropCols = Seq("_shufkey"), format = fmt)
      def partBytes(): Map[String, Seq[Byte]] = {
        val s = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        try s.filter(p => p.getFileName.toString.startsWith("part-"))
          .toArray.map(_.asInstanceOf[java.nio.file.Path])
          .map(p => p.toString ->
            java.nio.file.Files.readAllBytes(p).toSeq).toMap
        finally s.close()
      }
      val before = partBytes()
      val (firstNew, nNew) = graft.ops.Packing.appendShards(batch, dir,
        docsPerShard = 2L, format = fmt)
      assert(firstNew == 3L && nNew == 2L, s"$fmt: got ($firstNew, $nNew)")
      // every pre-existing part file byte-identical after the append
      val after = partBytes()
      assert(before.forall { case (p, b) => after.get(p).contains(b) },
        s"$fmt: an existing shard file was rewritten")
      assert(graft.ops.Packing.shardIds(spark, dir) == Seq(0L, 1L, 2L, 3L, 4L))
      val back =
        if (fmt == "parquet") spark.read.parquet(dir)
        else spark.read.schema(new org.apache.spark.sql.types.StructType()
          .add("doc_id", org.apache.spark.sql.types.LongType)
          .add("text", org.apache.spark.sql.types.StringType)
          .add("shard", org.apache.spark.sql.types.LongType)).json(dir)
      assert(back.select("doc_id").collect().map(_.getLong(0)).toSet
        == Set(1L, 2L, 3L, 4L, 5L, 10L, 11L, 12L), s"$fmt: union mismatch")
      // batch rows live only in the new ids (partition discovery infers
      // INT for parquet dirs — normalize)
      assert(back.filter(col("doc_id") >= 10L)
        .select(col("shard").cast("long")).collect()
        .map(_.getLong(0)).forall(_ >= 3L))
    }
  }

  test("appendCuratedAndShard: gated batch survivors land in fresh shards " +
      "of the existing layout; rejected docs never reach disk") {
    import org.apache.spark.sql.functions.col
    graft.ops.StageCache.clear()
    val corpus = frame(
      "doc_id" -> Seq[Any](1L, 2L),
      "text" -> Seq(
        "existing corpus document with plenty of ordinary tokens here",
        "second existing corpus document with plenty ordinary tokens"))
    val evalSet = frame("doc_id" -> Seq[Any](9L), "text" -> Seq("zz yy xx"))
    val dir = java.nio.file.Files.createTempDirectory("graft_acs").toString
    graft.ops.Packing.writePreSharded(
      graft.ops.Pipeline.shardAssignment(corpus, 2L), dir,
      orderCol = "_shufkey", dropCols = Seq("_shufkey"))
    val batch = frame(
      "doc_id" -> Seq[Any](10L, 11L, 12L),
      "text" -> Seq(
        "a genuinely new incoming document with novel fresh tokens",
        "existing corpus document with plenty of ordinary tokens here", // dup
        "spam spam spam spam spam spam spam spam spam spam")) // quality
    val (first, n, accepted) = graft.ops.Pipeline.appendCuratedAndShard(
      corpus, batch, evalSet, dir, docsPerShard = 2L)
    assert(first == 1L && n == 1L && accepted == 1L,
      s"expected 1 survivor in shard 1, got ($first, $n, $accepted)")
    val back = spark.read.parquet(dir)
    assert(back.select("doc_id").collect().map(_.getLong(0)).toSet
      == Set(1L, 2L, 10L), "layout must hold corpus + the one survivor")
    assert(back.filter(col("doc_id") === 10L)
      .select(col("shard").cast("long")).head().getLong(0) == 1L)
  }

  test("Jsonl streaming ingestion: the landing-directory stream delivers " +
      "exactly the batch rows, and a composed quality gate filters the " +
      "stream like the batch form") {
    import org.apache.spark.sql.functions._
    val docs = frame(
      "doc_id" -> Seq[Any](1L, 2L, 3L, 4L),
      "text" -> Seq(
        "a perfectly ordinary document body with several plain tokens",
        "another ordinary document body carrying enough distinct tokens",
        "spam spam spam spam spam spam spam spam spam spam",
        "a third ordinary document with a reasonable token variety"))
    val dir = java.nio.file.Files.createTempDirectory("graft_jlstream").toString
    graft.sources.Jsonl.writeJsonlShards(docs, dir, docsPerShard = 2L)
    val schema = new org.apache.spark.sql.types.StructType()
      .add("doc_id", org.apache.spark.sql.types.LongType)
      .add("text", org.apache.spark.sql.types.StringType)
    def gate(df: org.apache.spark.sql.DataFrame) =
      df.filter(graft.ops.TextAnalysis.qualityExpr(col("text")) > 0.3)
        .select("doc_id")
    val q = gate(graft.sources.Jsonl.readJsonlStream(spark, dir, schema,
        maxFilesPerTrigger = Some(1)))
      .writeStream.outputMode("append").format("memory")
      .queryName("jl_ingest").start()
    val got = try {
      q.processAllAvailable()
      spark.table("jl_ingest").collect().map(_.getLong(0)).sorted.toSeq
    } finally q.stop()
    val batch = gate(graft.sources.Jsonl.readJsonlShards(spark, dir, schema))
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(got == batch, s"stream $got != batch $batch")
    assert(got == Seq(1L, 2L, 4L), s"quality gate failed on the stream: $got")
  }

  test("zOrderedWrite: files tile BOTH dimensions (every file sees a " +
      "bounded x-range AND y-range — the data-skipping property), " +
      "content round-trips exactly") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    val n = 32
    val pts = for { x <- 0 until n; y <- 0 until n } yield (x.toLong, y.toLong)
    val df = spark.createDataFrame(pts).toDF("x", "y")
    graft.ops.Layout.zOrderedWrite(df, "x", "y", numFiles = 16, bits = 5)
      .write.mode("overwrite").parquet(s"$dir/out")
    val back = spark.read.parquet(s"$dir/out")
    // content identical
    assert(back.count() === n.toLong * n)
    assert(back.except(df).isEmpty && df.except(back).isEmpty)
    assert(back.columns.toSeq === Seq("x", "y"), "_z must not ship")
    // per-file bounding boxes: a z-ordered layout bounds BOTH spans in
    // (almost) every file; a plain sort by x would give full-range y
    // stripes (y_span = n-1 for every file)
    val boxes = back
      .groupBy(input_file_name().as("f"))
      .agg((max(col("x")) - min(col("x"))).as("xs"),
        (max(col("y")) - min(col("y"))).as("ys"))
      .collect()
    assert(boxes.length > 8, s"expected ~16 files, got ${boxes.length}")
    val fullSpan = (n - 1).toLong
    assert(boxes.count(b => b.getLong(1) < fullSpan &&
        b.getLong(2) < fullSpan) >= boxes.length - 2,
      "z-order must bound both dimensions in nearly every file")
    // and the skipping payoff is real: average box area well under the
    // full domain (a striped layout averages ~ n * (n/files))
    val avgArea = boxes.map(b =>
      (b.getLong(1) + 1.0) * (b.getLong(2) + 1.0)).sum / boxes.length
    assert(avgArea < 0.35 * n * n,
      s"avg bounding-box area $avgArea not tile-like for $n x $n")
  }

  test("partitionedUpsert: restated weeks replaced, untouched week " +
      "directories byte-identical (dynamic partition overwrite never " +
      "rewrites them)") {
    def day(n: Long): Long = n * 86400L * 1000000000L
    // 4 weeks (days 0, 7, 14, 21), 4 events per week with ids 1..4
    val rows = for (wk <- 0L to 3L; i <- 1L to 4L)
      yield (wk * 4 + i, day(wk * 7) + i, wk * 10 + i)
    val ev = frame(
      "event_id" -> rows.map(_._1),
      "ts_ns" -> rows.map(_._2),
      "user_id" -> rows.map(_._3),
      "event_type" -> rows.map(_ => "click"))
    val dir = java.nio.file.Files
      .createTempDirectory("graft_upsert_spec").toString
    val out = graft.ops.Layout.partitionedUpsert(ev, dir,
      restateWeeks = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // weeks 0-2 keep all 4 rows; week 3 keeps only even event_ids
    assert(out === Map(0L -> 4L, 1L -> 4L, 2L -> 4L, 3L -> 2L))
    def files(week: Long): Set[(String, Long)] = {
      val d = new java.io.File(s"$dir/week=$week")
      d.listFiles().filter(_.getName.startsWith("part-"))
        .map(f => (f.getName, f.length())).toSet
    }
    val before = (0L to 3L).map(w => w -> files(w)).toMap
    // replay ONLY the restatement write: untouched weeks must keep the
    // SAME part files (Spark mints fresh uuid names on any rewrite, so
    // unchanged names prove the directory was never touched)
    val spark2 = ev.sparkSession
    val dayCol = expr(graft.ops.EventWindows
      .floorDivSql("ts_ns", 86400L * 1000000000L))
    val typed = ev.select(col("event_type"), col("user_id"),
        col("event_id"), dayCol.as("day"))
      .withColumn("week", expr("day div 7"))
    val updates = typed.filter(col("week") === 3L &&
      col("event_id") % 2 === 0)
    spark2.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try updates.write.mode("overwrite").partitionBy("week").parquet(dir)
    finally spark2.conf.unset("spark.sql.sources.partitionOverwriteMode")
    for (w <- 0L to 2L)
      assert(files(w) === before(w),
        s"untouched week $w was rewritten by the dynamic overwrite")
    assert(files(3L).map(_._1) != before(3L).map(_._1),
      "restated week 3 must carry fresh part files")
    // and the full-table overwrite danger is the documented contrast:
    // without dynamic mode, mode(overwrite) would have dropped weeks 0-2
    assert((0L to 2L).forall(w => new java.io.File(s"$dir/week=$w").exists))
  }

  test("compactSmallFiles: row multiset conserved, one part file per " +
      "bin, bins respect the byte target, oversized file isolated") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_compact_in").toString
    val outDir = java.nio.file.Files
      .createTempDirectory("graft_compact_out").toString
    // 16 tiny part files
    val df = frame("k" -> (1L to 4096L),
      "v" -> (1L to 4096L).map(i => s"payload_$i"))
    df.repartition(16).write.mode("overwrite").parquet(dir)
    val inFiles = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("part-"))
    assert(inFiles.length === 16)
    val target = inFiles.map(_.length()).sum / 4 // ~4-5 bins
    val plan = graft.ops.Layout.compactSmallFiles(spark, dir, outDir,
      target).collect()
    // conservation: every input row survives exactly once
    val got = spark.read.parquet(outDir).select("k", "v")
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted
    val want = df.collect().map(r => (r.getLong(0), r.getString(1))).sorted
    assert(got.toSeq === want.toSeq)
    assert(plan.map(_.getLong(3)).sum === 4096L)
    // one part file per bin directory
    for (b <- plan.map(_.getLong(0))) {
      val parts = new java.io.File(s"$outDir/_bin=$b").listFiles()
        .filter(_.getName.startsWith("part-"))
      assert(parts.length === 1, s"bin $b has ${parts.length} files")
    }
    // next-fit: multi-file bins stay within target
    assert(plan.forall(r => r.getLong(1) == 1L || r.getLong(2) <= target))
    assert(plan.length < 16, "compaction must reduce the file count")
    // an oversized single file still gets its own bin (no split, no loss)
    val big = java.nio.file.Files
      .createTempDirectory("graft_compact_big").toString
    val bigOut = java.nio.file.Files
      .createTempDirectory("graft_compact_bigout").toString
    frame("k" -> (1L to 2000L), "v" -> (1L to 2000L).map(_.toString))
      .coalesce(1).write.mode("overwrite").parquet(big)
    val p2 = graft.ops.Layout.compactSmallFiles(spark, big, bigOut, 10L)
      .collect()
    assert(p2.length === 1 && p2(0).getLong(1) === 1L &&
      p2(0).getLong(3) === 2000L)
  }

  test("ORC round-trip preserves every documents row and type, and a " +
      "value filter is PUSHED to the ORC scan") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val dir = java.nio.file.Files.createTempDirectory("orc_rt").toString
    graft.sources.Columnar.writeOrc(docs, dir)
    val back = graft.sources.Columnar.readOrc(spark, dir, docs.schema)
    assert(back.schema === docs.schema)
    val got = back.collect().map(_.toSeq).toSet
    val want = docs.collect().map(_.toSeq).toSet
    assert(got === want && want.nonEmpty)
    val q = back.filter(col("n_chars") > 500)
    val scan = q.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: FileSourceScanExec => f
    }.get
    assert(scan.metadata.get("PushedFilters")
      .exists(s => s.contains("n_chars") && s != "[]"),
      s"expected a pushed ORC filter, got ${scan.metadata.get("PushedFilters")}")
    assert(q.count() ===
      docs.filter(col("n_chars") > 500).count())
  }

  test("typed CSV round-trip: explicit schema, NULL vs empty-string " +
      "pinned apart, nested/binary columns refused loudly") {
    val d = frame(
      "id" -> Seq(1L, 2L, 3L, 4L),
      "s" -> Seq("plain", "", null, "with,comma \"quoted\""),
      "x" -> Seq(1.5, -2.0, 0.0, 3.25))
    val dir = java.nio.file.Files.createTempDirectory("csv_rt").toString
    graft.sources.Columnar.writeCsv(d, dir)
    val back = graft.sources.Columnar.readCsv(spark, dir, d.schema)
      .orderBy("id").collect()
    assert(back.length === 4)
    assert(back(0).getString(1) === "plain")
    assert(back(1).getString(1) === "", "empty string must stay empty")
    assert(back(2).isNullAt(1), "NULL must stay NULL, not become \"\"")
    assert(back(3).getString(1) === "with,comma \"quoted\"")
    assert(back.map(_.getDouble(2)).toSeq === Seq(1.5, -2.0, 0.0, 3.25))
    // refusal contract: an array column cannot ride CSV
    val e = intercept[IllegalArgumentException] {
      graft.sources.Columnar.writeCsv(
        frame("id" -> Seq(1L), "emb" -> Seq(Seq(1.0, 2.0))), dir)
    }
    assert(e.getMessage.contains("losslessly"))
  }
}
