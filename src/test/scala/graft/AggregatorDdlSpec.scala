package graft

import graft.pipeline.Aggregators
import graft.sources.Ddl

class AggregatorDdlSpec extends SparkSpecBase {

  test("HighwaterAgg reproduces test_commit expectations through typed agg") {
    import spark.implicits._
    val got = Seq((0L, 1L), (1L, 0L)).toDS()
      .groupByKey(_._1).mapValues(_._2)
      .agg(Aggregators.HighwaterAgg.toColumn.name("hwm"))
      .collect().toMap
    assert(got === Map(0L -> 2L, 1L -> 1L))
  }

  test("ConcatAgg accumulates then flushes like BatchingReducer") {
    import spark.implicits._
    val got = Seq(("a", "x"), ("a", "y"), ("b", "z")).toDS()
      .groupByKey(_._1).mapValues(_._2)
      .agg(Aggregators.ConcatAgg.toColumn.name("batch"))
      .collect().toMap
    // arrival order within a partition; sort members for stability here
    assert(got("a").split(",").sorted.toSeq === Seq("x", "y"))
    assert(got("b") === "z")
  }

  test("sorted parquet table: catalog-visible, files sorted on the key") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ddl").toString
    val df = graft.ops.Tables.events(spark, sfDir)
      .select($"user_id", $"event_id", $"ts")
    Ddl.createSortedTable(spark, df, "events_sorted", s"$dir/events_sorted",
      Seq("user_id", "event_id"))
    val t = spark.table("events_sorted")
    assert(t.count() === df.count())
    // within every file, (user_id, event_id) is non-decreasing
    val disorder = t
      .withColumn("file", org.apache.spark.sql.functions.input_file_name())
      .withColumn("prev", org.apache.spark.sql.functions.lag($"event_id", 1)
        .over(org.apache.spark.sql.expressions.Window
          .partitionBy($"file", $"user_id").orderBy(
            org.apache.spark.sql.functions.monotonically_increasing_id())))
      .where($"prev".isNotNull && $"event_id" < $"prev")
    assert(disorder.count() === 0)
    spark.sql("DROP TABLE IF EXISTS events_sorted")
  }

  test("partitioned table: predicate prunes whole partitions at plan time") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    val docs = graft.ops.Tables.documents(spark, sfDir)
    Ddl.createPartitionedTable(docs, s"$dir/docs_by_lang", "lang")
    val t = spark.read.parquet(s"$dir/docs_by_lang")
    assert(t.count() === docs.count()) // layout is content-invisible
    val filtered = t.where($"lang" === "en").select($"doc_id", $"lang")
    assert(filtered.count() === docs.where($"lang" === "en").count())
    // pruning happens at PLANNING time: the partition predicate lands in
    // the scan's PartitionFilters, and the files the plan will touch all
    // live under the lang=en directory
    val scan = filtered.queryExecution.executedPlan.collectLeaves().collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scan.nonEmpty)
    assert(scan.head.partitionFilters.exists(_.toString.contains("lang")),
      scan.head.partitionFilters.toString)
    val files = scan.head.relation.location.listFiles(
      scan.head.partitionFilters, Nil).flatMap(_.files)
    assert(files.nonEmpty)
    assert(files.forall(_.getPath.toString.contains("lang=en")),
      "pruned listing must only contain the lang=en partition")
  }

  test("bucketed tables join with NO exchange on either side") {
    import spark.implicits._
    val orders = graft.ops.Tables.orders(spark, sfDir)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
    val customers = graft.ops.Tables.customer(spark, sfDir)
      .select($"c_custkey", $"c_mktsegment")
    Ddl.createBucketedTable(orders.withColumnRenamed("o_custkey", "custkey"),
      "orders_b", "custkey")
    Ddl.createBucketedTable(customers.withColumnRenamed("c_custkey", "custkey"),
      "customer_b", "custkey")
    // force a shuffle-based join (no broadcast) to expose the property
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"), "custkey")
      val plan = joined.queryExecution.executedPlan.toString
      // both sides already carry the bucket hash distribution: the join
      // plans with ZERO Exchange operators — the write-once,
      // join-many-times co-location that kills the per-join fact shuffle
      assert(!plan.contains("Exchange"), plan)
      // and it is still the correct join
      assert(joined.count() ===
        orders.join(customers, $"o_custkey" === $"c_custkey").count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }

  test("compaction: many small files -> few, same rows, crash-safe swap") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").toString
    val data = (0 until 1000).map(i => (i.toLong, s"row$i"))
    data.toDF("id", "payload").repartition(50)
      .write.mode("overwrite").parquet(dir)
    def parquetFiles = new java.io.File(dir).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(parquetFiles >= 50)
    Ddl.compact(spark, dir, targetBytes = 512L * 1024 * 1024)
    assert(parquetFiles <= 2, s"still $parquetFiles files")
    val back = spark.read.parquet(dir).as[(Long, String)].collect().toSet
    assert(back === data.toSet)
    // no leftover temp/backup dirs
    assert(!new java.io.File(dir + "._compact_tmp").exists())
    assert(!new java.io.File(dir + "._compact_old").exists())
    // a CATALOG table over the same path keeps working after compaction
    // (compact refreshes the cached file listing)
    spark.sql("DROP TABLE IF EXISTS compact_t")
    spark.sql(s"CREATE TABLE compact_t USING parquet LOCATION '$dir'")
    assert(spark.table("compact_t").count() === 1000)
    Ddl.compact(spark, dir, targetBytes = 512L * 1024 * 1024)
    assert(spark.table("compact_t").count() === 1000)
    spark.sql("DROP TABLE IF EXISTS compact_t")
  }

  test("recover() restores a table parked by a crashed compaction swap") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-recover")
      .resolve("t").toString
    (0 until 100).map(_.toLong).toDF("id")
      .write.mode("overwrite").parquet(dir)
    // simulate a crash between compact()'s two renames: data parked at
    // the backup name, table dir gone
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.rename(new org.apache.hadoop.fs.Path(dir),
      new org.apache.hadoop.fs.Path(dir + "._compact_old")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(dir)))
    Ddl.recover(spark, dir)
    assert(spark.read.parquet(dir).count() === 100)
    Ddl.recover(spark, dir) // idempotent on a healthy table
    assert(spark.read.parquet(dir).count() === 100)
  }

  test("compact is total on data-less dirs: tombstones-only clears " +
    "them vacuously, empty dir is a no-op") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-compact-e")
      .resolve("t").toString
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(dir))
    Ddl.compact(spark, dir) // empty: must not throw
    // tombstones landed before any data (takedown of a not-yet-built
    // index): vacuously applied, cleared
    Ddl.tombstone(spark, dir, Seq(1L, 2L).toDF("vec_id"))
    assert(Ddl.tombstonesOf(spark, dir).isDefined)
    Ddl.compact(spark, dir)
    assert(Ddl.tombstonesOf(spark, dir).isEmpty)
  }

  test("rewrite preserves column ORDER under using-column anti-joins " +
    "(hoisted join column never reaches the files)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-order")
      .resolve("t").toString
    Seq((1L, 10L), (2L, 20L)).toDF("id_a", "id_b")
      .write.parquet(dir)
    // anti-join on the SECOND column — Spark hoists id_b to the front
    // of the join output; rewrite must restore (id_a, id_b) so later
    // appends and this file agree on physical order (positional
    // readers otherwise depend on which footer wins schema inference)
    Ddl.rewrite(spark, dir) { df =>
      df.join(org.apache.spark.sql.functions.broadcast(
        Seq(20L).toDF("id_b")), Seq("id_b"), "left_anti")
    }
    assert(spark.read.parquet(dir).columns.toSeq === Seq("id_a", "id_b"))
    Seq((3L, 30L)).toDF("id_a", "id_b").write.mode("append").parquet(dir)
    assert(spark.read.parquet(dir).as[(Long, Long)].collect().toSet ===
      Set((1L, 10L), (3L, 30L)))
  }

  test("rewrite column order under SCHEMA-CHANGING transforms: retained " +
    "columns keep the input prefix, added columns append — a later " +
    "append in that order cannot re-introduce the positional flake") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{broadcast, col, lit}
    val dir = java.nio.file.Files.createTempDirectory("graft-order2")
      .resolve("t").toString
    Seq((1L, 10L), (2L, 20L)).toDF("id_a", "id_b")
      .write.parquet(dir)
    // migration transform: anti-join hoists id_b to the front AND a
    // new column is added ahead of the retained ones — the same-set
    // restore this spec's predecessor pinned passed this case through
    // untouched, writing (gen, id_b, id_a)-ordered files
    Ddl.rewrite(spark, dir) { df =>
      df.join(broadcast(Seq(20L).toDF("id_b")), Seq("id_b"), "left_anti")
        .select(lit(2L).as("gen"), col("id_b"), col("id_a"))
    }
    // deterministic contract: input order (id_a, id_b) as the prefix,
    // added column (gen) appended
    assert(spark.read.parquet(dir).columns.toSeq ===
      Seq("id_a", "id_b", "gen"))
    // an appender following the contract agrees with every file on
    // physical order — positional readers are safe regardless of which
    // footer wins schema inference
    Seq((3L, 30L, 2L)).toDF("id_a", "id_b", "gen")
      .write.mode("append").parquet(dir)
    val files = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .listStatus(new org.apache.hadoop.fs.Path(dir))
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
    assert(files.nonEmpty)
    files.foreach { f =>
      assert(spark.read.parquet(f.getPath.toString).columns.toSeq ===
        Seq("id_a", "id_b", "gen"), f.getPath.getName)
    }
    assert(spark.read.parquet(dir).as[(Long, Long, Long)].collect()
      .toSet === Set((1L, 10L, 2L), (3L, 30L, 2L)))
  }

  test("z-ordered layout bounds per-file ranges on BOTH columns") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-z").toString
    // uniform 128x128 grid: any single-column sort leaves the OTHER
    // column's per-file range at the full domain
    val grid = for { x <- 0L until 128L; y <- 0L until 128L } yield (x, y)
    val df = grid.toDF("x", "y")
    Ddl.createZOrderedTable(spark, df, s"$dir/z", "x", "y", numFiles = 16)
    df.repartitionByRange(16, $"x").write.parquet(s"$dir/linear")
    def avgYRange(path: String): Double = {
      val perFile = spark.read.parquet(path)
        .groupBy(org.apache.spark.sql.functions.input_file_name())
        .agg((org.apache.spark.sql.functions.max($"y") -
          org.apache.spark.sql.functions.min($"y")).as("r"))
        .select($"r").as[Long].collect()
      perFile.sum.toDouble / perFile.length
    }
    val zRange = avgYRange(s"$dir/z")
    val linRange = avgYRange(s"$dir/linear")
    // linear-by-x files span essentially all of y (~127); z-order files'
    // y-bounding-boxes shrink towards domain/sqrt(files)
    assert(linRange > 100, s"linear y-range $linRange")
    assert(zRange < linRange / 2, s"z $zRange vs linear $linRange")
  }

  test("kafka source wiring: option mapping and record column mapping") {
    import graft.sources.KafkaRecords
    val opts = KafkaRecords.options(KafkaRecords.Config(
      bootstrapServers = "broker:9092",
      topics = Seq("t1", "t2"),
      maxOffsetsPerTrigger = Some(128L),
      groupIdPrefix = Some("graft")))
    assert(opts("subscribe") === "t1,t2")
    assert(opts("maxOffsetsPerTrigger") === "128") // reference batch bound
    assert(opts("startingOffsets") === "earliest")
    // column mapping over the Kafka source's FULL seven-column contract
    // (SURVEY §1.1: key, value, topic, partition, offset, timestamp,
    // timestampType — exactly what readStream.format("kafka") emits), in
    // the source's own column ORDER, so the mapping is pinned to select
    // by NAME: a positional select would silently transpose. No broker
    // in the sandbox, so the shape is a batch frame with that schema.
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val kafkaSchema = StructType(Seq(
      StructField("key", BinaryType),
      StructField("value", BinaryType),
      StructField("topic", StringType),
      StructField("partition", IntegerType),
      StructField("offset", LongType),
      StructField("timestamp", TimestampType),
      StructField("timestampType", IntegerType)))
    val kafkaShaped = spark.createDataFrame(
      java.util.List.of(
        Row("k1".getBytes("UTF-8"), "payload".getBytes("UTF-8"), "t1", 0, 7L,
          java.sql.Timestamp.valueOf("2024-01-01 00:00:00.250"), 0),
        Row(null, "tomb".getBytes("UTF-8"), "t2", 3, 9L,
          java.sql.Timestamp.valueOf("2024-01-01 00:00:01.000"), 1)),
      kafkaSchema)
    val recs = KafkaRecords.toRecords(kafkaShaped)
      .collect().sortBy(_.offset).toSeq
    val rec = recs.head
    assert(rec.topic === "t1" && rec.partition === 0 && rec.offset === 7L)
    assert(rec.timestampMs % 1000 === 250L)
    assert(rec.key.map(new String(_, "UTF-8")) === Some("k1"))
    assert(new String(rec.value, "UTF-8") === "payload")
    // null key (every reference test's shape, src/lib.rs:1206) → None
    assert(recs(1).key.isEmpty && recs(1).topic === "t2"
      && recs(1).partition === 3)
  }

  test("writeShards: manifest reconciles, is deterministic, and detects tampering") {
    import spark.implicits._
    import graft.sources.Ddl
    val docs = graft.ops.Tables.documents(spark, sfDir)
      .select($"doc_id", $"text", $"source")
    val dir = java.nio.file.Files.createTempDirectory("graft-shards").toString
    val m1 = Ddl.writeShards(docs, s"$dir/v1", shards = 4).collect()
    // totals reconcile with the source frame; all shards materialize
    assert(m1.map(_.getAs[Long]("n_rows")).sum === docs.count())
    assert(m1.map(_.getAs[Long]("shard")).sorted.toSeq === Seq(0L, 1L, 2L, 3L))
    // deterministic: a second delivery of the same frame produces the
    // byte-identical manifest (rule is md5-keyed, no rand)
    val m2 = Ddl.writeShards(docs, s"$dir/v2", shards = 4).collect()
    assert(m1.map(_.toSeq).toSeq === m2.map(_.toSeq).toSeq)
    // a content change flips exactly its shard's checksum
    val tampered = docs.withColumn("text",
      org.apache.spark.sql.functions.when($"doc_id" === 7L,
        org.apache.spark.sql.functions.lit("TAMPERED")).otherwise($"text"))
    val m3 = Ddl.writeShards(tampered, s"$dir/v3", shards = 4).collect()
    val changed = m1.zip(m3).filter { case (a, b) => a.toSeq != b.toSeq }
    assert(changed.length === 1, changed.mkString(","))
    assert(changed.head._1.getAs[Long]("n_rows") ===
      changed.head._2.getAs[Long]("n_rows")) // same rows, different hash
    // an EMPTY delivery (releaseCorpus can hand an empty val/test
    // split) returns an empty manifest instead of failing the
    // schema-less read-back
    val empty = Ddl.writeShards(docs.where($"doc_id" < 0L),
      s"$dir/v-empty", shards = 4)
    assert(empty.count() === 0L)
    // shard rule identity with the oracle-gated q_shard_assign: first
    // md5 byte mod shards
    val sa = graft.operators.Corpus.shardAssign(spark, sfDir, nShards = 4)
      .select($"doc_id", $"shard").as[(Long, Long)].collect().toMap
    val delivered = (0 to 3).flatMap { sh =>
      val p = new java.io.File(s"$dir/v1/shard=$sh")
      if (p.exists)
        spark.read.parquet(p.toString).select($"doc_id")
          .as[Long].collect().map(_ -> sh.toLong)
      else Seq.empty
    }.toMap
    delivered.foreach { case (id, sh) => assert(sa(id) === sh, s"doc $id") }
  }

  test("dlq summary reduces a dead-letter directory (reduce_err analogue)") {
    import spark.implicits._
    import graft.pipeline.Record
    val dlqDir = java.nio.file.Files.createTempDirectory("graft-dlq").toString
    Seq(Record("t", 0, 5L, 0L, None, Array[Byte](1)),
      Record("t", 0, 7L, 0L, None, Array[Byte](2)),
      Record("t", 1, 3L, 0L, None, Array[Byte](3)))
      .toDS().write.mode("overwrite").parquet(dlqDir)
    val got = graft.streaming.StreamingPipeline.dlqSummary(spark, dlqDir)
      .orderBy($"partition")
      .select($"partition", $"n_failed", $"first_offset", $"last_offset")
      .as[(Int, Long, Long, Long)].collect().toSeq
    assert(got === Seq((0, 2L, 5L, 7L), (1, 1L, 3L, 3L)))
  }
}
