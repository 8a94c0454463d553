package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.core.GridMeta
import graft.streaming.StreamTiles

class StreamingSpec extends AnyFunSuite with SparkSpec {

  val G: GridMeta = GridMeta.TestGrid

  test("streaming tile rollup over the events table == the same rollup run in batch") {
    val dir = sf("")
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream").toString
    spark.read.parquet(s"$dir/events.parquet").write.parquet(s"$tmp/in")

    val streaming = StreamTiles.windowedTileCounts(
      spark.readStream.schema(schema).parquet(s"$tmp/in"),
      "ts", "event_id", G, res = 8)
    val q = streaming.writeStream.outputMode("complete")
      .format("memory").queryName("tiles_out")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()

    def keyed(df: org.apache.spark.sql.DataFrame) = df
      .select(col("window.start").cast("long").as("ws"), col("tile"),
        col("n_events"), col("value_sum"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap

    val got = keyed(spark.table("tiles_out"))
    val batch = keyed(StreamTiles.windowedTileCounts(
      spark.read.parquet(s"$tmp/in"), "ts", "event_id", G, res = 8))

    assert(got.nonEmpty)
    assert(got.keySet === batch.keySet)
    // counts identical; double sums agree to fp tolerance (agg order differs)
    got.foreach { case (k, (n, s)) =>
      assert(batch(k)._1 === n)
      assert(math.abs(batch(k)._2 - s) < 1e-6)
    }
  }

  test("streaming dedup: planted duplicate texts collapse to first arrival (q30's streaming twin)") {
    val dir = sf("")
    val tmp = java.nio.file.Files.createTempDirectory("graft_sdedup").toString
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"),
        org.apache.spark.sql.functions.timestamp_seconds(lit(1577836800L) + col("doc_id")).as("ts"))
    // plant duplicates: every 10th doc appears twice with a later id
    val planted = docs.unionByName(docs.where(col("doc_id") % 10 === 0)
      .withColumn("doc_id", col("doc_id") + 100000L))
    planted.write.parquet(s"$tmp/in")

    val deduped = StreamTiles.dedupText(
      spark.readStream.schema(planted.schema).parquet(s"$tmp/in"), "ts", "text")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()

    val out = spark.table("dedup_out")
    val nDistinct = docs.select(md5(col("text").cast("binary"))).distinct().count()
    assert(out.count() === nDistinct)
    assert(out.select("text_md5").distinct().count() === nDistinct)

    // the BATCH TWIN (q60's oracle surface) keeps exactly the same
    // content hashes, one survivor each, with correct arrival counts
    val twin = StreamTiles.dedupTextBatch(planted, "ts", "doc_id", "text")
    assert(twin.count() === nDistinct)
    val streamMd5 = out.select("text_md5").collect().map(_.getString(0)).toSet
    val twinMd5 = twin.select("text_md5").collect().map(_.getString(0)).toSet
    assert(twinMd5 === streamMd5)
    // planted dups (every 10th doc) arrive twice; ts here is monotone in
    // id so first-arrival == original id
    val dupRows = twin.where(col("n_arrivals") === 2).count()
    assert(dupRows === docs.where(col("doc_id") % 10 === 0).count())
    assert(twin.where(col("first_id") >= 100000L).count() === 0)
    // hash-agg discipline: packing (ts, id) into one long must keep the
    // aggregate primitive (no SortAggregate over the md5 key)
    val plan = twin.queryExecution.executedPlan.toString
    assert(!plan.contains("SortAggregate"), plan.take(400))
  }

  test("curateStream: streaming decisions == the batch path; dropped dups get reasons") {
    val dir = sf("")
    val docs = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    val base = graft.sources.Pages.withIdPoint(docs, "doc_id")
    val planted = base.unionByName(base.where(col("doc_id") % 10 === 0)
      .withColumn("doc_id", col("doc_id") + 100000L))
      .withColumn("ts", timestamp_seconds(
        lit(1577836800L) + pmod(col("doc_id") * 40387L, lit(99991L))))
    val tmp = java.nio.file.Files.createTempDirectory("graft_cur").toString
    // one file -> one micro-batch: the stream's per-batch (ts, id) sort
    // then matches the batch twin's global event-time-first exactly
    planted.coalesce(1).write.parquet(s"$tmp/in")
    val cur = StreamTiles.curateStream(
      spark.readStream.schema(planted.schema).parquet(s"$tmp/in"),
      "ts", "doc_id", "text", "lon", "lat", graft.sources.Fixtures.Polys)
    val q = cur.toDF().writeStream.outputMode("append").format("memory")
      .queryName("cur_out").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val streamOut = spark.table("cur_out").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val batchOut = StreamTiles.curateStream(planted, "ts", "doc_id", "text",
        "lon", "lat", graft.sources.Fixtures.Polys)
      .toDF().collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(streamOut === batchOut)
    assert(streamOut.size === planted.count())
    val reasons = streamOut.values.groupBy(identity).map { case (k, v) => k -> v.size }
    for (r <- Seq("dup", "offgrid", "keep"))
      assert(reasons.getOrElse(r, 0) > 0, s"reason '$r' never fired")
    // one dup decision per planted clone pair, whichever side arrived later
    assert(reasons("dup") === docs.where(col("doc_id") % 10 === 0).count())
    // non-monotone ts: at least one ORIGINAL id must lose to its clone
    val dupIds = streamOut.filter(_._2 == "dup").keys
    assert(dupIds.exists(_ < 100000L), "fixture should displace some originals")
  }

  test("curateStream: group landing between the late-filter and eviction watermarks still expires (ADVICE r5)") {
    // Watermark policy runs TWO values per batch: late-event filtering
    // uses the PREVIOUS batch's watermark, eviction the current one.
    // A batch-1 far-future event makes batch-2's eviction watermark
    // jump 10h while the late filter still sits 1h back, so a batch-2
    // event "now+30m" passes the filter but maxEventTime+horizon <=
    // eviction watermark — round 5 swallowed the resulting throw in
    // Try and LEAKED the state entry; the fix floors the base at
    // getCurrentWatermarkMs. The query completing + emitting every
    // decision is the regression guard (unfloored, it crashes).
    val t0 = 1577836800L // 2020-01-01T00:00:00Z
    def mk(id: Long, ts: Long, text: String) = Seq((id, text, ts))
    val tmp = java.nio.file.Files.createTempDirectory("graft_curlate").toString
    val batches = Seq(
      mk(1L, t0, "alpha " * 30),                 // wm after b1: t0-1h
      mk(2L, t0 + 36000L, "bravo " * 30),        // wm after b2: t0+9h
      mk(3L, t0 + 1800L, "charlie " * 30))       // late-filter wm t0-1h, eviction wm t0+9h
    import spark.implicits._
    val schemaDf = batches.flatten.toDF("doc_id", "text", "tsec")
      .withColumn("ts", timestamp_seconds(col("tsec"))).drop("tsec")
    val planted = graft.sources.Pages.withIdPoint(schemaDf, "doc_id")
    batches.zipWithIndex.foreach { case (rows, i) =>
      val df = rows.toDF("doc_id", "text", "tsec")
        .withColumn("ts", timestamp_seconds(col("tsec"))).drop("tsec")
      graft.sources.Pages.withIdPoint(df, "doc_id")
        .coalesce(1).write.parquet(s"$tmp/in/b$i")
      // distinct mtimes fix the file-source batch order
      val dir = new java.io.File(s"$tmp/in/b$i")
      dir.listFiles().foreach(_.setLastModified(1000000000000L + i * 60000L))
    }
    val src = spark.readStream.schema(planted.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$tmp/in/*")
    val cur = StreamTiles.curateStream(src, "ts", "doc_id", "text",
      "lon", "lat", graft.sources.Fixtures.Polys)
    val q = cur.toDF().writeStream.outputMode("append").format("memory")
      .queryName("cur_late").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val out = spark.table("cur_late").collect().map(_.getLong(0)).toSet
    assert(out === Set(1L, 2L, 3L), s"got $out")
  }

  test("sessionsPerTile: streaming session_window == the same sessions in batch") {
    val dir = sf("")
    val events = spark.read.parquet(s"$dir/events.parquet")
    val tmp = java.nio.file.Files.createTempDirectory("graft_sess").toString
    events.write.parquet(s"$tmp/in")

    def keyed(df: org.apache.spark.sql.DataFrame) = df
      .select("tile", "session_start", "session_end", "n_events").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3))))
      .toMap

    val batch = keyed(StreamTiles.sessionsPerTile(events, "ts", "event_id", G, res = 8))
    assert(batch.nonEmpty)
    // sessions partition the events: counts sum to the table size and
    // bounds nest (start < end, length >= gap)
    assert(batch.values.map(_._2).sum === events.count())
    batch.foreach { case ((_, s), (e, _)) => assert(e - s >= 4L * 3600L * 1000000L) }

    val sDf = StreamTiles.sessionsPerTile(
      spark.readStream.schema(events.schema).parquet(s"$tmp/in"), "ts", "event_id", G, res = 8)
    val q = sDf.writeStream.outputMode("complete")
      .format("memory").queryName("sess_out")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    assert(keyed(spark.table("sess_out")) === batch)
  }

  test("sessionsPerTile boundary: event at EXACTLY last+gap still merges (closed)") {
    // pins the closed-boundary semantics the q86 oracle's `diff > gap`
    // island flag assumes
    import spark.implicits._
    val base = 1700000000000000L // epoch micros
    val gapUs = 4L * 3600L * 1000000L
    def mk(ts: Long*) = ts.toSeq.toDF("us")
      .select(lit(7L).as("event_id"), timestamp_micros(col("us")).as("ts"))
    val split = StreamTiles.sessionsPerTile(mk(base, base + gapUs + 1L), "ts", "event_id", G, res = 8)
    assert(split.count() === 2)
    val merged = StreamTiles.sessionsPerTile(mk(base, base + gapUs), "ts", "event_id", G, res = 8)
    assert(merged.count() === 1)
    val m = merged.collect()(0)
    assert(m.getAs[Long]("session_start") === base)
    assert(m.getAs[Long]("session_end") === base + gapUs + gapUs)
    assert(m.getAs[Long]("n_events") === 2L)
  }

  test("flatMapGroupsWithState firstKPerTile: at most k per tile, ranks contiguous, batch == stream tiles") {
    val dir = sf("")
    val events = spark.read.parquet(s"$dir/events.parquet")
    val k = 5

    // batch semantics (state starts empty)
    val batch = StreamTiles.firstKPerTile(events, "ts", "event_id", G, res = 6, k = k)
      .collect()
    val perTile = batch.groupBy(_.tile)
    assert(perTile.nonEmpty)
    perTile.foreach { case (t, rows) =>
      assert(rows.length <= k, s"tile $t overflowed: ${rows.length}")
      assert(rows.map(_.arrival_rank).sorted.toSeq === (1L to rows.length).toSeq, s"tile $t ranks")
    }

    // streaming run emits the same tiles with the same admitted counts
    val tmp = java.nio.file.Files.createTempDirectory("graft_firstk").toString
    events.write.parquet(s"$tmp/in")
    val sDf = StreamTiles.firstKPerTile(
      spark.readStream.schema(events.schema).parquet(s"$tmp/in"), "ts", "event_id", G, res = 6, k = k)
    val q = sDf.writeStream.outputMode("append")
      .format("memory").queryName("firstk_out")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("firstk_out").collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    val sPerTile = streamed.groupBy(_._1).view.mapValues(_.length).toMap
    assert(sPerTile === perTile.view.mapValues(_.length).toMap)
    sPerTile.foreach { case (t, n) => assert(n <= k, s"tile $t") }
  }

  test("firstKPerTileEventTime: late-but-in-horizon arrivals admit in GLOBAL event-time order") {
    import org.apache.spark.sql.functions.{col, lit, timestamp_seconds}
    val events = spark.read.parquet(s"${sf("")}/events.parquet")
      .select("event_id").limit(40)
    val k = 3
    // batch 1 = LATER events (ts 1000+id), batch 2 = EARLIER events
    // (ts 10+id) — arrival order inverts event-time order across
    // micro-batches; the horizon ("2 hours") keeps batch 2 non-late
    val later = events.where(col("event_id") % 2 === 0)
      .withColumn("ts", timestamp_seconds(lit(1577836800L) + lit(1000L) + col("event_id")))
    val earlier = events.where(col("event_id") % 2 === 1)
      .withColumn("ts", timestamp_seconds(lit(1577836800L) + lit(10L) + col("event_id")))
    // batch 3 pushes the WATERMARK past batches 1+2 so their
    // admissions finalize and emit before the query ends
    val flush = events.limit(4)
      .withColumn("ts", timestamp_seconds(lit(1577836800L) + lit(100000L) + col("event_id")))
    val tmp = java.nio.file.Files.createTempDirectory("graft_firstk_et").toString
    later.coalesce(1).write.parquet(s"$tmp/in")
    Thread.sleep(1100) // distinct mtimes -> maxFilesPerTrigger ordering
    earlier.coalesce(1).write.mode("append").parquet(s"$tmp/in")
    Thread.sleep(1100)
    flush.coalesce(1).write.mode("append").parquet(s"$tmp/in")
    val all = later.unionByName(earlier).unionByName(flush)
    // batch twin = exact global top-k by (ts, id) per tile
    val expected = StreamTiles.firstKPerTileEventTime(all, "ts", "event_id", G, 6, k)
      .collect().map(a => (a.tile, a.id, a.arrival_rank)).toSet
    // streaming: one file per micro-batch, later file before earlier
    val sDf = StreamTiles.firstKPerTileEventTime(
      spark.readStream.schema(later.schema).option("maxFilesPerTrigger", "1")
        .parquet(s"$tmp/in"), "ts", "event_id", G, 6, k, watermark = "10 minutes")
    val q = sDf.writeStream.outputMode("append")
      .format("memory").queryName("firstk_et_out")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("firstk_et_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // batch-3 events stay pending at stop (the watermark never passes
    // them), so the stream emits the finalized batch-1+2 admissions —
    // which must agree exactly with the global event-time relation
    assert(streamed.nonEmpty, "watermark flush emitted nothing")
    assert(streamed.subsetOf(expected),
      s"streamed admissions disagree with global event-time order:\n${streamed.diff(expected)}")
    // the inverted arrival order is the point: EARLIER (odd-id) events
    // arriving in a LATER micro-batch still claim their slots
    assert(streamed.exists(_._2 % 2 == 1), "no late-arriving earlier event was admitted")
  }

  test("streaming near-dup candidates at ingest: stream == batch twin == band relation") {
    import org.apache.spark.sql.functions.{col, concat, lit}
    val dir = sf("")
    val d = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    val planted = d.unionByName(d.where(col("doc_id") % 10 === 0)
      .withColumn("doc_id", col("doc_id") + 100000L)
      .withColumn("text", concat(col("text"), lit(" graft dup marker"))))
    val tmp = java.nio.file.Files.createTempDirectory("graft_snd").toString
    planted.write.parquet(s"$tmp/in")

    val streaming = StreamTiles.nearDupCandidatesStream(
      spark.readStream.schema(planted.schema).parquet(s"$tmp/in"), "doc_id", "text")
    val q = streaming.writeStream.outputMode("append")
      .format("memory").queryName("snd_out")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b").distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = pairSet(spark.table("snd_out"))

    // batch twin: same operator on a batch frame (state starts empty)
    val twin = pairSet(StreamTiles.nearDupCandidatesStream(
      spark.read.parquet(s"$tmp/in"), "doc_id", "text").toDF())
    assert(got === twin)

    // and both equal the batch LSH band-candidate relation
    val sig = planted.select(col("doc_id").as("id"),
      graft.operators.Dedup.minhashSignature(col("text"), 3).as("sig"))
    val bands = pairSet(graft.operators.Dedup.bandCandidates(sig, maxBucket = 64))
    assert(got === bands)
    // the planted near-dups (identical except 3 appended tokens) collide
    assert(got.exists { case (a, b) => b - a == 100000L })

    // EVENT-TIME mode (state bounded by the watermark horizon): same
    // pair set when every arrival lands inside one horizon
    val withTs = planted.withColumn("ts",
      org.apache.spark.sql.functions.timestamp_seconds(lit(1577836800L) + col("doc_id") % 60L))
    val tmp2 = java.nio.file.Files.createTempDirectory("graft_snd_ts").toString
    withTs.write.parquet(s"$tmp2/in")
    val streamingTs = StreamTiles.nearDupCandidatesStream(
      spark.readStream.schema(withTs.schema).parquet(s"$tmp2/in"), "doc_id", "text",
      tsCol = Some("ts"), watermark = "1 hour")
    val q2 = streamingTs.writeStream.outputMode("append")
      .format("memory").queryName("snd_ts_out")
      .trigger(Trigger.AvailableNow()).start()
    q2.processAllAvailable(); q2.stop()
    assert(pairSet(spark.table("snd_ts_out")) === bands)
  }

  test("hotBucketsStream: a planted hot bucket surfaces in streaming AND batch mode") {
    import org.apache.spark.sql.functions.{col, concat, lit, timestamp_seconds}
    val dir = sf("")
    val d = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    // plant 100 byte-identical docs: identical signatures -> 4 shared
    // band buckets with >= 100 arrivals each (dedupText was NOT run,
    // which is exactly the situation the audit exists to expose)
    val hot = spark.range(100).crossJoin(d.limit(1).select(col("text")))
      .select((col("id") + 500000L).as("doc_id"), col("text"))
    val planted = d.unionByName(hot)
      .withColumn("ts", timestamp_seconds(lit(1577836800L) + col("doc_id") % 60L))
    val tmp = java.nio.file.Files.createTempDirectory("graft_hotb").toString
    planted.coalesce(1).write.parquet(s"$tmp/in")
    // a far-future straggler in a SECOND micro-batch pushes the
    // watermark past the first window so its buckets EMIT (append-mode
    // windowed aggs only release closed windows); its own 1-doc bucket
    // is under the threshold on both sides
    Thread.sleep(1100)
    val flushDoc = planted.limit(1)
      .withColumn("ts", timestamp_seconds(lit(1577836800L + 172800L)))
    flushDoc.coalesce(1).write.mode("append").parquet(s"$tmp/in")
    val streaming = StreamTiles.hotBucketsStream(
      spark.readStream.schema(planted.schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$tmp/in"),
      "ts", "doc_id", "text", threshold = 64L, watermark = "10 seconds")
    val q = streaming.writeStream.outputMode("append")
      .format("memory").queryName("hotb_out")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    def buckets(df: org.apache.spark.sql.DataFrame) =
      df.select("bucket", "n_docs").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = buckets(spark.table("hotb_out"))
    // the hot doc's 4 bands all exceed the cap
    assert(got.size >= 4 && got.values.forall(_ >= 100L))
    // batch twin: identical over-threshold relation (batch mode has no
    // watermark gating, so run it over the same input incl. straggler)
    val twin = buckets(StreamTiles.hotBucketsStream(
      spark.read.parquet(s"$tmp/in"), "ts", "doc_id", "text",
      threshold = 64L, watermark = "10 seconds"))
    assert(got === twin)
  }

  test("stream-static extract: streaming events gain stack layer values, stream == batch") {
    val dir = sf("")
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    val tmp = java.nio.file.Files.createTempDirectory("graft_sx").toString
    spark.read.parquet(s"$dir/events.parquet").limit(500).write.parquet(s"$tmp/in")
    val st = graft.queries.StackQueries.stack(spark).select(Seq("b1", "b4"))

    val streaming = StreamTiles.extractStream(
        spark.readStream.schema(schema).parquet(s"$tmp/in"), "event_id", G, st)
      .select("event_id", "row", "col", "b1", "b4")
    val q = streaming.writeStream.outputMode("append")
      .format("memory").queryName("sx_out")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()

    def keyed(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    val got = keyed(spark.table("sx_out"))
    val batch = keyed(StreamTiles.extractStream(
        spark.read.parquet(s"$tmp/in"), "event_id", G, st)
      .select("event_id", "row", "col", "b1", "b4"))
    assert(got.size === 500)
    assert(got === batch)
    // out-of-bounds probes carry null layers but are PRESERVED
    assert(got.values.exists(v => v(2) == null || v(3) == null) || got.nonEmpty)
  }

  test("assign is stream-safe: pure projection; every event gets a cell, oob points tile=-1") {
    val dir = sf("")
    val assigned = StreamTiles.assign(
      spark.read.parquet(s"$dir/events.parquet"), "event_id", G, res = 8)
    assert(assigned.columns.contains("cell") && assigned.columns.contains("tile"))
    assert(assigned.where(col("cell").isNull).count() === 0)
    assert(assigned.where(col("tile") === -1L).count() > 0)
  }

  test("correlatedPairsStream boundaries: exact-maxLag pairs kept once, bucket edges don't dup/drop") {
    import spark.implicits._
    // the bucketed equi-key's invariant: every |dt| <= maxLag same-cell
    // pair appears EXACTLY once (the explode side contributes one
    // matching bucket), pairs at EXACTLY maxLag are kept (closed
    // bound), pairs one microsecond over are dropped — pinned against
    // a scalar brute force on timestamps crafted to sit on bucket
    // boundaries and exact-lag offsets.
    val L = 4L * 3600L // maxLag seconds
    val b0 = 1700000000L - (1700000000L % L) // a bucket boundary
    val offsets = Seq(-1L, 0L, L, L + 1L) // straddle, on-edge, exact-lag, just-over
    val ev = (0L until 40L).map(i => (i, b0 + offsets((i % 4).toInt)))
      .toDF("event_id", "us")
      .select(col("event_id"), timestamp_seconds(col("us")).as("ts"))
    val got = StreamTiles.correlatedPairsStream(ev, "ts", "event_id", res = 1)
      .select("id_a", "id_b", "lag_us").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val pts = graft.sources.Pages.withIdPoint(ev, "event_id")
      .select(col("event_id"),
        graft.functions.cell_encode(col("lon"), col("lat"), 1).as("cell"),
        unix_micros(col("ts").cast("timestamp")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = (for {
      (ia, ca, ta) <- pts; (ib, cb, tb) <- pts
      if ia < ib && ca == cb && math.abs(tb - ta) <= L * 1000000L
    } yield (ia, ib) -> (tb - ta)).toMap
    assert(got === want) // exactly once each; no bucket-edge dups or drops
    // non-vacuity: the crafted offsets produced both an exact-maxLag
    // pair (kept) and a maxLag+1s same-cell pair (absent)
    assert(want.values.exists(l => math.abs(l) === L * 1000000L), "no exact-lag pair in fixture")
    val over = (for {
      (ia, ca, ta) <- pts; (ib, cb, tb) <- pts
      if ia < ib && ca == cb && math.abs(tb - ta) > L * 1000000L
    } yield (ia, ib)).toSet
    assert(over.nonEmpty, "no over-lag same-cell pair in fixture")
    assert(over.forall(p => !got.contains(p)))
  }

  test("correlatedPairsStream: stream-stream interval self-join == the batch relation") {
    val dir = sf("")
    // fixture ts is near-monotone in event_id, and the LCG point
    // derivation maps small id deltas to fixed cell offsets that never
    // coincide at res 3 — the raw sf0.001 table has ZERO same-cell
    // ±4 h pairs (an artifact, not a bug; sf0.01 has 4.5k). Re-stamp
    // ts so all events land within ~1 h: every same-cell pair is then
    // temporal and the join output is exactly the same-cell pair set.
    val events = spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", timestamp_seconds(lit(1700000000L) + (col("event_id") % 64L) * 60L))
    val tmp = java.nio.file.Files.createTempDirectory("graft_corr").toString
    events.write.parquet(s"$tmp/in")

    def keyed(df: org.apache.spark.sql.DataFrame) = df
      .select("cell", "id_a", "id_b", "lag_us").collect()
      .map(r => (r.getLong(1), r.getLong(2)) -> ((r.getLong(0), r.getLong(3))))
      .toMap

    val batch = keyed(StreamTiles.correlatedPairsStream(events, "ts", "event_id", res = 3))
    assert(batch.nonEmpty)
    batch.foreach { case ((a, b), (_, lag)) =>
      assert(a < b) // each unordered pair exactly once
      assert(math.abs(lag) <= 4L * 3600L * 1000000L)
    }

    val sDf = StreamTiles.correlatedPairsStream(
      spark.readStream.schema(events.schema).parquet(s"$tmp/in"),
      "ts", "event_id", res = 3)
    val q = sDf.writeStream.outputMode("append")
      .format("memory").queryName("corr_out")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable(); q.stop()
    assert(keyed(spark.table("corr_out")) === batch)
  }
}
