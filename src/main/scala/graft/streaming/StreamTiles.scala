package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.core.GridMeta
import graft.functions._

/** Event routed to a tile (input row of [[StreamTiles.firstKPerTile]]). */
final case class TileEvent(tile: Long, id: Long, tsMillis: Long)
/** One (band, bandKey) arrival of a document (near-dup ingest path);
  * ts is null when the caller runs without event time. The TIMESTAMP
  * column itself rides along so the upstream watermark survives column
  * pruning (event-time timeout requires it in the plan). */
final case class BandArrival(bucket: String, id: Long, ts: java.sql.Timestamp)
/** Ids already resident in a band bucket (bounded by the cap). */
final case class BucketState(ids: List[Long])
/** Candidate near-duplicate pair (id_a < id_b). */
final case class CandPair(id_a: Long, id_b: Long)
/** Custom state: how many arrivals a tile has already admitted. */
final case class TileSeen(seen: Long)
/** Custom state for the EVENT-TIME admission variant: admitted count +
  * events still pending finalization (newer than the watermark). */
final case class TileBuffer(seen: Long, pending: List[TileEvent])
/** [[TileEvent]] + the raw timestamp column riding along so the
  * upstream watermark survives column pruning (same rationale as
  * [[BandArrival]]). */
final case class TileEventW(tile: Long, id: Long, tsMillis: Long,
                            ts: java.sql.Timestamp)
/** Output: the `arrival_rank`-th admitted event of `tile`. */
final case class TileArrival(tile: Long, id: Long, arrival_rank: Long)

/** Curation-at-ingest event: content hash + precomputed stateless gate
  * verdict; the raw timestamp rides along for the watermark (same
  * rationale as [[TileEventW]]). */
final case class CurEvent(md5: String, id: Long, tsMillis: Long,
                          ts: java.sql.Timestamp, gate: String)
/** Curation decision for one arriving document. */
final case class CurDecision(doc_id: Long, reason: String)

/**
 * Streaming tile assignment. The reference is a pure batch library
 * (SURVEY.md §2.9), so this is an ENGINE EXTENSION, not a ported
 * operator: the same cell/tile Catalyst expressions applied to a
 * Structured Streaming source — arriving pages/events get point
 * geometry, cell and tile ids, and flow into watermarked event-time
 * windows. State is bounded by the watermark; the aggregation key
 * (window, tile/cell) is exactly the batch rollup key, so streaming and
 * batch results are union-compatible (lambda-free architecture).
 */
object StreamTiles {

  /**
   * Assign cell + tile to a (possibly streaming) DataFrame carrying an
   * id column; pure projections — works identically on batch and
   * streaming frames.
   */
  def assign(df: DataFrame, idCol: String, g: GridMeta, res: Int,
             th: Int = 64, tw: Int = 64): DataFrame = {
    val withPoint = graft.sources.Pages.withIdPoint(df, idCol)
    withPoint
      .withColumn("cell", cell_encode(col("lon"), col("lat"), res))
      .withColumn("grow", grid_row(col("lon"), col("lat"), g))
      .withColumn("gcol", grid_col(col("lon"), col("lat"), g))
      .withColumn("tile",
        when(in_bounds(col("grow"), col("gcol"), g), tile_id(col("grow"), col("gcol"), g, th, tw))
          .otherwise(-1L))
      .drop("grow", "gcol")
  }

  /**
   * CUSTOM-STATE streaming operator (flatMapGroupsWithState): admit the
   * FIRST `k` events per tile and drop the rest — the streaming
   * "reservoir head" used to cap per-tile sampling at ingest. State per
   * tile is a single counter (bounded by the live-tile count, not the
   * stream); within a micro-batch, arrivals order by (event time, id)
   * so admission is deterministic per batch. Emits (tile, id,
   * arrival_rank) in Append mode. Works identically on a batch Dataset
   * (state starts empty) — asserted in StreamingSpec.
   */
  def firstKPerTile(events: DataFrame, tsCol: String, idCol: String,
                    g: GridMeta, res: Int, k: Int): Dataset[TileArrival] = {
    val spark = events.sparkSession
    import spark.implicits._
    val assigned = assign(events, idCol, g, res)
      .select(col("tile"), col(idCol).cast("long").as("id"),
        (col(tsCol).cast("timestamp").cast("double") * 1000.0).cast("long").as("tsMillis"))
      .as[TileEvent]
    assigned.groupByKey(_.tile)
      .flatMapGroupsWithState[TileSeen, TileArrival](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (tile: Long, it: Iterator[TileEvent], state: GroupState[TileSeen]) =>
          val seen = if (state.exists) state.get.seen else 0L
          val room = math.max(0L, k - seen)
          val picked =
            if (room == 0L) Seq.empty
            else {
              // bounded size-`room` MAX-heap on (tsMillis, id): memory is
              // O(k) per tile, not O(micro-batch group) — a hot tile must
              // not materialize-and-sort its whole batch
              implicit val ord: Ordering[TileEvent] =
                Ordering.by((e: TileEvent) => (e.tsMillis, e.id))
              val heap = scala.collection.mutable.PriorityQueue.empty[TileEvent]
              it.foreach { e =>
                if (heap.size < room) heap.enqueue(e)
                else if (ord.lt(e, heap.head)) { heap.dequeue(); heap.enqueue(e) }
              }
              heap.dequeueAll.reverse // ascending (tsMillis, id)
            }
          if (picked.nonEmpty) state.update(TileSeen(seen + picked.size))
          picked.iterator.zipWithIndex.map { case (e, i) =>
            TileArrival(tile, e.id, seen + i + 1)
          }
      }
  }

  /**
   * EVENT-TIME-ordered admission — [[firstKPerTile]]'s watermark-exact
   * variant: where firstKPerTile admits in (micro-batch, event-time)
   * order (deterministic per batch, but late data that arrives in a
   * later batch can never displace an earlier admission), this variant
   * BUFFERS arrivals per tile and only finalizes admissions when the
   * watermark passes them — so the admitted set is the GLOBAL first k
   * by (event time, id) regardless of how arrivals interleave across
   * micro-batches (exactness across late data inside the horizon).
   * State per tile = admitted count + the pending (not yet
   * watermark-final) events; an event-time timer re-arms while pending
   * events remain, and pending events beyond the k-quota drop as soon
   * as the quota fills. On a BATCH frame each group's iterator is
   * complete (no watermark exists), so the operator emits the exact
   * top-k by (ts, id) directly — the oracle-checkable batch twin, and
   * exactly the relation q55's oracle ranks.
   */
  def firstKPerTileEventTime(events: DataFrame, tsCol: String, idCol: String,
                             g: GridMeta, res: Int, k: Int,
                             watermark: String = "10 minutes"): Dataset[TileArrival] = {
    val spark = events.sparkSession
    import spark.implicits._
    val assigned = events.transform { df =>
        val a = assign(df, idCol, g, res).withColumn("__ts", col(tsCol).cast("timestamp"))
        if (df.isStreaming) a.withWatermark("__ts", watermark) else a
      }
      .select(col("tile"), col(idCol).cast("long").as("id"),
        (col("__ts").cast("double") * 1000.0).cast("long").as("tsMillis"),
        col("__ts").as("ts"))
      .as[TileEventW]
    val ord = Ordering.by((e: TileEvent) => (e.tsMillis, e.id))
    val timeout =
      if (events.isStreaming) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    // the ts column stays in the grouped Dataset (TileEventW) so the
    // watermark attribute survives column pruning down to the stateful
    // operator; the buffer state narrows to TileEvent
    assigned.groupByKey(_.tile)
      .flatMapGroupsWithState[TileBuffer, TileArrival](
        OutputMode.Append(), timeout) {
        (tile: Long, itW: Iterator[TileEventW], state: GroupState[TileBuffer]) =>
          val it = itW.map(e => TileEvent(e.tile, e.id, e.tsMillis))
          val st = if (state.exists) state.get else TileBuffer(0L, Nil)
          // batch mode: no watermark exists — the group iterator is
          // complete, emit the exact global top-k directly
          val wmOpt = scala.util.Try(state.getCurrentWatermarkMs()).toOption
          wmOpt match {
            case None =>
              val picked = it.toSeq.sorted(ord).take(k)
              picked.iterator.zipWithIndex.map { case (e, i) => TileArrival(tile, e.id, i + 1L) }
            case Some(wm) =>
              var seen = st.seen
              var pending = (st.pending ++ it).sorted(ord)
              val out = scala.collection.mutable.ArrayBuffer.empty[TileArrival]
              // finalize: events at or before the watermark can no
              // longer be preceded by anything — admit in global
              // (ts, id) order while the quota lasts
              val (fin, rest) = pending.partition(_.tsMillis <= wm)
              fin.foreach { e =>
                if (seen < k) { seen += 1; out += TileArrival(tile, e.id, seen) }
              }
              // keep only pending events that could still be admitted:
              // the sorted head of size (k - seen) — anything beyond it
              // is preceded by enough guaranteed-finalizing events to
              // exhaust the quota (new arrivals only push it further out)
              pending = rest.take(math.max(0, (k - seen).toInt))
              state.update(TileBuffer(seen, pending))
              // re-arm while anything is pending: fire once the
              // watermark can have passed the earliest pending event
              if (pending.nonEmpty)
                state.setTimeoutTimestamp(math.max(pending.head.tsMillis + 1, wm + 1))
              out.iterator
          }
      }
  }

  /**
   * Streaming EXACT dedup at ingest — the streaming counterpart of
   * Dedup.exact (q30): keep the first arrival per content hash, drop
   * later duplicates. State is the set of hashes seen within the
   * watermark horizon, expired by the engine (RocksDB/HDFS state store
   * at scale; the shuffle key is the 16-byte md5, never the text).
   * A 100-TB ingest dedups per-horizon here and exactly in the batch
   * compaction pass (Dedup.exact) — the standard lambda split.
   */
  def dedupText(df: DataFrame, tsCol: String, textCol: String,
                watermark: String = "1 hour"): DataFrame =
    df.withColumn(tsCol, col(tsCol).cast("timestamp"))
      .withColumn("text_md5", md5(col(textCol).cast("binary")))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("text_md5")

  /**
   * Batch twin of [[dedupText]] — the compaction-pass semantics of the
   * lambda split: per content hash keep the EVENT-TIME-first arrival
   * (min over (ts, id); the streaming side admits the processing-order
   * first, which coincides when arrivals are processed in event order).
   * Deterministic and oracle-expressible, unlike `dropDuplicates`.
   *
   * Scale shape: (ts, id) packs into ONE long (ts * 2^31 + id), so the
   * group-by is a primitive-typed HASH aggregate with map-side
   * partials — a min over a (ts, id) STRUCT would plan an
   * ObjectHashAggregate/SortAggregate (the Dedup.representatives
   * lesson: never aggregate non-primitive columns on the hot path).
   * Packing domain is ENFORCED, not assumed (ADVICE r4): ids must be in
   * [0, 2^31) and timestamps non-null epoch-seconds >= 0 — violations
   * raise instead of silently corrupting first_ts/first_id.
   */
  def dedupTextBatch(df: DataFrame, tsCol: String, idCol: String,
                     textCol: String): DataFrame = {
    val id = col(idCol).cast("long")
    val ts = col(tsCol).cast("timestamp").cast("long")
    val packed = when(id >= 0L && id < TsPack && ts >= 0L, ts * TsPack + id)
      .otherwise(raise_error(concat(
        lit(s"dedupTextBatch: id must be in [0, $TsPack) and $tsCol a non-null epoch-seconds >= 0 timestamp; got id="),
        coalesce(id.cast("string"), lit("null")), lit(" ts="),
        coalesce(ts.cast("string"), lit("null")))).cast("long"))
    df.select(md5(col(textCol).cast("binary")).as("text_md5"), packed.as("__arr"))
      .groupBy("text_md5")
      .agg(min(col("__arr")).as("__f"), count(lit(1)).as("n_arrivals"))
      .select(col("text_md5"),
        graft.functions.idiv(col("__f"), lit(TsPack)).as("first_ts"),
        pmod(col("__f"), lit(TsPack)).as("first_id"),
        col("n_arrivals"))
  }
  /** (ts, id) packing base: id must be in [0, 2^31). */
  val TsPack: Long = 2147483648L

  /**
   * Streaming extract_xy — arriving events gain the static raster
   * stack's layer values: a STREAM-STATIC left-outer equi-join on
   * (row, col). Stateless on the stream side (each micro-batch probes
   * the static table; with a tile-bucketed stack the probe is
   * co-partitioned), so a 100-TB static stack serves an unbounded
   * stream. Works identically on a batch frame — the same
   * lambda-free-architecture contract as [[assign]].
   */
  def extractStream(events: DataFrame, idCol: String, g: GridMeta,
                    stack: graft.operators.Stack): DataFrame = {
    val probed = graft.sources.Pages.withIdPoint(events, idCol)
      .withColumn("row", grid_row(col("lon"), col("lat"), g))
      .withColumn("col", grid_col(col("lon"), col("lat"), g))
    probed.join(stack.df, Seq("row", "col"), "left_outer")
  }

  /**
   * Streaming NEAR-duplicate candidate detection at ingest — the
   * stream half of the minhash-LSH lambda split (batch half:
   * `Dedup.minhashLsh`/`jaccardPairs` in the compaction pass): each
   * arriving document projects to its 4 MinHash band keys (pure
   * Columns, stream-safe), and a custom-state operator per band bucket
   * emits a candidate pair for every prior resident of the bucket.
   * State per bucket is a BOUNDED id list (`maxBucket`, the
   * `Dedup.DefaultMaxBucket` discipline: a bucket over the cap stops
   * pairing instead of materializing O(n^2) pairs on one key); run
   * [[dedupText]] upstream so byte-identical boilerplate never reaches
   * banding — the same exact-dup pre-collapse the batch path applies.
   * Pairs surface once per SHARED BAND; distinct them downstream
   * (`dropDuplicatesWithinWatermark` on (id_a, id_b) streaming, plain
   * distinct in the batch twin). Works identically on a batch frame
   * (state starts empty) — spec-asserted against the batch
   * `Dedup.bandCandidates` relation.
   *
   * State expiry: pass `tsCol` to bound state by EVENT TIME — bucket
   * lists expire one `watermark` horizon after their last arrival
   * (event-time timeout; the dedupText pattern), so an unbounded
   * ingest's state is the ACTIVE buckets of the horizon, not the
   * corpus. Without `tsCol` the state lives for the job (fine for a
   * bounded compaction run).
   */
  def nearDupCandidatesStream(df: DataFrame, idCol: String, textCol: String,
                              w: Int = 3, maxBucket: Int = 64,
                              tsCol: Option[String] = None,
                              watermark: String = "1 hour"): Dataset[CandPair] = {
    val spark = df.sparkSession
    import spark.implicits._
    val base = tsCol match {
      case Some(tc) => df.withColumn("__ts", col(tc).cast("timestamp"))
        .withWatermark("__ts", watermark)
      case None => df.withColumn("__ts", lit(null).cast("timestamp"))
    }
    val banded = bandProjection(base, idCol, textCol, w).as[BandArrival]
    val timeout =
      if (tsCol.isDefined) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    banded.groupByKey(_.bucket)
      .flatMapGroupsWithState[BucketState, CandPair](OutputMode.Append(), timeout) {
        (_: String, it: Iterator[BandArrival], state: GroupState[BucketState]) =>
          if (state.hasTimedOut) {
            // horizon passed with no new arrival: drop the bucket list
            state.remove()
            Iterator.empty
          } else {
            var ids = if (state.exists) state.get.ids else Nil
            var size = ids.size
            var maxTs = 0L
            val out = scala.collection.mutable.ArrayBuffer.empty[CandPair]
            // deterministic intra-batch admission order (arrival order
            // within a micro-batch is partition-dependent)
            it.toSeq.sortBy(_.id).foreach { a =>
              if (a.ts != null && a.ts.getTime > maxTs) maxTs = a.ts.getTime
              if (!ids.contains(a.id) && size < maxBucket) {
                ids.foreach { b =>
                  out += (if (a.id < b) CandPair(a.id, b) else CandPair(b, a.id))
                }
                ids = a.id :: ids
                size += 1
              }
            }
            state.update(BucketState(ids))
            // expiry re-arms on activity: last arrival + one horizon
            // (Try: a BATCH run of the same code has no watermark and
            // GroupState refuses timeout calls — batch state dies with
            // the job anyway, so expiry is meaningless there)
            if (tsCol.isDefined) scala.util.Try {
              state.setTimeoutTimestamp(math.max(maxTs,
                state.getCurrentWatermarkMs() + 1), watermark)
            }
            out.iterator
          }
      }
  }

  /**
   * Shared MinHash band projection of the near-dup ingest paths:
   * (bucket, id, ts) — one row per (doc, band). Sub-w-word docs carry a
   * NULL signature; concat_ws would collapse them all into the 4
   * empty-key band buckets (ADVICE r4) — excluded exactly like
   * `Dedup.bandCandidates` and the oracles' null-propagating ||.
   */
  private def bandProjection(base: DataFrame, idCol: String, textCol: String,
                             w: Int): DataFrame =
    base.select(col(idCol).cast("long").as("id"), col("__ts").as("ts"),
        graft.operators.Dedup.minhashSignature(col(textCol), w).as("sig"))
      .where(col("sig").isNotNull)
      .select(col("id"), col("ts"),
        posexplode(transform(sequence(lit(0), lit(3)),
          bi => concat_ws(",", (1 to 4).map(r => element_at(col("sig"), bi * 4 + r)): _*))))
      .select(concat_ws("|", col("pos"), col("col")).as("bucket"),
        col("id"), col("ts"))

  /**
   * Streaming AUDIT of the band-bucket cap (the `Dedup.hotBands`
   * discipline at ingest): watermarked per-(window, bucket) arrival
   * counts, emitting buckets whose count within the window exceeds
   * `threshold` — run beside [[nearDupCandidatesStream]] so a
   * `maxBucket` cap that bites is VISIBLE, never a silent truncation.
   * Pure Columns + a windowed aggregation (state expires with the
   * watermark); works identically on a batch frame, which is the
   * spec's oracle twin.
   */
  def hotBucketsStream(df: DataFrame, tsCol: String, idCol: String, textCol: String,
                       w: Int = 3, threshold: Long = 64L,
                       windowLen: String = "1 hour",
                       watermark: String = "1 hour"): DataFrame = {
    val base = df.withColumn("__ts", col(tsCol).cast("timestamp"))
      .withWatermark("__ts", watermark)
    // aggregate on NUMERIC keys (band idx + the 4 raw signature longs)
    // and build the bucket STRING after the aggregation: concatenating
    // the keys before the agg inlined the signature expression into the
    // fused hash-agg codegen and blew janino's 64 KB method limit
    // (silent interpreted fallback — the round-3 lesson)
    val sig = base.select(col("__ts").as("ts"),
        graft.operators.Dedup.minhashSignature(col(textCol), w).as("sig"))
      .where(col("sig").isNotNull)
    val banded = sig.select(Seq(col("ts"),
        posexplode(transform(sequence(lit(0), lit(3)),
          bi => slice(col("sig"), bi * 4 + lit(1), lit(4))))): _*)
      .select(Seq(col("ts"), col("pos").as("band")) ++
        (1 to 4).map(r => element_at(col("col"), r).as(s"__k$r")): _*)
    banded
      .groupBy(window(col("ts"), windowLen), col("band"),
        col("__k1"), col("__k2"), col("__k3"), col("__k4"))
      .agg(count(lit(1)).as("n_docs"))
      .where(col("n_docs") > threshold)
      .select(col("window"),
        concat_ws("|", col("band"),
          concat_ws(",", col("__k1"), col("__k2"), col("__k3"), col("__k4"))).as("bucket"),
        col("n_docs"))
  }

  /**
   * Watermarked sliding-window rollup per tile: late data beyond
   * `watermark` is dropped, state expires with the watermark.
   */
  def windowedTileCounts(events: DataFrame, tsCol: String, idCol: String,
                         g: GridMeta, res: Int,
                         windowLen: String = "10 minutes",
                         slide: String = "10 minutes",
                         watermark: String = "30 minutes"): DataFrame =
    assign(events, idCol, g, res)
      .withColumn(tsCol, col(tsCol).cast("timestamp")) // NTZ -> event-time type
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen, slide), col("tile"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value")).as("value_sum"))

  /**
   * Stream-STREAM interval self-join (the one Structured Streaming join
   * primitive the other operators don't exercise): pairs of events
   * landing in the same coarse spatial cell within `maxLag` of each
   * other, both sides watermarked so the join state is bounded — each
   * side buffers only events younger than watermark + maxLag; older
   * state is evicted because the time bounds can no longer match.
   *
   * Emits (cell, id_a, id_b, lag_us) with id_a < id_b (each unordered
   * pair once); lag_us = signed microsecond lag of b behind a.
   *
   * Join-key design (the part that decides 100 TB viability): the
   * equi-key is (cell, TIME BUCKET of width maxLag) — side a explodes
   * into its bucket and both neighbors, side b keeps its own bucket,
   * so every true pair (|Δt| <= maxLag implies |Δbucket| <= 1) matches
   * EXACTLY once and the ±maxLag bounds become a residual filter. With
   * cell alone, key cardinality is fixed (64 at res 3) while per-key
   * pair products grow QUADRATICALLY with the time span — measured
   * 15 s at sf0.1 vs ~30x less pair work bucketed. Bucketing makes key
   * cardinality grow with the time span, which is what bounds both the
   * shuffle fan-in and the per-task join products as the corpus grows.
   *
   * The JOIN condition carries the equi-keys and the two time bounds —
   * the forms `StreamingJoinHelper` derives state watermarks from; the
   * id ordering is written as a post-join filter. (Catalyst pushes
   * that filter back into the join condition, where the state-watermark
   * analyzer attempts the non-time `<` conjunct, logs a CAUGHT
   * "Cannot evaluate expression" internal error, and proceeds — state
   * eviction is still derived from the time conjuncts, and the
   * StreamingSpec batch≡stream pin holds. The log line is analyzer
   * noise, not a failure.) The same code path runs on batch frames
   * (watermark is a no-op there). A hot (cell, bucket) is handled like
   * every hot key in this engine (AQE skew join, or one `res` finer).
   */
  def correlatedPairsStream(events: DataFrame, tsCol: String, idCol: String,
                            res: Int, maxLag: String = "4 hours",
                            watermark: String = "30 minutes"): DataFrame = {
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
      org.apache.spark.unsafe.types.UTF8String.fromString(maxLag))
    require(iv.months == 0 && iv.days == 0 && iv.microseconds > 0,
      s"maxLag must be a positive sub-day interval, got '$maxLag'")
    val bucketUs = iv.microseconds
    def base(sfx: String): DataFrame =
      graft.sources.Pages.withIdPoint(events, idCol)
        .select(cell_encode(col("lon"), col("lat"), res).as(s"cell$sfx"),
          col(tsCol).cast("timestamp").as(s"ts$sfx"),
          col(idCol).as(s"id$sfx"))
        .withColumn(s"bk$sfx", fdiv(unix_micros(col(s"ts$sfx")), bucketUs))
        .withWatermark(s"ts$sfx", watermark)
    val a = base("_a").withColumn("bk_a",
      explode(array(col("bk_a") - 1L, col("bk_a"), col("bk_a") + 1L)))
    a.join(base("_b"),
      expr(s"cell_a = cell_b AND bk_a = bk_b AND " +
        s"ts_b >= ts_a - INTERVAL $maxLag AND ts_b <= ts_a + INTERVAL $maxLag"))
      .where(col("id_a") < col("id_b"))
      .select(col("cell_a").as("cell"), col("id_a"), col("id_b"),
        (unix_micros(col("ts_b")) - unix_micros(col("ts_a"))).as("lag_us"))
  }

  /**
   * Gap-separated activity SESSIONS per tile (Spark `session_window`):
   * consecutive events on a tile merge into one session while each
   * arrives within `gap` of the session's last event INCLUSIVE — an
   * event landing at EXACTLY last + gap still merges (closed-boundary
   * semantics, pinned by StreamingSpec; the oracle's island flag is
   * therefore diff > gap). Works identically on batch and streaming
   * frames (the batch relation is q86's islands-and-gaps oracle; in
   * streaming, state is per open session and expires once the
   * watermark passes the session end).
   *
   * Emits (tile, session_start, session_end, n_events) with the bounds
   * in epoch MICROSECONDS (bit-exact against the oracle — the fixture
   * timestamps are microsecond-grained).
   */
  def sessionsPerTile(events: DataFrame, tsCol: String, idCol: String,
                      g: GridMeta, res: Int,
                      gap: String = "4 hours",
                      watermark: String = "30 minutes"): DataFrame =
    assign(events, idCol, g, res)
      .withColumn(tsCol, col(tsCol).cast("timestamp"))
      .withWatermark(tsCol, watermark)
      .groupBy(session_window(col(tsCol), gap), col("tile"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("tile"),
        unix_micros(col("session_window.start")).as("session_start"),
        unix_micros(col("session_window.end")).as("session_end"),
        col("n_events"))

  /**
   * CURATION AT INGEST — the q106 batch curation pipeline as a
   * streaming operator: every arriving document gets a decision the
   * moment it lands. The quality gates (token count, PIP region,
   * quality score) are STATELESS projections over the broadcast
   * polygon fixture; only exact-dedup needs state — one boolean per
   * content hash via `flatMapGroupsWithState` (unlike
   * `dropDuplicatesWithinWatermark`, dropped arrivals are EMITTED with
   * reason `dup`, which a curation ledger needs). State expires one
   * watermark horizon after the hash's last arrival (the
   * [[nearDupCandidatesStream]] expiry discipline).
   *
   * Batch twin: on a batch frame each group's iterator is complete, so
   * the representative is the global event-time-first (ts, id)
   * arrival — deterministic and oracle-expressible (the
   * [[dedupTextBatch]] lambda-split contract). Within one micro-batch
   * the same rule applies; across micro-batches processing order wins
   * (the streaming caveat shared with [[dedupText]]).
   */
  def curateStream(df: DataFrame, tsCol: String, idCol: String,
                   textCol: String, lonCol: String, latCol: String,
                   polys: graft.core.PolygonSet,
                   minTok: Int = 20, minQ: Double = 0.35,
                   watermark: String = "1 hour"): Dataset[CurDecision] = {
    val spark = df.sparkSession
    import spark.implicits._
    import graft.operators.{SpatialJoin, TextAnalysis}
    val gated0 = SpatialJoin.assign(df, col(lonCol), col(latCol), polys)
      .withColumn("__ts", col(tsCol).cast("timestamp"))
      .withColumn("__gate",
        when(TextAnalysis.tokenCount(col(textCol)) < minTok, "short")
          .when(col("poly_id") < 0, "offgrid")
          .when(TextAnalysis.qualityScore(col(textCol)) < minQ, "lowq")
          .otherwise("keep"))
    val gated =
      if (df.isStreaming) gated0.withWatermark("__ts", watermark) else gated0
    val prepared = gated.select(
      md5(col(textCol).cast("binary")).as("md5"),
      col(idCol).cast("long").as("id"),
      (col("__ts").cast("double") * 1000.0).cast("long").as("tsMillis"),
      col("__ts").as("ts"), col("__gate").as("gate")).as[CurEvent]
    val streaming = df.isStreaming
    val timeout =
      if (streaming) GroupStateTimeout.EventTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    prepared.groupByKey(_.md5)
      .flatMapGroupsWithState[Boolean, CurDecision](
        OutputMode.Append(), timeout) {
        (_: String, it: Iterator[CurEvent], state: GroupState[Boolean]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val evs = it.toSeq.sortBy(e => (e.tsMillis, e.id))
            val seen = state.exists
            val out =
              if (evs.isEmpty) Nil
              else if (seen) evs.map(e => CurDecision(e.id, "dup"))
              else CurDecision(evs.head.id, evs.head.gate) +:
                evs.drop(1).map(e => CurDecision(e.id, "dup"))
            if (!seen && evs.nonEmpty) state.update(true)
            // Stream only (NoTimeout = batch would throw): GC the hash
            // one horizon after its last arrival. Floor the base at the
            // CURRENT watermark — a fully-late group (max event time <=
            // watermark) would otherwise throw IllegalArgumentException,
            // and swallowing that (round-5 wrapped this in Try) leaked
            // the state entry for the life of the stream.
            if (streaming && evs.nonEmpty) {
              val base = math.max(evs.map(_.tsMillis).max,
                state.getCurrentWatermarkMs())
              state.setTimeoutTimestamp(base, watermark)
            }
            out.iterator
          }
      }
  }
}
