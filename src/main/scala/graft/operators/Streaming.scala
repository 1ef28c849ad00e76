package graft.operators

import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.streaming.Streams

/** Structured Streaming queries under the driver gate: each executes a
  * real streaming job (AvailableNow → memory sink, complete mode) whose
  * final state must equal the batch oracle.
  */
object Streaming {

  private def rmTree(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(rmTree)); f.delete(); ()
  }

  /** Run `body` (a streaming query start + await) with
    * `spark.sql.shuffle.partitions` bounded to the streaming default
    * the memory-sink gates already use (Streams.runToMemory's setting,
    * extended to the foreachBatch gates): AQE partition coalescing is
    * DISABLED inside Structured Streaming, so each micro-batch's
    * aggregations otherwise run the session's full 32 reduce tasks
    * over a few thousand rows — pure scheduler overhead × shuffles ×
    * batches (optimization guide §2.2; AQE would coalesce these to 1-2
    * partitions in a batch job). Partition count never changes any
    * gate's RESULT (every carried state is partition-order-independent
    * by construction — the split-merge seam fuzz specs). Production
    * streams size this by expected per-batch volume; the bound is the
    * gate-scale value, restored after the stream completes so
    * publish-time batch plans keep the session's parallelism (and AQE).
    */
  private def withStreamShuffle[T](s: org.apache.spark.sql.SparkSession,
      srcDir: String)(body: => T): T = {
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    // VOLUME-ADAPTIVE (r15, guide §2.2): partitions derive from the
    // largest staged batch file under `srcDir` — clamp(ceil(bytes /
    // 64 MB), 4, session value) via Streams.streamShufflePartitions —
    // instead of the r14 constant 4, which was right for sf0.1
    // micro-batches but a scale-killer at production volumes (every
    // foreachBatch reduce stage bottlenecked on 4 tasks). At gate scale
    // the clamp floor reproduces 4 exactly; -Dgraft.stream.parts=N
    // still overrides for A/B measurement.
    s.conf.set("spark.sql.shuffle.partitions",
      graft.streaming.Streams.streamShufflePartitions(s, srcDir).toString)
    try body finally s.conf.set("spark.sql.shuffle.partitions", prev)
  }

  /** Highest vN generation under a batchId-keyed state root — the
    * publish-time read after a retry-idempotent state chain (a
    * Spark-retried micro-batch overwrites its OWN generation, so the
    * max is stable; an in-memory counter would double-advance).
    */
  private def latestGen(root: String): Int =
    Option(new java.io.File(root).listFiles()).toSeq.flatten
      .map(_.getName).filter(_.matches("v\\d+")).map(_.drop(1).toInt).max

  /** The file-stream source consumes whole files, so each staged ingest
    * batch must land as ONE parquet file in the watched dir.
    */
  private def writeSingle(df: org.apache.spark.sql.DataFrame,
      srcDir: String, name: String): Unit = {
    val tmp = s"$srcDir/_$name"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(srcDir, s"$name.parquet"))
    rmTree(new java.io.File(tmp))
  }

  /** Single-pass ingest staging (optimization guide §2.4 — remove
    * redundant passes): the old `(0 until n).foreach(writeSingle(
    * df.filter(batchExpr === b)))` loop rescanned the WHOLE source once
    * per batch (n jobs, each collapsed to one task by its coalesce(1)).
    * This lands the SAME n single-file batches in ONE pass: partition
    * the rows by the batch key on write (one writer task — no less
    * parallel than the old per-batch coalesce(1)) and move each
    * partition's file to its `batch_<b>.parquet` name. Batch CONTENTS
    * are row-for-row identical to the old loop (same predicate value →
    * same batch); file mtimes are stamped ascending in b so the
    * file-stream source (which orders by modification time) replays
    * the batches in the same sequence as before. A batch key absent
    * from the data (possible at the smallest SFs) still lands a
    * schema-only parquet file, exactly like the old empty-filter write.
    */
  private def writeSplitSingle(df: org.apache.spark.sql.DataFrame,
      batchExpr: org.apache.spark.sql.Column, n: Int,
      srcDir: String, lo: Int = 0): Unit = {
    val tmp = s"$srcDir/_split"
    df.withColumn("bsplit", batchExpr.cast("long")).coalesce(1)
      .write.mode("overwrite").partitionBy("bsplit").parquet(tmp)
    val t0 = System.currentTimeMillis()
    (lo until lo + n).foreach { b =>
      val dst = java.nio.file.Paths.get(srcDir, s"batch_$b.parquet")
      Option(new java.io.File(tmp, s"bsplit=$b").listFiles()).toSeq
        .flatten.find(_.getName.endsWith(".parquet")) match {
        case Some(part) => java.nio.file.Files.move(part.toPath, dst)
        case None =>
          writeSingle(df.filter(batchExpr.cast("long") === b).limit(0),
            srcDir, s"batch_$b")
      }
      dst.toFile.setLastModified(t0 + b * 1000L)
      ()
    }
    rmTree(new java.io.File(tmp))
  }

  val all: Seq[QueryDef] = Seq(

    QueryDef("s01_stream_hourly",
      """SELECT date_trunc('hour', ts) AS hour, event_type,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,3))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      Streams.runToMemory(s,
        Streams.hourlyCounts(Streams.eventsStream(s, dir)),
        "s01_hourly", srcPath = s"$dir/events.parquet")
    },

    QueryDef("s02_stream_sessions",
      """WITH gaps AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id
        |                                 ORDER BY ts, event_id)
        |              >= INTERVAL '30 minutes'
        |         THEN 1 ELSE 0 END AS new_sess
        |  FROM events),
        |sess AS (
        |  SELECT user_id, ts,
        |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                        ROWS BETWEEN UNBOUNDED PRECEDING
        |                        AND CURRENT ROW) AS sess_id
        |  FROM gaps)
        |SELECT user_id, MIN(ts) AS sess_start,
        |  MAX(ts) + INTERVAL '30 minutes' AS sess_end,
        |  COUNT(*) AS n_events
        |FROM sess GROUP BY user_id, sess_id""".stripMargin) { (s, dir) =>
      Streams.runToMemory(s,
        Streams.userSessions(Streams.eventsStream(s, dir)),
        "s02_sessions", srcPath = s"$dir/events.parquet")
    },

    // streaming exact dedup: the stream unioned with itself (every event
    // twice) must come out with exactly one row per event_id; the final
    // per-type counts equal the batch COUNT(DISTINCT)
    QueryDef("s04_stream_dedup",
      """SELECT event_type, CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n
        |FROM events GROUP BY 1""".stripMargin) { (s, dir) =>
      val doubled = Streams.eventsStream(s, dir)
        .unionAll(Streams.eventsStream(s, dir))
      Streams.runToMemory(s, Streams.dedupStream(doubled),
        "s04_dedup", outputMode = "append",
        srcPath = s"$dir/events.parquet")
        .groupBy("event_type").agg(count(lit(1)).as("n"))
    },

    // stream-stream interval join (watermark-bounded state both sides);
    // the oracle is the exact batch interval join over the same events
    QueryDef("s05_stream_interval_join",
      """SELECT a.user_id, a.event_id AS click_id, b.event_id AS purchase_id
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id
        | AND a.event_type = 'click' AND b.event_type = 'purchase'
        | AND epoch_us(b.ts) - epoch_us(a.ts)
        |     BETWEEN 1 AND 300000000""".stripMargin) { (s, dir) =>
      Streams.runToMemory(s,
        Streams.clickPurchaseJoin(Streams.eventsStream(s, dir)),
        "s05_interval_join", outputMode = "append",
        srcPath = s"$dir/events.parquet")
    },

    // stream-static broadcast enrichment (stateless; the static profile
    // snapshot is broadcast per micro-batch)
    QueryDef("s06_stream_static_enrich",
      """WITH profile AS (
        |  SELECT user_id,
        |    CAST(SUM(CAST(value AS DECIMAL(18,3))) AS DOUBLE) / COUNT(*)
        |      AS avg_value
        |  FROM events GROUP BY user_id)
        |SELECT e.user_id, e.event_id, CAST(e.value AS DOUBLE) AS value,
        |  p.avg_value
        |FROM events e JOIN profile p USING (user_id)""".stripMargin) { (s, dir) =>
      val profile = Streams.userProfile(graft.Tables.load(s, dir, "events"))
      Streams.runToMemory(s,
        Streams.enrichWithUserProfile(Streams.eventsStream(s, dir), profile),
        "s06_enrich", outputMode = "append",
        srcPath = s"$dir/events.parquet")
    },

    // streaming incremental dedup vs a static history: stateless bloom
    // prefilter + broadcast exact verify (the p36 shape under
    // readStream; 344 of 5000 streamed events are true dups)
    QueryDef("s07_stream_bloom_dedup",
      """WITH hist AS (
        |  SELECT DISTINCT md5(concat_ws('|', event_type,
        |    CAST(user_id AS VARCHAR), props)) AS h
        |  FROM events WHERE event_id < 5000),
        |b AS (
        |  SELECT event_id, md5(concat_ws('|', event_type,
        |    CAST(user_id AS VARCHAR), props)) AS h
        |  FROM events WHERE event_id >= 5000)
        |SELECT b.event_id, (b.h IN (SELECT h FROM hist)) AS is_dup
        |FROM b""".stripMargin) { (s, dir) =>
      val (hashes, bytes) =
        Streams.historyFixture(graft.Tables.load(s, dir, "events"), 5000L)
      Streams.runToMemory(s,
        Streams.dedupAgainstHistory(
          Streams.eventsStream(s, dir).filter(col("event_id") >= 5000),
          hashes, bytes),
        "s07_bloom_dedup", outputMode = "append",
        srcPath = s"$dir/events.parquet")
    },

    // Streaming trending top-k: the stream maintains the windowed
    // counts (s01's watermarked aggregation — the only part that must
    // be incremental); the top-k rank is a batch query over the
    // AGGREGATED result, which is bounded by windows × event types, not
    // by event volume — the production dashboard shape. Ties break on
    // event_type for a deterministic hash gate.
    QueryDef("s08_stream_trending",
      """WITH c AS (
        |  SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |r AS (
        |  SELECT hour, event_type, n,
        |    ROW_NUMBER() OVER (PARTITION BY hour
        |                       ORDER BY n DESC, event_type) AS rank
        |  FROM c)
        |SELECT hour, event_type, n, rank FROM r WHERE rank <= 3
        |ORDER BY hour, rank""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val counts = Streams.runToMemory(s,
        Streams.hourlyCounts(Streams.eventsStream(s, dir)),
        "s08_trending", srcPath = s"$dir/events.parquet")
      counts
        .withColumn("rank", row_number().over(
          Window.partitionBy("hour")
            .orderBy(col("n").desc, col("event_type"))).cast("long"))
        .filter(col("rank") <= 3)
        .select("hour", "event_type", "n", "rank")
        .orderBy("hour", "rank")
    },

    // Streaming content-hash index maintenance: each micro-batch
    // appends its NOVEL digests to the x14 DedupIndex via foreachBatch
    // — the streaming form of the ingest contract p36 probes. Two
    // single-file batches (maxFilesPerTrigger=1 under AvailableNow)
    // carry intra-batch planted dups, so batch-local dedup, the
    // bloom+anti-join novelty check, and append accumulation across
    // micro-batches are all exercised; dup resolution is intra-batch
    // only, so the final index equals a global first-seen recompute
    // regardless of batch order.
    QueryDef("s09_stream_index_append",
      """WITH all_rows AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 2000000 AS doc_id, text FROM documents
        |  WHERE doc_id < 50 AND doc_id % 10 = 0
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id, text FROM documents
        |  WHERE doc_id >= 250 AND doc_id < 300 AND doc_id % 10 = 0)
        |SELECT md5(text) AS h, CAST(MIN(doc_id) AS BIGINT) AS keep_id,
        |  true AS multi_batch
        |FROM all_rows GROUP BY 1""".stripMargin) { (s, dir) =>
      import graft.pipeline.DedupIndex
      val d = graft.Tables.load(s, dir, "documents").select("doc_id", "text")
      val base = java.nio.file.Paths.get(
        sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft_fmt").toString
      val srcDir = s"$base/s09_stream_src"
      val idxDir = s"$base/s09_index"
      DedupIndex.drop(s, srcDir)
      DedupIndex.drop(s, idxDir)
      new java.io.File(srcDir).mkdirs()
      writeSingle(d.filter(col("doc_id") < 250)
        .unionAll(d.filter(col("doc_id") < 50 && col("doc_id") % 10 === 0)
          .select((col("doc_id") + 2000000).as("doc_id"), col("text"))),
        srcDir, "batch_a")
      writeSingle(d.filter(col("doc_id") >= 250)
        .unionAll(d.filter(col("doc_id") >= 250 && col("doc_id") < 300 &&
            col("doc_id") % 10 === 0)
          .select((col("doc_id") + 1000000).as("doc_id"), col("text"))),
        srcDir, "batch_b")
      val schema = s.read.parquet(srcDir).schema
      val nBatches = new java.util.concurrent.atomic.AtomicInteger(0)
      withStreamShuffle(s, srcDir) {
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "*.parquet")
        .parquet(srcDir)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          DedupIndex.append(batch.sparkSession, idxDir, batch,
            "doc_id", "text")
          nBatches.incrementAndGet()
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination() }
      DedupIndex.read(s, idxDir)
        .select(col("h"), col("keep_id"),
          lit(nBatches.get() >= 2).as("multi_batch"))
    },

    // Streaming LSH signature maintenance: each micro-batch computes its
    // docs' minhash signatures ONCE and appends them to a signature
    // store; near-dup pair discovery then runs over the ACCUMULATED
    // store — the incremental form of p02, where a new batch's text is
    // scanned once ever and cross-batch candidates fall out of the
    // banded join against history. The plants (originals in batch A,
    // perturbed copies in batch B) are discoverable ONLY via the
    // accumulated store, and the oracle is p02's exhaustive-Jaccard SQL
    // over the same union — streaming accumulation must cost zero
    // recall vs the batch recompute.
    QueryDef("s10_stream_lsh_sigs",
      s"""SELECT id_a, id_b, jaccard, true AS multi_batch
         |FROM (${Pipeline.minhashPairsSql}) q""".stripMargin) { (s, dir) =>
      import graft.pipeline.Dedup
      val d = graft.Tables.load(s, dir, "documents").select("doc_id", "text")
      val base = java.nio.file.Paths.get(
        sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft_fmt").toString
      val srcDir = s"$base/s10_stream_src"
      val sigDir = s"$base/s10_sigs"
      rmTree(new java.io.File(srcDir))
      rmTree(new java.io.File(sigDir))
      new java.io.File(srcDir).mkdirs()
      writeSingle(d.filter(col("doc_id") < 250), srcDir, "batch_a")
      writeSingle(d.filter(col("doc_id") >= 250)
        .unionAll(d.filter(col("doc_id") % 10 === 0)
          .select((col("doc_id") + 1000000).as("doc_id"),
            concat(col("text"), lit(" appended")).as("text"))),
        srcDir, "batch_b")
      val schema = s.read.parquet(srcDir).schema
      val nBatches = new java.util.concurrent.atomic.AtomicInteger(0)
      withStreamShuffle(s, srcDir) {
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "*.parquet")
        .parquet(srcDir)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          Dedup.minhashSigs(batch, "doc_id", "text", k = 64, shingleN = 3)
            .write.mode("append").parquet(sigDir)
          nBatches.incrementAndGet()
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination() }
      val sigs = s.read.parquet(sigDir)
      Dedup.lshCollapsedPairs(sigs, "sh", bands = 16, r = 4,
        threshold = 0.5)
        .withColumn("multi_batch", lit(nBatches.get() >= 2))
        .orderBy("id_a", "id_b")
    },

    // Streaming semantic routing: k-means centroids trained OFFLINE on
    // the static corpus (p54's training job), each streamed vector
    // routed to its nearest centroid as a stateless narrow map — the
    // online-inference half of clustering (ingest-time cluster tagging
    // for SemDeDup / IVF placement). The routed stream must equal the
    // batch assignment bit-for-bit, so it shares p54's oracle.
    QueryDef("s11_stream_cluster_route", Pipeline.kmeansAssignSql) {
      (s, dir) =>
      import graft.pipeline.Clustering
      val e = graft.Tables.load(s, dir, "embeddings")
        .select("vec_id", "embedding")
      val cents = Clustering.kmeansCentroids(e, k = 10, iters = 2,
        "vec_id", "embedding")
      val base = java.nio.file.Paths.get(
        sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft_fmt").toString
      val srcDir = s"$base/s11_stream_src"
      rmTree(new java.io.File(srcDir))
      new java.io.File(srcDir).mkdirs()
      writeSingle(e.filter(col("vec_id") < 250), srcDir, "batch_a")
      writeSingle(e.filter(col("vec_id") >= 250), srcDir, "batch_b")
      val schema = s.read.parquet(srcDir).schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "*.parquet")
        .parquet(srcDir)
      Streams.runToMemory(s, Clustering.assignWith(stream, cents),
        "s11_route", outputMode = "append", srcPath = srcDir)
    },

    // streaming quality filter at ingest: the p67 cascade applied to a
    // file stream micro-batch by micro-batch — a stateless narrow map,
    // so the accumulated stream output must equal the batch cascade
    // row-for-row (shared oracle). This is the filter-at-the-door
    // deployment: documents are tagged (and droppable) as they land,
    // before any batch job sees them.
    QueryDef("s12_stream_quality_gate", Pipeline.qualityCascadeSql) {
      (s, dir) =>
      import graft.pipeline.TextAnalysis
      val docs = graft.Tables.load(s, dir, "documents")
        .select("doc_id", "text", "lang")
      val planted = docs.filter(col("doc_id") % 9 === 0)
        .select((col("doc_id") + 3000000L).as("doc_id"),
          concat(col("text"), lit("\n"), col("text")).as("text"),
          col("lang"))
      val base = java.nio.file.Paths.get(
        sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft_fmt").toString
      val srcDir = s"$base/s12_stream_src"
      rmTree(new java.io.File(srcDir))
      new java.io.File(srcDir).mkdirs()
      writeSingle(docs, srcDir, "batch_a")
      writeSingle(planted, srcDir, "batch_b")
      val schema = s.read.parquet(srcDir).schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "*.parquet")
        .parquet(srcDir)
      Streams.runToMemory(s, TextAnalysis.qualityCascade(stream),
        "s12_quality_gate", outputMode = "append", srcPath = srcDir)
    },

    // Streaming benchmark scrub: p82's span removal applied to the
    // training docs as they land — per micro-batch, each doc's scrub
    // depends only on its own text plus the STATIC benchmark window
    // set (broadcast into every batch), so the op is stateless across
    // batches and the accumulated stream output must equal the batch
    // scrub row-for-row (shared oracle). This is decontamination at
    // the ingest door: eval passages never reach the corpus at all.
    QueryDef("s15_stream_benchmark_scrub", Pipeline.benchmarkScrubSql) {
      (s, dir) =>
      import graft.pipeline.Dedup
      val docs = graft.Tables.load(s, dir, "documents")
        .select("doc_id", "text")
      val bench = docs.filter(col("doc_id") % 50 === 7)
      val train = docs.filter(col("doc_id") % 50 =!= 7)
      val base = java.nio.file.Paths.get(
        sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft_fmt").toString
      val srcDir = s"$base/s15_stream_src"
      val outDir = s"$base/s15_scrubbed"
      rmTree(new java.io.File(srcDir)); rmTree(new java.io.File(outDir))
      new java.io.File(srcDir).mkdirs()
      writeSingle(train.filter(col("doc_id") % 2 === 0), srcDir, "batch_a")
      writeSingle(train.filter(col("doc_id") % 2 === 1), srcDir, "batch_b")
      val schema = s.read.parquet(srcDir).schema
      withStreamShuffle(s, srcDir) {
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "*.parquet")
        .parquet(srcDir)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          Dedup.benchmarkSpanRemoval(batch, bench)
            .write.mode("append").parquet(outDir)
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination() }
      s.read.parquet(outDir)
    },

    // Streaming BM25 contamination router: docs scored on arrival
    // against the static benchmark-query set using STATIC corpus
    // statistics (df/N/avgdl from the reference snapshot, broadcast
    // into every micro-batch) — per-doc scoring is stateless, so the
    // accumulated stream output must equal the batch scored relation
    // (shared `sc` oracle) filtered to the routing threshold. This is
    // p24's contamination idea with a graded lexical score instead of
    // a boolean n-gram hit: incoming docs routed to the benchmark
    // queries they might contaminate, hardest matches first. At 100 TB
    // the static stats are a one-off batch job; the per-batch cost is
    // one postings explode + broadcast joins, no cross-batch state.
    QueryDef("s16_stream_bm25_route",
      s"""${Pipeline.bm25ScoredCtes}
        |SELECT qid, id AS doc_id, score FROM sc
        |WHERE score >= 4.0""".stripMargin) { (s, dir) =>
      import graft.pipeline.Retrieval
      val docs = graft.Tables.load(s, dir, "documents")
        .select("doc_id", "text")
      val queries = docs.filter(col("doc_id") < 5)
        .select(col("doc_id").as("qid"),
          concat_ws(" ", slice(graft.pipeline.TextAnalysis.tokens(
            lower(col("text"))), 1, 30)).as("qtext"))
      val base = java.nio.file.Paths.get(
        sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft_fmt").toString
      val srcDir = s"$base/s16_stream_src"
      val outDir = s"$base/s16_routed"
      val statsDir = s"$base/s16_stats"
      rmTree(new java.io.File(srcDir)); rmTree(new java.io.File(outDir))
      new java.io.File(srcDir).mkdirs()
      writeSingle(docs.filter(col("doc_id") % 2 === 0), srcDir, "batch_a")
      writeSingle(docs.filter(col("doc_id") % 2 === 1), srcDir, "batch_b")
      // the one-off stats job: ONE corpus postings pass materializes the
      // vocab-sized (term, df, toks) table; scalars reassemble from that
      // table + a metadata-cheap doc count — scoring batches never
      // rescans the reference corpus
      Retrieval.bm25TermStats(docs)
        .write.mode("overwrite").parquet(statsDir)
      val stats = Retrieval.bm25StatsFromTerms(
        s.read.parquet(statsDir), docs.count())
      val schema = s.read.parquet(srcDir).schema
      withStreamShuffle(s, srcDir) {
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "*.parquet")
        .parquet(srcDir)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          Retrieval.bm25ScoresAgainst(batch, queries, stats)
            .filter(col("score") >= 4.0)
            .write.mode("append").parquet(outDir)
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination() }
      s.read.parquet(outDir)
    },

    // Streaming manifest maintenance: the x21 file-stats manifest kept
    // current BY THE INGEST STREAM itself — each micro-batch computes
    // its files' (path, min, max, rows) with one groupBy over
    // input_file_name and APPENDS to the manifest table. The
    // accumulated manifest must describe the corpus exactly: every
    // staged file indexed exactly once, sum(rows) equal to the direct
    // table count, global min/max equal to the direct scan's. At
    // 100 TB this is how the pruning index stays fresh: stats ride the
    // ingest DAG itself, so no separate footer-walking job ever runs
    // and a file is never readable-but-unindexed (the s09 argument,
    // applied to file metadata instead of content hashes).
    QueryDef("s17_stream_manifest",
      """SELECT CAST(count(*) AS BIGINT) AS total_rows,
        |  CAST(min(event_id) AS BIGINT) AS min_id,
        |  CAST(max(event_id) AS BIGINT) AS max_id,
        |  true AS files_indexed_once, true AS stats_match
        |FROM events""".stripMargin) { (s, dir) =>
      val events = graft.Tables.load(s, dir, "events")
        .select("event_id", "user_id")
      val base = java.nio.file.Paths.get(
        sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft_fmt").toString
      val srcDir = s"$base/s17_stream_src"
      val maniDir = s"$base/s17_manifest"
      rmTree(new java.io.File(srcDir)); rmTree(new java.io.File(maniDir))
      events.repartitionByRange(8, col("event_id"))
        .sortWithinPartitions("event_id")
        .write.mode("overwrite").parquet(srcDir)
      val schema = s.read.parquet(srcDir).schema
      withStreamShuffle(s, srcDir) {
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "2")
        .option("pathGlobFilter", "*.parquet")
        .parquet(srcDir)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.groupBy(input_file_name().as("file"))
            .agg(min("event_id").as("min_id"),
              max("event_id").as("max_id"),
              count(lit(1)).as("rows"))
            .write.mode("append").parquet(maniDir)
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination() }
      val nStaged = new java.io.File(srcDir).listFiles()
        .count(_.getName.endsWith(".parquet"))
      val m = s.read.parquet(maniDir)
        .agg(count(lit(1)).as("nf"), countDistinct(col("file")).as("nd"),
          sum("rows").as("tr"), min("min_id").as("mn"),
          max("max_id").as("mx")).head()
      val d = s.read.parquet(srcDir)
        .agg(count(lit(1)), min("event_id"), max("event_id")).head()
      val indexedOnce = m.getLong(0) == m.getLong(1) &&
        m.getLong(1) == nStaged.toLong
      val statsMatch = m.getLong(2) == d.getLong(0) &&
        m.getLong(3) == d.getLong(1) && m.getLong(4) == d.getLong(2)
      import s.implicits._
      Seq((m.getLong(2), m.getLong(3), m.getLong(4), indexedOnce,
        statsMatch)).toDF("total_rows", "min_id", "max_id",
        "files_indexed_once", "stats_match")
    },

    // Streaming IVF index maintenance: new vectors routed to their
    // coarse-quantizer cell per micro-batch and APPENDED to the x13
    // cell-partitioned layout — centroids are frozen from the base
    // corpus (production IVF practice: the quantizer trains once; the
    // stream only assigns), so batch order can't change any cell
    // assignment and the accumulated layout equals what a batch build
    // over the union would produce. Gate: an ANN query over the
    // accumulated layout (the DPP-prunable x13 join) returns exactly
    // the flat ivfTopK results on the full corpus. At 100 TB this is
    // how a vector index ingests: assignment is a per-row codegen'd
    // argmin against a broadcast centroid matrix, appends land in cell
    // directories, and queries prune to nProbe cells of the layout.
    QueryDef("s18_stream_ivf_index",
      """SELECT vec_id AS qid, CAST(10 AS BIGINT) AS n_returned,
        |  true AS same_as_flat
        |FROM embeddings WHERE vec_id < 5 ORDER BY qid""".stripMargin) {
      (s, dir) =>
      import graft.pipeline.Similarity
      val corpus = graft.Tables.load(s, dir, "embeddings")
        .select("vec_id", "embedding")
      val queries = corpus.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val cents = Similarity.ivfCentroids(corpus, 16, "vec_id", "embedding")
      val base = java.nio.file.Paths.get(
        sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft_fmt").toString
      val srcDir = s"$base/s18_stream_src"
      val layoutDir = s"$base/s18_ivf_layout"
      rmTree(new java.io.File(srcDir)); rmTree(new java.io.File(layoutDir))
      new java.io.File(srcDir).mkdirs()
      writeSingle(corpus.filter(col("vec_id") % 2 === 0), srcDir, "batch_a")
      writeSingle(corpus.filter(col("vec_id") % 2 === 1), srcDir, "batch_b")
      val schema = s.read.parquet(srcDir).schema
      withStreamShuffle(s, srcDir) {
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "*.parquet")
        .parquet(srcDir)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.withColumn("cell",
              Similarity.ivfProbeCells(cents, col("embedding"), 1)
                .getItem(0).getField("cid"))
            .write.partitionBy("cell").mode("append").parquet(layoutDir)
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination() }
      val stored = s.read.parquet(layoutDir)
      val qc = queries.withColumn("cell_l",
          explode(Similarity.ivfProbeCells(cents, col("qvec"), 4)
            .getField("cid")))
        .withColumn("cell", col("cell_l").cast("int")).drop("cell_l")
      val scored = stored.join(broadcast(qc), Seq("cell"))
        .withColumn("score",
          round(Similarity.cosine(col("embedding"), col("qvec")), 6))
      val layoutTop = Similarity.rankTopK(scored, 10, "qid", "vec_id")
      val flatTop = Similarity.ivfTopK(corpus, queries, k = 10,
        nCells = 16, nProbe = 4)
      Similarity.sameTopK(layoutTop, flatTop)
    },

    // Streaming vocabulary-novelty monitor (the p93 Heaps curve, fed
    // incrementally): each micro-batch's distinct token types are
    // anti-joined against the accumulated vocabulary store, the new
    // ones counted and appended — so the monitor's per-batch
    // new-type counts replay the batch first-occurrence bucketing
    // exactly. Batch order is pinned by spaced file mtimes + lexical
    // names (the file source sorts by timestamp, then path), because
    // ordering is semantic here, unlike s18's order-free cell routing.
    // At 100 TB the vocabulary store is a vocab-sized parquet table
    // and each batch costs one distinct + one token-keyed anti-join —
    // a falling new-type rate is the Heaps plateau, a spike is an
    // encoding/source regression arriving in the stream.
    QueryDef("s19_stream_vocab_novelty",
      """WITH mx AS (SELECT max(doc_id) AS max_id FROM documents),
        |bkt AS (SELECT doc_id * 4 // (max_id + 1) AS bucket, doc_id,
        |          text
        |        FROM documents CROSS JOIN mx),
        |dc AS (SELECT bucket, count(*) AS n_docs FROM bkt GROUP BY 1),
        |tok AS (SELECT bucket, unnest(CASE
        |    WHEN length(regexp_replace(text, '^\s+|\s+$', '', 'g')) = 0
        |    THEN CAST([] AS VARCHAR[])
        |    ELSE string_split_regex(
        |      lower(regexp_replace(text, '^\s+|\s+$', '', 'g')), '\s+')
        |    END) AS token
        |  FROM bkt),
        |tc AS (SELECT bucket, count(*) AS n_tokens FROM tok GROUP BY 1),
        |nt AS (SELECT bucket, count(*) AS n_new_types FROM (
        |    SELECT token, min(bucket) AS bucket FROM tok GROUP BY 1)
        |  GROUP BY 1)
        |SELECT CAST(bucket AS BIGINT) AS batch,
        |  CAST(n_docs AS BIGINT) AS n_docs,
        |  CAST(COALESCE(tc.n_tokens, 0) AS BIGINT) AS n_tokens,
        |  CAST(COALESCE(nt.n_new_types, 0) AS BIGINT) AS n_new_types
        |FROM dc LEFT JOIN tc USING (bucket) LEFT JOIN nt USING (bucket)"""
        .stripMargin) { (s, dir) =>
      import graft.pipeline.TextAnalysis
      val docs = graft.Tables.load(s, dir, "documents")
        .select("doc_id", "text")
      val maxId = docs.agg(max("doc_id")).head().getLong(0)
      val base = java.nio.file.Paths.get(
        sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft_fmt").toString
      val srcDir = s"$base/s19_stream_src"
      val vocabDir = s"$base/s19_vocab"
      val statsDir = s"$base/s19_stats"
      rmTree(new java.io.File(srcDir)); rmTree(new java.io.File(vocabDir))
      rmTree(new java.io.File(statsDir))
      new java.io.File(srcDir).mkdirs()
      val t0 = System.currentTimeMillis() - 3600000L
      writeSplitSingle(docs,
        expr(s"CAST(doc_id AS BIGINT) * 4 div ${maxId + 1}"), 4, srcDir)
      // pin processing order: file source sorts by (mtime, path)
      (0 until 4).foreach { b =>
        new java.io.File(srcDir, s"batch_$b.parquet")
          .setLastModified(t0 + b * 60000L)
        ()
      }
      val schema = s.read.parquet(srcDir).schema
      withStreamShuffle(s, srcDir) {
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "*.parquet")
        .parquet(srcDir)
        .writeStream
        .foreachBatch {
          (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
            val sp = batch.sparkSession
            val types = batch.select(explode(
              TextAnalysis.tokens(lower(col("text")))).as("token"))
            val known =
              if (new java.io.File(vocabDir).exists())
                sp.read.parquet(vocabDir)
              else sp.emptyDataFrame.withColumn("token",
                lit(null).cast("string")).select("token")
            val fresh = types.distinct()
              .join(known, Seq("token"), "left_anti")
            val nDocs = batch.count()
            val nToks = types.count()
            val nNew = fresh.count()
            fresh.write.mode("append").parquet(vocabDir)
            import sp.implicits._
            Seq((batchId, nDocs, nToks, nNew))
              .toDF("batch", "n_docs", "n_tokens", "n_new_types")
              .coalesce(1).write.mode("append").parquet(statsDir)
            ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination() }
      s.read.parquet(statsDir)
        .select(col("batch").cast("long").as("batch"),
          col("n_docs").cast("long").as("n_docs"),
          col("n_tokens").cast("long").as("n_tokens"),
          col("n_new_types").cast("long").as("n_new_types"))
    },

    // Streaming stupid-backoff LM router (the s16 pattern for p95):
    // the four LM count tables are materialized ONCE from the static
    // training half, then every micro-batch is scored against those
    // flat vocab-sized barriers — stateless per-batch scoring, no
    // per-batch rescan of the training corpus, batch-order-independent
    // (a doc's score depends only on itself + the frozen stats). The
    // accumulated stream output must equal the batch p95 relation
    // exactly. This is the production shape for perplexity-filtering
    // a crawl AS IT ARRIVES: stats job nightly, scoring in the ingest
    // stream.
    QueryDef("s20_stream_backoff_route",
      """WITH toks AS (
        |  SELECT doc_id, CASE
        |    WHEN length(regexp_replace(text, '^\s+|\s+$', '', 'g')) = 0
        |    THEN CAST([] AS VARCHAR[])
        |    ELSE string_split_regex(
        |      lower(regexp_replace(text, '^\s+|\s+$', '', 'g')), '\s+')
        |    END AS tk
        |  FROM documents),
        |tr AS (SELECT tk FROM toks WHERE doc_id % 2 = 0),
        |uni AS (SELECT t AS w, count(*) AS c
        |        FROM (SELECT unnest(tk) AS t FROM tr) GROUP BY 1),
        |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n, count(*) AS v
        |        FROM uni),
        |bg AS (SELECT w1, w2, count(*) AS c FROM (
        |    SELECT
        |      unnest(CASE WHEN len(tk) < 2 THEN CAST([] AS VARCHAR[])
        |             ELSE tk[1:len(tk)-1] END) AS w1,
        |      unnest(CASE WHEN len(tk) < 2 THEN CAST([] AS VARCHAR[])
        |             ELSE tk[2:len(tk)] END) AS w2
        |    FROM tr) GROUP BY 1, 2),
        |tg AS (SELECT w1, w2, w3, count(*) AS c FROM (
        |    SELECT
        |      unnest(CASE WHEN len(tk) < 3 THEN CAST([] AS VARCHAR[])
        |             ELSE tk[1:len(tk)-2] END) AS w1,
        |      unnest(CASE WHEN len(tk) < 3 THEN CAST([] AS VARCHAR[])
        |             ELSE tk[2:len(tk)-1] END) AS w2,
        |      unnest(CASE WHEN len(tk) < 3 THEN CAST([] AS VARCHAR[])
        |             ELSE tk[3:len(tk)] END) AS w3
        |    FROM tr) GROUP BY 1, 2, 3),
        |sp AS (SELECT doc_id,
        |      unnest(CASE WHEN len(tk) < 3 THEN CAST([] AS VARCHAR[])
        |             ELSE tk[1:len(tk)-2] END) AS w1,
        |      unnest(CASE WHEN len(tk) < 3 THEN CAST([] AS VARCHAR[])
        |             ELSE tk[2:len(tk)-1] END) AS w2,
        |      unnest(CASE WHEN len(tk) < 3 THEN CAST([] AS VARCHAR[])
        |             ELSE tk[3:len(tk)] END) AS w3
        |    FROM toks),
        |j AS (SELECT sp.doc_id, tg.c AS c123, b12.c AS c12, b23.c AS c23,
        |        u2.c AS c2, u3.c AS c3
        |      FROM sp
        |      LEFT JOIN tg ON tg.w1 = sp.w1 AND tg.w2 = sp.w2
        |                  AND tg.w3 = sp.w3
        |      LEFT JOIN bg b12 ON b12.w1 = sp.w1 AND b12.w2 = sp.w2
        |      LEFT JOIN bg b23 ON b23.w1 = sp.w2 AND b23.w2 = sp.w3
        |      LEFT JOIN uni u2 ON u2.w = sp.w2
        |      LEFT JOIN uni u3 ON u3.w = sp.w3),
        |sc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_trigrams,
        |    round(avg(ln(CASE
        |      WHEN c123 IS NOT NULL
        |      THEN CAST(c123 AS DOUBLE) / CAST(c12 AS DOUBLE)
        |      WHEN c23 IS NOT NULL
        |      THEN 0.4 * (CAST(c23 AS DOUBLE) / CAST(c2 AS DOUBLE))
        |      ELSE (0.4 * 0.4) * (CAST(COALESCE(c3, 0) + 1 AS DOUBLE) /
        |        CAST(t.n + t.v + 1 AS DOUBLE)) END)), 6) AS backoff_lm,
        |    round(avg(CASE WHEN c123 IS NOT NULL THEN 0.0 ELSE 1.0 END),
        |      6) AS backoff_frac
        |  FROM j, tot t GROUP BY doc_id)
        |SELECT d.doc_id, COALESCE(s.n_trigrams, 0) AS n_trigrams,
        |  s.backoff_lm, s.backoff_frac
        |FROM documents d LEFT JOIN sc s USING (doc_id)"""
        .stripMargin) { (s, dir) =>
      import graft.pipeline.TextAnalysis
      val docs = graft.Tables.load(s, dir, "documents")
        .select("doc_id", "text")
      val stats = TextAnalysis.backoffStatsMaterialized(
        docs.filter(col("doc_id") % 2 === 0))
      val base = java.nio.file.Paths.get(
        sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft_fmt").toString
      val srcDir = s"$base/s20_stream_src"
      val outDir = s"$base/s20_scored"
      rmTree(new java.io.File(srcDir)); rmTree(new java.io.File(outDir))
      new java.io.File(srcDir).mkdirs()
      writeSingle(docs.filter(col("doc_id") % 2 === 0), srcDir, "batch_a")
      writeSingle(docs.filter(col("doc_id") % 2 === 1), srcDir, "batch_b")
      val schema = s.read.parquet(srcDir).schema
      withStreamShuffle(s, srcDir) {
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "*.parquet")
        .parquet(srcDir)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          TextAnalysis.stupidBackoffScoreWith(batch, stats)
            .write.mode("append").parquet(outDir)
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination() }
      s.read.parquet(outDir)
    },

    // Streaming canonical-URL index maintenance (p102 as a stream): each
    // micro-batch's URLs are extracted + canonicalized, rolled up, and
    // MERGED into a copy-on-write store generation (old store ∪ batch →
    // groupBy canonical_url → sum). The batch rollup is mergeable
    // because batches partition docs, so per-batch n_docs sum to the
    // corpus n_docs. The accumulated store must equal the batch p102
    // relation exactly (same oracle SQL). The production shape for
    // crawl-frontier dedup: the fetcher consults the maintained URL
    // index AS pages arrive — the merge cost per batch is one
    // url-keyed rollup over (tiny store + tiny batch agg); document
    // text never enters the store.
    QueryDef("s21_stream_url_index", graft.operators.Pipeline.urlCanonSql) {
      (s, dir) =>
        import graft.pipeline.Corpus
        val docs = graft.operators.Pipeline.urlPlanted(
          graft.Tables.load(s, dir, "documents").select("doc_id", "text"))
        val maxId = docs.agg(max("doc_id")).head().getLong(0)
        val base = java.nio.file.Paths.get(
          sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft_fmt").toString
        val srcDir = s"$base/s21_stream_src"
        val storeBase = s"$base/s21_url_store"
        rmTree(new java.io.File(srcDir)); rmTree(new java.io.File(storeBase))
        new java.io.File(srcDir).mkdirs()
        val t0 = System.currentTimeMillis() - 3600000L
        writeSplitSingle(docs,
          expr(s"CAST(doc_id AS BIGINT) * 4 div ${maxId + 1}"), 4, srcDir)
        (0 until 4).foreach { b =>
          new java.io.File(srcDir, s"batch_$b.parquet")
            .setLastModified(t0 + b * 60000L)
          ()
        }
        val schema = s.read.parquet(srcDir).schema
        withStreamShuffle(s, srcDir) {
        val q = s.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1")
          .option("pathGlobFilter", "*.parquet")
          .parquet(srcDir)
          .writeStream
          .foreachBatch {
            (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
              val sp = batch.sparkSession
              val agg = Corpus.canonicalUrls(batch)
              val prev = new java.io.File(s"$storeBase/v${batchId - 1}")
              val merged =
                if (!prev.exists()) agg
                else sp.read.parquet(prev.toString).unionAll(agg)
                  .groupBy("canonical_url")
                  .agg(sum("n_occurrences").as("n_occurrences"),
                    sum("n_docs").as("n_docs"))
              merged.coalesce(1).write.mode("overwrite")
                .parquet(s"$storeBase/v$batchId")
              ()
          }
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination() }
        s.read.parquet(s"$storeBase/v3")
          .select(col("canonical_url"),
            col("n_occurrences").cast("long").as("n_occurrences"),
            col("n_docs").cast("long").as("n_docs"))
    },

    // Streaming profile-sketch maintenance (p107 as a stream): each
    // micro-batch contributes ONE KB-sized HLL sketch row per profiled
    // column to an append-only sketch store; the corpus profile at any
    // moment is a register-max union over the stored sketches — no
    // rescan of arrived data, ever. The union of the per-batch sketches
    // must satisfy the same gate as p107's per-shard union: ≈ the
    // whole-corpus sketch and within 5% of exact. This is how a 100 TB
    // corpus keeps a live distinct-count profile: the ingest stream
    // appends sketch rows, readers merge KBs.
    QueryDef("s22_stream_profile_sketches",
      graft.operators.Pipeline.profileMergeSql) { (s, dir) =>
      val profCols = Seq("doc_id", "lang", "source")
      val docs = graft.Tables.load(s, dir, "documents")
        .select("doc_id", "lang", "source")
      val maxId = docs.agg(max("doc_id")).head().getLong(0)
      val base = java.nio.file.Paths.get(
        sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft_fmt").toString
      val srcDir = s"$base/s22_stream_src"
      val storeDir = s"$base/s22_sketch_store"
      rmTree(new java.io.File(srcDir)); rmTree(new java.io.File(storeDir))
      new java.io.File(srcDir).mkdirs()
      val t0 = System.currentTimeMillis() - 3600000L
      writeSplitSingle(docs,
        expr(s"CAST(doc_id AS BIGINT) * 4 div ${maxId + 1}"), 4, srcDir)
      (0 until 4).foreach { b =>
        new java.io.File(srcDir, s"batch_$b.parquet")
          .setLastModified(t0 + b * 60000L)
        ()
      }
      val schema = s.read.parquet(srcDir).schema
      withStreamShuffle(s, srcDir) {
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "*.parquet")
        .parquet(srcDir)
        .writeStream
        .foreachBatch {
          (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
            val rows = profCols.map { c =>
              batch.agg(hll_sketch_agg(col(c), lit(14)).as("sk"))
                .select(lit(c).as("col_name"), col("sk"))
            }.reduce(_.unionAll(_))
            rows.coalesce(1).write.mode("append").parquet(storeDir)
            ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination() }
      val merged = s.read.parquet(storeDir).groupBy("col_name")
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(false)))
          .as("est_merged"))
      val whole = profCols.map { c =>
        docs.agg(countDistinct(col(c)).as("n_exact"),
          hll_sketch_estimate(hll_sketch_agg(col(c), lit(14)))
            .as("est_whole"))
          .select(lit(c).as("col_name"), col("n_exact"), col("est_whole"))
      }.reduce(_.unionAll(_))
      whole.join(merged, Seq("col_name"))
        .select(col("col_name"), col("n_exact"),
          (abs(col("est_merged") - col("est_whole")).cast("double") /
            greatest(col("est_whole"), lit(1L)).cast("double") <= 0.02)
            .as("merged_close"),
          (abs(col("est_merged") - col("n_exact")).cast("double") /
            col("n_exact").cast("double") <= 0.05).as("est_within_5pct"))
    },

    // Streaming CDC apply: the p68 release deltas consumed as a stream,
    // each micro-batch merged into a materialized corpus store by
    // copy-on-write (anti-join out the touched ids, append the new
    // versions, write the next store generation — the parquet-native
    // MERGE a table format would journal). The final store must equal
    // the v2 corpus digest-for-digest. At 100 TB the merge is one
    // id-keyed anti-join per batch (broadcastable — a delta is tiny
    // next to the corpus) + an append; generations become partition
    // overwrites on a real table layout.
    QueryDef("s13_stream_cdc_apply",
      """WITH v2 AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END
        |      AS text
        |  FROM documents WHERE doc_id % 11 <> 0
        |  UNION ALL
        |  SELECT doc_id + 5000000 AS doc_id, text FROM documents
        |  WHERE doc_id % 13 = 0)
        |SELECT doc_id, md5(text) AS dg FROM v2""".stripMargin) {
      (s, dir) =>
      import graft.pipeline.Corpus
      val v1 = graft.Tables.load(s, dir, "documents")
        .select("doc_id", "text")
      val kept = v1.filter(col("doc_id") % 11 =!= 0)
        .select(col("doc_id"),
          when(col("doc_id") % 7 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text")).as("text"))
      val added = v1.filter(col("doc_id") % 13 === 0)
        .select((col("doc_id") + 5000000L).as("doc_id"), col("text"))
      val v2 = kept.unionAll(added)
      // delta table = p68 statuses + the new text for upserts; unchanged
      // rows never enter the stream (that's the point of the diff)
      val delta = Corpus.snapshotDiff(v1, v2)
        .filter(col("status") =!= "unchanged")
        .join(v2, Seq("doc_id"), "left")
      val base = java.nio.file.Paths.get(
        sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft_fmt").toString
      val srcDir = s"$base/s13_stream_src"
      val storeRoot = s"$base/s13_store"
      rmTree(new java.io.File(srcDir)); rmTree(new java.io.File(storeRoot))
      new java.io.File(srcDir).mkdirs()
      writeSingle(delta.filter(col("doc_id") % 2 === 0), srcDir, "batch_a")
      writeSingle(delta.filter(col("doc_id") % 2 === 1), srcDir, "batch_b")
      v1.write.mode("overwrite").parquet(s"$storeRoot/v0")
      val schema = s.read.parquet(srcDir).schema
      withStreamShuffle(s, srcDir) {
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "*.parquet")
        .parquet(srcDir)
        .writeStream
        // retry-idempotent: generations keyed by the framework batchId
        // (the s39 discipline) — a retried micro-batch rewrites its
        // own generation instead of double-advancing a counter
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame,
            batchId: Long) =>
          val cur = s.read.parquet(s"$storeRoot/v$batchId")
          val next = cur
            .join(batch.select("doc_id"), Seq("doc_id"), "left_anti")
            .unionByName(batch
              .filter(col("status").isin("added", "changed"))
              .select("doc_id", "text"))
          next.write.mode("overwrite")
            .parquet(s"$storeRoot/v${batchId + 1}")
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination() }
      s.read.parquet(s"$storeRoot/v${latestGen(storeRoot)}")
        .select(col("doc_id"), md5(col("text")).as("dg"))
        .orderBy("doc_id")
    },

    // Streaming drift monitor: p71's PSI computed per ingest micro-batch
    // against the static corpus baseline — the at-the-door alarm that
    // catches a broken upstream extractor the batch it lands, not at
    // the next release. Batches are parity groups of the corpus, so the
    // group label is derivable from the data (min id % 2 — bounded
    // 1-row driver agg) and the oracle can replay each batch's
    // histogram + smoothed PSI in SQL. Per batch: one narrow hist agg
    // to ≤ #bins rows, the tiny drift join, one appended (grp, psi)
    // row. Summed terms are round-6 doubles re-rounded — mirrored
    // exactly in the oracle.
    QueryDef("s14_stream_drift_monitor",
      """WITH base AS (
        |  SELECT length(CAST(length(text) AS VARCHAR)) AS bin,
        |    count(*) AS c1 FROM documents GROUP BY 1),
        |grps AS (SELECT DISTINCT doc_id % 2 AS grp FROM documents),
        |g AS (SELECT doc_id % 2 AS grp,
        |    length(CAST(length(text) AS VARCHAR)) AS bin, count(*) AS c2
        |  FROM documents GROUP BY 1, 2),
        |j AS (SELECT grps.grp, base.bin, base.c1,
        |    coalesce(g.c2, 0) AS c2
        |  FROM base CROSS JOIN grps
        |  LEFT JOIN g ON g.grp = grps.grp AND g.bin = base.bin),
        |t AS (SELECT grp, sum(c1) AS n1, sum(c2) AS n2, count(*) AS nb
        |  FROM j GROUP BY 1)
        |SELECT j.grp, round(sum(round(
        |    ((c1 + 1) / (n1 + nb) - (c2 + 1) / (n2 + nb)) *
        |    ln(((c1 + 1) / (n1 + nb)) / ((c2 + 1) / (n2 + nb))), 6)), 6)
        |    AS psi
        |FROM j JOIN t USING (grp) GROUP BY j.grp""".stripMargin) {
      (s, dir) =>
      import graft.pipeline.Corpus
      val docs = graft.Tables.load(s, dir, "documents")
        .select("doc_id", "text")
      val base = java.nio.file.Paths.get(
        sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft_fmt").toString
      val srcDir = s"$base/s14_stream_src"
      val outDir = s"$base/s14_psi_out"
      rmTree(new java.io.File(srcDir)); rmTree(new java.io.File(outDir))
      new java.io.File(srcDir).mkdirs()
      writeSingle(docs.filter(col("doc_id") % 2 === 0), srcDir, "batch_a")
      writeSingle(docs.filter(col("doc_id") % 2 === 1), srcDir, "batch_b")
      val schema = s.read.parquet(srcDir).schema
      withStreamShuffle(s, srcDir) {
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "*.parquet")
        .parquet(srcDir)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          val grp = batch.agg(min(col("doc_id") % 2)).head().getLong(0)
          Corpus.snapshotDrift(docs, batch)
            .agg(round(sum("psi_term"), 6).as("psi"))
            .select(lit(grp).as("grp"), col("psi"))
            .write.mode("append").parquet(outDir)
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination() }
      s.read.parquet(outDir).orderBy("grp")
    },

    // custom arbitrary state: flatMapGroupsWithState running stats — the
    // single AvailableNow batch's final state must equal the batch agg
    QueryDef("s03_stream_custom_state",
      """SELECT user_id, COUNT(*) AS n_events,
        |  SUM(CAST(ROUND(value * 100) AS BIGINT)) / 100.0 AS sum_value,
        |  MAX(CAST(ROUND(value * 100) AS BIGINT)) / 100.0 AS max_value
        |FROM events GROUP BY user_id""".stripMargin) { (s, dir) =>
      Streams.runToMemory(s,
        Streams.userRunningStats(Streams.eventsStream(s, dir)),
        "s03_custom_state", outputMode = "append",
        srcPath = s"$dir/events.parquet")
    },

    // LEFT OUTER stream-stream interval join: null rows flush only when
    // the watermark proves the join window closed, so the gate compares
    // the region where that proof is certain — clicks at least 2 h
    // (> watermark delay + join window) before the stream's max ts.
    // Matched rows emit immediately; the oracle replays the batch left
    // join under the same cutoff.
    QueryDef("s23_stream_left_outer_join",
      """WITH c AS (SELECT user_id, event_id AS click_id, ts FROM events
        |  WHERE event_type = 'click'),
        |p AS (SELECT user_id, event_id AS purchase_id, ts FROM events
        |  WHERE event_type = 'purchase'),
        |mx AS (SELECT least((SELECT max(ts) FROM c),
        |                    (SELECT max(ts) FROM p)) AS m)
        |SELECT c.user_id, c.click_id, p.purchase_id
        |FROM c LEFT JOIN p
        |  ON c.user_id = p.user_id
        | AND epoch_us(p.ts) - epoch_us(c.ts) BETWEEN 1 AND 300000000
        |WHERE epoch_us(c.ts) <=
        |  (SELECT epoch_us(m) FROM mx) - 7200000000""".stripMargin) {
      (s, dir) =>
      val joined = Streams.runToMemory(s,
        Streams.clickPurchaseLeftJoin(Streams.eventsStream(s, dir)),
        "s23_left_outer", outputMode = "append",
        srcPath = s"$dir/events.parquet")
      // the global watermark is min over BOTH inputs' (max ts − delay),
      // so the certainty cutoff keys off the SMALLER side maximum —
      // one bounded 2-row agg over the batch table
      val maxUs = graft.Tables.load(s, dir, "events")
        .filter(col("event_type").isin("click", "purchase"))
        .groupBy("event_type").agg(max(unix_micros(col("ts"))).as("m"))
        .agg(min(col("m"))).head().getLong(0)
      joined
        .filter(unix_micros(col("c_ts")) <= maxUs - 7200000000L)
        .select("user_id", "click_id", "purchase_id")
    },

    // The DSv2 logfmt source's STREAMING tier: events staged as two
    // logfmt files, ingested by two separate runs sharing one
    // checkpoint — run 2 must resume from the committed file-name
    // high-watermark (only batch-001 replans) and restore the
    // aggregation state, so the final complete-mode table equals the
    // batch aggregate over BOTH halves.
    QueryDef("s24_stream_logfmt_source",
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,3))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1""".stripMargin) { (s, dir) =>
      val root = java.nio.file.Files.createTempDirectory("graft_s24")
      val src = s"$root/in"
      new java.io.File(src).mkdirs()
      val ckpt = s"$root/ckpt"
      val ev = graft.Tables.load(s, dir, "events")
        .select(col("event_id"), col("event_type"), col("value"))
      def stage(name: String, half: Int): Unit = {
        val tmp = s"$root/_stage"
        ev.filter(col("event_id") % 2 === half)
          .select(concat(
            lit("event_id="), col("event_id"),
            lit(" event_type="), col("event_type"),
            lit(" value="), col("value")).as("value"))
          .coalesce(1).write.mode("overwrite").text(tmp)
        val part = new java.io.File(tmp).listFiles()
          .find(_.getName.endsWith(".txt")).get
        java.nio.file.Files.move(part.toPath,
          java.nio.file.Paths.get(src, name))
        rmTree(new java.io.File(tmp))
      }
      def runOnce(): Unit = {
        withStreamShuffle(s, src) {
        val q = s.readStream.format("graft-logfmt").load(src)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum(col("value").cast("decimal(18,3)")).cast("double")
              .as("sum_value"))
          .writeStream
          .format("memory").queryName("s24_counts")
          .outputMode("complete")
          .option("checkpointLocation", ckpt)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination() }
      }
      stage("batch-000.logfmt", 0)
      runOnce()
      stage("batch-001.logfmt", 1)
      runOnce()
      s.table("s24_counts")
    },

    // Streaming semantic decontamination: each embedding micro-batch
    // scores against the broadcast eval set at ingest (the s15 pattern
    // with p126's operator). Batches partition the corpus by vector, so
    // the appended per-batch best-match rows must union to exactly the
    // batch p126 relation — shared oracle.
    QueryDef("s25_stream_semantic_decontam", Pipeline.semanticDecontamSql) {
      (s, dir) =>
      import graft.pipeline.Similarity
      val e = graft.Tables.load(s, dir, "embeddings")
        .select("vec_id", "embedding")
      val evalSet = e.filter(col("vec_id") % 50 === 3)
        .select(col("vec_id").as("eval_id"), col("embedding").as("evec"))
      val base = java.nio.file.Paths.get(
        sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft_fmt").toString
      val srcDir = s"$base/s25_stream_src"
      val outDir = s"$base/s25_stream_out"
      rmTree(new java.io.File(srcDir))
      rmTree(new java.io.File(outDir))
      new java.io.File(srcDir).mkdirs()
      writeSingle(e.filter(col("vec_id") % 2 === 0), srcDir, "batch_a")
      writeSingle(e.filter(col("vec_id") % 2 === 1), srcDir, "batch_b")
      val schema = s.read.parquet(srcDir).schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "*.parquet")
        .parquet(srcDir)
      val q = stream.writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame,
            _: Long) =>
          Similarity.semanticContamination(batch, evalSet,
            threshold = 0.98)
            .write.mode("append").parquet(outDir)
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.read.parquet(outDir)
    },

    // Streaming write-audit-publish: each micro-batch stages, audits
    // (exact count vs the batch relation), and atomically renames into
    // a published generation — an unaudited batch can never become
    // visible to readers. The published store must reproduce the batch
    // per-type aggregate exactly.
    QueryDef("s26_stream_write_audit_publish",
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
        |FROM events GROUP BY 1""".stripMargin) { (s, dir) =>
      val base = java.nio.file.Paths.get(
        sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft_fmt").toString
      val srcDir = s"$base/s26_stream_src"
      val pubDir = s"$base/s26_published"
      rmTree(new java.io.File(srcDir))
      rmTree(new java.io.File(pubDir))
      new java.io.File(srcDir).mkdirs()
      new java.io.File(pubDir).mkdirs()
      val ev = graft.Tables.load(s, dir, "events")
        .select("event_id", "event_type")
      writeSingle(ev.filter(col("event_id") % 2 === 0), srcDir, "batch_a")
      writeSingle(ev.filter(col("event_id") % 2 === 1), srcDir, "batch_b")
      val schema = s.read.parquet(srcDir).schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "*.parquet")
        .parquet(srcDir)
      val fs = new org.apache.hadoop.fs.Path(pubDir)
        .getFileSystem(s.sessionState.newHadoopConf())
      val q = stream.writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame,
            batchId: Long) =>
          val n = batch.count()
          val staging = new org.apache.hadoop.fs.Path(
            s"$pubDir/_staging_gen$batchId")
          batch.write.mode("overwrite").parquet(staging.toString)
          val staged = s.read.parquet(staging.toString)
          if (staged.count() == n)
            fs.rename(staging,
              new org.apache.hadoop.fs.Path(s"$pubDir/gen$batchId"))
          else fs.delete(staging, true)
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.read.parquet(s"$pubDir/gen*")
        .groupBy("event_type").agg(count(lit(1)).as("n"))
    },

    // Streaming RAG chunk-index maintenance: each document micro-batch
    // is sentence-chunked at ingest (stateless per-doc) and appended to
    // the index store; batches partition docs, so the accumulated store
    // must equal the batch p131 relation — shared oracle.
    QueryDef("s27_stream_chunk_index", Pipeline.sentenceChunksSql) {
      (s, dir) =>
      import graft.pipeline.Corpus
      val base = java.nio.file.Paths.get(
        sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft_fmt").toString
      val srcDir = s"$base/s27_stream_src"
      val outDir = s"$base/s27_stream_out"
      rmTree(new java.io.File(srcDir))
      rmTree(new java.io.File(outDir))
      new java.io.File(srcDir).mkdirs()
      val docs = graft.Tables.load(s, dir, "documents")
        .select("doc_id", "text")
      writeSingle(docs.filter(col("doc_id") % 2 === 0), srcDir, "batch_a")
      writeSingle(docs.filter(col("doc_id") % 2 === 1), srcDir, "batch_b")
      val schema = s.read.parquet(srcDir).schema
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "*.parquet")
        .parquet(srcDir)
      val q = stream.writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame,
            _: Long) =>
          Corpus.sentenceChunks(batch, maxTokens = 64)
            .write.mode("append").parquet(outDir)
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.read.parquet(outDir)
    },

    // Streaming as-of enrichment: each micro-batch of clicks is
    // enriched against a STATIC purchase dimension through the custom
    // AsOfJoinExec (x27/f18's operator) inside foreachBatch — the
    // standard "attach the latest reference state to an event stream"
    // shape. Per-row enrichment depends only on the row and the static
    // side, so micro-batch boundaries CANNOT change the answer: the
    // streamed union must equal the whole-corpus batch oracle (DuckDB's
    // native ASOF LEFT JOIN) byte-for-byte. Scale shape: the dimension
    // is sorted/shuffled once per batch on the join key (SMJ layout);
    // at a real deployment the dimension side would be broadcast or
    // pre-partitioned, and the stream side's shuffle is per-batch-sized.
    QueryDef("s28_stream_asof_enrich",
      """WITH r AS (
        |  SELECT user_id, ts,
        |    CAST(MAX(CAST(value AS DECIMAL(18,3))) AS DOUBLE) AS purchase_value
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
        |l AS (
        |  SELECT user_id, event_id, ts FROM events WHERE event_type = 'click')
        |SELECT l.user_id, l.event_id, l.ts,
        |  r.ts AS purchase_ts, r.purchase_value
        |FROM l ASOF LEFT JOIN r
        |  ON l.user_id = r.user_id AND l.ts >= r.ts""".stripMargin) {
      (s, dir) =>
      import org.apache.spark.sql.graft.AsOfJoinOps
      val ev = graft.Tables.load(s, dir, "events")
      val dim = ev.filter(col("event_type") === "purchase")
        .groupBy("user_id", "ts")
        .agg(max(col("value").cast("decimal(18,3)")).cast("double")
          .as("purchase_value"))
        .select(col("user_id").as("r_uid"), col("ts").as("purchase_ts"),
          col("purchase_value"))
      val clicks = ev.filter(col("event_type") === "click")
        .select("user_id", "event_id", "ts")
      val base = java.nio.file.Paths.get(
        sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft_fmt").toString
      val srcDir = s"$base/s28_stream_src"
      val outDir = s"$base/s28_enriched"
      rmTree(new java.io.File(srcDir)); rmTree(new java.io.File(outDir))
      new java.io.File(srcDir).mkdirs()
      writeSingle(clicks.filter(col("event_id") % 2 === 0), srcDir, "batch_a")
      writeSingle(clicks.filter(col("event_id") % 2 === 1), srcDir, "batch_b")
      val schema = s.read.parquet(srcDir).schema
      withStreamShuffle(s, srcDir) {
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "*.parquet")
        .parquet(srcDir)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          AsOfJoinOps.asofJoin(batch, dim,
            "user_id", "ts", "r_uid", "purchase_ts")
            .select("user_id", "event_id", "ts", "purchase_ts",
              "purchase_value")
            .write.mode("append").parquet(outDir)
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination() }
      s.read.parquet(outDir)
    },

    // Streaming PQ code-index maintenance (the p135 layout fed by a
    // stream, the s18-for-PQ dual): codebooks are frozen offline, each
    // micro-batch encodes its vectors to (id, codes, rnorm) rows and
    // appends them to the codes index — the encode is a pure per-row
    // function of the frozen codebooks, so the stream-built index is
    // value-identical to a batch re-encode regardless of batch
    // boundaries or arrival order. The gate queries the STORED index
    // through the ADC shortlist + exact rerank and pins equality with
    // the flat batch operator per query. At 100 TB this is how the
    // hot code table stays current: new embeddings stream in, only
    // their codes are appended, the float vectors go to cold storage.
    QueryDef("s29_stream_pq_index",
      """SELECT vec_id AS qid, CAST(10 AS BIGINT) AS n_returned,
        |  true AS same_as_flat
        |FROM embeddings WHERE vec_id < 5 ORDER BY qid""".stripMargin) {
      (s, dir) =>
      import graft.pipeline.Similarity
      val corpus = graft.Tables.load(s, dir, "embeddings")
        .select("vec_id", "embedding")
      val queries = corpus.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      val cbs = Similarity.pqCodebooks(corpus, 8, 16, "vec_id", "embedding")
      val base = java.nio.file.Paths.get(
        sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft_fmt").toString
      val srcDir = s"$base/s29_stream_src"
      val idxDir = s"$base/s29_pq_codes"
      rmTree(new java.io.File(srcDir)); rmTree(new java.io.File(idxDir))
      new java.io.File(srcDir).mkdirs()
      writeSingle(corpus.filter(col("vec_id") % 2 === 0), srcDir, "batch_a")
      writeSingle(corpus.filter(col("vec_id") % 2 === 1), srcDir, "batch_b")
      val schema = s.read.parquet(srcDir).schema
      withStreamShuffle(s, srcDir) {
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "*.parquet")
        .parquet(srcDir)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          Similarity.pqEncodeTable(batch, cbs, "vec_id", "embedding")
            .write.mode("append").parquet(idxDir)
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination() }
      val streamTop = Similarity.pqTopKFromCodes(
        s.read.parquet(idxDir), corpus, queries, cbs,
        k = 10, shortlistFactor = 10,
        "vec_id", "embedding", "qid", "qvec")
      val flatTop = Similarity.pqTopK(corpus, queries, k = 10)
      Similarity.sameTopK(streamTop, flatTop)
    },

    // Streaming weighted reservoir (the p137 Efraimidis-Spirakis sample
    // maintained over a stream): each micro-batch keeps only its local
    // top-k by the deterministic ln(u)/w key and appends those ≤k
    // candidate rows to the reservoir state; the global answer is the
    // top-k over the appended candidates. Correct by the E-S merge
    // property — a row outside its batch's top-k can never enter the
    // global top-k — so batch boundaries and arrival order are
    // irrelevant, and the stream-built sample is value-identical to
    // the batch operator over the union (this gate's oracle IS p137's
    // ranking replay). At 100 TB this is how an exact-count weighted
    // sample survives continuous ingest: per-batch state is k rows,
    // not the corpus.
    QueryDef("s30_stream_weighted_reservoir",
      """WITH h AS (SELECT doc_id, n_chars AS w,
        |    substring(md5('ws:' || CAST(doc_id AS VARCHAR)), 1, 8) AS hx
        |  FROM documents WHERE n_chars > 0),
        |v AS (SELECT doc_id, w,
        |    (strpos('0123456789abcdef', substring(hx,1,1)) - 1) * 268435456.0
        |  + (strpos('0123456789abcdef', substring(hx,2,1)) - 1) * 16777216.0
        |  + (strpos('0123456789abcdef', substring(hx,3,1)) - 1) * 1048576.0
        |  + (strpos('0123456789abcdef', substring(hx,4,1)) - 1) * 65536.0
        |  + (strpos('0123456789abcdef', substring(hx,5,1)) - 1) * 4096.0
        |  + (strpos('0123456789abcdef', substring(hx,6,1)) - 1) * 256.0
        |  + (strpos('0123456789abcdef', substring(hx,7,1)) - 1) * 16.0
        |  + (strpos('0123456789abcdef', substring(hx,8,1)) - 1) AS hv
        |  FROM h)
        |SELECT doc_id, CAST(w AS BIGINT) AS weight,
        |  round(ln((hv + 1) / 4294967296.0) / w, 6) + 0.0 AS key
        |FROM v ORDER BY key DESC, doc_id LIMIT 500""".stripMargin) {
      (s, dir) =>
      import graft.pipeline.Corpus
      val docs = graft.Tables.load(s, dir, "documents")
        .select("doc_id", "n_chars")
      val base = java.nio.file.Paths.get(
        sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft_fmt").toString
      val srcDir = s"$base/s30_stream_src"
      val resDir = s"$base/s30_reservoir"
      rmTree(new java.io.File(srcDir)); rmTree(new java.io.File(resDir))
      new java.io.File(srcDir).mkdirs()
      writeSingle(docs.filter(col("doc_id") % 3 === 0), srcDir, "batch_a")
      writeSingle(docs.filter(col("doc_id") % 3 === 1), srcDir, "batch_b")
      writeSingle(docs.filter(col("doc_id") % 3 === 2), srcDir, "batch_c")
      val schema = s.read.parquet(srcDir).schema
      withStreamShuffle(s, srcDir) {
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "*.parquet")
        .parquet(srcDir)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          Corpus.weightedSampleK(batch, k = 500, weightCol = "n_chars")
            .write.mode("append").parquet(resDir)
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination() }
      s.read.parquet(resDir)
        .orderBy(col("key").desc, col("doc_id"))
        .limit(500)
    },

    // Streaming data-quality monitor (the p138 contract evaluated over
    // continuous ingest): each micro-batch appends (a) its conditional
    // violation counts for the batch-decomposable checks — counts sum
    // across batches because the predicates are row-local — and (b) its
    // per-key partial counts for the pk-uniqueness check, which is NOT
    // row-local: a key is a violation only relative to every batch, so
    // the monitor persists the map-side partial aggregate (key, cnt)
    // and merges at report time. Per-batch state is O(batch keys), the
    // corpus is never re-read, and the final report must equal the
    // batch dataContract restricted to orders — via p138's own oracle
    // rows. At 100 TB the key store is the content-hash-index shape
    // (s09) applied to constraint state.
    QueryDef("s31_stream_contract_monitor",
      """SELECT check_name, checked, violations, violations = 0 AS pass
        |FROM (
        |  SELECT 'orders_pk_unique' AS check_name,
        |    (SELECT COUNT(*) FROM orders) AS checked,
        |    (SELECT COUNT(*) - COUNT(DISTINCT o_orderkey) FROM orders)
        |      AS violations
        |  UNION ALL SELECT 'orders_price_positive',
        |    (SELECT COUNT(*) FROM orders),
        |    (SELECT COUNT(*) FROM orders WHERE o_totalprice <= 0)
        |  UNION ALL SELECT 'orders_status_domain',
        |    (SELECT COUNT(*) FROM orders),
        |    (SELECT COUNT(*) FROM orders
        |     WHERE o_orderstatus NOT IN ('O','F','P'))
        |) ORDER BY check_name""".stripMargin) { (s, dir) =>
      val orders = graft.Tables.load(s, dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      val base = java.nio.file.Paths.get(
        sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft_fmt").toString
      val srcDir = s"$base/s31_stream_src"
      val statsDir = s"$base/s31_stats"
      val keysDir = s"$base/s31_keys"
      Seq(srcDir, statsDir, keysDir).foreach(d => rmTree(new java.io.File(d)))
      new java.io.File(srcDir).mkdirs()
      writeSplitSingle(orders, col("o_orderkey") % 4, 4,
        srcDir)
      val schema = s.read.parquet(srcDir).schema
      withStreamShuffle(s, srcDir) {
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "*.parquet")
        .parquet(srcDir)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.agg(
            count(lit(1)).cast("long").as("checked"),
            coalesce(sum(when(!col("o_orderstatus").isin("O", "F", "P"),
              1L).otherwise(0L)), lit(0L)).cast("long").as("v_status"),
            coalesce(sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L)),
              lit(0L)).cast("long").as("v_price"))
            .select(expr("stack(2, " +
              "'orders_status_domain', checked, v_status, " +
              "'orders_price_positive', checked, v_price) " +
              "AS (check_name, checked, violations)"))
            .coalesce(1).write.mode("append").parquet(statsDir)
          batch.groupBy("o_orderkey")
            .agg(count(lit(1)).cast("long").as("cnt"))
            .coalesce(1).write.mode("append").parquet(keysDir)
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination() }
      val decomposable = s.read.parquet(statsDir)
        .groupBy("check_name")
        .agg(sum(col("checked")).cast("long").as("checked"),
          sum(col("violations")).cast("long").as("violations"))
      val pk = s.read.parquet(keysDir).agg(
        sum(col("cnt")).cast("long").as("checked"),
        (sum(col("cnt")) - count_distinct(col("o_orderkey"))).cast("long")
          .as("violations"))
        .select(lit("orders_pk_unique").as("check_name"),
          col("checked"), col("violations"))
      decomposable.unionAll(pk)
        .select(col("check_name"), col("checked"), col("violations"),
          (col("violations") === 0L).as("pass"))
        .orderBy("check_name")
    },

    // Streaming ordered funnel (p142 over continuous ingest). Batches
    // are staged in EVENT-TIME order (ntile over ts — the watermark
    // discipline a production funnel assumes), which makes the
    // Streaming event-rate anomaly monitor (the p148 shape as a
    // production ingest monitor): each micro-batch appends its
    // (series, hour) PARTIAL counts — exact longs, so they sum across
    // batches no matter how events split — and the report merges the
    // partials, zero-fills the calendar grid, fits a STATIC baseline
    // per series over the first 360 grid hours, and z-flags the
    // serving half (with a planted 300-event burst that must flag).
    // The baseline stats are computed from exact integer sums
    // (mu = s1/nb, var = (s2 - s1*mu)/(nb-1)) rather than a float
    // aggregate, so the doubles are bit-identical in any engine and
    // any partition order. At 100 TB: per-batch state is O(active
    // series x hours in the batch), the corpus is never re-read, and
    // the report cost is bounded by the calendar grid.
    QueryDef("s33_stream_anomaly",
      """WITH c AS (SELECT event_type AS series,
        |    epoch_us(ts) // 3600000000 AS hr,
        |    CAST(COUNT(*) AS BIGINT) AS n0 FROM events GROUP BY 1, 2),
        |b AS (SELECT MIN(hr) AS mn, MAX(hr) AS mx FROM c),
        |sb AS (SELECT s.series, b.mn, b.mx
        |  FROM (SELECT DISTINCT series FROM c) s CROSS JOIN b),
        |grid AS (SELECT series, unnest(range(mn, mx + 1)) AS hr, mn
        |  FROM sb),
        |filled AS (SELECT g.series, g.hr, g.mn,
        |    COALESCE(c.n0, 0) +
        |    CASE WHEN g.series = 'click' AND g.hr = g.mn + 500
        |         THEN 300 ELSE 0 END AS n
        |  FROM grid g LEFT JOIN c
        |    ON g.series = c.series AND g.hr = c.hr),
        |base AS (SELECT series, CAST(COUNT(*) AS BIGINT) AS nb,
        |    CAST(SUM(n) AS BIGINT) AS s1,
        |    CAST(SUM(n * n) AS BIGINT) AS s2
        |  FROM filled WHERE hr < mn + 360 GROUP BY 1),
        |stats AS (SELECT series,
        |    CAST(s1 AS DOUBLE) / nb AS mu0,
        |    sqrt(greatest((CAST(s2 AS DOUBLE) -
        |      CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) / nb)) / (nb - 1),
        |      0.0)) AS sd0
        |  FROM base)
        |SELECT f.series, f.hr, CAST(f.n AS BIGINT) AS n,
        |  round(t.mu0, 6) AS mu, round(t.sd0, 6) AS sd,
        |  CASE WHEN t.sd0 > 0 THEN round((f.n - t.mu0) / t.sd0, 6) END
        |    AS z,
        |  COALESCE(CASE WHEN t.sd0 > 0
        |    THEN abs(round((f.n - t.mu0) / t.sd0, 6)) >= 3.0 END, FALSE)
        |    AS is_anomaly
        |FROM filled f JOIN stats t ON f.series = t.series
        |WHERE f.hr >= f.mn + 360
        |ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      val ev = graft.Tables.load(s, dir, "events")
        .select(col("event_type").as("series"),
          expr("unix_micros(ts) div 3600000000").as("hr"),
          col("event_id"))
      val base = java.nio.file.Paths.get(
        sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft_fmt").toString
      val srcDir = s"$base/s33_stream_src"
      val cntDir = s"$base/s33_counts"
      Seq(srcDir, cntDir).foreach(d => rmTree(new java.io.File(d)))
      new java.io.File(srcDir).mkdirs()
      writeSplitSingle(ev, col("event_id") % 4, 4,
        srcDir)
      val schema = s.read.parquet(srcDir).schema
      withStreamShuffle(s, srcDir) {
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "*.parquet")
        .parquet(srcDir)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.groupBy("series", "hr")
            .agg(count(lit(1)).cast("long").as("n"))
            .coalesce(1).write.mode("append").parquet(cntDir)
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination() }
      val merged = s.read.parquet(cntDir).groupBy("series", "hr")
        .agg(sum("n").cast("long").as("n0"))
      val bounds = merged.agg(min("hr").as("mn"), max("hr").as("mx"))
      val grid = merged.select("series").distinct().crossJoin(bounds)
        .select(col("series"),
          explode(sequence(col("mn"), col("mx"))).as("hr"), col("mn"))
      val filled = grid.join(merged, Seq("series", "hr"), "left")
        .select(col("series"), col("hr"), col("mn"),
          (coalesce(col("n0"), lit(0L)) +
            when(col("series") === "click" &&
              col("hr") === col("mn") + 500, lit(300L))
              .otherwise(lit(0L))).as("n"))
      val baseStats = filled.filter(col("hr") < col("mn") + 360)
        .groupBy("series").agg(
          count(lit(1)).cast("long").as("nb"),
          sum(col("n")).cast("long").as("s1"),
          sum(col("n") * col("n")).cast("long").as("s2"))
      val mu0 = col("s1").cast("double") / col("nb")
      val sd0 = sqrt(greatest(
        (col("s2").cast("double") -
          col("s1").cast("double") * (col("s1").cast("double") / col("nb"))) /
          (col("nb") - 1), lit(0.0)))
      val stats = baseStats.select(col("series"),
        mu0.as("mu0"), sd0.as("sd0"))
      filled.filter(col("hr") >= col("mn") + 360)
        .join(stats, "series")
        .withColumn("z0",
          when(col("sd0") > 0,
            round((col("n") - col("mu0")) / col("sd0"), 6)))
        .select(col("series"), col("hr"), col("n"),
          round(col("mu0"), 6).as("mu"), round(col("sd0"), 6).as("sd"),
          col("z0").as("z"),
          coalesce(abs(col("z0")) >= 3.0, lit(false)).as("is_anomaly"))
        .orderBy("series", "hr")
    },

    // per-user anchor state monotone-safe with THREE longs per user:
    // once step i's first-match anchor is set, every later-arriving
    // event has a later timestamp, so the anchor never changes and a
    // batch-discarded event (≤ the current anchor) could never qualify
    // later. Equal-timestamp ties split across a batch boundary are
    // safe too: strict '>' qualification excludes same-instant events
    // regardless of which side of the boundary they land on.
    // Each batch merges its per-user step minima into the state
    // generation (full-outer on user, least() per anchor, dependent
    // steps resolved against the batch's own updated anchors); the
    // final counts must equal the batch p142 report — its oracle
    // verbatim. At 100 TB: state is 3 longs per user, each batch
    // touches only its users.
    QueryDef("s32_stream_funnel",
      """WITH s1 AS (SELECT user_id, MIN(epoch_us(ts)) AS a
        |  FROM events WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS a
        |  FROM events e JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'click' AND epoch_us(e.ts) > s1.a
        |  GROUP BY 1),
        |s3 AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS a
        |  FROM events e JOIN s2 ON e.user_id = s2.user_id
        |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s2.a
        |  GROUP BY 1),
        |c AS (
        |  SELECT '1_view' AS step,
        |    CAST((SELECT COUNT(*) FROM s1) AS BIGINT) AS n_users
        |  UNION ALL SELECT '2_click',
        |    CAST((SELECT COUNT(*) FROM s2) AS BIGINT)
        |  UNION ALL SELECT '3_purchase',
        |    CAST((SELECT COUNT(*) FROM s3) AS BIGINT))
        |SELECT step, n_users,
        |  ROUND(CAST(n_users AS DOUBLE)
        |    / CAST(COALESCE(LAG(n_users) OVER (ORDER BY step), n_users)
        |           AS DOUBLE), 6) AS conv_rate
        |FROM c ORDER BY step""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val ev = graft.Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
      val base = java.nio.file.Paths.get(
        sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft_fmt").toString
      val srcDir = s"$base/s32_stream_src"
      val stateRoot = s"$base/s32_state"
      rmTree(new java.io.File(srcDir)); rmTree(new java.io.File(stateRoot))
      new java.io.File(srcDir).mkdirs()
      // time-ordered staging WITHOUT a global sort: range-split on
      // approx time quartiles (same-us ties across a cut are safe —
      // strict '>' excludes same-instant events on either side)
      val cuts = ev.stat.approxQuantile("us",
        Array(0.25, 0.5, 0.75), 0.001).map(_.toLong)
      val bounds = (Long.MinValue +: cuts) :+ Long.MaxValue
      // FileStreamSource orders by mtime; back-to-back writes can tie
      // at ms granularity and fall back to listing order — pin the
      // event-time processing order with explicit increasing mtimes
      val t0 = System.currentTimeMillis() - 3600000L
      // batch index 1 + #cuts-below == the old (bounds(b-1), bounds(b)]
      // range filter, computed in ONE pass (bounds(0)/bounds(4) are the
      // +/-inf sentinels every row clears)
      writeSplitSingle(ev,
        lit(1) + (col("us") > bounds(1)).cast("int") +
          (col("us") > bounds(2)).cast("int") +
          (col("us") > bounds(3)).cast("int"),
        4, srcDir, lo = 1)
      (1 to 4).foreach { b =>
        new java.io.File(srcDir, s"batch_$b.parquet")
          .setLastModified(t0 + b * 60000L)
        ()
      }
      val nullA = lit(null).cast("long")
      s.range(0).select(col("id").as("user_id"), nullA.as("a1"),
        nullA.as("a2"), nullA.as("a3"))
        .write.mode("overwrite").parquet(s"$stateRoot/v0")
      val schema = s.read.parquet(srcDir).schema
      withStreamShuffle(s, srcDir) {
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "*.parquet")
        .parquet(srcDir)
        .writeStream
        // retry-idempotent: batchId-keyed generations (s39 discipline)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame,
            batchId: Long) =>
          val st = s.read.parquet(s"$stateRoot/v$batchId")
          def stepMin(tp: String, anchored: org.apache.spark.sql.DataFrame,
              anchorCol: String): org.apache.spark.sql.DataFrame =
            batch.filter(col("event_type") === tp)
              .select(col("user_id"), col("us"))
              .join(anchored.select(col("user_id"), col(anchorCol)),
                "user_id")
              .filter(col("us") > col(anchorCol))
              .groupBy("user_id").agg(min("us").as("nv"))
          val bv = batch.filter(col("event_type") === "view")
            .groupBy("user_id").agg(min("us").as("nv"))
          val st1 = st.join(bv, Seq("user_id"), "full_outer")
            .select(col("user_id"), least(col("a1"), col("nv")).as("a1"),
              col("a2"), col("a3"))
          val st2 = st1.join(stepMin("click", st1, "a1"),
              Seq("user_id"), "left")
            .select(col("user_id"), col("a1"),
              least(col("a2"), col("nv")).as("a2"), col("a3"))
          val st3 = st2.join(stepMin("purchase", st2, "a2"),
              Seq("user_id"), "left")
            .select(col("user_id"), col("a1"), col("a2"),
              least(col("a3"), col("nv")).as("a3"))
          st3.write.mode("overwrite")
            .parquet(s"$stateRoot/v${batchId + 1}")
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination() }
      graft.operators.Pipeline.funnelRates(
        s.read.parquet(s"$stateRoot/v${latestGen(stateRoot)}").agg(
          count(col("a1")).cast("long").as("n1"),
          count(col("a2")).cast("long").as("n2"),
          count(col("a3")).cast("long").as("n3"))
          .select(expr("stack(3, '1_view', n1, '2_click', n2, " +
            "'3_purchase', n3) AS (step, n_users)")))
    },

    // Streaming OHLC bars (p143 over continuous ingest): each
    // micro-batch appends its per-(series, hour) PARTIAL bar — the
    // orderable-STRUCT min/max that selects open/close is an exact
    // decomposable aggregate (min of per-batch (us, event_id, v)
    // minima IS the global minimum, no matter how events split across
    // batches), as are high/low/count — and the report merges the
    // partials with the same min/max/sum. The oracle is batch p143's
    // SQL verbatim: the streamed, batch-split computation must equal
    // the one-shot batch bar table exactly. At 100 TB: per-batch
    // state is one row per (series, hour) touched by the batch; the
    // stream is never re-read.
    QueryDef("s34_stream_ohlc",
      """WITH e AS (SELECT event_type, event_id,
        |    epoch_us(ts) AS us, epoch_us(ts) // 3600000000 AS hr,
        |    value AS v
        |  FROM events WHERE value IS NOT NULL),
        |r AS (SELECT event_type, hr, us, event_id, v,
        |    ROW_NUMBER() OVER (PARTITION BY event_type, hr
        |                       ORDER BY us, event_id) AS rn_a,
        |    ROW_NUMBER() OVER (PARTITION BY event_type, hr
        |                       ORDER BY us DESC, event_id DESC) AS rn_d
        |  FROM e)
        |SELECT event_type, hr,
        |  MAX(CASE WHEN rn_a = 1 THEN v END) AS open,
        |  MAX(v) AS high, MIN(v) AS low,
        |  MAX(CASE WHEN rn_d = 1 THEN v END) AS close,
        |  CAST(COUNT(*) AS BIGINT) AS n_events
        |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      val ev = graft.Tables.load(s, dir, "events")
        .filter(col("value").isNotNull)
        .select(col("event_type"), col("event_id"),
          col("value").as("v"), unix_micros(col("ts")).as("us"))
        .withColumn("hr", expr("us div 3600000000"))
      val base = java.nio.file.Paths.get(
        sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft_fmt").toString
      val srcDir = s"$base/s34_stream_src"
      val barDir = s"$base/s34_bars"
      Seq(srcDir, barDir).foreach(d => rmTree(new java.io.File(d)))
      new java.io.File(srcDir).mkdirs()
      writeSplitSingle(ev, col("event_id") % 4, 4,
        srcDir)
      val schema = s.read.parquet(srcDir).schema
      withStreamShuffle(s, srcDir) {
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "*.parquet")
        .parquet(srcDir)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.groupBy("event_type", "hr")
            .agg(min(struct(col("us"), col("event_id"), col("v")))
                .as("o"),
              max(col("v")).as("hi"), min(col("v")).as("lo"),
              max(struct(col("us"), col("event_id"), col("v")))
                .as("c"),
              count(lit(1)).cast("long").as("n"))
            .coalesce(1).write.mode("append").parquet(barDir)
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination() }
      s.read.parquet(barDir).groupBy("event_type", "hr")
        .agg(min(col("o")).getField("v").as("open"),
          max(col("hi")).as("high"), min(col("lo")).as("low"),
          max(col("c")).getField("v").as("close"),
          sum(col("n")).cast("long").as("n_events"))
        .orderBy("event_type", "hr")
    },

    // Streaming Markov transitions (p152 over continuous ingest): the
    // cross-batch state is each user's LAST event (us, event_id, type)
    // — the one event whose outgoing transition hasn't been counted
    // yet. Batches are staged in event-time order (s32's range-split
    // discipline; equal-us rows never straddle a cut, so per-user
    // (us, event_id) order is globally correct), each batch counts the
    // lead() pairs over carried-last ∪ batch-events per user — the
    // carried row contributes exactly its one uncounted outgoing pair
    // — appends the (from, to) partial counts, and advances the state
    // to the new per-user struct-max event. The report merges partial
    // counts and must equal batch p152's oracle verbatim. At 100 TB:
    // state is one row per ACTIVE user, counts are types², and each
    // batch touches only its own users.
    QueryDef("s35_stream_transitions",
      """WITH o AS (SELECT user_id, event_type, event_id,
        |    epoch_us(ts) AS us FROM events),
        |l AS (SELECT event_type AS ft,
        |    lead(event_type) OVER w AS tt,
        |    lead(us) OVER w - us AS gap
        |  FROM o WINDOW w AS (PARTITION BY user_id ORDER BY us,
        |    event_id)),
        |f AS (SELECT ft, tt FROM l
        |  WHERE tt IS NOT NULL AND gap < 1800000000),
        |c AS (SELECT ft AS from_type, tt AS to_type,
        |    CAST(COUNT(*) AS BIGINT) AS n FROM f GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        |  round(n / CAST(SUM(n) OVER (PARTITION BY from_type)
        |    AS DOUBLE), 6) AS p
        |FROM c ORDER BY 1, 2""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val ev = graft.Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_type"), col("event_id"),
          unix_micros(col("ts")).as("us"))
      val base = java.nio.file.Paths.get(
        sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft_fmt").toString
      val srcDir = s"$base/s35_stream_src"
      val cntDir = s"$base/s35_counts"
      val stateRoot = s"$base/s35_state"
      Seq(srcDir, cntDir, stateRoot)
        .foreach(d => rmTree(new java.io.File(d)))
      new java.io.File(srcDir).mkdirs()
      val cuts = ev.stat.approxQuantile("us",
        Array(0.25, 0.5, 0.75), 0.001).map(_.toLong)
      val bounds = (Long.MinValue +: cuts) :+ Long.MaxValue
      // explicit increasing mtimes: the carried last-event state is
      // only correct if batches process in event-time order, and
      // FileStreamSource's mtime ordering ties at ms granularity for
      // back-to-back writes (ADVICE r9)
      val t0 = System.currentTimeMillis() - 3600000L
      // batch index 1 + #cuts-below == the old (bounds(b-1), bounds(b)]
      // range filter, computed in ONE pass (bounds(0)/bounds(4) are the
      // +/-inf sentinels every row clears)
      writeSplitSingle(ev,
        lit(1) + (col("us") > bounds(1)).cast("int") +
          (col("us") > bounds(2)).cast("int") +
          (col("us") > bounds(3)).cast("int"),
        4, srcDir, lo = 1)
      (1 to 4).foreach { b =>
        new java.io.File(srcDir, s"batch_$b.parquet")
          .setLastModified(t0 + b * 60000L)
        ()
      }
      s.range(0).select(col("id").as("user_id"),
          lit(null).cast("long").as("us"),
          lit(null).cast("long").as("event_id"),
          lit(null).cast("string").as("event_type"))
        .write.mode("overwrite").parquet(s"$stateRoot/v0")
      val schema = s.read.parquet(srcDir).schema
      withStreamShuffle(s, srcDir) {
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "*.parquet")
        .parquet(srcDir)
        .writeStream
        // retry-idempotent: batchId-keyed generations AND per-batch
        // overwrite paths for the transition counts (s39 discipline —
        // an appended count row would duplicate under a retry)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame,
            batchId: Long) =>
          val st = s.read.parquet(s"$stateRoot/v$batchId")
            .select("user_id", "us", "event_id", "event_type")
          val uni = st.unionByName(
            batch.select("user_id", "us", "event_id", "event_type"))
          val w = Window.partitionBy("user_id").orderBy("us", "event_id")
          uni.withColumn("tt", lead(col("event_type"), 1).over(w))
            .withColumn("gap", lead(col("us"), 1).over(w) - col("us"))
            .filter(col("tt").isNotNull && col("gap") < 1800000000L)
            .groupBy(col("event_type").as("from_type"),
              col("tt").as("to_type"))
            .agg(count(lit(1)).cast("long").as("n"))
            .coalesce(1).write.mode("overwrite")
            .parquet(s"$cntDir/b_$batchId")
          uni.groupBy("user_id")
            .agg(max(struct(col("us"), col("event_id"),
              col("event_type"))).as("m"))
            .select(col("user_id"), col("m.us").as("us"),
              col("m.event_id").as("event_id"),
              col("m.event_type").as("event_type"))
            .write.mode("overwrite")
            .parquet(s"$stateRoot/v${batchId + 1}")
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination() }
      s.read.option("recursiveFileLookup", "true").parquet(cntDir)
        .groupBy("from_type", "to_type")
        .agg(sum(col("n")).cast("long").as("n"))
        .withColumn("p", round(col("n") /
          sum(col("n")).over(Window.partitionBy("from_type")), 6))
        .orderBy("from_type", "to_type")
    },

    // Streaming deletion propagation (p158 over a deletion-request
    // STREAM): right-to-be-forgotten keys arrive continuously; each
    // micro-batch appends its distinct keys to the accumulated
    // tombstone set, and the final scrub-and-audit runs p158's exact
    // operator against the union — so the streamed accumulation must
    // produce the identical accounting row p158's batch oracle pins
    // (duplicate requests across batches must not double-count). At
    // 100 TB: tombstones are key-only appends; the scrub is one
    // anti-join at publish time, not per batch.
    QueryDef("s36_stream_deletion",
      """WITH del AS (SELECT DISTINCT user_id FROM events
        |  WHERE user_id % 97 = 3),
        |m AS (SELECT COUNT(*) AS n_match FROM events
        |  WHERE user_id % 97 = 3)
        |SELECT CAST((SELECT COUNT(*) FROM events) AS BIGINT) AS n_before,
        |  CAST(m.n_match AS BIGINT) AS n_deleted,
        |  CAST((SELECT COUNT(*) FROM events) - m.n_match AS BIGINT)
        |    AS n_after,
        |  CAST((SELECT COUNT(*) FROM del) AS BIGINT) AS n_keys_matched,
        |  CAST(0 AS BIGINT) AS residual,
        |  true AS clean
        |FROM m""".stripMargin) { (s, dir) =>
      val ev = graft.Tables.load(s, dir, "events")
      // the request stream: matching users' ids, deliberately WITH
      // duplicates (every matching event emits a request) split
      // across 4 batches
      val reqs = ev.filter(col("user_id") % 97 === 3)
        .select(col("user_id"), col("event_id"))
      val base = java.nio.file.Paths.get(
        sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft_fmt").toString
      val srcDir = s"$base/s36_stream_src"
      val keyDir = s"$base/s36_tombstones"
      Seq(srcDir, keyDir).foreach(d => rmTree(new java.io.File(d)))
      new java.io.File(srcDir).mkdirs()
      writeSplitSingle(reqs, col("event_id") % 4, 4,
        srcDir)
      val schema = s.read.parquet(srcDir).schema
      withStreamShuffle(s, srcDir) {
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "*.parquet")
        .parquet(srcDir)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.select("user_id").distinct()
            .coalesce(1).write.mode("append").parquet(keyDir)
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination() }
      graft.pipeline.Contracts.deletionAudit(ev, "user_id",
        s.read.parquet(keyDir))
    },

    // Streaming CUSUM monitor (p160 over continuous ingest): each
    // micro-batch appends its (series, hour) PARTIAL counts — exact
    // longs, merge-safe under any event split (s33's state shape) —
    // and the report merges them, zero-fills the grid, plants the
    // level shift, and runs p160's integer Page recurrence over the
    // accumulated counts. The oracle is p160's SQL verbatim: the
    // stream-accumulated change-point report must equal the one-shot
    // batch detection exactly, alarm bucket included. At 100 TB:
    // per-batch state is O(series × hours touched); the recurrence
    // runs once at report time over the bounded grid.
    QueryDef("s37_stream_cusum",
      """WITH RECURSIVE c AS (SELECT event_type AS series,
        |    epoch_us(ts) // 3600000000 AS hr,
        |    CAST(COUNT(*) AS BIGINT) AS n0 FROM events GROUP BY 1, 2),
        |span AS (SELECT series, MIN(hr) AS mn, MAX(hr) AS mx
        |  FROM c GROUP BY 1),
        |grid AS (SELECT series, unnest(range(mn, mx + 1)) AS hr, mn
        |  FROM span),
        |filled AS (SELECT g.series, g.hr, g.mn,
        |    COALESCE(c.n0, 0) +
        |    CASE WHEN g.series = 'click' AND g.hr >= g.mn + 600
        |         THEN 5 ELSE 0 END AS n
        |  FROM grid g LEFT JOIN c
        |    ON g.series = c.series AND g.hr = c.hr),
        |base AS (SELECT series, CAST(COUNT(*) AS BIGINT) AS nb,
        |    CAST(SUM(n) AS BIGINT) AS s1
        |  FROM filled WHERE hr < mn + 360 GROUP BY 1),
        |sv AS (SELECT f.series, f.hr, f.n, b.nb, b.s1,
        |    ROW_NUMBER() OVER (PARTITION BY f.series ORDER BY f.hr)
        |      AS rn
        |  FROM filled f JOIN base b ON f.series = b.series
        |  WHERE f.hr >= f.mn + 360),
        |rec(series, rn, s, mx, alarm) AS (
        |  SELECT series, rn,
        |    greatest(0, n * nb - s1 - 1 * nb),
        |    greatest(0, n * nb - s1 - 1 * nb),
        |    CASE WHEN greatest(0, n * nb - s1 - 1 * nb) >= 50 * nb
        |         THEN hr END
        |  FROM sv WHERE rn = 1
        |  UNION ALL
        |  SELECT v.series, v.rn,
        |    greatest(0, r.s + v.n * v.nb - v.s1 - 1 * v.nb),
        |    greatest(r.mx,
        |      greatest(0, r.s + v.n * v.nb - v.s1 - 1 * v.nb)),
        |    COALESCE(r.alarm,
        |      CASE WHEN greatest(0, r.s + v.n * v.nb - v.s1 - 1 * v.nb)
        |           >= 50 * v.nb THEN v.hr END)
        |  FROM rec r JOIN sv v
        |    ON v.series = r.series AND v.rn = r.rn + 1),
        |fin AS (SELECT series, MAX(rn) AS mr FROM rec GROUP BY 1)
        |SELECT b.series, b.nb, b.s1,
        |  CAST(r.alarm AS BIGINT) AS alarm_hr,
        |  CAST(r.mx AS BIGINT) AS max_cusum_scaled,
        |  r.alarm IS NOT NULL AS shift_detected
        |FROM rec r JOIN fin l ON r.series = l.series AND r.rn = l.mr
        |JOIN base b ON b.series = r.series
        |ORDER BY 1""".stripMargin) { (s, dir) =>
      val ev = graft.Tables.load(s, dir, "events")
        .select(col("event_type").as("series"),
          expr("unix_micros(ts) div 3600000000").as("hr"),
          col("event_id"), col("ts"))
      val base = java.nio.file.Paths.get(
        sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft_fmt").toString
      val srcDir = s"$base/s37_stream_src"
      val cntDir = s"$base/s37_counts"
      Seq(srcDir, cntDir).foreach(d => rmTree(new java.io.File(d)))
      new java.io.File(srcDir).mkdirs()
      writeSplitSingle(ev, col("event_id") % 4, 4,
        srcDir)
      val schema = s.read.parquet(srcDir).schema
      withStreamShuffle(s, srcDir) {
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "*.parquet")
        .parquet(srcDir)
        .writeStream
        // retry-idempotent: per-batch OVERWRITE paths keyed by the
        // framework batchId (s39 discipline) — an append would
        // duplicate a retried batch's partial counts
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame,
            batchId: Long) =>
          batch.groupBy("series", "hr")
            .agg(count(lit(1)).cast("long").as("n"))
            .coalesce(1).write.mode("overwrite")
            .parquet(s"$cntDir/b_$batchId")
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination() }
      // merge the accumulated partials back into per-hour events-shaped
      // rows? No — run p160's exact report pipeline over the merged
      // counts via the SHARED cusumFromCounts stage (one arithmetic
      // path for the batch gate and this mirror; the fuzz spec pins
      // that any batch split of the partials folds identically)
      val merged = s.read.option("recursiveFileLookup", "true")
        .parquet(cntDir).groupBy("series", "hr")
        .agg(sum("n").cast("long").as("n0"))
      graft.operators.Pipeline.cusumFromCounts(merged, trainHours = 360,
        k = 1L, threshold = 50L, shiftSeries = "click",
        shiftOffset = 600L, shiftN = 5L)
    },

    // Streaming chi-square readout (p164's full-corpus scenario over
    // continuous ingest): the carried state is per-user PARTIAL
    // conversion-event counts — each micro-batch appends its own
    // (user_id, n_conv) aggregate, order-free because counts merge by
    // sum; at publish the merged counts threshold into conversion
    // flags and flow through the batch gate's exact readout stage
    // (Pipeline.chiSquareFromConv), so the streamed statistic must
    // equal the batch oracle verbatim. At 100 TB: state is one count
    // row per converting-candidate user per batch, the readout is the
    // same two-aggregate scalar plan as p164.
    QueryDef("s38_stream_chi_square",
      """WITH u AS (SELECT user_id,
        |    CASE WHEN SUM(CASE WHEN event_type = 'purchase'
        |                  THEN 1 ELSE 0 END) >= 14
        |         THEN 1 ELSE 0 END AS conv,
        |    (strpos('0123456789abcdef',
        |        substring(md5(CAST(user_id AS VARCHAR)), 1, 1)) - 1)
        |      % 3 AS v
        |  FROM events GROUP BY 1),
        |c AS (SELECT
        |    CAST(SUM(CASE WHEN v = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_0,
        |    CAST(SUM(CASE WHEN v = 0 THEN conv ELSE 0 END) AS BIGINT)
        |      AS conv_0,
        |    CAST(SUM(CASE WHEN v = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_1,
        |    CAST(SUM(CASE WHEN v = 1 THEN conv ELSE 0 END) AS BIGINT)
        |      AS conv_1,
        |    CAST(SUM(CASE WHEN v = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_2,
        |    CAST(SUM(CASE WHEN v = 2 THEN conv ELSE 0 END) AS BIGINT)
        |      AS conv_2
        |  FROM u),
        |g AS (SELECT *, n_0 + n_1 + n_2 AS tn,
        |    conv_0 + conv_1 + conv_2 AS tc FROM c),
        |e AS (SELECT *,
        |    (n_0 * tc >= 5 * tn AND n_0 * (tn - tc) >= 5 * tn AND
        |     n_1 * tc >= 5 * tn AND n_1 * (tn - tc) >= 5 * tn AND
        |     n_2 * tc >= 5 * tn AND n_2 * (tn - tc) >= 5 * tn AND
        |     tn > 0) AS ok,
        |    CAST(tn AS DOUBLE) AS tnd, CAST(tc AS DOUBLE) AS tcd,
        |    CAST(n_0 AS DOUBLE) AS n0d, CAST(conv_0 AS DOUBLE) AS c0d,
        |    CAST(n_1 AS DOUBLE) AS n1d, CAST(conv_1 AS DOUBLE) AS c1d,
        |    CAST(n_2 AS DOUBLE) AS n2d, CAST(conv_2 AS DOUBLE) AS c2d
        |  FROM g),
        |f AS (SELECT *,
        |    n0d * tcd / tnd AS e10, n0d * (tnd - tcd) / tnd AS e00,
        |    n1d * tcd / tnd AS e11, n1d * (tnd - tcd) / tnd AS e01,
        |    n2d * tcd / tnd AS e12, n2d * (tnd - tcd) / tnd AS e02
        |  FROM e),
        |x AS (SELECT *,
        |    CASE WHEN ok THEN round(
        |      (((c0d - e10) * (c0d - e10) / e10
        |          + (n0d - c0d - e00) * (n0d - c0d - e00) / e00)
        |       + ((c1d - e11) * (c1d - e11) / e11
        |          + (n1d - c1d - e01) * (n1d - c1d - e01) / e01))
        |      + ((c2d - e12) * (c2d - e12) / e12
        |          + (n2d - c2d - e02) * (n2d - c2d - e02) / e02), 6)
        |    END AS chi2
        |  FROM f)
        |SELECT n_0, conv_0,
        |  round(CASE WHEN n_0 > 0 THEN c0d / n_0 END, 6) AS rate_0,
        |  n_1, conv_1,
        |  round(CASE WHEN n_1 > 0 THEN c1d / n_1 END, 6) AS rate_1,
        |  n_2, conv_2,
        |  round(CASE WHEN n_2 > 0 THEN c2d / n_2 END, 6) AS rate_2,
        |  chi2, 2 AS df,
        |  COALESCE(chi2 >= 5.991, false) AS significant,
        |  NOT ok AS guarded
        |FROM x""".stripMargin) { (s, dir) =>
      val ev = graft.Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_type"), col("event_id"))
      val base = java.nio.file.Paths.get(
        sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft_fmt").toString
      val srcDir = s"$base/s38_stream_src"
      val cntDir = s"$base/s38_counts"
      Seq(srcDir, cntDir).foreach(d => rmTree(new java.io.File(d)))
      new java.io.File(srcDir).mkdirs()
      writeSplitSingle(ev, col("event_id") % 4, 4,
        srcDir)
      val schema = s.read.parquet(srcDir).schema
      withStreamShuffle(s, srcDir) {
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "*.parquet")
        .parquet(srcDir)
        .writeStream
        // retry-idempotent: per-batch OVERWRITE paths keyed by the
        // framework batchId (s39 discipline)
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame,
            batchId: Long) =>
          batch.groupBy("user_id")
            .agg(sum(when(col("event_type") === "purchase", 1L)
              .otherwise(0L)).as("nc"))
            .coalesce(1).write.mode("overwrite")
            .parquet(s"$cntDir/b_$batchId")
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination() }
      val flags = s.read.option("recursiveFileLookup", "true")
        .parquet(cntDir).groupBy("user_id")
        .agg(when(sum(col("nc")) >= 14, 1L).otherwise(0L).as("conv"))
      graft.operators.Pipeline.chiSquareFromConv(flags, k = 3,
        minExpected = 5L, crit = 5.991)
    },

    // Streaming group-sequential monitor (p167 live): each micro-batch
    // IS one interim look — batches staged by the look schedule's week
    // cuts (known a priori, as a real monitor's calendar is), carried
    // state is one (first_week, purchase_count) row per user, and the
    // look row is computed from the merged state AT INGEST TIME via
    // the shared twoPropZ seam, so the live z is bit-identical to the
    // batch gate's. The oracle is p167's verbatim. At 100 TB: state is
    // one row per user; each look is one scalar aggregate over it.
    QueryDef("s39_stream_sequential",
      """WITH ev AS (SELECT user_id, event_type,
        |    epoch_us(ts) // 604800000000 AS wk FROM events),
        |rng AS (SELECT MIN(wk) AS mn, MAX(wk) AS mx FROM ev),
        |u AS (SELECT user_id, MIN(wk) AS fw,
        |    SUM(CASE WHEN event_type = 'purchase' AND wk <=
        |      mn + ((mx - mn + 1) * 1 + 3) // 4 - 1
        |      THEN 1 ELSE 0 END) AS p_1,
        |    SUM(CASE WHEN event_type = 'purchase' AND wk <=
        |      mn + ((mx - mn + 1) * 2 + 3) // 4 - 1
        |      THEN 1 ELSE 0 END) AS p_2,
        |    SUM(CASE WHEN event_type = 'purchase' AND wk <=
        |      mn + ((mx - mn + 1) * 3 + 3) // 4 - 1
        |      THEN 1 ELSE 0 END) AS p_3,
        |    SUM(CASE WHEN event_type = 'purchase' AND wk <=
        |      mn + ((mx - mn + 1) * 4 + 3) // 4 - 1
        |      THEN 1 ELSE 0 END) AS p_4,
        |    MIN(mn) AS mn, MIN(mx) AS mx,
        |    substring(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8' AS va
        |  FROM ev, rng GROUP BY user_id),
        |c AS (SELECT
        |    CAST(SUM(CASE WHEN va AND fw <=
        |      mn + ((mx - mn + 1) * 1 + 3) // 4 - 1
        |      THEN 1 ELSE 0 END) AS BIGINT) AS na_1,
        |    CAST(SUM(CASE WHEN va AND fw <=
        |      mn + ((mx - mn + 1) * 1 + 3) // 4 - 1 AND p_1 >= 14
        |      THEN 1 ELSE 0 END) AS BIGINT) AS ca_1,
        |    CAST(SUM(CASE WHEN NOT va AND fw <=
        |      mn + ((mx - mn + 1) * 1 + 3) // 4 - 1
        |      THEN 1 ELSE 0 END) AS BIGINT) AS nb_1,
        |    CAST(SUM(CASE WHEN NOT va AND fw <=
        |      mn + ((mx - mn + 1) * 1 + 3) // 4 - 1 AND p_1 >= 14
        |      THEN 1 ELSE 0 END) AS BIGINT) AS cb_1,
        |    CAST(SUM(CASE WHEN va AND fw <=
        |      mn + ((mx - mn + 1) * 2 + 3) // 4 - 1
        |      THEN 1 ELSE 0 END) AS BIGINT) AS na_2,
        |    CAST(SUM(CASE WHEN va AND fw <=
        |      mn + ((mx - mn + 1) * 2 + 3) // 4 - 1 AND p_2 >= 14
        |      THEN 1 ELSE 0 END) AS BIGINT) AS ca_2,
        |    CAST(SUM(CASE WHEN NOT va AND fw <=
        |      mn + ((mx - mn + 1) * 2 + 3) // 4 - 1
        |      THEN 1 ELSE 0 END) AS BIGINT) AS nb_2,
        |    CAST(SUM(CASE WHEN NOT va AND fw <=
        |      mn + ((mx - mn + 1) * 2 + 3) // 4 - 1 AND p_2 >= 14
        |      THEN 1 ELSE 0 END) AS BIGINT) AS cb_2,
        |    CAST(SUM(CASE WHEN va AND fw <=
        |      mn + ((mx - mn + 1) * 3 + 3) // 4 - 1
        |      THEN 1 ELSE 0 END) AS BIGINT) AS na_3,
        |    CAST(SUM(CASE WHEN va AND fw <=
        |      mn + ((mx - mn + 1) * 3 + 3) // 4 - 1 AND p_3 >= 14
        |      THEN 1 ELSE 0 END) AS BIGINT) AS ca_3,
        |    CAST(SUM(CASE WHEN NOT va AND fw <=
        |      mn + ((mx - mn + 1) * 3 + 3) // 4 - 1
        |      THEN 1 ELSE 0 END) AS BIGINT) AS nb_3,
        |    CAST(SUM(CASE WHEN NOT va AND fw <=
        |      mn + ((mx - mn + 1) * 3 + 3) // 4 - 1 AND p_3 >= 14
        |      THEN 1 ELSE 0 END) AS BIGINT) AS cb_3,
        |    CAST(SUM(CASE WHEN va AND fw <=
        |      mn + ((mx - mn + 1) * 4 + 3) // 4 - 1
        |      THEN 1 ELSE 0 END) AS BIGINT) AS na_4,
        |    CAST(SUM(CASE WHEN va AND fw <=
        |      mn + ((mx - mn + 1) * 4 + 3) // 4 - 1 AND p_4 >= 14
        |      THEN 1 ELSE 0 END) AS BIGINT) AS ca_4,
        |    CAST(SUM(CASE WHEN NOT va AND fw <=
        |      mn + ((mx - mn + 1) * 4 + 3) // 4 - 1
        |      THEN 1 ELSE 0 END) AS BIGINT) AS nb_4,
        |    CAST(SUM(CASE WHEN NOT va AND fw <=
        |      mn + ((mx - mn + 1) * 4 + 3) // 4 - 1 AND p_4 >= 14
        |      THEN 1 ELSE 0 END) AS BIGINT) AS cb_4,
        |    CAST(MAX(mn + ((mx - mn + 1) * 1 + 3) // 4 - 1) AS BIGINT)
        |      AS cut_1,
        |    CAST(MAX(mn + ((mx - mn + 1) * 2 + 3) // 4 - 1) AS BIGINT)
        |      AS cut_2,
        |    CAST(MAX(mn + ((mx - mn + 1) * 3 + 3) // 4 - 1) AS BIGINT)
        |      AS cut_3,
        |    CAST(MAX(mn + ((mx - mn + 1) * 4 + 3) // 4 - 1) AS BIGINT)
        |      AS cut_4
        |  FROM u),
        |l AS (
        |  SELECT 1 AS look, cut_1 AS wk_cut, na_1 AS n_a, ca_1 AS conv_a,
        |    nb_1 AS n_b, cb_1 AS conv_b, CAST(4.049 AS DOUBLE) AS bnd
        |  FROM c
        |  UNION ALL SELECT 2, cut_2, na_2, ca_2, nb_2, cb_2,
        |    CAST(2.863 AS DOUBLE) FROM c
        |  UNION ALL SELECT 3, cut_3, na_3, ca_3, nb_3, cb_3,
        |    CAST(2.337 AS DOUBLE) FROM c
        |  UNION ALL SELECT 4, cut_4, na_4, ca_4, nb_4, cb_4,
        |    CAST(2.024 AS DOUBLE) FROM c),
        |e AS (SELECT *,
        |    CASE WHEN n_a > 0 THEN CAST(conv_a AS DOUBLE) / n_a END
        |      AS ra,
        |    CASE WHEN n_b > 0 THEN CAST(conv_b AS DOUBLE) / n_b END
        |      AS rb,
        |    CASE WHEN n_a > 0 AND n_b > 0 THEN
        |      sqrt(CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b) *
        |        (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b)) *
        |        (1.0 / n_a + 1.0 / n_b)) END AS se
        |  FROM l),
        |zt AS (SELECT *,
        |    CASE WHEN se > 0 THEN (ra - rb) / se END AS z,
        |    COALESCE(abs(CASE WHEN se > 0 THEN (ra - rb) / se END)
        |      >= bnd, false) AS crossed
        |  FROM e)
        |SELECT look, wk_cut, n_a, conv_a, n_b, conv_b,
        |  round(z, 6) AS z, bnd AS boundary, crossed,
        |  (crossed AND COALESCE(SUM(CASE WHEN crossed THEN 1 ELSE 0 END)
        |    OVER (ORDER BY look
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |    0) = 0) AS first_crossing
        |FROM zt ORDER BY look""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val bnds = Seq(4.049, 2.863, 2.337, 2.024)
      val ev = graft.Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          expr("unix_micros(ts) div 604800000000").as("wk"))
      // the look schedule (week cuts) is fixed a priori, as a real
      // monitor's calendar is — derived once from the corpus range
      val r = ev.agg(min("wk"), max("wk")).head()
      val (mn, mx) = (r.getLong(0), r.getLong(1))
      val cuts = (1 to 4).map(k => mn + ((mx - mn + 1) * k + 3) / 4 - 1)
      val base = java.nio.file.Paths.get(
        sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft_fmt").toString
      val srcDir = s"$base/s39_stream_src"
      val stateRoot = s"$base/s39_state"
      val looksDir = s"$base/s39_looks"
      Seq(srcDir, stateRoot, looksDir)
        .foreach(d => rmTree(new java.io.File(d)))
      new java.io.File(srcDir).mkdirs()
      val lows = Long.MinValue +: cuts.init
      val t0 = System.currentTimeMillis() - 3600000L
      // batch index 1 + #cuts-below == the old (lows(b-1), cuts(b-1)]
      // range filter in ONE pass; rows above cuts(3) index to 5 and are
      // dropped, exactly as the old loop's filters dropped them
      writeSplitSingle(ev,
        lit(1) + (col("wk") > cuts(0)).cast("int") +
          (col("wk") > cuts(1)).cast("int") +
          (col("wk") > cuts(2)).cast("int") +
          (col("wk") > cuts(3)).cast("int"),
        4, srcDir, lo = 1)
      (1 to 4).foreach { b =>
        new java.io.File(srcDir, s"batch_$b.parquet")
          .setLastModified(t0 + b * 60000L)
        ()
      }
      s.range(0).select(col("id").as("user_id"),
          lit(null).cast("long").as("fw"),
          lit(null).cast("long").as("np"))
        .write.mode("overwrite").parquet(s"$stateRoot/v0")
      val schema = s.read.parquet(srcDir).schema
      withStreamShuffle(s, srcDir) {
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "*.parquet")
        .parquet(srcDir)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame,
            batchId: Long) =>
          // retry-idempotent (ADVICE r10): the state generation and
          // the look row are keyed by the FRAMEWORK batchId — not an
          // in-memory counter — and every write OVERWRITES its own
          // per-batch path, so a Spark-retried micro-batch replaces
          // its outputs instead of appending a duplicate look and
          // rereading a stale generation
          val g = batchId
          val st = s.read.parquet(s"$stateRoot/v$g")
            .select("user_id", "fw", "np")
          val bagg = batch.groupBy("user_id")
            .agg(min(col("wk")).as("fw"),
              sum(when(col("event_type") === "purchase", 1L)
                .otherwise(0L)).as("np"))
          st.unionByName(bagg).groupBy("user_id")
            .agg(min("fw").as("fw"), sum("np").cast("long").as("np"))
            .write.mode("overwrite").parquet(s"$stateRoot/v${g + 1}")
          val k = (g + 1).toInt
          val m = s.read.parquet(s"$stateRoot/v${g + 1}")
            .withColumn("va",
              substring(md5(col("user_id").cast("string")), 1, 1) < "8")
          val cnt = m.agg(
            sum(when(col("va"), 1L).otherwise(0L)).cast("long")
              .as("n_a"),
            sum(when(col("va") && col("np") >= 14, 1L).otherwise(0L))
              .cast("long").as("conv_a"),
            sum(when(!col("va"), 1L).otherwise(0L)).cast("long")
              .as("n_b"),
            sum(when(!col("va") && col("np") >= 14, 1L).otherwise(0L))
              .cast("long").as("conv_b"))
          val z = graft.operators.Pipeline.twoPropZ(col("n_a"),
            col("conv_a"), col("n_b"), col("conv_b"))
          cnt.select(lit(k).as("look"),
              lit(cuts(k - 1)).as("wk_cut"),
              col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
              round(z, 6).as("z"),
              lit(bnds(k - 1)).as("boundary"),
              coalesce(abs(z) >= bnds(k - 1), lit(false)).as("crossed"))
            .coalesce(1).write.mode("overwrite")
            .parquet(s"$looksDir/look_$k")
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination() }
      val wPrev = Window
        .partitionBy(graft.pipeline.Corpus.boundedKey(col("look")))
        .orderBy("look")
        .rowsBetween(Window.unboundedPreceding, -1)
      // recursiveFileLookup instead of a look_* glob: a glob path makes
      // FileStreamSink's metadata probe WARN with a stack trace on
      // every read (the path "does not exist" as a literal dir)
      s.read.option("recursiveFileLookup", "true").parquet(looksDir)
        .withColumn("first_crossing", col("crossed") &&
          coalesce(sum(when(col("crossed"), 1L).otherwise(0L))
            .over(wPrev), lit(0L)) === 0L)
        .orderBy("look")
    },

    // Always-valid monitor LIVE (p188's point): each micro-batch is an
    // observation point — NOT a scheduled look; the mSPRT p-value's
    // validity holds at any stopping time, so the team may stop the
    // moment p_always ≤ α. Carried state is s39's (first_week,
    // purchase_count) row per user (min/sum merges — associative and
    // order-free); each look's p_now comes from the merged state via
    // the shared msprtPNow seam, so the live number is bit-identical
    // to the batch gate's; p_always is the running min over emitted
    // looks. The oracle is p188's null scenario verbatim.
    // Retry-idempotent: batchId-keyed OVERWRITE paths (s39 discipline).
    QueryDef("s44_stream_msprt", {
      val counters = (1 to 4).map { k =>
        val cut = s"mn + ((mx - mn + 1) * $k + 3) // 4 - 1"
        s"""    CAST(SUM(CASE WHEN va AND fw <= $cut
           |      THEN 1 ELSE 0 END) AS BIGINT) AS na_$k,
           |    CAST(SUM(CASE WHEN va AND fw <= $cut AND p_$k >= 14
           |      THEN 1 ELSE 0 END) AS BIGINT) AS ca_$k,
           |    CAST(SUM(CASE WHEN NOT va AND fw <= $cut
           |      THEN 1 ELSE 0 END) AS BIGINT) AS nb_$k,
           |    CAST(SUM(CASE WHEN NOT va AND fw <= $cut AND
           |      p_$k >= 14 THEN 1 ELSE 0 END) AS BIGINT) AS cb_$k,
           |    CAST(MAX($cut) AS BIGINT) AS cut_$k""".stripMargin
      }.mkString(",\n")
      val lookRows = (1 to 4).map { k =>
        s"""  SELECT $k AS look, cut_$k AS wk_cut, na_$k AS n_a,
           |    ca_$k AS conv_a, nb_$k AS n_b, cb_$k AS conv_b
           |  FROM c""".stripMargin
      }.mkString("\n  UNION ALL\n")
      s"""WITH ev AS (SELECT user_id, event_type,
         |    epoch_us(ts) // 604800000000 AS wk FROM events),
         |rng AS (SELECT MIN(wk) AS mn, MAX(wk) AS mx FROM ev),
         |u AS (SELECT user_id, MIN(wk) AS fw,
         |${(1 to 4).map { k =>
        s"""    SUM(CASE WHEN event_type = 'purchase' AND wk <=
           |      mn + ((mx - mn + 1) * $k + 3) // 4 - 1
           |      THEN 1 ELSE 0 END) AS p_$k,""".stripMargin
      }.mkString("\n")}
         |    MIN(mn) AS mn, MIN(mx) AS mx,
         |    substring(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8' AS va
         |  FROM ev, rng GROUP BY user_id),
         |c AS (SELECT
         |$counters
         |  FROM u),
         |l AS (
         |$lookRows),
         |e AS (SELECT *,
         |    CASE WHEN n_a > 0 AND n_b > 0 THEN
         |      CAST(conv_a AS DOUBLE) / n_a -
         |      CAST(conv_b AS DOUBLE) / n_b END AS th,
         |    CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b) *
         |      (1.0 - CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b)) *
         |      (1.0 / n_a + 1.0 / n_b) AS v
         |  FROM l),
         |pp AS (SELECT *,
         |    CASE WHEN n_a > 0 AND n_b > 0 AND v > 0 THEN
         |      least(1.0, 1.0 / (sqrt(v / (v + 0.01)) *
         |        exp(th * th * 0.01 / (2.0 * v * (v + 0.01))))) END
         |      AS p_now
         |  FROM e),
         |w AS (SELECT *, MIN(p_now) OVER (ORDER BY look
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS p_always
         |  FROM pp)
         |SELECT look, wk_cut, n_a, conv_a, n_b, conv_b,
         |  round(th, 6) AS theta, round(p_now, 6) AS p_now,
         |  round(p_always, 6) AS p_always,
         |  COALESCE(p_always <= 0.05, false) AS rejected,
         |  p_now IS NULL AS guarded
         |FROM w ORDER BY look""".stripMargin
    }) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val ev = graft.Tables.load(s, dir, "events")
        .select(col("user_id"), col("event_type"),
          expr("unix_micros(ts) div 604800000000").as("wk"))
      val r = ev.agg(min("wk"), max("wk")).head()
      val (mn, mx) = (r.getLong(0), r.getLong(1))
      val cuts = (1 to 4).map(k => mn + ((mx - mn + 1) * k + 3) / 4 - 1)
      val base = java.nio.file.Paths.get(
        sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft_fmt").toString
      val srcDir = s"$base/s44_stream_src"
      val stateRoot = s"$base/s44_state"
      val looksDir = s"$base/s44_looks"
      Seq(srcDir, stateRoot, looksDir)
        .foreach(d => rmTree(new java.io.File(d)))
      new java.io.File(srcDir).mkdirs()
      val lows = Long.MinValue +: cuts.init
      val t0 = System.currentTimeMillis() - 3600000L
      // batch index 1 + #cuts-below == the old (lows(b-1), cuts(b-1)]
      // range filter in ONE pass; rows above cuts(3) index to 5 and are
      // dropped, exactly as the old loop's filters dropped them
      writeSplitSingle(ev,
        lit(1) + (col("wk") > cuts(0)).cast("int") +
          (col("wk") > cuts(1)).cast("int") +
          (col("wk") > cuts(2)).cast("int") +
          (col("wk") > cuts(3)).cast("int"),
        4, srcDir, lo = 1)
      (1 to 4).foreach { b =>
        new java.io.File(srcDir, s"batch_$b.parquet")
          .setLastModified(t0 + b * 60000L)
        ()
      }
      s.range(0).select(col("id").as("user_id"),
          lit(null).cast("long").as("fw"),
          lit(null).cast("long").as("np"))
        .write.mode("overwrite").parquet(s"$stateRoot/v0")
      val schema = s.read.parquet(srcDir).schema
      withStreamShuffle(s, srcDir) {
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "*.parquet")
        .parquet(srcDir)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame,
            batchId: Long) =>
          val g = batchId
          val st = s.read.parquet(s"$stateRoot/v$g")
            .select("user_id", "fw", "np")
          val bagg = batch.groupBy("user_id")
            .agg(min(col("wk")).as("fw"),
              sum(when(col("event_type") === "purchase", 1L)
                .otherwise(0L)).as("np"))
          st.unionByName(bagg).groupBy("user_id")
            .agg(min("fw").as("fw"), sum("np").cast("long").as("np"))
            .write.mode("overwrite").parquet(s"$stateRoot/v${g + 1}")
          val k = (g + 1).toInt
          val m = s.read.parquet(s"$stateRoot/v${g + 1}")
            .withColumn("va",
              substring(md5(col("user_id").cast("string")), 1, 1) < "8")
          val cnt = m.agg(
            sum(when(col("va"), 1L).otherwise(0L)).cast("long")
              .as("n_a"),
            sum(when(col("va") && col("np") >= 14, 1L).otherwise(0L))
              .cast("long").as("conv_a"),
            sum(when(!col("va"), 1L).otherwise(0L)).cast("long")
              .as("n_b"),
            sum(when(!col("va") && col("np") >= 14, 1L).otherwise(0L))
              .cast("long").as("conv_b"))
          val theta = when(col("n_a") > 0 && col("n_b") > 0,
            col("conv_a").cast("double") / col("n_a").cast("double") -
              col("conv_b").cast("double") / col("n_b").cast("double"))
          val pNow = graft.operators.Pipeline.msprtPNow(col("n_a"),
            col("conv_a"), col("n_b"), col("conv_b"), tauSq = 0.01)
          cnt.select(lit(k).as("look"),
              lit(cuts(k - 1)).as("wk_cut"),
              col("n_a"), col("conv_a"), col("n_b"), col("conv_b"),
              round(theta, 6).as("theta"),
              round(pNow, 6).as("p_now"),
              pNow.as("p_raw"))
            .coalesce(1).write.mode("overwrite")
            .parquet(s"$looksDir/look_$k")
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination() }
      // publish: the always-valid p is the running min over the looks
      // observed so far — the only cross-look state, and it lives in
      // the (bounded, ≤looks-row) look log, not in per-user state.
      // The stop decision compares the RAW running min to α (the batch
      // gate and the oracle both do) — deciding on the 6-dp ROUNDED
      // value would flip `rejected` for a raw p in (α, α + 5e-7]; the
      // REPORTED p_always may round (round is monotone, so
      // round(min raw) == min(round raw) on the grid)
      val wMin = Window
        .partitionBy(graft.pipeline.Corpus.boundedKey(col("look")))
        .orderBy("look")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      s.read.option("recursiveFileLookup", "true").parquet(looksDir)
        .withColumn("p_always", round(min(col("p_raw")).over(wMin), 6))
        .withColumn("rejected",
          coalesce(min(col("p_raw")).over(wMin) <= 0.05, lit(false)))
        .withColumn("guarded", col("p_now").isNull)
        .drop("p_raw")
        .orderBy("look")
    },

    // Streaming perceptual dedup (p189 live): images arrive in
    // micro-batches; each batch decodes its payloads ONCE and persists
    // only the (id, 64-bit dHash) signature rows — the carried state is
    // one long per image, never the bytes, and signature computation is
    // per-row so any batch split merges (by append) to the same table.
    // Publish runs the multi-block hamming pairs + connected components
    // + canonical-roster join over the merged signatures, so the report
    // must equal the batch p189 oracle verbatim. The expensive decode
    // happens exactly once per image at INGEST — re-publishing after
    // every batch costs only the pairs path over longs.
    // Retry-idempotent: batchId-keyed OVERWRITE paths (s39 discipline).
    QueryDef("s47_stream_perceptual",
      """SELECT doc_id, doc_id AS comp, true AS kept
        |FROM documents WHERE doc_id % 4 = 0
        |UNION ALL
        |SELECT doc_id + 1000000 AS doc_id, doc_id AS comp,
        |  false AS kept
        |FROM documents WHERE doc_id % 4 = 0
        |UNION ALL
        |SELECT doc_id + 2000000 AS doc_id, doc_id AS comp,
        |  false AS kept
        |FROM documents WHERE doc_id % 4 = 0
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val (sel, media) = Planted.imageMedia(s, dir)
      val base = java.nio.file.Paths.get(
        sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft_fmt").toString
      val srcDir = s"$base/s47_stream_src"
      val sigRoot = s"$base/s47_sigs"
      val mediaDir = s"$base/s47_media"
      Seq(srcDir, sigRoot, mediaDir)
        .foreach(d => rmTree(new java.io.File(d)))
      new java.io.File(srcDir).mkdirs()
      // render the fixture corpus ONCE; the per-batch splits read the
      // staged parquet back — filtering the mapPartitions render
      // directly would re-render the whole corpus per split (it can't
      // be pruned; measured 35.6 s → 15.3 s at sf0.1)
      media.write.mode("overwrite").parquet(mediaDir)
      val staged = s.read.parquet(mediaDir)
      // Split on xxhash64(doc_id), NOT doc_id % 4: every fixture id is
      // ≡ 0 mod 4 (base ids are multiples of 4; the +1e6/+2e6 variant
      // offsets are too), so a mod-id split would put the whole corpus
      // in micro-batch 0 and never exercise the cross-batch signature
      // append-merge this gate exists to cover (r12 advice). The hash
      // split scatters each planted trio across batches.
      writeSplitSingle(staged,
        pmod(xxhash64(col("doc_id")), lit(4L)), 4, srcDir)
      val schema = s.read.parquet(srcDir).schema
      withStreamShuffle(s, srcDir) {
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "*.parquet")
        .parquet(srcDir)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame,
            batchId: Long) =>
          val dec = graft.pipeline.Multimodal
            .withDecodedGray(graft.streaming.Streams.fanOutBatch(batch),
              "media")
            .filter(col("gray").isNotNull)
          // repartition(1), NOT coalesce(1): coalesce is narrow and
          // would collapse the fanned-out decode back into the single
          // writer task; the exchange ships only (id, sig) longs
          dec.select(col("doc_id").as("id"),
              org.apache.spark.sql.graft.VectorExpressions.dhash64(
                col("gray"), col("img_w"), col("img_h")).as("sig"))
            .repartition(1).write.mode("overwrite")
            .parquet(s"$sigRoot/b_$batchId")
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination() }
      val sigs = s.read.option("recursiveFileLookup", "true")
        .parquet(sigRoot)
      val pairs = graft.pipeline.Dedup.hammingPairs(sigs,
        maxHamming = 8, multiIndex = 3)
      val labels = graft.pipeline.Dedup.components(pairs)
      Planted.dedupRoster(sel, Seq(0L, 1000000L, 2000000L), labels)
    },

    // Streaming perceptual AUDIO dedup (p192 live): WAV payloads arrive
    // in micro-batches; each batch parses its PCM ONCE and persists only
    // the (id, 64-bit AudioHash64) signature rows — carried state is one
    // long per sound, never the bytes, and signatures are per-row so any
    // batch split append-merges to the same table. Publish runs the
    // multi-block hamming pairs + connected components + canonical
    // roster over the merged signatures == the batch p192 oracle
    // verbatim. Batches split on xxhash64(doc_id) (the s47 lesson: every
    // fixture id is 0 mod 4, a mod split would never mix the trios).
    // Retry-idempotent: batchId-keyed OVERWRITE paths (s39 discipline).
    QueryDef("s48_stream_audio",
      """SELECT doc_id, doc_id AS comp, true AS kept
        |FROM documents WHERE doc_id % 4 = 0
        |UNION ALL
        |SELECT doc_id + 1000000 AS doc_id, doc_id AS comp,
        |  false AS kept
        |FROM documents WHERE doc_id % 4 = 0
        |UNION ALL
        |SELECT doc_id + 2000000 AS doc_id, doc_id AS comp,
        |  false AS kept
        |FROM documents WHERE doc_id % 4 = 0
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val (sel, media) = Planted.audioMedia(s, dir)
      val base = java.nio.file.Paths.get(
        sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft_fmt").toString
      val srcDir = s"$base/s48_stream_src"
      val sigRoot = s"$base/s48_sigs"
      val mediaDir = s"$base/s48_media"
      Seq(srcDir, sigRoot, mediaDir)
        .foreach(d => rmTree(new java.io.File(d)))
      new java.io.File(srcDir).mkdirs()
      // render the fixture corpus ONCE; per-batch splits read the staged
      // parquet back (the s47 lesson: filtering the mapPartitions render
      // directly re-renders the whole corpus per split)
      media.write.mode("overwrite").parquet(mediaDir)
      val staged = s.read.parquet(mediaDir)
      writeSplitSingle(staged,
        pmod(xxhash64(col("doc_id")), lit(4L)), 4, srcDir)
      val schema = s.read.parquet(srcDir).schema
      withStreamShuffle(s, srcDir) {
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "*.parquet")
        .parquet(srcDir)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame,
            batchId: Long) =>
          val dec = graft.pipeline.Multimodal
            .withDecodedPcm(graft.streaming.Streams.fanOutBatch(batch),
              "media")
            .filter(col("pcm").isNotNull)
          // repartition(1), NOT coalesce(1) — the s47 note
          dec.select(col("doc_id").as("id"),
              org.apache.spark.sql.graft.VectorExpressions.audiohash64(
                col("pcm")).as("sig"))
            .repartition(1).write.mode("overwrite")
            .parquet(s"$sigRoot/b_$batchId")
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination() }
      val sigs = s.read.option("recursiveFileLookup", "true")
        .parquet(sigRoot)
      val pairs = graft.pipeline.Dedup.hammingPairs(sigs,
        maxHamming = 8, multiIndex = 3)
      val labels = graft.pipeline.Dedup.components(pairs)
      Planted.dedupRoster(sel, Seq(0L, 1000000L, 2000000L), labels)
    },

    // Streaming perceptual VIDEO dedup (p194 live): clips arrive in
    // micro-batches; each batch demuxes its payloads ONCE — sampling 8
    // time-fraction frames, dHashing each, and voting them into one
    // clip signature — and persists only the (id, MajorityHash64) rows.
    // A clip's frames never span batches (the unit of arrival is the
    // whole payload), so the per-clip vote is complete within its
    // batch and the carried state is one long per clip; any batch
    // split append-merges to the same signature table. Publish =
    // pairs + components + canonical roster == batch p194 verbatim.
    // Batches split on xxhash64(doc_id) (the s47 lesson).
    QueryDef("s49_stream_video",
      """SELECT doc_id, doc_id AS comp, true AS kept
        |FROM documents WHERE doc_id % 4 = 0
        |UNION ALL
        |SELECT doc_id + 1000000 AS doc_id, doc_id AS comp,
        |  false AS kept
        |FROM documents WHERE doc_id % 4 = 0
        |UNION ALL
        |SELECT doc_id + 2000000 AS doc_id, doc_id AS comp,
        |  false AS kept
        |FROM documents WHERE doc_id % 4 = 0
        |UNION ALL
        |SELECT doc_id + 3000000 AS doc_id, doc_id AS comp,
        |  false AS kept
        |FROM documents WHERE doc_id % 4 = 0
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val (sel, media) = Planted.videoMedia(s, dir)
      val base = java.nio.file.Paths.get(
        sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft_fmt").toString
      val srcDir = s"$base/s49_stream_src"
      val sigRoot = s"$base/s49_sigs"
      val mediaDir = s"$base/s49_media"
      Seq(srcDir, sigRoot, mediaDir)
        .foreach(d => rmTree(new java.io.File(d)))
      new java.io.File(srcDir).mkdirs()
      // render the fixture corpus ONCE; per-batch splits read the staged
      // parquet back (mapPartitions renders can't be pruned)
      media.write.mode("overwrite").parquet(mediaDir)
      // Clips are ~28 KB of binary per row: at the 100× sweep the
      // vectorized reader's default 4096-row batch tried to reserve
      // 4096 × 28 KB ≈ 113 MB CONTIGUOUS per task and OOM'd 32-wide
      // (caught there, invisible at the test SFs — the r12 p187
      // broadcast lesson again). Scope the documented workaround —
      // a smaller columnar batch — around the media reads only; the
      // publish-side (id, sig) long reads restore the default.
      val batchKey = "spark.sql.parquet.columnarReaderBatchSize"
      val prevBatchSize = s.conf.get(batchKey, "4096")
      s.conf.set(batchKey, "256")
      try {
        val staged = s.read.parquet(mediaDir)
        writeSplitSingle(staged,
          pmod(xxhash64(col("doc_id")), lit(4L)), 4, srcDir)
        val schema = s.read.parquet(srcDir).schema
        withStreamShuffle(s, srcDir) {
        val q = s.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1")
          .option("pathGlobFilter", "*.parquet")
          .parquet(srcDir)
          .writeStream
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame,
              batchId: Long) =>
            val frames = graft.pipeline.Multimodal
              .withDecodedFrames(
                graft.streaming.Streams.fanOutBatch(batch), "media")
              .filter(col("gray").isNotNull)
            // repartition(1), NOT coalesce(1) — the s47 note (the
            // groupBy exchange sits between, but coalesce(1) would
            // still collapse the vote stage onto one core)
            frames.select(col("doc_id").as("id"),
                org.apache.spark.sql.graft.VectorExpressions.dhash64(
                  col("gray"), col("img_w"), col("img_h")).as("fsig"))
              .groupBy("id")
              .agg(org.apache.spark.sql.graft.VectorExpressions
                .majorityhash64(collect_list(col("fsig"))).as("sig"))
              .repartition(1).write.mode("overwrite")
              .parquet(s"$sigRoot/b_$batchId")
            ()
          }
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination() }
      } finally s.conf.set(batchKey, prevBatchSize)
      val sigs = s.read.option("recursiveFileLookup", "true")
        .parquet(sigRoot)
      val pairs = graft.pipeline.Dedup.hammingPairs(sigs,
        maxHamming = 6, multiIndex = 3)
      val labels = graft.pipeline.Dedup.components(pairs)
      Planted.dedupRoster(sel, Seq(0L, 1000000L, 2000000L, 3000000L),
        labels)
    },

    // Streaming cross-modal frame-grab detection (p195 live): clips
    // AND still images arrive interleaved in micro-batches; each batch
    // decodes its own payloads once — clip rows demux to 8 per-frame
    // dHashes under packed sub-ids (id·16 + frame_pos), image rows to
    // one dHash under id·16 + 15 — and persists only the (sub-id, sig)
    // longs. The carried state is a pure APPEND merge (every sub-id's
    // signature derives from exactly one arriving payload, and a
    // clip's 8 frames come from one row, so no signature ever spans
    // batches). Publish runs the SAME frameGrabPairsFromSigs seam as
    // batch p195 (pigeonhole → bipartite filter → min-hamming
    // collapse) over the merged table — output must equal p195
    // verbatim even though a grab and its source clip usually land in
    // DIFFERENT batches (xxhash64 split: ids 1000000 apart never
    // share a batch systematically — the cross-batch pairing the gate
    // exists to exercise).
    QueryDef("s50_stream_frame_grab",
      """SELECT doc_id AS clip_id, doc_id + 1000000 AS image_id,
        |  true AS found
        |FROM documents WHERE doc_id % 4 = 0
        |ORDER BY clip_id""".stripMargin) { (s, dir) =>
      val (sel, clips, grabs) = Planted.frameGrabCorpus(s, dir)
      val base = java.nio.file.Paths.get(
        sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft_fmt").toString
      val srcDir = s"$base/s50_stream_src"
      val sigRoot = s"$base/s50_sigs"
      val mediaDir = s"$base/s50_media"
      Seq(srcDir, sigRoot, mediaDir)
        .foreach(d => rmTree(new java.io.File(d)))
      new java.io.File(srcDir).mkdirs()
      // render BOTH corpora once (the s47 lesson); the kind column
      // routes each row to its decoder inside the batch
      clips.withColumn("kind", lit("clip"))
        .unionAll(grabs.withColumn("kind", lit("grab")))
        .write.mode("overwrite").parquet(mediaDir)
      // wide-binary columnar batches: same contiguous-reservation OOM
      // as s49 at the 100× sweep — shrink around the media reads only
      val batchKey = "spark.sql.parquet.columnarReaderBatchSize"
      val prevBatchSize = s.conf.get(batchKey, "4096")
      s.conf.set(batchKey, "256")
      try {
        val staged = s.read.parquet(mediaDir)
        writeSplitSingle(staged,
          pmod(xxhash64(col("doc_id")), lit(4L)), 4, srcDir)
        val schema = s.read.parquet(srcDir).schema
        withStreamShuffle(s, srcDir) {
        val q = s.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1")
          .option("pathGlobFilter", "*.parquet")
          .parquet(srcDir)
          .writeStream
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame,
              batchId: Long) =>
            val fanned = graft.streaming.Streams.fanOutBatch(batch)
            val frameSigs = graft.pipeline.Dedup.frameGrabClipSigs(
              fanned.filter(col("kind") === "clip"), "doc_id", "media")
            val grabSigs = graft.pipeline.Dedup.frameGrabImageSigs(
              fanned.filter(col("kind") === "grab"), "doc_id", "media")
            // repartition(1), NOT coalesce(1) — the s47 note
            frameSigs.unionAll(grabSigs)
              .repartition(1).write.mode("overwrite")
              .parquet(s"$sigRoot/b_$batchId")
            ()
          }
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination() }
      } finally s.conf.set(batchKey, prevBatchSize)
      val sigs = s.read.option("recursiveFileLookup", "true")
        .parquet(sigRoot)
      val pairs = graft.pipeline.Dedup.frameGrabPairsFromSigs(sigs,
        maxHamming = 6, multiIndex = 3)
      sel.select(col("doc_id").as("clip_id"),
          (col("doc_id") + 1000000L).as("image_id"))
        .join(pairs, Seq("image_id", "clip_id"), "left")
        .select(col("clip_id"), col("image_id"),
          col("hamming").isNotNull.as("found"))
        .orderBy("clip_id")
    },

    // Streaming BPE tokenizer training (p196 live): documents arrive
    // in micro-batches; the carried state is the per-batch WORD-COUNT
    // histogram — (w, cnt) rows bounded by vocabulary size, merged by
    // sum (counts are distributive, so ANY split of the corpus merges
    // to the same histogram). Publish char-splits the merged vocab
    // once and runs the SAME bpeTrainFromVocab loop as batch p196 —
    // merge rules and frequencies must match verbatim. This is how a
    // production tokenizer trains over a streaming corpus: the heavy
    // corpus pass amortizes per batch, the merge rounds run once at
    // publish on the compact vocab.
    QueryDef("s51_stream_bpe",
        Pipeline.bpeTrainOracleSql(10)) { (s, dir) =>
      val docs = graft.Tables.load(s, dir, "documents")
        .select("doc_id", "text")
      val base = java.nio.file.Paths.get(
        sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft_fmt").toString
      val srcDir = s"$base/s51_stream_src"
      val histRoot = s"$base/s51_hist"
      Seq(srcDir, histRoot).foreach(d => rmTree(new java.io.File(d)))
      new java.io.File(srcDir).mkdirs()
      writeSplitSingle(docs,
        pmod(xxhash64(col("doc_id")), lit(4L)), 4, srcDir)
      val schema = s.read.parquet(srcDir).schema
      withStreamShuffle(s, srcDir) {
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "*.parquet")
        .parquet(srcDir)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame,
            batchId: Long) =>
          batch.select(explode(graft.pipeline.TextAnalysis.tokens(
              lower(col("text")))).as("w"))
            .groupBy("w").agg(count(lit(1)).as("cnt"))
            .coalesce(1).write.mode("overwrite")
            .parquet(s"$histRoot/b_$batchId")
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination() }
      val vocab = s.read.option("recursiveFileLookup", "true")
        .parquet(histRoot)
        .groupBy("w").agg(sum("cnt").as("cnt"))
        .select(graft.pipeline.TextAnalysis.bpeSeqOf(col("w")).as("seq"),
          col("cnt"))
      graft.pipeline.TextAnalysis.bpeTrainFromVocab(vocab, 10)
    },

    // Streaming BPE train + encode (p198 live): the carried state adds
    // the doc key to s51's histogram — per-batch (doc_id, w, n) token
    // counts, merged by sum (the corpus-sized-but-compact state every
    // perceptual mirror also carries per doc). Publish trains on the
    // doc-collapsed histogram (Σ over docs == s51's vocab exactly) and
    // encodes by broadcasting the trained vocab against the SAME
    // carried counts — no re-read of the raw corpus at publish, and
    // the per-doc (n_words, n_bpe) readout must equal batch p198
    // verbatim.
    QueryDef("s52_stream_bpe_encode",
        Pipeline.bpeEncodeOracleSql(10)) { (s, dir) =>
      val docs = graft.Tables.load(s, dir, "documents")
        .select("doc_id", "text")
      val base = java.nio.file.Paths.get(
        sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft_fmt").toString
      val srcDir = s"$base/s52_stream_src"
      val histRoot = s"$base/s52_hist"
      Seq(srcDir, histRoot).foreach(d => rmTree(new java.io.File(d)))
      new java.io.File(srcDir).mkdirs()
      writeSplitSingle(docs,
        pmod(xxhash64(col("doc_id")), lit(4L)), 4, srcDir)
      val schema = s.read.parquet(srcDir).schema
      withStreamShuffle(s, srcDir) {
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "*.parquet")
        .parquet(srcDir)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame,
            batchId: Long) =>
          batch.select(col("doc_id"),
              explode(graft.pipeline.TextAnalysis.tokens(
                lower(col("text")))).as("w"))
            .groupBy("doc_id", "w").agg(count(lit(1)).as("n"))
            .coalesce(1).write.mode("overwrite")
            .parquet(s"$histRoot/b_$batchId")
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination() }
      val state = s.read.option("recursiveFileLookup", "true")
        .parquet(histRoot)
        .groupBy("doc_id", "w").agg(sum("n").as("n"))
      val vocab0 = state.groupBy("w").agg(sum("n").as("cnt"))
        .select(col("w"),
          graft.pipeline.TextAnalysis.bpeSeqOf(col("w")).as("seq"),
          col("cnt"))
      val vocabN = graft.pipeline.TextAnalysis
        .bpeFinalVocab(vocab0, 10)
      state.join(
          broadcast(vocabN.select(col("w"),
            size(split(col("seq"), " ")).as("len"))),
          Seq("w"))
        .groupBy("doc_id")
        .agg(sum("n").as("n_words"),
          sum(col("n") * col("len")).as("n_bpe"))
        .filter(col("doc_id") % 23 === 0)
        .orderBy("doc_id")
    },

    // Streaming audio snippet containment (p200 live): recordings AND
    // snippets arrive interleaved; each batch decodes its own payloads
    // once — recordings demux to 4 windowed AudioHash64 signatures
    // under packed sub-ids (id·16 + w), snippets to one signature
    // under id·16 + 15 — and persists only the (sub-id, sig) longs
    // (pure append merge; a recording's windows come from one row).
    // Publish = the shared frameGrabPairsFromSigs collapse == batch
    // p200 verbatim, with snippet and source recording usually in
    // different batches under the xxhash64 split.
    QueryDef("s54_stream_audio_snippet",
      """SELECT doc_id AS rec_id, doc_id + 1000000 AS snippet_id,
        |  true AS found
        |FROM documents WHERE doc_id % 4 = 0
        |ORDER BY rec_id""".stripMargin) { (s, dir) =>
      val (sel, recs, snips) = Planted.audioSnippetCorpus(s, dir)
      val base = java.nio.file.Paths.get(
        sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft_fmt").toString
      val srcDir = s"$base/s54_stream_src"
      val sigRoot = s"$base/s54_sigs"
      val mediaDir = s"$base/s54_media"
      Seq(srcDir, sigRoot, mediaDir)
        .foreach(d => rmTree(new java.io.File(d)))
      new java.io.File(srcDir).mkdirs()
      // wide-binary WRITES have the same contiguous-buffer hazard as
      // the reads: 32 concurrent writers × a default 128 MB row group
      // of ~42 KB recordings OOM'd the 8 GB heap at the 100× sweep —
      // an 8 MB row group bounds the staging buffers at ~256 MB
      recs.withColumn("kind", lit("rec"))
        .unionAll(snips.withColumn("kind", lit("snip")))
        .write.option("parquet.block.size", s"${8 * 1024 * 1024}")
        .mode("overwrite").parquet(mediaDir)
      val batchKey = "spark.sql.parquet.columnarReaderBatchSize"
      val prevBatchSize = s.conf.get(batchKey, "4096")
      s.conf.set(batchKey, "256")
      try {
        val staged = s.read.parquet(mediaDir)
        writeSplitSingle(staged,
          pmod(xxhash64(col("doc_id")), lit(4L)), 4, srcDir)
        val schema = s.read.parquet(srcDir).schema
        withStreamShuffle(s, srcDir) {
        val q = s.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1")
          .option("pathGlobFilter", "*.parquet")
          .parquet(srcDir)
          .writeStream
          .foreachBatch { (batch: org.apache.spark.sql.DataFrame,
              batchId: Long) =>
            // hopDiv=2 mirrors the batch operator's sliding default
            // (p200/p202) — the streaming ingest must compute the SAME
            // window signatures the batch path would
            val fanned = graft.streaming.Streams.fanOutBatch(batch)
            val winSigs = graft.pipeline.Dedup.audioWindowSigs(
              fanned.filter(col("kind") === "rec"), "doc_id", "media", 4,
              hopDiv = 2)
            val snipSigs = graft.pipeline.Dedup.audioSnippetSigs(
              fanned.filter(col("kind") === "snip"), "doc_id", "media")
            // repartition(1), NOT coalesce(1) — the s47 note
            winSigs.unionAll(snipSigs)
              .repartition(1).write.mode("overwrite")
              .parquet(s"$sigRoot/b_$batchId")
            ()
          }
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination() }
      } finally s.conf.set(batchKey, prevBatchSize)
      val sigs = s.read.option("recursiveFileLookup", "true")
        .parquet(sigRoot)
      val pairs = graft.pipeline.Dedup.frameGrabPairsFromSigs(sigs,
        maxHamming = 6, multiIndex = 3)
        .select(col("image_id").as("snippet_id"),
          col("clip_id").as("rec_id"), col("hamming"))
      sel.select(col("doc_id").as("rec_id"),
          (col("doc_id") + 1000000L).as("snippet_id"))
        .join(pairs, Seq("snippet_id", "rec_id"), "left")
        .select(col("rec_id"), col("snippet_id"),
          col("hamming").isNotNull.as("found"))
        .orderBy("rec_id")
    },

    // Streaming incremental view maintenance (x46 live): the CDC
    // changelog arrives as signed micro-batches (+1 inserts, −1
    // deletes carrying the old row) and the carried state IS the
    // maintained view — one (event_type, n_rows, sum_user) row per
    // key, merged per batch by signed sums. Crucially the zero-count
    // drop does NOT run mid-stream: a delete batch may process before
    // the batch that inserted its rows (retraction before arrival),
    // leaving legitimate NEGATIVE intermediate counts that a mid-
    // stream n>0 filter would destroy; cancellation is exact, so the
    // filter is sound only at publish. Publish == the full recompute
    // over the reconstructed table, verbatim.
    QueryDef("s53_stream_ivm",
      """WITH ins AS (SELECT event_id + 1000000000000 AS event_id,
        |    user_id, event_type FROM events WHERE event_id % 3 = 0),
        |del AS (SELECT event_id FROM events WHERE event_id % 7 = 0),
        |t1 AS (SELECT event_id, user_id, event_type FROM events
        |  UNION ALL SELECT * FROM ins),
        |t2 AS (SELECT * FROM t1 WHERE event_id NOT IN
        |  (SELECT event_id FROM del))
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(user_id) AS BIGINT) AS sum_user
        |FROM t2 GROUP BY 1 ORDER BY 1""".stripMargin) { (s, dir) =>
      val events = graft.Tables.load(s, dir, "events")
        .select("event_id", "user_id", "event_type")
      val base = java.nio.file.Paths.get(
        sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft_fmt").toString
      val srcDir = s"$base/s53_stream_src"
      val viewRoot = s"$base/s53_view"
      Seq(srcDir, viewRoot).foreach(d => rmTree(new java.io.File(d)))
      new java.io.File(srcDir).mkdirs()
      // the changelog: base rows as three insert batches, then the
      // insert commit, then the delete commit (old rows, sign −1)
      writeSplitSingle(events.withColumn("sign", lit(1)),
        pmod(xxhash64(col("event_id")), lit(3L)), 3, srcDir)
      writeSingle(
        events.filter(col("event_id") % 3 === 0)
          .select((col("event_id") + 1000000000000L).as("event_id"),
            col("user_id"), col("event_type"))
          .withColumn("sign", lit(1)),
        srcDir, "batch_3")
      writeSingle(
        events.filter(col("event_id") % 7 === 0)
          .withColumn("sign", lit(-1)),
        srcDir, "batch_4")
      // seed an EMPTY v0 so generations key off the framework batchId
      // (the s39/s13 discipline): a retried micro-batch re-reads
      // v(batchId) and OVERWRITES its own v(batchId+1) — a listing-
      // derived counter would see the half-committed v(g+1) as current
      // and apply the signed delta twice (or merge against a partial
      // write left by a crash mid-write)
      events.limit(0).groupBy("event_type")
        .agg(sum("user_id").cast("long").as("n_rows"),
          sum("user_id").cast("long").as("sum_user"))
        .coalesce(1).write.mode("overwrite").parquet(s"$viewRoot/v0")
      val schema = s.read.parquet(srcDir).schema
      withStreamShuffle(s, srcDir) {
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "*.parquet")
        .parquet(srcDir)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame,
            batchId: Long) =>
          val deltaView = batch.groupBy("event_type")
            .agg(sum("sign").cast("long").as("n_rows"),
              sum(col("user_id") * col("sign")).cast("long")
                .as("sum_user"))
          val merged = deltaView.unionAll(
              s.read.parquet(s"$viewRoot/v$batchId"))
            .groupBy("event_type")
            .agg(sum("n_rows").cast("long").as("n_rows"),
              sum("sum_user").cast("long").as("sum_user"))
          merged.coalesce(1).write.mode("overwrite")
            .parquet(s"$viewRoot/v${batchId + 1}")
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination() }
      s.read.parquet(s"$viewRoot/v${latestGen(viewRoot)}")
        .filter(col("n_rows") > 0)
        .orderBy("event_type")
    },

    // Streaming split-conformal calibration (p177 live): the carried
    // state is a per-batch (n_chars value, split flag, count) HISTOGRAM
    // — counts merge by sum, and every publish-time quantity derives
    // from the merged histogram EXACTLY: the calibration mean from the
    // decimal Σ(x·c), the k-th smallest residual by weighted rank over
    // the ≤|distinct n_chars| histogram rows (the value at rank k under
    // (resid, id) order equals the value whose cumulative count first
    // reaches k — tiebreak ids reorder only EQUAL values), and coverage
    // by weighted count. No offline fit at all — unlike s41/s46 the
    // predictor (calibration mean) itself comes out of the merged
    // state, so the publish readout must equal batch p177 verbatim.
    // State is bounded by distinct document lengths, not corpus size.
    QueryDef("s45_stream_conformal",
      """WITH d AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS x,
        |    substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'c' AS cal
        |  FROM documents),
        |f AS (SELECT
        |    CAST(COALESCE(SUM(CASE WHEN cal THEN 1 ELSE 0 END), 0)
        |      AS BIGINT) AS n_cal,
        |    CAST(COALESCE(SUM(CASE WHEN NOT cal THEN 1 ELSE 0 END), 0)
        |      AS BIGINT) AS n_test,
        |    SUM(CASE WHEN cal THEN CAST(x AS HUGEINT) END) AS s_cal
        |  FROM d),
        |k AS (SELECT *,
        |    CASE WHEN n_cal > 0 THEN CAST(ceil(
        |      CAST(n_cal + 1 AS DOUBLE) * 0.9) AS BIGINT) END AS k_rank,
        |    CASE WHEN n_cal > 0 THEN CAST(s_cal AS DOUBLE) / n_cal
        |      END AS mean_cal
        |  FROM f),
        |r AS (SELECT d.doc_id, abs(CAST(d.x AS DOUBLE) - k.mean_cal)
        |      AS resid
        |  FROM d CROSS JOIN k WHERE d.cal),
        |rr AS (SELECT *, ROW_NUMBER() OVER (ORDER BY resid, doc_id)
        |      AS pos FROM r),
        |q AS (SELECT MAX(CASE WHEN rr.pos = k.k_rank THEN rr.resid
        |      END) AS q_hat
        |  FROM k LEFT JOIN rr ON true),
        |c AS (SELECT CAST(COALESCE(SUM(CASE WHEN
        |      abs(CAST(d.x AS DOUBLE) - k.mean_cal) <= q.q_hat
        |      THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_cov
        |  FROM d CROSS JOIN k CROSS JOIN q WHERE NOT d.cal)
        |SELECT k.n_cal, k.n_test, k.k_rank,
        |  round(q.q_hat, 6) AS q_hat,
        |  CASE WHEN q.q_hat IS NOT NULL THEN COALESCE(c.n_cov, 0)
        |    END AS n_covered,
        |  round(CASE WHEN q.q_hat IS NOT NULL AND k.n_test > 0 THEN
        |    CAST(COALESCE(c.n_cov, 0) AS DOUBLE) / k.n_test END, 6)
        |    AS coverage,
        |  q.q_hat IS NULL OR k.n_test = 0 AS guarded
        |FROM k CROSS JOIN q CROSS JOIN c""".stripMargin) { (s, dir) =>
      val docs = graft.Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("n_chars").cast("long").as("x"),
          (substring(md5(col("doc_id").cast("string")), 1, 1) < "c")
            .as("cal"))
      val base = java.nio.file.Paths.get(
        sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft_fmt").toString
      val srcDir = s"$base/s45_stream_src"
      val histRoot = s"$base/s45_hist"
      Seq(srcDir, histRoot).foreach(d => rmTree(new java.io.File(d)))
      new java.io.File(srcDir).mkdirs()
      writeSplitSingle(docs, col("doc_id") % 4, 4,
        srcDir)
      val schema = s.read.parquet(srcDir).schema
      withStreamShuffle(s, srcDir) {
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "*.parquet")
        .parquet(srcDir)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame,
            batchId: Long) =>
          batch.groupBy("x", "cal")
            .agg(count(lit(1)).cast("long").as("c"))
            .coalesce(1).write.mode("overwrite")
            .parquet(s"$histRoot/b_$batchId")
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination() }
      val hist = s.read.option("recursiveFileLookup", "true")
        .parquet(histRoot)
        .groupBy("x", "cal")
        .agg(sum("c").cast("long").as("c"))
      graft.operators.Pipeline.conformalFromHist(hist, alpha = 0.1)
    },

    // Streaming isotonic calibration (p179 live): the s41 shape —
    // model fit ONCE up front (offline training, online scoring), each
    // micro-batch persists its (bin, n, pos) partials, which merge by
    // sum into exactly the bounded ≤100-row bin table the batch
    // minimax PAV consumes — so the publish-time fit must equal the
    // batch p179 oracle verbatim. State: ≤nBins rows per batch.
    QueryDef("s46_stream_isotonic",
      """WITH f AS (
        |  SELECT CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
        |    1.0 AS x0,
        |    ln(1.0 + CAST(nt AS DOUBLE)) AS x1,
        |    CAST(length(text) AS DOUBLE) / CAST(nt AS DOUBLE) AS x2
        |  FROM (SELECT lang, text, CASE
        |      WHEN length(regexp_replace(text, '^\s+|\s+$', '', 'g'))
        |        = 0 THEN 0
        |      ELSE len(string_split_regex(
        |        regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+'))
        |      END AS nt
        |    FROM documents)
        |  WHERE nt > 0),
        |n AS (SELECT count(*) AS m FROM f),
        |ws0 AS (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2),
        |g1 AS (SELECT
        |    CAST(sum(CAST((1.0/(1.0+exp(-(w0*x0+w1*x1+w2*x2))) - y)*x0
        |      AS DECIMAL(28,12))) AS DOUBLE) AS g0,
        |    CAST(sum(CAST((1.0/(1.0+exp(-(w0*x0+w1*x1+w2*x2))) - y)*x1
        |      AS DECIMAL(28,12))) AS DOUBLE) AS g1,
        |    CAST(sum(CAST((1.0/(1.0+exp(-(w0*x0+w1*x1+w2*x2))) - y)*x2
        |      AS DECIMAL(28,12))) AS DOUBLE) AS g2
        |  FROM f CROSS JOIN ws0),
        |ws1 AS (SELECT w0 - 1.0*(g0/CAST(m AS DOUBLE)) AS w0,
        |    w1 - 1.0*(g1/CAST(m AS DOUBLE)) AS w1,
        |    w2 - 1.0*(g2/CAST(m AS DOUBLE)) AS w2
        |  FROM g1 CROSS JOIN ws0 CROSS JOIN n),
        |sc AS (SELECT CAST(y AS BIGINT) AS yl,
        |    round(1.0/(1.0+exp(-(w0*x0+w1*x1+w2*x2))), 6) AS p
        |  FROM f CROSS JOIN ws1),
        |b AS (SELECT CAST(least(floor(p * 100), 99) AS BIGINT)
        |    AS bin, yl FROM sc),
        |g AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(COALESCE(SUM(yl), 0) AS BIGINT) AS pos
        |  FROM b GROUP BY 1),
        |pr AS (SELECT *, COALESCE(SUM(n) OVER (ORDER BY bin ROWS
        |      BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS pre_n,
        |    COALESCE(SUM(pos) OVER (ORDER BY bin ROWS BETWEEN
        |      UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pre_pos
        |  FROM g),
        |cu AS (SELECT *, pre_n + n AS cum_n, pre_pos + pos AS cum_pos
        |  FROM pr),
        |sp AS (SELECT j.bin AS j, k.bin AS k,
        |    CASE WHEN k.cum_n - j.pre_n > 0 THEN
        |      CAST(k.cum_pos - j.pre_pos AS DOUBLE) /
        |      (k.cum_n - j.pre_n) END AS rate
        |  FROM cu j JOIN cu k ON j.bin <= k.bin),
        |mm AS (SELECT i.bin, i.n, i.pos, sp.j, MIN(sp.rate) AS mnr
        |  FROM cu i JOIN sp ON sp.j <= i.bin AND i.bin <= sp.k
        |  GROUP BY 1, 2, 3, 4),
        |ff AS (SELECT bin, n, pos, MAX(mnr) AS fitted
        |  FROM mm GROUP BY 1, 2, 3)
        |SELECT bin, n, pos,
        |  round(CASE WHEN n > 0 THEN CAST(pos AS DOUBLE) / n END, 6)
        |    AS raw_rate,
        |  round(fitted, 6) AS fitted_rate
        |FROM ff ORDER BY 1""".stripMargin) { (s, dir) =>
      import graft.pipeline.TextAnalysis
      val docs = graft.Tables.load(s, dir, "documents")
        .select("doc_id", "lang", "text")
      // steps=1: the published model the batch p179 gate calibrates
      val (_, w) = TextAnalysis.logregFit(docs, steps = 1, lr = 1.0,
        posLang = "en", langCol = "lang", textCol = "text")
      val base = java.nio.file.Paths.get(
        sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft_fmt").toString
      val srcDir = s"$base/s46_stream_src"
      val binRoot = s"$base/s46_bins"
      Seq(srcDir, binRoot).foreach(d => rmTree(new java.io.File(d)))
      new java.io.File(srcDir).mkdirs()
      writeSplitSingle(docs, col("doc_id") % 4, 4,
        srcDir)
      val schema = s.read.parquet(srcDir).schema
      withStreamShuffle(s, srcDir) {
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "*.parquet")
        .parquet(srcDir)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame,
            batchId: Long) =>
          TextAnalysis.logregScore(batch, w)
            .select(least(floor(col("p") * 100), lit(99L))
              .cast("long").as("bin"), col("yl"))
            .groupBy("bin")
            .agg(count(lit(1)).cast("long").as("n"),
              coalesce(sum(col("yl")), lit(0L)).cast("long").as("pos"))
            .coalesce(1).write.mode("overwrite")
            .parquet(s"$binRoot/b_$batchId")
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination() }
      val merged = s.read.option("recursiveFileLookup", "true")
        .parquet(binRoot)
        .groupBy("bin")
        .agg(sum("n").cast("long").as("n"),
          sum("pos").cast("long").as("pos"))
      TextAnalysis.pavFit(merged)
    },

    // Streaming stratified sample (p166 over continuous ingest): each
    // micro-batch persists (a) its per-stratum counts — they merge by
    // sum — and (b) its per-stratum k-lowest-(draw, id) candidates via
    // the two-phase stratumTopK, the min-k merge property (a union of
    // per-batch top-k contains every member of the global top-k, the
    // s30 reservoir argument applied per stratum). Publish time runs
    // the EXACT largest-remainder allocation over the merged counts
    // and ranks the merged candidates — so the report must equal the
    // batch p166 oracle verbatim. State is bounded: |strata| count
    // rows + |strata|·k candidate rows per batch; the corpus is never
    // re-read. Retry-idempotent: both state writes OVERWRITE
    // batchId-keyed paths (the s39 discipline).
    QueryDef("s40_stream_stratified",
      """WITH c AS (SELECT source AS s, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM documents GROUP BY 1),
        |t AS (SELECT CAST(SUM(c) AS BIGINT) AS tc FROM c),
        |b AS (SELECT s, c, 200 * c // tc AS b, 200 * c % tc AS r
        |  FROM c, t),
        |a AS (SELECT s, c, b, r,
        |    CASE WHEN ROW_NUMBER() OVER (ORDER BY r DESC, s)
        |      <= 200 - (SELECT SUM(b) FROM b) THEN 1 ELSE 0 END AS extra
        |  FROM b),
        |al AS (SELECT s AS source,
        |    CAST(LEAST(b + extra, c) AS BIGINT) AS n_alloc FROM a),
        |d AS (SELECT source, doc_id,
        |    md5('strat:' || CAST(doc_id AS VARCHAR)) AS draw
        |  FROM documents),
        |rk AS (SELECT source, doc_id,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY source
        |      ORDER BY draw, doc_id) AS BIGINT) AS rank_in_stratum
        |  FROM d)
        |SELECT rk.source, rk.doc_id, rk.rank_in_stratum, al.n_alloc
        |FROM rk JOIN al USING (source)
        |WHERE rk.rank_in_stratum <= al.n_alloc
        |ORDER BY 1, 3""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      import graft.pipeline.Corpus
      val docs = graft.Tables.load(s, dir, "documents")
        .select("doc_id", "source")
      val base = java.nio.file.Paths.get(
        sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft_fmt").toString
      val srcDir = s"$base/s40_stream_src"
      val cntRoot = s"$base/s40_counts"
      val candRoot = s"$base/s40_cands"
      Seq(srcDir, cntRoot, candRoot)
        .foreach(d => rmTree(new java.io.File(d)))
      new java.io.File(srcDir).mkdirs()
      writeSplitSingle(docs, col("doc_id") % 4, 4,
        srcDir)
      val schema = s.read.parquet(srcDir).schema
      withStreamShuffle(s, srcDir) {
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "*.parquet")
        .parquet(srcDir)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame,
            batchId: Long) =>
          batch.groupBy("source")
            .agg(count(lit(1)).cast("long").as("n"))
            .coalesce(1).write.mode("overwrite")
            .parquet(s"$cntRoot/b_$batchId")
          Corpus.stratumTopK(batch, 200L)
            .coalesce(1).write.mode("overwrite")
            .parquet(s"$candRoot/b_$batchId")
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination() }
      // recursiveFileLookup instead of b_* globs: see the s39 note
      val counts = s.read.option("recursiveFileLookup", "true")
        .parquet(cntRoot)
        .groupBy(col("source").as("s"))
        .agg(sum("n").cast("long").as("c"))
      val alloc = Corpus.allocFromCounts(counts, 200L, "source")
      // the stratum-keyed window here ranks the MERGED CANDIDATE
      // state (≤ batches·|strata|·k rows by construction), not the
      // corpus — the boundedness that makes a plain window safe
      val w = Window.partitionBy("source").orderBy("draw", "doc_id")
      s.read.option("recursiveFileLookup", "true").parquet(candRoot)
        .withColumn("rk2", row_number().over(w).cast("long"))
        .join(broadcast(alloc), Seq("source"))
        .filter(col("rk2") <= col("n_alloc"))
        .select(col("source"), col("doc_id"),
          col("rk2").as("rank_in_stratum"), col("n_alloc"))
        .orderBy("source", "rank_in_stratum")
    },

    // Streaming model evaluation (p169's AUC over continuous ingest):
    // an OFFLINE-trained model (the 3-step GD fit, published once)
    // scores each ingest micro-batch; the carried state is the
    // per-batch (score, count, positives) HISTOGRAM partial — exact
    // under any split because histogram counts merge by sum — and the
    // publish-time readout flows through the batch gate's identical
    // midrank rank arithmetic (midrankAucFromCounts), so the streamed
    // AUC must equal p169's scenario-1 row verbatim. At 100 TB: state
    // is |distinct 6-decimal scores| rows per batch (≤ 10^6+1 by
    // construction), the corpus is never re-read, and no single task
    // ever holds more than a range partition of the score histogram.
    // Retry-idempotent: batchId-keyed overwrite paths (s39 discipline).
    QueryDef("s41_stream_auc",
      """WITH f AS (
        |  SELECT CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
        |    1.0 AS x0,
        |    ln(1.0 + CAST(nt AS DOUBLE)) AS x1,
        |    CAST(length(text) AS DOUBLE) / CAST(nt AS DOUBLE) AS x2
        |  FROM (SELECT lang, text, CASE
        |      WHEN length(regexp_replace(text, '^\s+|\s+$', '', 'g')) = 0
        |      THEN 0
        |      ELSE len(string_split_regex(
        |        regexp_replace(text, '^\s+|\s+$', '', 'g'), '\s+'))
        |      END AS nt
        |    FROM documents)
        |  WHERE nt > 0),
        |n AS (SELECT count(*) AS m FROM f),
        |ws0 AS (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2),
        |g1 AS (SELECT
        |    CAST(sum(CAST((1.0/(1.0+exp(-(w0*x0+w1*x1+w2*x2))) - y)*x0
        |      AS DECIMAL(28,12))) AS DOUBLE) AS g0,
        |    CAST(sum(CAST((1.0/(1.0+exp(-(w0*x0+w1*x1+w2*x2))) - y)*x1
        |      AS DECIMAL(28,12))) AS DOUBLE) AS g1,
        |    CAST(sum(CAST((1.0/(1.0+exp(-(w0*x0+w1*x1+w2*x2))) - y)*x2
        |      AS DECIMAL(28,12))) AS DOUBLE) AS g2
        |  FROM f CROSS JOIN ws0),
        |ws1 AS (SELECT w0 - 1.0*(g0/CAST(m AS DOUBLE)) AS w0,
        |    w1 - 1.0*(g1/CAST(m AS DOUBLE)) AS w1,
        |    w2 - 1.0*(g2/CAST(m AS DOUBLE)) AS w2
        |  FROM g1 CROSS JOIN ws0 CROSS JOIN n),
        |g2 AS (SELECT
        |    CAST(sum(CAST((1.0/(1.0+exp(-(w0*x0+w1*x1+w2*x2))) - y)*x0
        |      AS DECIMAL(28,12))) AS DOUBLE) AS g0,
        |    CAST(sum(CAST((1.0/(1.0+exp(-(w0*x0+w1*x1+w2*x2))) - y)*x1
        |      AS DECIMAL(28,12))) AS DOUBLE) AS g1,
        |    CAST(sum(CAST((1.0/(1.0+exp(-(w0*x0+w1*x1+w2*x2))) - y)*x2
        |      AS DECIMAL(28,12))) AS DOUBLE) AS g2
        |  FROM f CROSS JOIN ws1),
        |ws2 AS (SELECT w0 - 1.0*(g0/CAST(m AS DOUBLE)) AS w0,
        |    w1 - 1.0*(g1/CAST(m AS DOUBLE)) AS w1,
        |    w2 - 1.0*(g2/CAST(m AS DOUBLE)) AS w2
        |  FROM g2 CROSS JOIN ws1 CROSS JOIN n),
        |g3 AS (SELECT
        |    CAST(sum(CAST((1.0/(1.0+exp(-(w0*x0+w1*x1+w2*x2))) - y)*x0
        |      AS DECIMAL(28,12))) AS DOUBLE) AS g0,
        |    CAST(sum(CAST((1.0/(1.0+exp(-(w0*x0+w1*x1+w2*x2))) - y)*x1
        |      AS DECIMAL(28,12))) AS DOUBLE) AS g1,
        |    CAST(sum(CAST((1.0/(1.0+exp(-(w0*x0+w1*x1+w2*x2))) - y)*x2
        |      AS DECIMAL(28,12))) AS DOUBLE) AS g2
        |  FROM f CROSS JOIN ws2),
        |ws3 AS (SELECT w0 - 1.0*(g0/CAST(m AS DOUBLE)) AS w0,
        |    w1 - 1.0*(g1/CAST(m AS DOUBLE)) AS w1,
        |    w2 - 1.0*(g2/CAST(m AS DOUBLE)) AS w2
        |  FROM g3 CROSS JOIN ws2 CROSS JOIN n),
        |sc AS (SELECT CAST(y AS BIGINT) AS yl,
        |    round(1.0/(1.0+exp(-(w0*x0+w1*x1+w2*x2))), 6) AS p
        |  FROM f CROSS JOIN ws3),
        |g AS (SELECT p, CAST(count(*) AS BIGINT) AS c,
        |    CAST(sum(yl) AS BIGINT) AS np
        |  FROM sc GROUP BY 1),
        |o AS (SELECT p, c, np,
        |    CAST(COALESCE(SUM(c) OVER (ORDER BY p
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS BIGINT) AS below
        |  FROM g),
        |tt AS (SELECT
        |    COALESCE(SUM(CAST(np AS DECIMAL(18,0)) *
        |      CAST(below*2 + c + 1 AS DECIMAL(18,0))),
        |      CAST(0 AS DECIMAL(18,0))) AS r2,
        |    CAST(COALESCE(SUM(np), 0) AS DECIMAL(18,0)) AS npos,
        |    CAST(COALESCE(SUM(c - np), 0) AS DECIMAL(18,0)) AS nneg
        |  FROM o)
        |SELECT round(CASE WHEN npos > 0 AND nneg > 0 THEN
        |    CAST(r2 - npos*(npos+1) AS DOUBLE) /
        |    CAST(npos*nneg*2 AS DOUBLE) END, 6) AS auc,
        |  CAST(npos AS BIGINT) AS n_pos,
        |  CAST(nneg AS BIGINT) AS n_neg,
        |  NOT (npos > 0 AND nneg > 0) AS guarded
        |FROM tt""".stripMargin) { (s, dir) =>
      import graft.pipeline.TextAnalysis
      val docs = graft.Tables.load(s, dir, "documents")
        .select("doc_id", "lang", "text")
      // the model is fit ONCE up front (offline training, online
      // scoring — an evaluation stream consumes a published model)
      val (_, w) = TextAnalysis.logregFit(docs, steps = 3, lr = 1.0,
        posLang = "en", langCol = "lang", textCol = "text")
      val base = java.nio.file.Paths.get(
        sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft_fmt").toString
      val srcDir = s"$base/s41_stream_src"
      val cntRoot = s"$base/s41_hist"
      Seq(srcDir, cntRoot).foreach(d => rmTree(new java.io.File(d)))
      new java.io.File(srcDir).mkdirs()
      writeSplitSingle(docs, col("doc_id") % 4, 4,
        srcDir)
      val schema = s.read.parquet(srcDir).schema
      withStreamShuffle(s, srcDir) {
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "*.parquet")
        .parquet(srcDir)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame,
            batchId: Long) =>
          TextAnalysis.logregScore(batch, w)
            .groupBy("p")
            .agg(count(lit(1)).cast("long").as("c"),
              sum(col("yl")).cast("long").as("np"))
            .coalesce(1).write.mode("overwrite")
            .parquet(s"$cntRoot/b_$batchId")
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination() }
      val merged = s.read.option("recursiveFileLookup", "true")
        .parquet(cntRoot)
        .groupBy("p")
        .agg(sum("c").cast("long").as("c"),
          sum("np").cast("long").as("np"))
      TextAnalysis.midrankAucFromCounts(merged)
    },

    // Streaming retention curve (p176's Kaplan–Meier over continuous
    // ingest): batches split by EVENT (event_id % 4), so a user's
    // first and last events land in different micro-batches and the
    // carried state — one (user, min ts, max ts) row per user touched
    // per batch — must genuinely merge by min/max (associative AND
    // idempotent, so a replayed batch cannot corrupt it; paths are
    // batchId-keyed overwrites on top, the s39 discipline). The
    // publish-time readout reconstructs the two-event-per-user stream
    // from merged state and runs the BATCH operator verbatim — the
    // estimator only ever consumes per-user (first, last), so the
    // streamed curve must equal p176's oracle row for row. At 100 TB:
    // state is ≤1 row per active user per batch, the corpus is never
    // re-read, and the readout inherits p176's hour-span-bounded shape.
    // oracle = the batch gate's string, SHARED (one definition — the
    // "stream equals batch verbatim" contract cannot drift)
    QueryDef("s42_stream_survival",
      graft.operators.Pipeline.kmOracleSql) { (s, dir) =>
      val ev = graft.Tables.load(s, dir, "events")
        .select("event_id", "user_id", "ts")
      val base = java.nio.file.Paths.get(
        sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft_fmt").toString
      val srcDir = s"$base/s42_stream_src"
      val stateRoot = s"$base/s42_spans"
      Seq(srcDir, stateRoot).foreach(d => rmTree(new java.io.File(d)))
      new java.io.File(srcDir).mkdirs()
      writeSplitSingle(ev, col("event_id") % 4, 4,
        srcDir)
      val schema = s.read.parquet(srcDir).schema
      withStreamShuffle(s, srcDir) {
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "*.parquet")
        .parquet(srcDir)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame,
            batchId: Long) =>
          batch.groupBy("user_id")
            .agg(min(unix_micros(col("ts"))).cast("long").as("fw"),
              max(unix_micros(col("ts"))).cast("long").as("lw"))
            .coalesce(1).write.mode("overwrite")
            .parquet(s"$stateRoot/b_$batchId")
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination() }
      val merged = s.read.option("recursiveFileLookup", "true")
        .parquet(stateRoot)
        .groupBy("user_id")
        .agg(min("fw").cast("long").as("fw"),
          max("lw").cast("long").as("lw"))
      val twoEv = merged.select(col("user_id"), col("fw").as("us"))
        .unionAll(merged.select(col("user_id"), col("lw").as("us")))
        .select(col("user_id"), timestamp_micros(col("us")).as("ts"))
      graft.operators.Pipeline.kaplanMeier(twoEv)
    },

    // Streaming log-rank (p180 live, the r12 task the r13 verdict
    // carried): the retention A/B readout maintained over continuous
    // ingest. Batches split by EVENT, so a user's lifetime spans
    // micro-batches; the carried state is per-batch (user, min ts,
    // max ts) partials — the s42 shape, min/max-merge associative AND
    // idempotent (a replayed partial cannot move either bound), under
    // batchId-keyed overwrite paths (the s39 discipline; the s42 seam
    // spec proves this exact state's split-merge invariance). Publish
    // reconstructs each user's two boundary events from the merged
    // state and runs the BATCH Pipeline.logRank on them verbatim —
    // first/last collapse, broadcast corpus max, censor cut, E/V
    // decimal-pinned terms all shared, so publish == p180's real
    // scenario by construction. At 100 TB: state is one narrow row
    // per user, events are never re-read, the readout is a
    // duration-bounded aggregate + scalar.
    QueryDef("s55_stream_log_rank",
      graft.operators.Pipeline.logRankOracleSql) { (s, dir) =>
      val ev = graft.Tables.load(s, dir, "events")
        .select("event_id", "user_id", "ts")
      val base = java.nio.file.Paths.get(
        sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft_fmt").toString
      val srcDir = s"$base/s55_stream_src"
      val stateRoot = s"$base/s55_spans"
      Seq(srcDir, stateRoot).foreach(d => rmTree(new java.io.File(d)))
      new java.io.File(srcDir).mkdirs()
      writeSplitSingle(ev, col("event_id") % 4, 4,
        srcDir)
      val schema = s.read.parquet(srcDir).schema
      withStreamShuffle(s, srcDir) {
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "*.parquet")
        .parquet(srcDir)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame,
            batchId: Long) =>
          batch.groupBy("user_id")
            .agg(min(unix_micros(col("ts"))).cast("long").as("fw"),
              max(unix_micros(col("ts"))).cast("long").as("lw"))
            .coalesce(1).write.mode("overwrite")
            .parquet(s"$stateRoot/b_$batchId")
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination() }
      val merged = s.read.option("recursiveFileLookup", "true")
        .parquet(stateRoot)
        .groupBy("user_id")
        .agg(min("fw").cast("long").as("fw"),
          max("lw").cast("long").as("lw"))
      val twoEv = merged.select(col("user_id"), col("fw").as("us"))
        .unionAll(merged.select(col("user_id"), col("lw").as("us")))
        .select(col("user_id"), timestamp_micros(col("us")).as("ts"))
      graft.operators.Pipeline.logRank(twoEv)
    },

    // Live sample-ratio-mismatch monitor (p185's guardrail over
    // continuous ingest — production SRM runs DURING the ramp, not
    // after): batches split by EVENT, so a user recurs across
    // micro-batches; the carried state is each batch's DISTINCT
    // user set (bounded by users touched per batch), merged by
    // distinct-union — associative AND idempotent, so a replayed
    // batch partial cannot inflate either arm (plus batchId-keyed
    // overwrite paths, the s39 discipline). Publish runs the batch
    // srmCheck over the merged population — equal to p185's healthy
    // scenario verbatim. At 100 TB: state is user-id rows only, the
    // events are never re-read, the readout is one scalar aggregate.
    QueryDef("s43_stream_srm",
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |m AS (SELECT
        |    CAST(COALESCE(SUM(CASE WHEN
        |      substring(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8'
        |      THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_a,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM u),
        |e AS (SELECT *, CAST(n AS DOUBLE) * 0.5 AS ea,
        |    CAST(n AS DOUBLE) * 0.5 AS eb,
        |    CAST(n_a AS DOUBLE) AS nad,
        |    CAST(n - n_a AS DOUBLE) AS nbd FROM m),
        |f AS (SELECT *, CASE WHEN n > 0 THEN
        |    (nad - ea) * (nad - ea) / ea +
        |    (nbd - eb) * (nbd - eb) / eb END AS chi FROM e)
        |SELECT n_a, CAST(n - n_a AS BIGINT) AS n_b,
        |  round(0.5, 6) AS expected_a,
        |  round(chi, 6) AS chi_sq,
        |  COALESCE(chi > 10.827566170662733, FALSE) AS srm_detected,
        |  COALESCE(NOT (n > 0), TRUE) AS guarded
        |FROM f""".stripMargin) { (s, dir) =>
      val ev = graft.Tables.load(s, dir, "events")
        .select("event_id", "user_id")
      val base = java.nio.file.Paths.get(
        sys.props.getOrElse("java.io.tmpdir", "/tmp"), "graft_fmt").toString
      val srcDir = s"$base/s43_stream_src"
      val stateRoot = s"$base/s43_users"
      Seq(srcDir, stateRoot).foreach(d => rmTree(new java.io.File(d)))
      new java.io.File(srcDir).mkdirs()
      writeSplitSingle(ev, col("event_id") % 4, 4,
        srcDir)
      val schema = s.read.parquet(srcDir).schema
      withStreamShuffle(s, srcDir) {
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .option("pathGlobFilter", "*.parquet")
        .parquet(srcDir)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame,
            batchId: Long) =>
          batch.select("user_id").distinct()
            .coalesce(1).write.mode("overwrite")
            .parquet(s"$stateRoot/b_$batchId")
          ()
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination() }
      val population = s.read.option("recursiveFileLookup", "true")
        .parquet(stateRoot).distinct()
      graft.operators.Pipeline.srmCheck(population, "8", 0.5)
    }
  )
}
