package graft.streaming

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming results must agree with their batch equivalents on the same
  * data — the file source replays the events table in one trigger, so the
  * incremental plans are checked against the batch plans exactly.
  */
class EventStreamsSpec extends AnyFunSuite {

  private val dir = "/root/testdata/sf0.001"

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("windowed counts match the batch daily rollup") {
    val q = EventStreams.windowedCounts(EventStreams.readEvents(spark, dir))
      .writeStream.format("memory").queryName("win_counts").outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("win_counts")
      .select(col("window.start").as("day"), col("event_type"), col("n"), col("total"))
    val batch = Tables.load(spark, dir, "events")
      .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(
      batch.select(col("day").cast("timestamp"), col("event_type"), col("n"), col("total"))).isEmpty)
  }

  test("stateful dedup keeps every distinct event_id") {
    val q = EventStreams.dedup(EventStreams.readEvents(spark, dir))
      .writeStream.format("memory").queryName("dedup_events").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val expected = Tables.load(spark, dir, "events").select("event_id").distinct().count()
    assert(spark.table("dedup_events").count() == expected)
  }

  test("document ingest dedup keeps one row per distinct content") {
    val q = EventStreams.dedupDocuments(EventStreams.readDocuments(spark, dir))
      .writeStream.format("memory").queryName("docs_dedup").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val expected = Tables.load(spark, dir, "documents").select("text").distinct().count()
    assert(spark.table("docs_dedup").count() == expected)
  }

  test("near-dup ingest dedup matches the batch single-band admission rule") {
    val q = EventStreams.nearDedupDocuments(EventStreams.readDocuments(spark, dir))
      .writeStream.format("memory").queryName("docs_near_dedup").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val admitted = spark.table("docs_near_dedup").select("doc_id").collect()
      .map(_.getLong(0)).toSet

    // batch replay of the same rule: per band-0 bucket, admit in doc_id
    // order unless within Hamming 3 of an already-admitted sketch
    graft.functions.GraftFunctions.register(spark)
    val sketched = Tables.load(spark, dir, "documents")
      .withColumn("sim", expr("simhash64(split(lower(text), '\\\\s+'))"))
      .select(col("doc_id"), col("sim"), expr("sim & 65535").as("bucket"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = sketched.groupBy(_._3).values.flatMap { group =>
      var kept = List.empty[Long]
      group.sortBy(_._1).flatMap { case (id, sim, _) =>
        if (kept.exists(s => java.lang.Long.bitCount(s ^ sim) <= 3)) None
        else { kept = sim :: kept; Some(id) }
      }
    }.toSet
    assert(admitted == expected)
    // near-dup admission is strictly at-most the exact-content dedup count
    val exactCount = Tables.load(spark, dir, "documents").select("text").distinct().count()
    assert(admitted.size <= exactCount)
  }

  test("stream-static join enriches events with the customer dimension") {
    val q = EventStreams.enriched(
      EventStreams.readEvents(spark, dir), Tables.load(spark, dir, "customer"))
      .writeStream.format("memory").queryName("enriched").outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("enriched")
    val batch = Tables.load(spark, dir, "events")
      .join(Tables.load(spark, dir, "customer")
        .select(col("c_custkey").as("user_id"), col("c_mktsegment").as("segment")),
        Seq("user_id"), "left")
      .groupBy(col("segment"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("total"))
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).isEmpty)
  }

  test("streaming ingest lands in the engine through the full INSERT pipeline") {
    import graft.engine.{Catalog, SqlContext, SqlEngine}
    val wh = java.nio.file.Files.createTempDirectory("graft-stream-wh-").toString
    val e = new SqlEngine(spark, new Catalog(wh), SqlContext("ing", "u"))
    e.execute("CREATE DATABASE ing")
    e.execute("CREATE TABLE landed (id bigserial PRIMARY KEY, doc_id bigint, digest text)")
    val stream = EventStreams.dedupDocuments(EventStreams.readDocuments(spark, dir))
      .select(col("doc_id"), sha2(col("text"), 256).as("digest"))
    val q = EventStreams.ingestInto(stream.select(col("doc_id"), col("digest")), e, "landed").start()
    try q.processAllAvailable() finally q.stop()
    val expected = Tables.load(spark, dir, "documents").select("text").distinct().count()
    val landed = e.execute("SELECT count(*) AS n, count(DISTINCT id) AS ids FROM landed").collect()(0)
    assert(landed.getLong(0) == expected, "every deduped doc must land exactly once")
    assert(landed.getLong(1) == expected, "serial ids assigned per-batch stay unique")
  }

  test("stream-stream purchase attribution matches the batch interval join") {
    val q = EventStreams.purchaseAttribution(EventStreams.readEvents(spark, dir))
      .writeStream.format("memory").queryName("attribution").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val ev = Tables.load(spark, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"))
    val batch = ev.filter(col("event_type") === "purchase")
      .join(clicks,
        col("user_id") === col("c_user") &&
          col("click_ts") <= col("ts") &&
          col("click_ts") >= col("ts") - expr("INTERVAL 1 HOUR"))
    assert(spark.table("attribution").count() == batch.count())
    assert(batch.count() > 0)
  }

  test("flatMapGroupsWithState sessionization matches the batch definition") {
    val q = EventStreams.sessionize(
      EventStreams.typedEvents(EventStreams.readEvents(spark, dir)))
      .writeStream.format("memory").queryName("sessions").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    // one trigger: every session except each user's final (still open in
    // state) is emitted
    val batch = graft.SparkEntry.queries("q29_sessionize")(spark, dir)
    val totalSessions = batch.agg(sum(col("n_sessions"))).head().getLong(0)
    val nUsers = batch.count()
    assert(spark.table("sessions").count() == totalSessions - nUsers)
    // session event counts must cover all non-open events
    val emittedEvents = spark.table("sessions").agg(sum(col("n_events"))).head().getLong(0)
    assert(emittedEvents > 0 && emittedEvents < Tables.load(spark, dir, "events").count())
  }
}
