package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.streaming.EventStream

class StreamingSpec extends AnyFunSuite with GraphFixtures {

  private lazy val eventsDir: String = {
    // file streaming source wants a directory; stage the test events there
    val dir = Files.createTempDirectory("graft-events").toString
    val src = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    src.write.mode("overwrite").parquet(dir)
    dir
  }

  private def eventsSchema: StructType =
    spark.read.parquet("/root/testdata/sf0.001/events.parquet").schema

  test("windowedAgg: streaming (complete mode over files) equals batch on the same data") {
    val batch = EventStream.windowedAgg(
      spark.read.parquet("/root/testdata/sf0.001/events.parquet"))
    val stream = EventStream.windowedAgg(
      spark.readStream.schema(eventsSchema).parquet(eventsDir))
    val q = stream.writeStream.format("memory").queryName("win_agg")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = spark.table("win_agg")
      assert(got.count() == batch.count())
      assert(got.exceptAll(batch).count() == 0)
      assert(batch.exceptAll(got).count() == 0)
    } finally q.stop()
  }

  test("windowedAggStreamOnce (driver-oracle entry point) equals batch on the fixed-point grid") {
    val batch = EventStream.windowedAgg(
      spark.read.parquet("/root/testdata/sf0.001/events.parquet"), quantize = 1e6)
    val got = EventStream.windowedAggStreamOnce(
      spark, "/root/testdata/sf0.001/events.parquet", quantize = 1e6)
    assert(got.count() == batch.count())
    assert(got.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(got).count() == 0)
  }

  test("sessionizeStreamOnce (driver-oracle entry point) equals batch incl. flushed open sessions") {
    val pq = "/root/testdata/sf0.001/events.parquet"
    val batch = EventStream.sessionizeBatch(spark.read.parquet(pq), gapMinutes = 30)
    val got = EventStream.sessionizeStreamOnce(spark, pq, gapMinutes = 30)
      .select("user_id", "session_start", "session_end", "n_events")
    assert(got.count() == batch.count()) // open sessions WERE flushed
    assert(got.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(got).count() == 0)
  }

  test("dedupStream drops replayed event_ids") {
    val dir = Files.createTempDirectory("graft-events-dup").toString
    val src = spark.read.parquet("/root/testdata/sf0.001/events.parquet").limit(100)
    src.union(src).write.mode("overwrite").parquet(dir) // every event twice
    val stream = EventStream.dedupStream(spark.readStream.schema(eventsSchema).parquet(dir))
      .groupBy().count()
    val q = stream.writeStream.format("memory").queryName("dedup_cnt")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      assert(spark.table("dedup_cnt").head().getLong(0) == 100L)
    } finally q.stop()
  }

  test("sessionizeBatch: gap splitting is exact on a hand-built trace") {
    val s = spark
    import s.implicits._
    def t(min: Long) = new Timestamp(min * 60000L)
    val ev = Seq(
      (1L, t(0)), (1L, t(10)), (1L, t(20)), // session 1: 3 events
      (1L, t(60)), (1L, t(65)),             // session 2: 2 events (gap 40 > 30)
      (2L, t(5))                            // user 2: 1 session
    ).toDF("user_id", "ts")
    val got = EventStream.sessionizeBatch(ev, gapMinutes = 30)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime / 60000,
        r.getTimestamp(2).getTime / 60000, r.getLong(3))).toSet
    assert(got == Set((1L, 0L, 20L, 3L), (1L, 60L, 65L, 2L), (2L, 5L, 5L, 1L)))
  }

  // ---- checkpoint/restart recovery (VERDICT r4 #3): a SECOND query
  // instance started on the SAME checkpointLocation must recover source
  // offsets (no reprocessing of consumed files) AND StateStore state
  // (sessions/windows spanning the restart come out whole) ---------------

  test("sessionizeStream: restart from checkpointLocation recovers state — a session spans the restart") {
    val s = spark
    import s.implicits._
    def t(min: Long) = new Timestamp((1440 + min) * 60000L)
    val srcDir = Files.createTempDirectory("graft-ck-sess-src").toString
    val outDir = Files.createTempDirectory("graft-ck-sess-out").toString
    val ckDir = Files.createTempDirectory("graft-ck-sess-chk").toString
    val sch = StructType(Seq(StructField("user_id", LongType), StructField("ts", TimestampType)))
    def run(): Unit = {
      val q = EventStream.sessionizeStream(
        spark.readStream.schema(sch).parquet(srcDir), gapMinutes = 30, watermark = "0 minutes")
        .toDF().writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckDir)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    // run 1: user 1's session is OPEN (events at 0, 10) when the query stops
    Seq((1L, t(0)), (1L, t(10)), (2L, t(5)))
      .toDF("user_id", "ts").coalesce(1).write.mode("append").parquet(srcDir)
    run()
    // run 2 (new query object, same checkpoint): event at 20 CONTINUES the
    // recovered open session; 60 closes it by gap; user 9 pushes watermark
    Seq((1L, t(20)), (1L, t(60)), (9L, t(2000)))
      .toDF("user_id", "ts").coalesce(1).write.mode("append").parquet(srcDir)
    run()
    // run 3: one more batch so event-time timeouts behind the advanced
    // watermark fire (watermarks bind one batch late by contract)
    Seq((9L, t(5000))).toDF("user_id", "ts").coalesce(1).write.mode("append").parquet(srcDir)
    run()
    val got = spark.read.parquet(outDir).where(col("user_id") =!= 9L)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime / 60000 - 1440,
        r.getTimestamp(2).getTime / 60000 - 1440, r.getLong(3))).toSet
    // ONE 3-event session 0-20 straddling the restart proves state recovery
    // (lost state would yield (1,0,10,2) + (1,20,20,1)); offsets recovery is
    // proven by the exact event counts (re-ingesting run-1 files would
    // double-count user 2)
    assert(got == Set((1L, 0L, 20L, 3L), (1L, 60L, 60L, 1L), (2L, 5L, 5L, 1L)), s"$got")
  }

  test("windowedAgg: restart from checkpointLocation recovers window state — a window spans the restart") {
    val s = spark
    import s.implicits._
    def t(min: Long) = new Timestamp((1440 + min) * 60000L)
    val srcDir = Files.createTempDirectory("graft-ck-win-src").toString
    val outDir = Files.createTempDirectory("graft-ck-win-out").toString
    val ckDir = Files.createTempDirectory("graft-ck-win-chk").toString
    val sch = StructType(Seq(StructField("ts", TimestampType),
      StructField("event_type", StringType), StructField("value", DoubleType)))
    def run(): Unit = {
      // 2h watermark delay: run 1's max event time (minute 70+1440) leaves
      // the [0h,1h) window OPEN across the restart (a 0-delay watermark
      // would finalize it and correctly drop run 2's in-window event as
      // late — the recovery test needs the window alive)
      val q = EventStream.windowedAgg(
        spark.readStream.schema(sch).parquet(srcDir), watermark = "2 hours")
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckDir)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    // hour-window [1440, 1500) receives events in BOTH runs
    Seq((t(0), "a", 1.0), (t(10), "a", 2.0), (t(70), "b", 1.0))
      .toDF("ts", "event_type", "value").coalesce(1).write.mode("append").parquet(srcDir)
    run()
    Seq((t(20), "a", 4.0), (t(3000), "c", 1.0))
      .toDF("ts", "event_type", "value").coalesce(1).write.mode("append").parquet(srcDir)
    run()
    Seq((t(6000), "c", 1.0))
      .toDF("ts", "event_type", "value").coalesce(1).write.mode("append").parquet(srcDir)
    run() // finalizes windows behind the advanced watermark
    val got = spark.read.parquet(outDir).where(col("event_type") =!= "c")
      .collect().map(r => (r.getTimestamp(0).getTime / 60000 - 1440,
        r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    // count 3 / sum 7.0 for window-a requires BOTH the recovered partial
    // (1+2) and the post-restart event (4); an offset replay would double it
    assert(got == Set((0L, "a", 3L, 7.0), (60L, "b", 1L, 1.0)), s"$got")
  }

  test("sessionizeStream (flatMapGroupsWithState) emits the same closed sessions as batch") {
    val s = spark
    import s.implicits._
    // offset by a day: stateful ops drop rows at/below the initial watermark (epoch 0)
    def t(min: Long) = new Timestamp((1440 + min) * 60000L)
    val rows = Seq(
      (1L, t(0)), (1L, t(10)), (1L, t(20)),
      (1L, t(60)), (1L, t(65)),
      (2L, t(5)), (2L, t(200)), // user 2: two sessions
      (9L, t(500))              // late sentinel pushes the watermark forward
    )
    val dir = Files.createTempDirectory("graft-events-sess").toString
    rows.toDF("user_id", "ts").coalesce(1).write.mode("overwrite").parquet(dir)
    val sch = StructType(Seq(StructField("user_id", LongType), StructField("ts", TimestampType)))
    val stream = EventStream.sessionizeStream(
      spark.readStream.schema(sch).parquet(dir), gapMinutes = 30, watermark = "0 minutes")
    val q = stream.writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("sessions")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime / 60000,
          r.getTimestamp(2).getTime / 60000, r.getLong(3))).toSet
      // sessions closed by gap-exceeding successors within the batch:
      assert(got.contains((1L, 1440L, 1460L, 3L)))
      assert(got.contains((2L, 1445L, 1445L, 1L)))
    } finally q.stop()
  }
}
