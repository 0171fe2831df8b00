package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.medallion.{Bronze, Gold, Silver}
import graft.streaming.Streams

/** End-to-end medallion pipeline over streaming JSON — the
  * reference's actual topology (bronze_ingestion.py →
  * silver_transformation.py → gold_transformation.py) driven as
  * Structured Streaming with trigger-once semantics.
  */
class MedallionStreamingSpec extends SparkSpec {
  import spark.implicits._

  /** Nested JSON fixtures shaped like the reference entities:
    * customers {customer_id, name, email, address{city,postal_code,
    * country}}, orders {order_id, timestamp, customer{...}, items[
    * {item_id, product_name, quantity, price}], payment{...}}. */
  private def writeFixtures(dir: String): Unit = {
    val customers =
      """[{"customer_id": 1, "name": "Ada", "email": "ada@x.com",
        |  "address": {"city": "new york", "postal_code": "10001", "country": "usa"}},
        | {"customer_id": 2, "name": "Bo", "email": "bo@x.com",
        |  "address": {"city": "chicago", "postal_code": "60601", "country": "usa"}},
        | {"customer_id": 2, "name": "Bo", "email": "bo@x.com",
        |  "address": {"city": "chicago", "postal_code": "60601", "country": "usa"}}]""".stripMargin
    val orders =
      """[{"order_id": "O1", "timestamp": "2024-01-01T10:00:00Z",
        |  "customer": {"customer_id": 1, "name": "Ada"},
        |  "items": [{"item_id": "P1", "product_name": "laptop", "quantity": 1, "price": 1200.5},
        |            {"item_id": "P2", "product_name": "mouse", "quantity": 2, "price": 25.0}],
        |  "payment": {"method": "card", "transaction_id": "T1"}},
        | {"order_id": "O2", "timestamp": "2024-01-02T11:00:00Z",
        |  "customer": {"customer_id": 2, "name": "Bo"},
        |  "items": [{"item_id": "P1", "product_name": "laptop", "quantity": -1, "price": 1200.5}],
        |  "payment": {"method": "paypal", "transaction_id": "T2"}}]""".stripMargin
    Files.createDirectories(java.nio.file.Paths.get(s"$dir/customers"))
    Files.createDirectories(java.nio.file.Paths.get(s"$dir/orders"))
    Files.writeString(java.nio.file.Paths.get(s"$dir/customers/part1.json"), customers)
    Files.writeString(java.nio.file.Paths.get(s"$dir/orders/part1.json"), orders)
  }

  test("bronze: schema inference + streaming JSON ingest wraps payload") {
    val dir = Files.createTempDirectory("graft_medallion").toString
    writeFixtures(dir)
    val schema = Bronze.inferSchema(spark, s"$dir/customers")
    assert(schema.fieldNames.toSet === Set("customer_id", "name", "email", "address"))

    val bronze = Bronze.readStream(spark, s"$dir/customers", schema)
    Streams.runOnce(bronze.drop("bronze_ingest_ts"), s"$dir/ckpt_b", "bronze_customers")
    val out = spark.table("bronze_customers")
    assert(out.columns.toSet === Set("payload", "ingest_file"))
    assert(out.count() === 3)
    assert(out.select("payload.address.city").as[String].collect().toSet
      === Set("new york", "chicago"))
    assert(out.select("ingest_file").as[String].head().contains("part1.json"))
  }

  test("bronze rescue: drifted rows keep typed fields, lose nothing") {
    val dir = Files.createTempDirectory("graft_rescue").toString
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("name",
        org.apache.spark.sql.types.StringType)))
    Files.writeString(java.nio.file.Paths.get(dir, "batch.json"),
      Seq(
        """{"id": 1, "name": "ok"}""", // conforming
        """{"id": 2, "name": "x", "extra_col": "surprise"}""", // drifted: new col
        """{"id": "not-a-number", "name": "y"}""", // type violation
        """{"id": 4, "name": null}""", // legitimate null: NOT a violation
        """this is not json at all""" // wholly corrupt
      ).mkString("\n"))
    val out = Bronze.readRescued(spark, dir, schema)
    assert(out.columns.toSeq === Seq("id", "name", "_rescued"))
    assert(out.count() === 5, "rescue must lose ZERO rows")
    val rows = out.collect().map(r =>
      (Option(r.get(0)), Option(r.get(1)), Option(r.getString(2)))).toSet
    assert(rows.contains((Some(1L), Some("ok"), None)))
    assert(rows.contains((Some(4L), None, None))) // null stays clean
    // drifted row: typed fields intact, extra field rescued
    assert(rows.exists { case (id, n, resc) =>
      id == Some(2L) && n == Some("x") &&
        resc.exists(_.contains(""""extra_col":"surprise"""")) })
    // type violation: other field intact, bad value rescued
    assert(rows.exists { case (id, n, resc) =>
      id.isEmpty && n == Some("y") &&
        resc.exists(_.contains(""""id":"not-a-number"""")) })
    // corrupt line: whole text under _raw
    assert(rows.exists { case (id, _, resc) =>
      id.isEmpty && resc.exists(_.contains("not json")) })
    // drift monitor: exactly the 3 non-conforming rows flagged
    assert(out.filter(col("_rescued").isNotNull).count() === 3)

    // streaming twin lands the same 5 rows
    val ckpt = Files.createTempDirectory("graft_rescue_ck").toString
    Streams.runOnce(Bronze.readStreamRescued(spark, dir, schema),
      ckpt, "bronze_rescued")
    assert(spark.table("bronze_rescued").count() === 5)
    assert(spark.table("bronze_rescued")
      .filter(col("_rescued").isNotNull).count() === 3)
  }

  test("silver: streaming flatten + dedup over bronze") {
    val dir = Files.createTempDirectory("graft_medallion2").toString
    writeFixtures(dir)
    val schema = Bronze.inferSchema(spark, s"$dir/customers")
    val bronze = Bronze.readStream(spark, s"$dir/customers", schema)
    val silver = Silver.transform(bronze, Seq("customer_id"))
    Streams.runOnce(silver, s"$dir/ckpt_s", "silver_customers")
    val out = spark.table("silver_customers")
    assert(out.count() === 2) // dup customer 2 removed
    assert(out.columns.toSet === Set("customer_id", "name", "email",
      "address_city", "address_postal_code", "address_country",
      "ingest_file", "bronze_ingest_ts", "silver_ingest_ts"))
  }

  test("silver explodes order items; gold builds fact with DQ filters") {
    val dir = Files.createTempDirectory("graft_medallion3").toString
    writeFixtures(dir)
    val oschema = Bronze.inferSchema(spark, s"$dir/orders")
    val bronzeOrders = Bronze.readStream(spark, s"$dir/orders", oschema)
    val silverOrders = Silver.transform(bronzeOrders, Seq("order_id"))
    Streams.runOnce(silverOrders, s"$dir/ckpt_o", "silver_orders_t")
    val so = spark.table("silver_orders_t")
    // Reference semantics (silver_transformation.py:85-90): dedup by
    // order_id runs AFTER flatten+explode — an order with 2 items
    // keeps exactly one (arbitrary) item row. 2 orders -> 2 rows.
    assert(so.count() === 2)
    assert(so.columns.contains("items_item_id") && so.columns.contains("customer_customer_id"))

    // gold fact: derived measure + DQ filter drops the negative-qty line
    val fact = so
      .select(col("order_id"), col("customer_customer_id").as("customer_id"),
        col("items_item_id").as("product_id"),
        col("items_quantity").as("quantity"),
        col("items_price").as("price"),
        (col("items_quantity") * col("items_price")).as("total_order_value"))
      .filter(col("order_id").isNotNull && col("quantity") > 0 && col("total_order_value") > 0)
    assert(fact.count() === 1) // O2's only line has negative quantity
    val total = fact.agg(sum("total_order_value")).as[Double].head()
    assert(total === 1200.5 || total === 50.0) // whichever O1 item survived
  }

  test("stream-static gold fact: streaming lines broadcast-join static dims") {
    val dir = Files.createTempDirectory("graft_medallion4").toString
    writeFixtures(dir)
    val oschema = Bronze.inferSchema(spark, s"$dir/orders")
    val bronzeOrders = Bronze.readStream(spark, s"$dir/orders", oschema)
    // dedup on (order, item) keeps every line — 3 item rows
    val lines = Silver.transform(bronzeOrders, Seq("order_id", "items_item_id"))
    val dimProducts = Seq(("P1", "laptop", "electronics"), ("P2", "mouse", "accessories"))
      .toDF("product_id", "product_name_dim", "category")
    val fact = Gold.fact(
      lines,
      dims = Seq((dimProducts, col("items_item_id") === col("product_id"))),
      select = Seq(col("order_id"), col("product_id"), col("category"),
        col("items_quantity").as("quantity"),
        (col("items_quantity") * col("items_price")).as("total_order_value")),
      filters = Seq(col("order_id").isNotNull, col("quantity") > 0,
        col("total_order_value") > 0))
    assert(fact.isStreaming, "fact build must stay a streaming plan")
    Streams.runOnce(fact, s"$dir/ckpt_f", "stream_fact")
    val out = spark.table("stream_fact")
    // O1's two lines survive; O2's negative-qty line is filtered
    assert(out.count() === 2)
    assert(out.select("category").as[String].collect().toSet
      === Set("electronics", "accessories"))
  }

  test("foreachBatch upsert keeps the latest version per key across batches") {
    val dir = Files.createTempDirectory("graft_upsert").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$dir/updates"))
    // two files -> two micro-batches (maxFilesPerTrigger=1)
    Files.writeString(java.nio.file.Paths.get(s"$dir/updates/b1.json"),
      """[{"id": 1, "version": 1, "value": "a"},
        | {"id": 2, "version": 1, "value": "b"}]""".stripMargin)
    Files.writeString(java.nio.file.Paths.get(s"$dir/updates/b2.json"),
      """[{"id": 2, "version": 2, "value": "b2"},
        | {"id": 3, "version": 1, "value": "c"}]""".stripMargin)
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "id BIGINT, version BIGINT, value STRING")
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1")
      .option("multiLine", "true").json(s"$dir/updates")
    Streams.runUpsertOnce(stream, Seq("id"), "version",
      s"$dir/target", s"$dir/ckpt_u")
    val out = spark.read.parquet(s"$dir/target")
      .orderBy("id").select("id", "version", "value")
      .as[(Long, Long, String)].collect().toSeq
    assert(out === Seq((1L, 1L, "a"), (2L, 2L, "b2"), (3L, 1L, "c")))
  }

  test("stream-stream join within time bound matches batch semantics") {
    val dir = Files.createTempDirectory("graft_ssj").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$dir/clicks"))
    Files.createDirectories(java.nio.file.Paths.get(s"$dir/buys"))
    Files.writeString(java.nio.file.Paths.get(s"$dir/clicks/c.json"),
      """[{"k": 1, "ts": "2024-01-01T10:00:00Z", "page": "home"},
        | {"k": 1, "ts": "2024-01-01T10:10:00Z", "page": "item"},
        | {"k": 2, "ts": "2024-01-01T10:00:00Z", "page": "home"}]""".stripMargin)
    Files.writeString(java.nio.file.Paths.get(s"$dir/buys/b.json"),
      """[{"k": 1, "ts": "2024-01-01T10:10:30Z", "amount": 5.0},
        | {"k": 2, "ts": "2024-01-01T11:30:00Z", "amount": 7.0}]""".stripMargin)
    val cSchema = org.apache.spark.sql.types.StructType.fromDDL(
      "k BIGINT, ts TIMESTAMP, page STRING")
    val bSchema = org.apache.spark.sql.types.StructType.fromDDL(
      "k BIGINT, ts TIMESTAMP, amount DOUBLE")
    def clicks = spark.readStream.schema(cSchema).option("multiLine", "true")
      .json(s"$dir/clicks")
    def buys = spark.readStream.schema(bSchema).option("multiLine", "true")
      .json(s"$dir/buys")
    val joined = Streams.streamStreamJoin(clicks, buys, Seq("k"), boundSeconds = 60)
      .select(col("l.k").as("k"), col("l.page").as("page"), col("r.amount").as("amount"))
    assert(joined.isStreaming)
    Streams.runOnce(joined, s"$dir/ckpt_j", "ssj_out")
    val got = spark.table("ssj_out").orderBy("k", "page")
      .as[(Long, String, Double)].collect().toSeq
    // k=1: only the 10:10 click is within 60s of the 10:10:30 buy;
    // k=2: the buy is 90 min after the click — no match
    assert(got === Seq((1L, "item", 5.0)))
  }

  test("left-outer stream-stream join emits unmatched rows after watermark") {
    val dir = Files.createTempDirectory("graft_ssj_outer").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$dir/in"))
    // BOTH sides ride the same files (side tag + filter) so the two
    // sources batch in lockstep and their watermarks advance together
    // — independent per-source file pacing would manufacture
    // artificial late data. f1: a matched pair (k=1) + a
    // never-matched click (k=2); f2/f3 advance the watermark past
    // k=2's 60s window on both branches.
    Files.writeString(java.nio.file.Paths.get(s"$dir/in/f1.json"),
      """[{"side": "c", "k": 1, "ts": "2024-01-01T10:00:00Z", "page": "home", "amount": null},
        | {"side": "c", "k": 2, "ts": "2024-01-01T10:00:00Z", "page": "promo", "amount": null},
        | {"side": "b", "k": 1, "ts": "2024-01-01T10:00:30Z", "page": null, "amount": 5.0}]""".stripMargin)
    Files.writeString(java.nio.file.Paths.get(s"$dir/in/f2.json"),
      """[{"side": "c", "k": 8, "ts": "2024-01-01T16:00:00Z", "page": "x", "amount": null},
        | {"side": "b", "k": 7, "ts": "2024-01-01T16:00:00Z", "page": null, "amount": 1.0}]""".stripMargin)
    Files.writeString(java.nio.file.Paths.get(s"$dir/in/f3.json"),
      """[{"side": "c", "k": 8, "ts": "2024-01-01T23:00:00Z", "page": "y", "amount": null},
        | {"side": "b", "k": 7, "ts": "2024-01-01T23:00:00Z", "page": null, "amount": 1.0}]""".stripMargin)
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "side STRING, k BIGINT, ts TIMESTAMP, page STRING, amount DOUBLE")
    def src = spark.readStream.schema(schema).option("multiLine", "true")
      .option("maxFilesPerTrigger", "1").json(s"$dir/in")
    val clicks = src.filter(col("side") === "c").select("k", "ts", "page")
    val buys = src.filter(col("side") === "b").select("k", "ts", "amount")
    val joined = Streams.streamStreamJoin(clicks, buys, Seq("k"),
      boundSeconds = 60, watermark = "10 minutes", joinType = "left_outer")
      .select(col("l.k").as("k"), col("l.page").as("page"), col("r.amount").as("amount"))
    Streams.runOnce(joined, s"$dir/ckpt_oj", "ssj_outer_out")
    val got = spark.table("ssj_outer_out")
      .select(col("k"), col("page"), col("amount")).orderBy("k", "page")
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]))).toSeq
    // k=1 matched; k=2's click emits with NULL amount once the
    // watermark passed its 60s window
    assert(got.contains((1L, "home", Some(5.0))))
    assert(got.contains((2L, "promo", None)))
  }

  test("foreachBatch upsert is idempotent under full replay") {
    val dir = Files.createTempDirectory("graft_replay").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$dir/updates"))
    Files.writeString(java.nio.file.Paths.get(s"$dir/updates/b1.json"),
      """[{"id": 1, "version": 2, "value": "x"}, {"id": 2, "version": 1, "value": "y"}]""")
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "id BIGINT, version BIGINT, value STRING")
    def stream = spark.readStream.schema(schema)
      .option("multiLine", "true").json(s"$dir/updates")
    // run once, then replay the same source with a FRESH checkpoint
    // (simulating at-least-once delivery): the target must not change
    Streams.runUpsertOnce(stream, Seq("id"), "version", s"$dir/target", s"$dir/ck1")
    val first = spark.read.parquet(s"$dir/target").orderBy("id")
      .as[(Long, Long, String)].collect().toSeq
    Streams.runUpsertOnce(stream, Seq("id"), "version", s"$dir/target", s"$dir/ck2")
    val second = spark.read.parquet(s"$dir/target").orderBy("id")
      .as[(Long, Long, String)].collect().toSeq
    assert(first === second && first.nonEmpty)
  }

  test("checkpoint recovery: a restarted stream processes only new files") {
    val dir = Files.createTempDirectory("graft_recover").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$dir/in"))
    val schema = org.apache.spark.sql.types.StructType.fromDDL("id BIGINT, v STRING")
    def run(): Unit = {
      val q = spark.readStream.schema(schema)
        .option("multiLine", "true").json(s"$dir/in")
        .writeStream.format("parquet")
        .option("path", s"$dir/out")
        .option("checkpointLocation", s"$dir/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    Files.writeString(java.nio.file.Paths.get(s"$dir/in/f1.json"),
      """[{"id": 1, "v": "a"}]""")
    run()
    Files.writeString(java.nio.file.Paths.get(s"$dir/in/f2.json"),
      """[{"id": 2, "v": "b"}]""")
    run() // SAME checkpoint: must append only f2, not reprocess f1
    val out = spark.read.parquet(s"$dir/out").orderBy("id")
      .as[(Long, String)].collect().toSeq
    assert(out === Seq((1L, "a"), (2L, "b")))
  }

  test("dropDuplicatesWithinWatermark dedups retries with differing timestamps") {
    val dir = Files.createTempDirectory("graft-ddww").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // event 1 is delivered twice with DIFFERENT timestamps (an
    // at-least-once retry) — key-only dedup must keep one
    val rows = Seq(
      (1L, ts("2024-01-01 00:00:00"), 10.0),
      (1L, ts("2024-01-01 00:00:05"), 10.0),
      (2L, ts("2024-01-01 00:01:00"), 20.0))
    val df = rows.toDF("event_id", "ts", "value")
    df.write.mode("overwrite").parquet(s"$dir/src")
    val stream = spark.readStream.schema(df.schema).parquet(s"$dir/src")
    Streams.runOnce(
      Streams.streamingDedupWithinWatermark(stream, Seq("event_id")),
      s"$dir/ckpt", "ddww_out")
    val out = spark.table("ddww_out")
    assert(out.count() === 2)
    assert(out.select("event_id").as[Long].collect().toSet === Set(1L, 2L))
    // the timestamp-in-key variant would have kept the retry
    val naive = Streams.streamingDedup(
      spark.readStream.schema(df.schema).parquet(s"$dir/src"), Seq("event_id"))
    Streams.runOnce(naive, s"$dir/ckpt2", "ddww_naive")
    assert(spark.table("ddww_naive").count() === 3)
  }

  test("sessionizer: a beyond-gap late event becomes its own session") {
    val dir = Files.createTempDirectory("graft-late").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // batch 1 opens a session at 12:00; batch 2 delivers a 10:30
    // event — inside the 2h watermark but 90min (> 30min gap) before
    // the open session, so it must NOT merge into it
    Seq(Streams.Event(1L, ts("2024-01-01 12:00:00"), 1L, "click", 1.0))
      .toDF().coalesce(1).write.parquet(s"$dir/src/f1")
    // TWO stale events within the gap of each other: they must merge
    // into ONE late session, not two singletons
    Seq(Streams.Event(2L, ts("2024-01-01 10:30:00"), 1L, "click", 2.0),
      Streams.Event(3L, ts("2024-01-01 10:45:00"), 1L, "click", 3.0))
      .toDF().coalesce(1).write.parquet(s"$dir/src/f2")
    val schema = spark.read.parquet(s"$dir/src/f1").schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/src/*")
      .as[Streams.Event](org.apache.spark.sql.Encoders.product[Streams.Event])
    Streams.runOnce(
      Streams.sessionize(stream, gapMs = 1800 * 1000L)(spark).toDF(),
      s"$dir/ckpt", "late_sess_out")
    val emitted = spark.table("late_sess_out")
      .select("user_id", "session_start", "session_end", "n_events")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getInt(3))).toSet
    // only the merged stale session closes (the 12:00 session stays
    // open behind the watermark): [10:30, 10:45], 2 events
    assert(emitted === Set((1L, ts("2024-01-01 10:30:00"),
      ts("2024-01-01 10:45:00"), 2)))
  }

  test("transformWithState maintains running per-user totals across batches") {
    val dir = Files.createTempDirectory("graft-tws").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val b1 = Seq(
      Streams.Event(1L, ts("2024-01-01 00:00:00"), 10L, "click", 1.5),
      Streams.Event(2L, ts("2024-01-01 00:00:10"), 10L, "click", 2.0),
      Streams.Event(3L, ts("2024-01-01 00:00:20"), 20L, "view", 4.0))
    val b2 = Seq(
      Streams.Event(4L, ts("2024-01-01 00:01:00"), 10L, "click", 0.5))
    b1.toDF().coalesce(1).write.parquet(s"$dir/src/f1")
    b2.toDF().coalesce(1).write.parquet(s"$dir/src/f2")
    val stream = spark.readStream.schema(b1.toDF().schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$dir/src/*")
      .as[Streams.Event]
    // transformWithState needs the RocksDB state store (multiple
    // column families); the HDFS-backed default cannot host it
    val saved = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val q = Streams.runningUserStats(stream).toDF().writeStream
        .format("memory").queryName("tws_out").outputMode("update")
        .option("checkpointLocation", s"$dir/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
    val rows = spark.table("tws_out")
      .as[(Long, Long, Double)].collect()
    // user 10 appears in both batches: the LAST update is cumulative
    val user10 = rows.filter(_._1 == 10L).maxBy(_._2)
    assert(user10 === ((10L, 3L, 4.0)))
    val user20 = rows.filter(_._1 == 20L).maxBy(_._2)
    assert(user20 === ((20L, 1L, 4.0)))
  }

  test("gold dimension normalization matches reference initcap semantics") {
    val dim = Seq((1, "new york", "usa"), (2, "chicago", "usa"))
      .toDF("customer_id", "city", "country")
    val out = Gold.dimension(dim, "customer_id",
      Seq("customer_id" -> "customer_id", "city" -> "city", "country" -> "country"),
      Map("city" -> initcap(col("city")), "country" -> upper(col("country"))))
    assert(out.orderBy("customer_id").select("city").as[String].collect().toSeq
      === Seq("New York", "Chicago"))
  }
}
