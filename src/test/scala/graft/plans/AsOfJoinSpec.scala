package graft.plans

import graft.{SparkSpecBase, Tables}
import graft.ops.AsOfJoinOps.asofJoin
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpecBase {
  import spark.implicits._

  test("small case: most recent quote at-or-before each trade, nulls when none") {
    val trades = Seq((1L, 100L, "t1"), (1L, 200L, "t2"), (2L, 50L, "t3"))
      .toDF("key", "t", "trade")
    val quotes = Seq((1L, 90L, "q_old"), (1L, 100L, "q_exact"), (1L, 150L, "q_mid"),
      (2L, 60L, "q_late"))
      .toDF("qkey", "qt", "quote")
    val out = asofJoin(trades, quotes, "key", "qkey", "t", "qt", "qt")
      .select("trade", "quote").as[(String, Option[String])].collect().toMap
    assert(out("t1").contains("q_exact"), "tie at t=100 takes the row at qt<=t")
    assert(out("t2").contains("q_mid"))
    assert(out("t3").isEmpty, "no quote at-or-before t=50 for key 2")
  }

  test("native as-of join matches the q13 union+window composition") {
    val ev = Tables.events(spark, sfDir)
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("t"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        unix_micros(col("ts")).as("ct"))
    val native = asofJoin(errors, clicks,
      "user_id", "c_user", "t", "ct", "click_id")
      .select(col("event_id"), col("click_id"))
      .as[(Long, Option[Long])].collect().toMap
    val composed = graft.queries.RelationalQueries
      .queries("q13_asof_join")(spark, sfDir)
      .select(col("event_id"), col("prev_click_id"))
      .as[(Long, Option[Long])].collect().toMap
    assert(native.keySet == composed.keySet)
    val diffs = native.collect { case (k, v) if composed(k) != v => (k, v, composed(k)) }
    assert(diffs.isEmpty, s"first diffs: ${diffs.take(5)}")
  }

  test("tolerance gates stale matches on every merge path") {
    val trades = Seq((1L, 100L, "t1"), (1L, 200L, "t2"), (1L, 210L, "t3"))
      .toDF("key", "t", "trade")
    val quotes = Seq((1L, 60L, "q_old"), (1L, 195L, "q_fresh"))
      .toDF("qkey", "qt", "quote")
    // primitive long path: t1's only candidate (60) is 40 > tol=39 stale;
    // t2 matches 195 (within 5); t3 matches 195 (within 15 = tol boundary)
    val longOut = asofJoin(trades, quotes, "key", "qkey", "t", "qt", "qt",
      tolerance = Some(39L))
      .select("trade", "quote").as[(String, Option[String])].collect().toMap
    assert(longOut("t1").isEmpty, "stale match must pad nulls")
    assert(longOut("t2").contains("q_fresh"))
    assert(longOut("t3").contains("q_fresh"))
    // boundary is INCLUSIVE: tol = exactly the staleness
    val boundary = asofJoin(trades, quotes, "key", "qkey", "t", "qt", "qt",
      tolerance = Some(40L))
      .select("trade", "quote").as[(String, Option[String])].collect().toMap
    assert(boundary("t1").contains("q_old"), "tolerance is inclusive")
    // string-key path
    val sTrades = Seq(("a", 100L, "t1")).toDF("key", "t", "trade")
    val sQuotes = Seq(("a", 60L, "q_old")).toDF("qkey", "qt", "quote")
    val sOut = asofJoin(sTrades, sQuotes, "key", "qkey", "t", "qt", "qt",
      tolerance = Some(39L))
      .select("trade", "quote").as[(String, Option[String])].collect().toMap
    assert(sOut("t1").isEmpty)
    // generic path (composite keys) with long time
    val gTrades = Seq((1L, 1L, 100L, "t1")).toDF("k1", "k2", "t", "trade")
    val gQuotes = Seq((1L, 1L, 60L, "q_old")).toDF("q1", "q2", "qt", "quote")
    val gOut = graft.ops.AsOfJoinOps.asofJoinMulti(gTrades, gQuotes,
      Seq("k1", "k2"), Seq("q1", "q2"), "t", "qt", "qt",
      tolerance = Some(39L))
      .select("trade", "quote").as[(String, Option[String])].collect().toMap
    assert(gOut("t1").isEmpty)
    // non-long-backed time + tolerance must be rejected
    val dTrades = Seq((1L, "2020-01-01", "t1")).toDF("key", "d", "trade")
      .withColumn("d", col("d").cast("date"))
    val dQuotes = Seq((1L, "2019-12-01", "q")).toDF("qkey", "qd", "quote")
      .withColumn("qd", col("qd").cast("date"))
    val err = intercept[Exception] {
      asofJoin(dTrades, dQuotes, "key", "qkey", "d", "qd", "qd",
        tolerance = Some(5L)).collect()
    }
    assert(err.getMessage.contains("long-backed"))
  }

  test("forward direction peeks the earliest at-or-after match per path") {
    val trades = Seq((1L, 100L, "t1"), (1L, 150L, "t2"), (2L, 10L, "t3"))
      .toDF("key", "t", "trade")
    val quotes = Seq((1L, 100L, "q_exact"), (1L, 140L, "q_mid"),
      (1L, 160L, "q_late"), (2L, 5L, "q_past"))
      .toDF("qkey", "qt", "quote")
    // long path: t1 → q_exact (tie at 100 matches forward too); t2 → 160;
    // t3 → null (only a PAST quote exists for key 2)
    val fwd = graft.ops.AsOfJoinOps.asofJoin(trades, quotes,
      "key", "qkey", "t", "qt", "qt", direction = "forward")
      .select("trade", "quote").as[(String, Option[String])].collect().toMap
    assert(fwd("t1").contains("q_exact"))
    assert(fwd("t2").contains("q_late"))
    assert(fwd("t3").isEmpty)
    // tolerance composes with forward (160 - 150 = 10 > 5 → null)
    val fwdTol = graft.ops.AsOfJoinOps.asofJoin(trades, quotes,
      "key", "qkey", "t", "qt", "qt", tolerance = Some(5L),
      direction = "forward")
      .select("trade", "quote").as[(String, Option[String])].collect().toMap
    assert(fwdTol("t1").contains("q_exact") && fwdTol("t2").isEmpty)
    // string-key path + a shared un-consumed match: both lefts at 90/95
    // must match the SAME right row at 100
    val sTrades = Seq(("a", 90L, "t1"), ("a", 95L, "t2"))
      .toDF("key", "t", "trade")
    val sQuotes = Seq(("a", 100L, "q1")).toDF("qkey", "qt", "quote")
    val sOut = graft.ops.AsOfJoinOps.asofJoin(sTrades, sQuotes,
      "key", "qkey", "t", "qt", "qt", direction = "forward")
      .select("trade", "quote").as[(String, Option[String])].collect().toMap
    assert(sOut("t1").contains("q1") && sOut("t2").contains("q1"),
      "an un-consumed forward match serves every earlier left row")
    // generic path (composite keys)
    val gTrades = Seq((1L, 2L, 50L, "t1")).toDF("k1", "k2", "t", "trade")
    val gQuotes = Seq((1L, 2L, 70L, "q1")).toDF("q1", "q2", "qt", "quote")
    val gOut = graft.ops.AsOfJoinOps.asofJoinMulti(gTrades, gQuotes,
      Seq("k1", "k2"), Seq("q1", "q2"), "t", "qt", "qt",
      direction = "forward")
      .select("trade", "quote").as[(String, Option[String])].collect().toMap
    assert(gOut("t1").contains("q1"))
  }

  test("nearest direction picks the closer side, ties to backward") {
    val trades = Seq((1L, 100L, "t1"), (1L, 107L, "t2"), (2L, 50L, "t3"),
      (3L, 10L, "t4"))
      .toDF("key", "t", "trade")
    val quotes = Seq((1L, 95L, "q_back"), (1L, 110L, "q_fwd"),
      (2L, 45L, "q_b"), (2L, 55L, "q_f"))
      .toDF("qkey", "qt", "quote")
    // t1: back dist 5 < fwd dist 10 → q_back; t2: back 12 > fwd 3 → q_fwd;
    // t3: EQUAL dist 5/5 → backward wins; t4: no quote at all → null
    val near = graft.ops.AsOfJoinOps.asofJoin(trades, quotes,
      "key", "qkey", "t", "qt", "qt", direction = "nearest")
      .select("trade", "quote").as[(String, Option[String])].collect().toMap
    assert(near("t1").contains("q_back"))
    assert(near("t2").contains("q_fwd"))
    assert(near("t3").contains("q_b"), "equal distance resolves backward")
    assert(near("t4").isEmpty)
    // tolerance bounds BOTH sides: ±4 leaves t1 (5 back, 10 fwd) unmatched
    // but t2 (3 fwd) matched
    val nearTol = graft.ops.AsOfJoinOps.asofJoin(trades, quotes,
      "key", "qkey", "t", "qt", "qt", tolerance = Some(4L),
      direction = "nearest")
      .select("trade", "quote").as[(String, Option[String])].collect().toMap
    assert(nearTol("t1").isEmpty && nearTol("t2").contains("q_fwd"))
    // string-key and generic (composite-key) paths
    val sOut = graft.ops.AsOfJoinOps.asofJoin(
      Seq(("a", 100L, "t1")).toDF("key", "t", "trade"),
      Seq(("a", 90L, "qb"), ("a", 103L, "qf")).toDF("qkey", "qt", "quote"),
      "key", "qkey", "t", "qt", "qt", direction = "nearest")
      .select("trade", "quote").as[(String, Option[String])].collect().toMap
    assert(sOut("t1").contains("qf"))
    val gOut = graft.ops.AsOfJoinOps.asofJoinMulti(
      Seq((1L, 1L, 100L, "t1")).toDF("k1", "k2", "t", "trade"),
      Seq((1L, 1L, 104L, "qf"), (1L, 1L, 90L, "qb"))
        .toDF("q1", "q2", "qt", "quote"),
      Seq("k1", "k2"), Seq("q1", "q2"), "t", "qt", "qt",
      direction = "nearest")
      .select("trade", "quote").as[(String, Option[String])].collect().toMap
    assert(gOut("t1").contains("qf"))
  }

  test("generic path: string keys + timestamp times merge identically") {
    val trades = Seq(("alpha", "2020-01-01 10:00:00", "t1"),
      ("alpha", "2020-01-01 11:00:00", "t2"),
      ("beta", "2020-01-01 09:00:00", "t3"))
      .toDF("key", "ts", "trade")
      .withColumn("ts", col("ts").cast("timestamp"))
    val quotes = Seq(("alpha", "2020-01-01 09:30:00", "q_early"),
      ("alpha", "2020-01-01 10:00:00", "q_tie"),
      ("alpha", "2020-01-01 10:30:00", "q_mid"),
      ("beta", "2020-01-01 09:30:00", "q_late"),
      ("gamma", "2020-01-01 08:00:00", "q_other"))
      .toDF("qkey", "qts", "quote")
      .withColumn("qts", col("qts").cast("timestamp"))
    val out = asofJoin(trades, quotes, "key", "qkey", "ts", "qts", "quote")
      .select("trade", "quote").as[(String, Option[String])].collect().toMap
    assert(out("t1").contains("q_tie"), "exact-time tie matches (qt <= t)")
    assert(out("t2").contains("q_mid"))
    assert(out("t3").isEmpty, "beta has no quote at-or-before 09:00")
    // cross-check the generic merge against the long fast path on the corpus
    val ev = Tables.events(spark, sfDir)
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id").cast("string").as("u"), col("event_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").cast("string").as("cu"),
        col("event_id").as("click_id"), col("ts").as("cts"))
    val generic = asofJoin(errors, clicks, "u", "cu", "ts", "cts", "click_id")
      .select(col("event_id"), col("click_id"))
      .as[(Long, Option[Long])].collect().toMap
    val composed = graft.queries.RelationalQueries
      .queries("q13_asof_join")(spark, sfDir)
      .select(col("event_id"), col("prev_click_id"))
      .as[(Long, Option[Long])].collect().toMap
    assert(generic == composed, "string-keyed merge must equal the composition")
  }

  test("generic path: int keys + date times (no specialized loop applies)") {
    val l = Seq((1, "2020-01-10", "L1"), (2, "2020-02-01", "L2"))
      .toDF("k", "d", "tag").withColumn("d", col("d").cast("date"))
    val r = Seq((1, "2020-01-05", "R1"), (1, "2020-01-09", "R2"),
      (2, "2020-03-01", "R3"))
      .toDF("rk", "rd", "rtag").withColumn("rd", col("rd").cast("date"))
    val out = asofJoin(l, r, "k", "rk", "d", "rd", "rtag")
      .select("tag", "rtag").as[(String, Option[String])].collect().toMap
    assert(out("L1").contains("R2"), "latest date at-or-before wins")
    assert(out("L2").isEmpty, "future-dated right row must not match")
  }

  test("composite keys: (exchange, symbol) quotes merge per venue") {
    val trades = Seq(("NYSE", "A", 100L, "t1"), ("NYSE", "B", 100L, "t2"),
      ("BATS", "A", 100L, "t3"))
      .toDF("ex", "sym", "t", "trade")
    val quotes = Seq(("NYSE", "A", 90L, "q_nyse_a"), ("BATS", "A", 95L, "q_bats_a"),
      ("NYSE", "B", 200L, "q_late"))
      .toDF("qex", "qsym", "qt", "quote")
    val out = graft.ops.AsOfJoinOps.asofJoinMulti(trades, quotes,
      Seq("ex", "sym"), Seq("qex", "qsym"), "t", "qt", "quote")
      .select("trade", "quote").as[(String, Option[String])].collect().toMap
    assert(out("t1").contains("q_nyse_a"), "same venue+symbol matches")
    assert(out("t3").contains("q_bats_a"), "other venue keeps its own quote")
    assert(out("t2").isEmpty, "future quote must not match")
  }

  test("NULL times: right NULLs never match, left NULLs pad, on every path") {
    // long path: a NULL-time quote must not be held (getLong would read it
    // as 0 and let it shadow real matches / corrupt tolerance distances)
    val trades = Seq((1L, Some(100L), "t1"), (1L, None: Option[Long], "tnull"),
      (2L, Some(50L), "t2"))
      .toDF("key", "t", "trade")
    val quotes = Seq((1L, None: Option[Long], "q_null"), (1L, Some(90L), "q_real"),
      (2L, None: Option[Long], "q_only_null"))
      .toDF("qkey", "qt", "quote")
    val out = asofJoin(trades, quotes, "key", "qkey", "t", "qt", "qt")
      .select("trade", "quote").as[(String, Option[String])].collect().toMap
    assert(out("t1").contains("q_real"), "real quote wins over the NULL-time row")
    assert(out("tnull").isEmpty, "NULL left time emits null-padded")
    assert(out("t2").isEmpty, "a key whose only quote has NULL time matches nothing")
    // tolerance must not treat a NULL right time as 0
    val tolOut = asofJoin(trades, quotes, "key", "qkey", "t", "qt", "qt",
      tolerance = Some(1000L))
      .select("trade", "quote").as[(String, Option[String])].collect().toMap
    assert(tolOut("t2").isEmpty, "NULL-time row must stay unmatched under tolerance")
    // string-key path
    val sOut = asofJoin(
      Seq(("a", Some(100L), "t1"), ("a", None: Option[Long], "tnull"))
        .toDF("key", "t", "trade"),
      Seq(("a", None: Option[Long], "q_null"), ("a", Some(95L), "q_real"))
        .toDF("qkey", "qt", "quote"),
      "key", "qkey", "t", "qt", "qt")
      .select("trade", "quote").as[(String, Option[String])].collect().toMap
    assert(sOut("t1").contains("q_real") && sOut("tnull").isEmpty)
    // generic path (composite keys); also the forward direction's peek
    val gOut = graft.ops.AsOfJoinOps.asofJoinMulti(
      Seq((1L, 1L, Some(100L), "t1"), (1L, 1L, None: Option[Long], "tnull"))
        .toDF("k1", "k2", "t", "trade"),
      Seq((1L, 1L, None: Option[Long], "q_null"), (1L, 1L, Some(90L), "q_real"))
        .toDF("q1", "q2", "qt", "quote"),
      Seq("k1", "k2"), Seq("q1", "q2"), "t", "qt", "qt")
      .select("trade", "quote").as[(String, Option[String])].collect().toMap
    assert(gOut("t1").contains("q_real") && gOut("tnull").isEmpty)
    val fOut = asofJoin(
      Seq((1L, Some(100L), "t1"), (1L, None: Option[Long], "tnull"))
        .toDF("key", "t", "trade"),
      Seq((1L, None: Option[Long], "q_null"), (1L, Some(120L), "q_fwd"))
        .toDF("qkey", "qt", "quote"),
      "key", "qkey", "t", "qt", "qt", direction = "forward")
      .select("trade", "quote").as[(String, Option[String])].collect().toMap
    assert(fOut("t1").contains("q_fwd") && fOut("tnull").isEmpty,
      "forward peek skips NULL-time rows")
  }

  test("physical plan is the custom exec with one exchange+sort per side") {
    val ev = Tables.events(spark, sfDir)
    val l = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("t"))
    val r = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("u2"), col("event_id").as("cid"),
        unix_micros(col("ts")).as("ct"))
    val df = asofJoin(l, r, "user_id", "u2", "t", "ct", "cid")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoinExec") || plan.contains("AsOfJoin"),
      s"expected custom exec in plan:\n$plan")
  }
}
