package graft

import org.apache.spark.sql.functions._

import graft.sources.AtopLogStore

/** The atop-shaped connector (sources/AtopLogConn.scala): host×day
  * splits, planning-time day pruning from time constraints, the
  * RESET/SEP stream protocol, field-index parsing, and retention. */
class AtopLogSuite extends GraftSuite {

  private val E0 = 1700006400L // UTC-day-aligned epoch
  private val Day0 = E0 / 86400

  private def line(epoch: Long, dur: Long, dev: String, io: Long,
      rr: Long): String =
    s"DSK h $epoch 2023/11/15 00:00:00 $dur $dev $io $rr ${rr * 2} ${rr + 5} ${rr * 3}"

  private def read(store: String, table: String,
      opts: Map[String, String] = Map.empty) = {
    val r = spark.read.format("graft-atop").option("store", store)
      .option("table", table)
    opts.foldLeft(r) { case (acc, (k, v)) => acc.option(k, v) }.load()
  }

  test("host x day split fan-out, host_ip from the split") {
    AtopLogStore.drop("at_fan")
    for (h <- 0 until 3; d <- 0 until 4)
      AtopLogStore.append("at_fan", s"10.0.0.$h", Day0 + d,
        Seq(line(E0 + d * 86400 + 600, 600, "sda", 1001, h * 10 + d)))
    val df = read("at_fan", "disks")
    assert(df.rdd.getNumPartitions == 12)
    assert(df.count() == 12)
    assert(df.select("host_ip").distinct().count() == 3)
    val e = intercept[IllegalArgumentException] {
      read("at_fan", "nope").count()
    }
    assert(e.getMessage.contains("unknown table"))
  }

  test("time constraints prune whole days at planning") {
    AtopLogStore.drop("at_prune")
    for (h <- 0 until 2; d <- 0 until 5)
      AtopLogStore.append("at_prune", s"10.0.0.$h", Day0 + d,
        Seq(line(E0 + d * 86400 + 600, 600, "sda", 1001, d)))
    def ts(sec: Long) = to_timestamp(lit(sec).cast("double"))
    val all = read("at_prune", "disks")
    assert(all.rdd.getNumPartitions == 10)
    // >= day 3 keeps days 3-4 on both hosts
    val tail = all.filter(col("start_time") >= ts(E0 + 3 * 86400))
    assert(tail.rdd.getNumPartitions == 4)
    assert(tail.count() == 4)
    // a one-day window via both bounds keeps one day
    val window = all.filter(col("end_time") >= ts(E0 + 86400) &&
      col("end_time") <= ts(E0 + 2 * 86400 - 1))
    assert(window.rdd.getNumPartitions == 2)
    // a non-time filter prunes nothing at planning, rows re-filter
    val dev = all.filter(col("read_requests") === 2)
    assert(dev.rdd.getNumPartitions == 10)
    assert(dev.count() == 2)
  }

  test("RESET drops the next disks sample; reboots is built FROM it") {
    AtopLogStore.drop("at_reset")
    AtopLogStore.append("at_reset", "10.0.0.9", Day0, Seq(
      line(E0 + 600, 600, "sda", 1001, 1),
      "SEP",
      "RESET",
      line(E0 + 1200, 1200, "sda", 999999, 2), // "since boot" outlier
      "SEP",
      line(E0 + 1800, 600, "sda", 1001, 3)))
    val disks = read("at_reset", "disks")
    // the post-RESET sample is gone; SEPs are protocol, not rows
    assert(disks.count() == 2)
    assert(disks.agg(sum(col("read_requests"))).head().getLong(0) == 4L)
    val reboots = read("at_reset", "reboots")
    val r = reboots.collect()
    assert(r.length == 1)
    assert(r.head.getString(0) == "10.0.0.9")
    // power_on = end - duration of the line AFTER the RESET
    assert(r.head.getTimestamp(1).getTime / 1000 == E0)
  }

  test("field-index parsing: utilization rounds and caps at 100") {
    AtopLogStore.drop("at_util")
    AtopLogStore.append("at_util", "10.0.0.1", Day0, Seq(
      line(E0 + 600, 600, "sda", 3001, 1), // 3001/6000 -> 1 (0.50016 up)
      line(E0 + 1200, 600, "sdb", 650001, 2))) // 108.3 -> capped 100
    val rows = read("at_util", "disks")
      .orderBy("device_name").collect()
    assert(rows(0).getAs[Double]("utilization_percent") == 1.0)
    assert(rows(1).getAs[Double]("utilization_percent") == 100.0)
    assert(rows(0).getAs[Long]("io_millis") == 3001L)
    assert(rows(0).getAs[Long]("sectors_read") == 2L)
    assert(rows(0).getAs[Long]("write_requests") == 6L)
    assert(rows(0).getAs[Long]("sectors_written") == 3L)
    assert(rows(0).getAs[java.sql.Timestamp]("start_time")
      .getTime / 1000 == E0)
  }

  test("max_history_days retention drops old days from planning") {
    AtopLogStore.drop("at_hist")
    for (d <- Seq(0L, 20L, 40L))
      AtopLogStore.append("at_hist", "10.0.0.1", Day0 + d,
        Seq(line(E0 + d * 86400 + 600, 600, "sda", 1001, d)))
    // default 30-day window is anchored at the newest day: day 40
    // retains days > 10 -> days 20 and 40
    assert(read("at_hist", "disks").rdd.getNumPartitions == 2)
    val wide = read("at_hist", "disks",
      Map("max_history_days" -> "100"))
    assert(wide.rdd.getNumPartitions == 3)
    val narrow = read("at_hist", "disks", Map("max_history_days" -> "1"))
    assert(narrow.rdd.getNumPartitions == 1)
    assert(narrow.head().getAs[Long]("read_requests") == 40L)
  }
}
