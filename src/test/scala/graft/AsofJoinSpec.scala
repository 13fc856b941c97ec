package graft

import graft.operators.Relational.asofJoin

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asofJoin attaches the latest right row at or before each left row per key") {
    val quotes = Seq( // (key, ts, price)
      (1L, ts("2024-01-01 10:00:00"), 100.0),
      (1L, ts("2024-01-01 10:05:00"), 101.0),
      (1L, ts("2024-01-01 10:30:00"), 99.0),
      (2L, ts("2024-01-01 11:00:00"), 50.0))
      .toDF("acct", "qts", "price")
    val trades = Seq( // (key, ts, qty)
      (1L, ts("2024-01-01 10:05:00"), 10),  // tie → matches the 10:05 quote
      (1L, ts("2024-01-01 10:20:00"), 20),  // between → 10:05 quote
      (1L, ts("2024-01-01 09:00:00"), 5),   // before any quote → null
      (2L, ts("2024-01-01 12:00:00"), 7),   // → 11:00 quote
      (3L, ts("2024-01-01 12:00:00"), 1))   // key with no quotes → null
      .toDF("acct", "tts", "qty")

    val out = asofJoin(trades, quotes, "acct", "tts", "qts",
      rightCols = Seq("acct", "qts", "price"))
      .orderBy("acct", "tts")
      .collect()
      .map(r => (r.getLong(0), r.getInt(2),
        Option(r.getAs[java.sql.Timestamp]("asof_qts")).map(_.toString),
        Option(r.getAs[Any]("asof_price"))))

    assert(out.toSeq == Seq(
      (1L, 5, None, None),
      (1L, 10, Some("2024-01-01 10:05:00.0"), Some(101.0)),
      (1L, 20, Some("2024-01-01 10:05:00.0"), Some(101.0)),
      (2L, 7, Some("2024-01-01 11:00:00.0"), Some(50.0)),
      (3L, 1, None, None)))
  }
}
