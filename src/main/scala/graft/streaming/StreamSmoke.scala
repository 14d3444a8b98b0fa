package graft.streaming

import org.apache.spark.sql.SparkSession

/** Smoke main for the streaming surface: wires StreamOps to a live
  * `rate` source and a memory sink, runs a few micro-batches, prints
  * the observed windows. Usage:
  *   java -cp "classes:SPARK_JARS" graft.streaming.StreamSmoke
  */
object StreamSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // rate source → events schema; event time fans out so windows differ.
    val events = spark.readStream.format("rate").option("rowsPerSecond", "500").load()
      .selectExpr(
        "value AS event_id",
        "timestamp_micros(unix_micros(timestamp) + value * 600000000) AS ts",
        "value % 5 AS user_id",
        "CASE WHEN value % 2 = 0 THEN 'click' ELSE 'view' END AS event_type",
        "CAST(value % 7 AS DOUBLE) / 2 AS value")

    val q = StreamOps.tumbling(events).writeStream
      .format("memory").queryName("smoke_tumbling").outputMode("complete").start()
    val s = StreamOps.sessions(events).writeStream
      .format("memory").queryName("smoke_sessions").outputMode("complete").start()
    Thread.sleep(6000)
    q.processAllAvailable()
    s.processAllAvailable()

    val windows = spark.table("smoke_tumbling").orderBy("ws_us", "event_type").collect()
    println(s"TUMBLING_ROWS=${windows.length}")
    windows.take(5).foreach(r => println(s"ROW $r"))
    println(s"SESSION_ROWS=${spark.table("smoke_sessions").count()}")
    q.stop(); s.stop()
    spark.stop()
    sys.exit(0)
  }
}
