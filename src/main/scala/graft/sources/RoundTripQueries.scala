package graft.sources

import graft.core.Cols._
import graft.core.{Q, Tables}
import graft.streaming.TempWork
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Non-parquet source/sink round trips (SURVEY.md §2B "Scans/sources":
  * parquet, text, json, csv). Each gated query writes a table out
  * through the format's sink, reads it back through the format's
  * source with an EXPLICIT schema (schema inference over 100 TB means
  * reading the data twice — a declared schema is the only scale-sane
  * contract), and audits the round trip with an aggregate whose oracle
  * is computed straight from the original parquet. A value the format
  * corrupts — a timestamp that loses its microseconds, a double that
  * fails to round-trip through decimal text, a comma that breaks CSV
  * quoting — lands in the aggregate and fails the cross-engine hash.
  *
  * Both formats round-trip doubles exactly: Spark writes shortest
  * decimal text (Ryū) and parses it back to the identical IEEE value.
  * Timestamps carry an explicit micros format on BOTH sides — the
  * default JSON/CSV patterns are millisecond-precision, which would
  * silently truncate the events table's micros instants.
  */
object RoundTripQueries {

  private val TsFmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"

  /** Spark 4 bundles the Avro FileFormat in spark-sql, but this
    * distribution's DataSourceRegister service file omits the "avro"
    * short name — the format is addressed by class (same engine path,
    * explicit binding; see b15's comment). */
  private val AvroFmt = "org.apache.spark.sql.avro.AvroFileFormat"

  private val eventsSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  private val customerSchema = StructType(Seq(
    StructField("c_custkey", LongType),
    StructField("c_name", StringType),
    StructField("c_nationkey", IntegerType),
    StructField("c_acctbal", DoubleType),
    StructField("c_mktsegment", StringType)))

  val all: Seq[Q] = Seq(

    // B2 — JSON-lines round trip on events: the hardest columns a text
    // format faces — micros timestamps, doubles, and props (a JSON
    // document nested as a STRING, so the writer must escape it and the
    // reader must NOT parse it). The audit keys every fidelity channel:
    // exact value sums via integer ten-thousandths (sum order never
    // touches doubles), micros extremes via epoch_us, distinct users.
    Q(
      "b2_jsonl_roundtrip",
      """SELECT event_type, count(*) AS n,
        |  count(DISTINCT user_id) AS users,
        |  SUM(CAST(round(value*10000) AS BIGINT)) / 10000.0 AS v_sum,
        |  min(epoch_us(ts)) AS ts_min, max(epoch_us(ts)) AS ts_max
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (spark, dir) =>
      val out = TempWork.dir("graft_b2_jsonl")
      Tables(spark, dir, "events")
        .write.mode("overwrite")
        .option("timestampFormat", TsFmt)
        .json(out)
      spark.read.schema(eventsSchema)
        .option("timestampFormat", TsFmt)
        .json(out)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("users"),
          sumFixed(col("value"), 10000).as("v_sum"),
          min(epochUs(col("ts"))).as("ts_min"),
          max(epochUs(col("ts"))).as("ts_max"))
        .orderBy("event_type")
    },

    // B3 — CSV round trip on customer: free-text name column exercises
    // the quoting path; the read declares the schema (header is written
    // for human inspection but the reader's contract is the schema, not
    // inference). Money audited as exact integer cents.
    Q(
      "b3_csv_roundtrip",
      """SELECT c_mktsegment, count(*) AS n,
        |  count(DISTINCT c_nationkey) AS nations,
        |  SUM(CAST(round(c_acctbal*100) AS BIGINT)) / 100.0 AS bal_sum,
        |  min(c_custkey) AS first_cust, max(c_custkey) AS last_cust
        |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (spark, dir) =>
      val out = TempWork.dir("graft_b3_csv")
      Tables(spark, dir, "customer")
        .write.mode("overwrite")
        .option("header", "true")
        .csv(out)
      spark.read.schema(customerSchema)
        .option("header", "true")
        .csv(out)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"),
          countDistinct(col("c_nationkey")).as("nations"),
          sumFixed(col("c_acctbal"), 100).as("bal_sum"),
          min(col("c_custkey")).as("first_cust"),
          max(col("c_custkey")).as("last_cust"))
        .orderBy("c_mktsegment")
    },

    // B4 — Hive-partitioned sink + PRUNED source: write orders
    // partitioned by priority (5 directories), read back with a
    // partition-column filter, and audit the filtered slice per month.
    // The filter never touches data files of the other four partitions
    // — it is resolved against DIRECTORY NAMES during file listing
    // (PartitionedScanSpec asserts the scan's partition count), which
    // is the first and cheapest pruning tier a 100 TB table has:
    // before min/max stats, before bloom filters, a date- or
    // tenant-partitioned layout turns a selective query into a listing
    // of one directory. The audit is all-integer (counts, cents, key
    // extremes) and the oracle filters the original table — equality
    // proves the partitioned round trip lost nothing AND routed every
    // row to the directory its partition value names.
    Q(
      "b4_partitioned_scan",
      """SELECT (epoch_us(o_orderdate) // 86400000000) // 32 AS month_bin,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents,
        |  min(o_orderkey) AS first_key, max(o_orderkey) AS last_key
        |FROM orders WHERE o_orderpriority = '1-URGENT'
        |GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (spark, dir) =>
      val out = TempWork.dir("graft_b4_part")
      Tables(spark, dir, "orders")
        .write.mode("overwrite").partitionBy("o_orderpriority").parquet(out)
      spark.read.parquet(out)
        .filter(col("o_orderpriority") === "1-URGENT")
        .groupBy(expr("unix_micros(o_orderdate) DIV 86400000000 DIV 32")
          .as("month_bin"))
        .agg(count(lit(1)).as("n_orders"),
          sum(fixed(col("o_totalprice"), 100)).as("cents"),
          min("o_orderkey").as("first_key"),
          max("o_orderkey").as("last_key"))
        .orderBy("month_bin")
    },

    // B5 — SCHEMA EVOLUTION round trip: a table whose early files were
    // written BEFORE a column existed (the v1 batch drops `props`),
    // read back as one table with `mergeSchema` — the lakehouse
    // reality every long-lived 100 TB dataset lives with, since
    // rewriting history on every added column is off the table. The
    // audit proves the merged read (a) unions the schemas, (b) fills
    // the missing column with NULL exactly on the v1 rows (even/odd
    // event_id split — deterministic, engine-independent), and (c)
    // loses no rows or values across the generations. mergeSchema is
    // declared explicitly: footer-schema union is a real (one footer
    // per file) planning cost a production table pays via its
    // catalog/manifest instead — the read path is otherwise identical.
    Q(
      "b5_schema_evolution",
      """SELECT event_type,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(SUM(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS v1_rows,
        |  CAST(SUM(CASE WHEN event_id % 2 = 0 THEN 0
        |       WHEN props IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS props_present,
        |  CAST(SUM(CAST(round(value * 10000) AS BIGINT)) AS BIGINT) AS val_10k,
        |  min(event_id) AS first_ev, max(event_id) AS last_ev
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (spark, dir) =>
      val out = TempWork.dir("graft_b5_evo")
      val ev = Tables(spark, dir, "events")
      // generation 1: the schema before `props` existed
      ev.filter(col("event_id") % 2 === 0)
        .select("event_id", "ts", "user_id", "event_type", "value")
        .write.mode("append").parquet(out)
      // generation 2: the widened schema
      ev.filter(col("event_id") % 2 =!= 0)
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
        .write.mode("append").parquet(out)
      spark.read.option("mergeSchema", "true").parquet(out)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("event_id") % 2 === 0, 1L).otherwise(0L)).as("v1_rows"),
          sum(when(col("event_id") % 2 === 0, 0L)
            .when(col("props").isNull, 0L).otherwise(1L)).as("props_present"),
          sum(fixed(col("value"), 10000L)).as("val_10k"),
          min("event_id").as("first_ev"),
          max("event_id").as("last_ev"))
        .orderBy("event_type")
    },

    // B9 — ORC round trip on events: the OTHER mainstream columnar
    // format (Spark ships the ORC reader/writer natively; a lake
    // migrating between Hive-era ORC and parquet runs exactly this).
    // ORC stores timestamps at nanosecond precision natively — no
    // format-string contract needed, unlike b2/b3's text formats —
    // and doubles as IEEE bits, so the audit proves the binary
    // round trip preserves micros instants, exact value sums, and
    // row identity. The filter on the read side additionally
    // exercises ORC's predicate-pushdown path (min/max stripe stats
    // — the ORC analogue of parquet row-group pruning; the audit
    // restricts to purchase/click so a pushdown bug that drops or
    // double-reads stripes shows up in the counts).
    Q(
      "b9_orc_roundtrip",
      """SELECT event_type, count(*) AS n,
        |  count(DISTINCT user_id) AS users,
        |  CAST(SUM(CAST(round(value*10000) AS BIGINT)) AS BIGINT) AS val_10k,
        |  min(epoch_us(ts)) AS ts_min, max(epoch_us(ts)) AS ts_max,
        |  min(event_id) AS first_ev, max(event_id) AS last_ev
        |FROM events WHERE event_type IN ('purchase', 'click')
        |GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (spark, dir) =>
      val out = TempWork.dir("graft_b9_orc")
      Tables(spark, dir, "events")
        .write.mode("overwrite").orc(out)
      spark.read.schema(eventsSchema).orc(out)
        .filter(col("event_type").isin("purchase", "click"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("users"),
          sum(fixed(col("value"), 10000L)).as("val_10k"),
          min(epochUs(col("ts"))).as("ts_min"),
          max(epochUs(col("ts"))).as("ts_max"),
          min("event_id").as("first_ev"),
          max("event_id").as("last_ev"))
        .orderBy("event_type")
    },

    // B15 — Avro round trip on events: the mainstream ROW-oriented
    // lake format (Kafka payloads, schema-registry pipelines, and
    // every ingest tier that streams records before a columnar
    // compaction lands them as parquet — b6's job, one format
    // earlier). Spark 4 ships the Avro reader/writer inside spark-sql
    // (AvroFileFormat), but this distribution's service registry does
    // not map the short name "avro" to it, so the format is addressed
    // by its class name — same engine path, explicit binding. The
    // fidelity contract differs from b9's columnar case:
    // Avro carries timestamps as the timestamp-micros LOGICAL TYPE
    // (exact micros, no format string) and doubles as IEEE bits, and
    // the reader must resolve the writer-embedded schema against the
    // DECLARED read schema. The read-side filter exercises Avro's
    // row-level filter pushdown (no stripe/row-group stats exist in a
    // row format — pruning happens at deserialization, which is
    // precisely why the ingest tier compacts to columnar; the audit
    // restricts to view/purchase so a pushdown bug that drops or
    // double-reads records lands in the counts).
    Q(
      "b15_avro_roundtrip",
      """SELECT event_type, count(*) AS n,
        |  count(DISTINCT user_id) AS users,
        |  CAST(SUM(CAST(round(value*10000) AS BIGINT)) AS BIGINT) AS val_10k,
        |  min(epoch_us(ts)) AS ts_min, max(epoch_us(ts)) AS ts_max,
        |  min(event_id) AS first_ev, max(event_id) AS last_ev
        |FROM events WHERE event_type IN ('view', 'purchase')
        |GROUP BY 1 ORDER BY 1""".stripMargin
    ) { (spark, dir) =>
      val out = TempWork.dir("graft_b15_avro")
      Tables(spark, dir, "events")
        .write.mode("overwrite").format(AvroFmt).save(out)
      spark.read.schema(eventsSchema).format(AvroFmt).load(out)
        .filter(col("event_type").isin("view", "purchase"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("users"),
          sum(fixed(col("value"), 10000L)).as("val_10k"),
          min(epochUs(col("ts"))).as("ts_min"),
          max(epochUs(col("ts"))).as("ts_max"),
          min("event_id").as("first_ev"),
          max("event_id").as("last_ev"))
        .orderBy("event_type")
    }
  )
}
