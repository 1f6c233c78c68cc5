package graft

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampNTZType

/** Deterministic fixture generator for the SCALE REHEARSAL (VERDICT r7
  * item 1): reproduces the driver fixture's schemas and distributions —
  * verified against /root/testdata by direct inspection (row-count
  * scaling, category domains, value spans, the 5% appended-" dup"
  * near-duplicate process, unit-norm 64-dim embeddings with weak label
  * clusters, monotone 30-day event stream) — at any SF, so sf1 can be
  * generated locally and the full oracle gate + slow-query timing run
  * one decade above the driver's sf0.1.
  *
  * Pure columnar generation: every value is a hash of (salt, row id), so
  * output is deterministic regardless of partitioning and generating 10x
  * the data is just spark.range(10x) — no driver-side loops, no RNG
  * state. Usage: Test/runMain graft.GenData <outDir> <sf>
  */
object GenData {

  /** Uniform [0,1) as a pure function of (salt, id columns). */
  private def u(salt: Int, cols: Column*): Column =
    pmod(xxhash64((lit(salt) +: cols): _*), lit(1000000000L))
      .cast("double") / 1e9

  /** Uniform integer in [0, n) as a pure function of (salt, ids). */
  private def ui(salt: Int, n: Int, cols: Column*): Column =
    pmod(xxhash64((lit(salt) +: cols): _*), lit(n.toLong)).cast("int")

  private def pick(salt: Int, values: Seq[String], cols: Column*): Column =
    element_at(array(values.map(lit): _*), ui(salt, values.size, cols: _*) + 1)

  private def money(salt: Int, lo: Double, hi: Double,
      cols: Column*): Column =
    round(u(salt, cols: _*) * (hi - lo) + lo, 2)

  /** Write a frame as a SINGLE parquet file at dir/name.parquet (the
    * driver fixture's one-file-per-table layout, which DuckDB's plain
    * 'path' read expects).
    */
  private def writeOne(df: DataFrame, dir: String, name: String): Unit = {
    val tmp = s"$dir/.tmp_$name"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = Files.list(Paths.get(tmp)).toArray.map(_.asInstanceOf[Path])
      .find(_.getFileName.toString.endsWith(".parquet"))
      .getOrElse(sys.error(s"no part file written for $name"))
    val target = Paths.get(s"$dir/$name.parquet")
    Files.deleteIfExists(target)
    Files.move(part, target)
    import scala.jdk.CollectionConverters._
    scala.util.Using.resource(Files.walk(Paths.get(tmp))) { st =>
      st.iterator().asScala.toSeq.sortBy(-_.getNameCount)
        .foreach(Files.delete)
    }
    println(s"[gendata] $name: ${df.count()} rows -> $target")
  }

  def main(args: Array[String]): Unit = {
    val Array(outDir, sfStr) = args.take(2)
    val sf = sfStr.toDouble
    val spark = GraftSession.create("graft-gendata")
    // Small row groups (4 MB vs the 128 MB default): row groups are the
    // scan-parallelism unit of a parquet FILE, and the one-file-per-table
    // layout would otherwise serialize every sf1 table scan onto a single
    // task — no real large dataset is one row group.
    spark.sparkContext.hadoopConfiguration
      .setInt("parquet.block.size", 4 * 1024 * 1024)
    import spark.implicits._
    new java.io.File(outDir).mkdirs()
    val id = col("id")

    // ---- region / nation (fixed-size dimensions) ----------------------
    writeOne(Seq((0, "AFRICA"), (1, "AMERICA"), (2, "ASIA"), (3, "EUROPE"),
        (4, "MIDDLE EAST"))
      .toDF("r_regionkey", "r_name"), outDir, "region")
    writeOne(spark.range(25).select(id.cast("int").as("n_nationkey"),
      concat(lit("NATION_"), id).as("n_name"),
      (id % 5).cast("int").as("n_regionkey")), outDir, "nation")

    // ---- supplier / customer / part -----------------------------------
    val nSupp = math.max(10, (10000 * sf).toInt)
    val nCust = math.max(150, (150000 * sf).toInt)
    val nPart = math.max(200, (200000 * sf).toInt)
    writeOne(spark.range(nSupp).select(id.as("s_suppkey"),
      format_string("Supplier#%09d", id).as("s_name"),
      ui(1, 25, id).as("s_nationkey"),
      money(2, 0, 10000, id).as("s_acctbal")), outDir, "supplier")
    writeOne(spark.range(nCust).select(id.as("c_custkey"),
      format_string("Customer#%09d", id).as("c_name"),
      ui(3, 25, id).as("c_nationkey"),
      money(4, -1000, 10000, id).as("c_acctbal"),
      pick(5, Seq("AUTOMOBILE", "BUILDING", "MACHINERY", "FURNITURE",
        "HOUSEHOLD"), id).as("c_mktsegment")), outDir, "customer")
    writeOne(spark.range(nPart).select(id.as("p_partkey"),
      concat(pick(6, Seq("small", "red", "blue", "old", "hot", "large",
          "new", "cold"), id), lit(" "),
        pick(7, Seq("gizmo", "anvil", "widget", "ring", "gear", "bolt",
          "plate", "rod"), id)).as("p_name"),
      concat(lit("Brand#"), (ui(8, 25, id) + 1)).as("p_brand"),
      pick(9, Seq("STANDARD", "LARGE", "ECONOMY", "SMALL", "MEDIUM",
        "PROMO"), id).as("p_type"),
      (ui(10, 50, id) + 1).as("p_size"),
      round(lit(900.0) + (id % 1000) * 0.1, 2).as("p_retailprice")),
      outDir, "part")

    // ---- orders / lineitem ---------------------------------------------
    val nOrders = math.max(1500, (1500000 * sf).toInt)
    val nLines = math.max(6000, (6000000 * sf).toInt)
    // 1995-01-01 .. 2001-08-01, midnight NTZ (2404-day span)
    def orderDate(k: Column): Column =
      date_add(lit(java.sql.Date.valueOf("1995-01-01")),
        ui(11, 2405, k)).cast(TimestampNTZType)
    writeOne(spark.range(nOrders).select(id.as("o_orderkey"),
      ui(12, nCust, id).cast("long").as("o_custkey"),
      pick(13, Seq("P", "O", "F"), id).as("o_orderstatus"),
      money(14, 1000, 500000, id).as("o_totalprice"),
      orderDate(id).as("o_orderdate"),
      pick(15, Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
        "5-LOW"), id).as("o_orderpriority")), outDir, "orders")
    // Line rows draw their order key uniformly (≈ e^-4 of orders end up
    // lineless, matching the fixture's 14743/15000 distinct) and ship
    // 1..95 days after that order's deterministic date.
    writeOne(spark.range(nLines)
      .withColumn("l_orderkey", ui(16, nOrders, id).cast("long"))
      .select(col("l_orderkey"),
        ui(17, nPart, id).cast("long").as("l_partkey"),
        ui(18, nSupp, id).cast("long").as("l_suppkey"),
        (ui(19, 7, id) + 1).as("l_linenumber"),
        (ui(20, 50, id) + 1).cast("double").as("l_quantity"),
        money(21, 900, 105000, id).as("l_extendedprice"),
        (ui(22, 11, id) * lit(0.01)).as("l_discount"),
        (ui(23, 9, id) * lit(0.01)).as("l_tax"),
        pick(24, Seq("A", "N", "R"), id).as("l_returnflag"),
        pick(25, Seq("O", "F"), id).as("l_linestatus"),
        (orderDate(col("l_orderkey")).cast("date") +
          make_dt_interval(ui(26, 95, id).cast("long") + 1))
          .cast(TimestampNTZType).as("l_shipdate")),
      outDir, "lineitem")

    // ---- events (30-day monotone stream) -------------------------------
    val nEvents = math.max(1000, (1000000 * sf).toInt)
    val nUsers = math.max(150, (15000 * sf).toInt)
    val spanUs = 30L * 86400 * 1000000
    writeOne(spark.range(nEvents).select(id.as("event_id"),
      // start + (id + jitter) * gap: strictly monotone in event_id
      timestamp_micros(lit(1704067200000000L) +
        ((id.cast("double") + u(27, id)) * (spanUs.toDouble / nEvents))
          .cast("long")).cast(TimestampNTZType).as("ts"),
      ui(28, nUsers, id).cast("long").as("user_id"),
      pick(29, Seq("click", "view", "purchase", "signup", "error"), id)
        .as("event_type"),
      // Exp(50), 2dp — matches the fixture's mean≈std≈50 tail
      round(-lit(50.0) * log(lit(1.0) - u(30, id) + lit(1e-12)), 2)
        .as("value"),
      format_string("{\"k\": %d}", ui(31, 100, id)).as("props")),
      outDir, "events")

    // ---- documents (5% appended-" dup" near-duplicates) ----------------
    val nDocs = math.max(500, (50000 * sf).toInt)
    val vocab = Seq("join", "hash", "row", "batch", "scan", "customer",
      "column", "filter", "small", "slow", "merge", "order", "vector",
      "line", "data", "table", "agg", "value", "key", "stream", "window",
      "spark", "a", "part", "group", "big", "sort", "query", "fast", "the")
    val isDup = ui(32, 20, id) === 0
    val baseId = pmod(xxhash64(lit(33), id), lit(nDocs.toLong - 1))
    val genId = when(isDup, when(baseId === id, baseId + 1)
      .otherwise(baseId)).otherwise(id)
    val nWords = ui(34, 90, genId) + 10
    val baseText = array_join(transform(sequence(lit(1), nWords),
      i => element_at(array(vocab.map(lit): _*),
        ui(35, vocab.size, genId, i) + 1)), " ")
    val text = when(isDup, concat(baseText,
        when(ui(36, 8, id) === 0, lit(" dup dup")).otherwise(lit(" dup"))))
      .otherwise(baseText)
    writeOne(spark.range(nDocs).select(id.as("doc_id"), text.as("text"),
      when(u(37, id) < 0.44, lit("en")).otherwise(
        pick(38, Seq("de", "zh", "fr", "es"), id)).as("lang"),
      concat(lit("src"), ui(39, 20, id)).as("source"),
      length(text).cast("long").as("n_chars")), outDir, "documents")

    // ---- embeddings (unit-norm float32[64], weak label clusters) -------
    val nVecs = math.max(500, (20000 * sf).toInt)
    val lbl = ui(40, 10, id)
    // center(label,j)*0.03 + N(0,0.125) noise (Box-Muller), normalized:
    // |center|²/|noise|² ≈ 0.02 — same-label mean cosine lands at the
    // fixture's ~0.02 (0.15 amplitude measured 0.34, far too clustered)
    val raw = transform(sequence(lit(0), lit(63)), j =>
      (u(41, lbl, j) * 2 - 1) * 0.03 +
        sqrt(-lit(2.0) * log(u(42, id, j) + lit(1e-12))) *
          cos(u(43, id, j) * lit(2 * math.Pi)) * lit(0.125))
    writeOne(spark.range(nVecs)
      .select(id.as("vec_id"), raw.as("r"), lbl.as("label"))
      .withColumn("nrm", sqrt(aggregate(col("r"), lit(0.0),
        (acc, x) => acc + x * x)))
      .select(col("vec_id"),
        transform(col("r"), x => (x / col("nrm")).cast("float"))
          .as("embedding"),
        col("label")), outDir, "embeddings")

    spark.stop()
  }
}
