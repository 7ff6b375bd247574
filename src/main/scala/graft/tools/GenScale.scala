package graft.tools

import org.apache.spark.sql.{Dataset, SaveMode, SparkSession}
import graft.GraftSession

/** Deterministic synthetic-data generator for the SCALE experiments
  * (round-11 verdict ask #1): emits an sfN tree in the exact layout and
  * schema of the driver's `/root/testdata/sf*` trees (TESTDATA.md), at an
  * arbitrary multiplier of the sf0.1 row counts, so the scale-riskiest
  * queries can be re-benched at 10x+ without touching the read-only
  * driver data.
  *
  * Design constraints, in order:
  *  - DISTRIBUTED AND ORDER-FREE: every row is a pure function of its
  *    rowid through a splitmix64 stream — `spark.range(n).mapPartitions`,
  *    no driver-side loops, no `scala.util.Random` whose sequence would
  *    couple rows to partitioning. The same generator would emit 100 TB
  *    on a 1000-executor cluster unchanged.
  *  - SCHEMA-EXACT to the driver trees (column names, physical types,
  *    timestamp unit MICROS, embedding = list<float>), verified by
  *    GenScaleSpec against /root/testdata/sf0.01.
  *  - DISTRIBUTION-FAITHFUL where workload shape depends on it:
  *    lineitem order fan-out 1..7 (avg ~4, parent-consistent with
  *    orders), events confined to Jan 2024 (Tables.load asserts the
  *    month), heavy value ties (the top-k tie-break discipline),
  *    documents over the same 31-word vocab with ~0.2% planted exact
  *    dups + ~0.15% planted near-dups, embeddings in 10 unit-norm
  *    Gaussian clusters keyed by label (the IVF/k-means/dbscan shape).
  *
  * Usage: runMain graft.tools.GenScale <outDir> <multiplier>
  *   multiplier 10 => "sf1" (10x the sf0.1 row counts).
  */
object GenScale {

  // ---- splitmix64: the per-row deterministic stream ---------------------
  final class Mix(seed0: Long) {
    private var s = seed0
    def nextLong(): Long = {
      s += 0x9e3779b97f4a7c15L
      var z = s
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    /** uniform in [0, n) */
    def int(n: Int): Int = ((nextLong() >>> 1) % n).toInt
    def long(n: Long): Long = (nextLong() >>> 1) % n
    /** uniform in [0, 1) */
    def double(): Double = (nextLong() >>> 11) * 1.1102230246251565e-16
    /** standard normal (Box-Muller, burns two draws) */
    def gauss(): Double = {
      val u1 = math.max(double(), 1e-12); val u2 = double()
      math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.Pi * u2)
    }
  }
  def mix(table: Long, row: Long): Mix =
    new Mix(table * 0x100000001b3L + row * 0xc2b2ae3d27d4eb4fL + 42L)

  private def r2(x: Double): Double = math.rint(x * 100.0) / 100.0

  // ---- row types (schema-exact to the driver trees) ---------------------
  case class Region(r_regionkey: Int, r_name: String)
  case class Nation(n_nationkey: Int, n_name: String, n_regionkey: Int)
  case class Supplier(s_suppkey: Long, s_name: String, s_nationkey: Int,
      s_acctbal: Double)
  case class Customer(c_custkey: Long, c_name: String, c_nationkey: Int,
      c_acctbal: Double, c_mktsegment: String)
  case class Part(p_partkey: Long, p_name: String, p_brand: String,
      p_type: String, p_size: Int, p_retailprice: Double)
  case class Order(o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
      o_totalprice: Double, o_orderdate: java.time.LocalDateTime,
      o_orderpriority: String)
  case class Lineitem(l_orderkey: Long, l_partkey: Long, l_suppkey: Long,
      l_linenumber: Int, l_quantity: Double, l_extendedprice: Double,
      l_discount: Double, l_tax: Double, l_returnflag: String,
      l_linestatus: String, l_shipdate: java.time.LocalDateTime)
  case class Event(event_id: Long, ts: java.time.LocalDateTime, user_id: Long,
      event_type: String, value: Double, props: String)
  case class Document(doc_id: Long, text: String, lang: String,
      source: String, n_chars: Long)
  case class Embedding(vec_id: Long, embedding: Array[Float], label: Int)

  // ---- shared vocab/domain constants ------------------------------------
  val Vocab: Array[String] = Array("spark", "window", "merge", "table",
    "column", "vector", "stream", "value", "data", "small", "batch",
    "part", "line", "order", "sort", "fast", "scan", "a", "hash", "slow",
    "group", "query", "agg", "row", "big", "key", "the", "filter", "join",
    "customer", "b")
  val Langs: Array[String] = Array("en", "en", "de", "es", "fr", "zh")
  val EventTypes: Array[String] = Array("click", "error", "purchase",
    "signup", "view")
  val Segments: Array[String] = Array("AUTOMOBILE", "BUILDING",
    "FURNITURE", "HOUSEHOLD", "MACHINERY")
  val Priorities: Array[String] = Array("1-URGENT", "2-HIGH", "3-MEDIUM",
    "4-NOT SPECIFIED", "5-LOW")
  val PartAdj: Array[String] = Array("large", "hot", "blue", "old", "new",
    "red", "green", "small", "dark", "light")
  val PartNoun: Array[String] = Array("ring", "bolt", "plate", "screw",
    "nut", "washer", "gear", "rod", "pin", "cap")
  val PartTypes: Array[String] = Array("STANDARD", "SMALL", "MEDIUM",
    "LARGE", "ECONOMY", "PROMO")

  // driver trees are parquet TIMESTAMP(MICROS, isAdjustedToUTC=false) =
  // Spark TIMESTAMP_NTZ; LocalDateTime encodes to exactly that
  private def dayTs(epochDay: Long): java.time.LocalDateTime =
    java.time.LocalDateTime.ofEpochSecond(epochDay * 86400L, 0,
      java.time.ZoneOffset.UTC)
  private val Day1995 = java.time.LocalDate.of(1995, 1, 1).toEpochDay
  private val OrderDays = 2404L // 1995-01-01 .. 2001-08-01
  private val Jan2024Us =
    java.time.Instant.parse("2024-01-01T00:00:00Z").getEpochSecond * 1000000L
  private val Jan2024SpanUs = 30L * 86400L * 1000000L // Jan 1 .. Jan 31

  /** documents text: word salad over the 31-word vocab, 8..100 words.
    * Planted structure (rates match the driver tree at sf0.1):
    * doc_id % 640 == 639 -> EXACT copy of doc_id-1's text;
    * doc_id % 641 == 640 -> NEAR-dup of doc_id-1 (one word appended).
    *
    * `rich` mode (the SCALE.md background-similarity experiment): each
    * word carries a per-draw numeric suffix from a ~3,100-type effective
    * vocabulary, which drives the BACKGROUND pairwise shingle Jaccard of
    * unrelated docs from ~0.2 (driver-faithful word salad — adversarial
    * for every τ-threshold dedup family) to ~0 (realistic corpus), while
    * the planted dup/near-dup structure is identical. */
  private def docText(id: Long, rich: Boolean): String = {
    // resolve the base RECURSIVELY: id 640 is both a %641 near-dup of 639
    // AND 639 is itself a %640 exact dup of 638 — the near-dup must copy
    // 639's STORED text (seed 638), not its raw seed
    def baseSeed(i: Long): Long =
      if (i % 640 == 639 || i % 641 == 640) baseSeed(i - 1) else i
    val r = mix(if (rich) 19L else 9L, baseSeed(id))
    val n = 8 + r.int(93)
    val sb = new StringBuilder
    var i = 0
    while (i < n) {
      if (i > 0) sb.append(' ')
      sb.append(Vocab(r.int(Vocab.length)))
      if (rich) sb.append(r.int(100))
      i += 1
    }
    if (id % 641 == 640) sb.append(" extra")
    sb.toString
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: GenScale <outDir> <multiplier> [rich]")
    val spark = GraftSession.fromEnv()
    run(spark, args(0), args(1).toDouble,
      rich = args.lift(2).contains("rich"))
    spark.stop()
  }

  /** Programmatic entry (GenScaleSpec): never stops the caller's session. */
  def run(spark: SparkSession, out: String, m: Double,
      rich: Boolean = false): Unit = {
    import spark.implicits._
    // physical timestamp unit must match the driver trees (timestamp[us]):
    // Tables.load probes the events footer and branches on the unit
    spark.conf.set("spark.sql.parquet.outputTimestampType",
      "TIMESTAMP_MICROS")

    def sc(base: Long): Long = math.max(1L, math.rint(base * m).toLong)
    val nSupp = sc(1000L); val nPart = sc(20000L)
    val nCust = sc(15000L); val nOrd = sc(150000L)
    val nEvents = sc(100000L); val nUsers = sc(1500L)
    val nDocs = sc(5000L); val nEmb = sc(2000L)

    def write[T](ds: Dataset[T], name: String): Unit = {
      ds.write.mode(SaveMode.Overwrite).parquet(s"$out/$name.parquet")
      println(s"GENSCALE wrote $name")
    }

    write(spark.createDataset(Seq(Region(0, "AFRICA"), Region(1, "AMERICA"),
      Region(2, "ASIA"), Region(3, "EUROPE"), Region(4, "MIDDLE EAST"))),
      "region")
    write(spark.createDataset((0 until 25).map(i =>
      Nation(i, s"NATION_$i", i % 5))), "nation")

    write(spark.range(nSupp).map { i =>
      val r = mix(1L, i)
      Supplier(i, f"Supplier#$i%09d", r.int(25), r2(r.double() * 9999.0))
    }, "supplier")

    write(spark.range(nCust).map { i =>
      val r = mix(2L, i)
      Customer(i, f"Customer#$i%09d", r.int(25),
        r2(-999.99 + r.double() * 10999.79), Segments(r.int(5)))
    }, "customer")

    write(spark.range(nPart).map { i =>
      val r = mix(3L, i)
      Part(i, s"${PartAdj(r.int(10))} ${PartNoun(r.int(10))}",
        s"Brand#${1 + r.int(25)}", PartTypes(r.int(6)), 1 + r.int(50),
        r2(900.0 + i * 0.1))
    }, "part")

    write(spark.range(nOrd).map { i =>
      val r = mix(4L, i)
      Order(i, r.long(nCust), "FOP".charAt(r.int(3)).toString,
        r2(1000.0 + r.double() * 499000.0),
        dayTs(Day1995 + r.long(OrderDays)), Priorities(r.int(5)))
    }, "orders")

    // lineitem: parent-consistent flatMap from the order stream — the
    // SAME splitmix draws as the orders map above re-derive custkey/date,
    // then an independent stream fans out 1..7 lines (avg ~4).
    write(spark.range(nOrd).flatMap { i =>
      val ro = mix(4L, i)
      // burn draws in the orders map's exact arg order (custkey, status,
      // totalprice) so the next draw IS that order's o_orderdate
      ro.long(nCust); ro.int(3); ro.double()
      val odate = Day1995 + ro.long(OrderDays)
      val r = mix(5L, i)
      val lines = 1 + r.int(7)
      (1 to lines).map { ln =>
        val qty = (1 + r.int(50)).toDouble
        val price = r2(900.0 + r.double() * 104100.0)
        Lineitem(i, r.long(nPart), r.long(nSupp), ln, qty, price,
          r2(r.double() * 0.10), r2(r.double() * 0.08),
          "ANR".charAt(r.int(3)).toString, "FO".charAt(r.int(2)).toString,
          dayTs(odate + 1 + r.long(95)))
      }
    }, "lineitem")

    write(spark.range(nEvents).map { i =>
      val r = mix(6L, i)
      val us = Jan2024Us + r.long(Jan2024SpanUs)
      Event(i, java.time.LocalDateTime.ofEpochSecond(us / 1000000L,
          ((us % 1000000L) * 1000L).toInt, java.time.ZoneOffset.UTC),
        r.long(nUsers), EventTypes(r.int(5)),
        // cents over a bounded range => heavy ties at scale, exactly the
        // driver tree's ~18%-distinct shape the top-k tie-break needs
        (r.int(56022)).toDouble / 100.0,
        s"""{"k": ${r.int(100)}}""")
    }, "events")

    write(spark.range(nDocs).map { i =>
      val r = mix(7L, i)
      val t = docText(i, rich)
      val lang0 = Langs(r.int(Langs.length))
      // en-heavy mix like the driver tree (~41% en, rest ~even)
      val lang = if (r.double() < 0.12) "en" else lang0
      Document(i, t, lang, s"src${r.int(20)}", t.length.toLong)
    }, "documents")

    write(spark.range(nEmb).map { i =>
      val r = mix(8L, i)
      val label = r.int(10)
      // 10 unit-ish cluster centroids, each a deterministic function of
      // the label; vectors are centroid + sigma*noise, L2-normalized
      val rc = mix(80L + label, 7L)
      val c = Array.fill(64)(rc.gauss())
      val v = Array.tabulate(64)(d => c(d) + 0.6 * r.gauss())
      val norm = math.sqrt(v.map(x => x * x).sum)
      Embedding(i, v.map(x => (x / norm).toFloat), label)
    }, "embeddings")

    println(s"GENSCALE_DONE out=$out multiplier=$m")
  }
}
