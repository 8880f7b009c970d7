package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.ExactRound

/** Data-layout advisors — the write-time physical-design measurements a
  * 100 TB table needs before anyone queries it: how well each column's
  * values cluster under the current write order (min/max pruning
  * effectiveness, the Snowflake `clustering_information` analog) and
  * what a sort-key or Z-order rewrite would buy. Pure measurements over
  * chunk metadata: the only data-sized steps are single scans; every
  * audit frame after that is #chunks- or #buckets-bounded.
  */
object LayoutQueries {

  private def events(s: SparkSession, dir: String) =
    Tables.load(s, dir, "events")

  // -- q242: clustering-depth audit — simulate the current write order
  //          (event_id ranges) chunked into 100-id row groups; per
  //          candidate column, per chunk, [min,max]; the DEPTH at a
  //          chunk's lower bound = how many chunk intervals cover it
  //          (opens_le − closes_lt, two RANGE-frame cumulative counts
  //          — exact longs, tie-safe because RANGE frames include all
  //          equal keys regardless of row order). Depth ≈ 1 ⇒ min/max
  //          pruning works (a point predicate touches ~1 chunk);
  //          depth ≈ n_chunks ⇒ the column is scattered and every scan
  //          reads everything — the signal that picks a sort key.
  //          Scale shape: ONE scan + one chunk-keyed aggregate; the
  //          sweep windows run over 2·n_chunks metadata rows (row
  //          groups, not rows — the same metadata-scale window class
  //          as q141's shard manifest).
  private val ChunkIds = 100L

  private def q242(s: SparkSession, dir: String): DataFrame = {
    val chunks = events(s, dir)
      .select(expr(s"event_id div $ChunkIds").as("chunk"),
        expr("unix_timestamp(ts)").as("sec"), col("user_id"))
      .groupBy(col("chunk"))
      .agg(min(col("sec")).as("sec_min"), max(col("sec")).as("sec_max"),
        min(col("user_id")).as("uid_min"), max(col("user_id")).as("uid_max"))

    def depth(minC: String, maxC: String, name: String): DataFrame = {
      val evs = chunks
        .select(col(minC).as("v"), lit(1L).as("op"), lit(0L).as("cl"),
          lit(true).as("is_min"))
        .unionByName(chunks.select(col(maxC).as("v"), lit(0L).as("op"),
          lit(1L).as("cl"), lit(false).as("is_min")))
      val wLe = Window.orderBy(col("v"))
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
      val wLt = Window.orderBy(col("v"))
        .rangeBetween(Window.unboundedPreceding, -1)
      evs
        .withColumn("opens_le", sum(col("op")).over(wLe))
        .withColumn("closes_lt",
          coalesce(sum(col("cl")).over(wLt), lit(0L)))
        .filter(col("is_min"))
        .agg(count(lit(1)).as("n_chunks"),
          sum(col("opens_le") - col("closes_lt")).as("depth_sum"),
          max(col("opens_le") - col("closes_lt")).as("max_depth"))
        .select(lit(name).as("col_name"), col("n_chunks"),
          ExactRound.ratio6(col("depth_sum"), col("n_chunks"))
            .as("avg_depth"),
          col("max_depth"))
    }

    depth("sec_min", "sec_max", "sec")
      .unionByName(depth("uid_min", "uid_max", "user_id"))
      .orderBy(col("col_name"))
  }

  private val q242Sql = {
    def leg(minC: String, maxC: String, name: String) =
      s"""SELECT '$name' AS col_name, n_chunks,
         |  ${ExactRound.sql.ratio6("depth_sum", "n_chunks")} AS avg_depth,
         |  max_depth
         |FROM (
         |  SELECT CAST(count(*) AS BIGINT) AS n_chunks,
         |    CAST(sum(opens_le - closes_lt) AS BIGINT) AS depth_sum,
         |    CAST(max(opens_le - closes_lt) AS BIGINT) AS max_depth
         |  FROM (
         |    SELECT is_min,
         |      CAST(sum(op) OVER (ORDER BY v RANGE BETWEEN UNBOUNDED
         |        PRECEDING AND CURRENT ROW) AS BIGINT) AS opens_le,
         |      CAST(coalesce(sum(cl) OVER (ORDER BY v RANGE BETWEEN
         |        UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         |        AS closes_lt
         |    FROM (
         |      SELECT $minC AS v, 1 AS op, 0 AS cl, TRUE AS is_min
         |      FROM chunks
         |      UNION ALL
         |      SELECT $maxC, 0, 1, FALSE FROM chunks) sweep) d
         |  WHERE is_min) agg""".stripMargin
    s"""WITH chunks AS (
       |  SELECT event_id // $ChunkIds AS chunk,
       |    min(CAST(floor(epoch(ts)) AS BIGINT)) AS sec_min,
       |    max(CAST(floor(epoch(ts)) AS BIGINT)) AS sec_max,
       |    min(user_id) AS uid_min, max(user_id) AS uid_max
       |  FROM events GROUP BY 1)
       |SELECT * FROM (
       |  ${leg("sec_min", "sec_max", "sec")}
       |  UNION ALL
       |  ${leg("uid_min", "uid_max", "user_id")})
       |ORDER BY col_name""".stripMargin
  }

  // -- q243: Z-order layout comparison — what a layout rewrite buys for
  //          two-dimensional pruning. Three candidate layouts of the
  //          events table, each bucketed into 256 equal-width key
  //          ranges: `natural` (event_id, ≈ arrival), `by_user`
  //          (user_id sort), `zorder` (4+4-bit interleave of the
  //          normalized user_id and sec coordinates — Morton order).
  //          Per layout the score is the average per-bucket [min,max]
  //          span of EACH dimension as a fraction of its global range —
  //          exact integer span sums over bucket metadata, one ratio6
  //          at the end: a dimension with a small fraction prunes under
  //          min/max stats in that layout. Sorting by one key wins its
  //          own dimension and forfeits the other; Z-order pays a
  //          little on both to win on both — measured here, not argued.
  //          Scale shape: ONE scan computes all three bucket ids (the
  //          1-row global-range frame is the only broadcast cross);
  //          three 256-bounded aggregates follow. A real rewrite would
  //          range-partition on the same keys — this audit is the
  //          decision input, not the shuffle itself.
  private val ZBits = 4 // per dimension -> 256 Morton buckets
  private val Buckets = 256L

  /** Morton interleave of two ZBits-bit coordinates (u odd bits, t even
    * bits) as a column expression — codegen'd shifts/masks, no UDF. */
  private def morton(zu: Column, zt: Column): Column =
    (0 until ZBits).map { i =>
      (shiftleft(shiftright(zu, i).bitwiseAND(1), 2 * i + 1)
        .bitwiseOR(shiftleft(shiftright(zt, i).bitwiseAND(1), 2 * i)))
    }.reduce(_.bitwiseOR(_))

  private def mortonSql(zu: String, zt: String): String =
    (0 until ZBits).map { i =>
      s"((($zu >> $i) & 1) << ${2 * i + 1}) | ((($zt >> $i) & 1) << ${2 * i})"
    }.mkString("(", ") | (", ")")

  private def q243(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir).select(col("event_id").as("e"),
      expr("unix_timestamp(ts)").as("t"), col("user_id").as("u"))
    val rng = ev.agg(
      min(col("e")).as("e0"), max(col("e")).as("e1"),
      min(col("u")).as("u0"), max(col("u")).as("u1"),
      min(col("t")).as("t0"), max(col("t")).as("t1"))
    def width(lo: Column, hi: Column) = hi - lo + lit(1L)
    val b = ev.crossJoin(broadcast(rng)).select(
      col("u"), col("t"),
      expr(s"(e - e0) * $Buckets div (e1 - e0 + 1)").as("b_nat"),
      expr(s"(u - u0) * $Buckets div (u1 - u0 + 1)").as("b_user"),
      morton(expr(s"(u - u0) * ${1L << ZBits} div (u1 - u0 + 1)"),
        expr(s"(t - t0) * ${1L << ZBits} div (t1 - t0 + 1)")).as("b_z"),
      width(col("u0"), col("u1")).as("u_range"),
      width(col("t0"), col("t1")).as("t_range"))
    def layout(bucket: String, name: String): DataFrame =
      b.groupBy(col(bucket))
        .agg((max(col("u")) - min(col("u")) + lit(1L)).as("u_span"),
          (max(col("t")) - min(col("t")) + lit(1L)).as("t_span"),
          max(col("u_range")).as("u_range"), max(col("t_range")).as("t_range"))
        .agg(count(lit(1)).as("n_buckets"),
          sum(col("u_span")).as("us"), sum(col("t_span")).as("ts"),
          max(col("u_range")).as("ur"), max(col("t_range")).as("tr"))
        .select(lit(name).as("layout"), col("n_buckets"),
          ExactRound.ratio6(col("us"), col("n_buckets") * col("ur"))
            .as("avg_user_span"),
          ExactRound.ratio6(col("ts"), col("n_buckets") * col("tr"))
            .as("avg_sec_span"))
    layout("b_nat", "natural")
      .unionByName(layout("b_user", "by_user"))
      .unionByName(layout("b_z", "zorder"))
      .orderBy(col("layout"))
  }

  private val q243Sql = {
    val zb = 1L << ZBits
    def leg(bucket: String, name: String) =
      s"""SELECT '$name' AS layout, n_buckets,
         |  ${ExactRound.sql.ratio6("us", "n_buckets * ur")} AS avg_user_span,
         |  ${ExactRound.sql.ratio6("ts", "n_buckets * tr")} AS avg_sec_span
         |FROM (
         |  SELECT CAST(count(*) AS BIGINT) AS n_buckets,
         |    CAST(sum(u_span) AS BIGINT) AS us,
         |    CAST(sum(t_span) AS BIGINT) AS ts,
         |    max(u_range) AS ur, max(t_range) AS tr
         |  FROM (
         |    SELECT $bucket,
         |      max(u) - min(u) + 1 AS u_span, max(t) - min(t) + 1 AS t_span,
         |      max(u_range) AS u_range, max(t_range) AS t_range
         |    FROM b GROUP BY 1) g) a""".stripMargin
    s"""WITH ev AS (
       |  SELECT event_id AS e, CAST(floor(epoch(ts)) AS BIGINT) AS t,
       |    user_id AS u
       |  FROM events),
       |rng AS (
       |  SELECT min(e) AS e0, max(e) AS e1, min(u) AS u0, max(u) AS u1,
       |    min(t) AS t0, max(t) AS t1
       |  FROM ev),
       |b AS (
       |  SELECT u, t,
       |    (e - e0) * $Buckets // (e1 - e0 + 1) AS b_nat,
       |    (u - u0) * $Buckets // (u1 - u0 + 1) AS b_user,
       |    ${mortonSql(s"((u - u0) * $zb // (u1 - u0 + 1))",
           s"((t - t0) * $zb // (t1 - t0 + 1))")} AS b_z,
       |    u1 - u0 + 1 AS u_range, t1 - t0 + 1 AS t_range
       |  FROM ev CROSS JOIN rng)
       |SELECT * FROM (
       |  ${leg("b_nat", "natural")}
       |  UNION ALL
       |  ${leg("b_user", "by_user")}
       |  UNION ALL
       |  ${leg("b_z", "zorder")})
       |ORDER BY layout""".stripMargin
  }

  // -- q244: Bloom runtime-filter audit — size the join pre-filter a
  //          1000-executor shuffle join would ship: build an m-bit,
  //          k-hash Bloom filter over the orders-side join keys
  //          (distinct o_custkey of orders over the high-value
  //          threshold — the filtered-dim case where Spark actually
  //          injects one), probe it with every customer key,
  //          and report the MEASURED false-pass rate on true
  //          non-matches next to the fill-based estimate
  //          (bits_set/m)^k. The decision input for Spark's
  //          bloom-pushdown: if measured FPR at this m is high, the
  //          filter ships bytes without pruning rows. Fully
  //          declarative — the "bitset" is a distinct-position frame,
  //          probes pass when all k hash-join lookups hit; exact longs
  //          end-to-end, the two rates are single ratio6/multiply
  //          expressions (no pow, no cross-engine libm). Scale shape:
  //          build explode is k·|build| rows hash-joined on position
  //          (m-bounded build side); probe explode is k·|probe| rows —
  //          both plain equi-joins that partition like any shuffle
  //          join; output is ONE row.
  private val BloomBits = 4096L
  private val BloomK = 3
  private val HighValue = 400000.0 // dim-side filter: the case where Spark injects a runtime filter

  private def q244(s: SparkSession, dir: String): DataFrame = {
    import graft.pipeline.Sampling
    val build = Tables.load(s, dir, "orders")
      .filter(col("o_totalprice") > HighValue)
      .select(col("o_custkey").as("key")).distinct()
    val probe = Tables.load(s, dir, "customer")
      .select(col("c_custkey").as("key"))
    def positions(df: DataFrame) = (0 until BloomK).map(i =>
      df.select(col("key"),
        Sampling.hashBucket(col("key"), BloomBits.toInt, s"bloom$i")
          .as("pos"))).reduce(_ unionByName _)
    val bits = positions(build).select(col("pos")).distinct()
    val probeHits = positions(probe)
      .join(bits.withColumn("hit", lit(1L)), Seq("pos"), "left")
      .groupBy(col("key"))
      .agg(sum(coalesce(col("hit"), lit(0L))).as("hits"))
      .join(build.withColumn("is_match", lit(1L)), Seq("key"), "left")
      .select(col("key"), (col("hits") === BloomK).cast("long").as("pass"),
        coalesce(col("is_match"), lit(0L)).as("is_match"))
    val stats = probeHits.agg(
      count(lit(1)).as("n_probe"),
      sum(lit(1L) - col("is_match")).as("n_nonmatch"),
      sum(when(col("is_match") === 0L, col("pass")).otherwise(lit(0L)))
        .as("n_false_pass"))
    val buildStats = build.agg(count(lit(1)).as("n_build"))
    val bitStats = bits.agg(count(lit(1)).as("bits_set"))
    def dd(c: Column) = c.cast("double")
    stats.crossJoin(broadcast(buildStats)).crossJoin(broadcast(bitStats))
      .select(col("n_build"), lit(BloomBits).as("m_bits"),
        lit(BloomK.toLong).as("k_hashes"), col("bits_set"),
        ExactRound.ratio6(col("bits_set"), lit(BloomBits)).as("fill_ratio"),
        col("n_probe"), col("n_nonmatch"), col("n_false_pass"),
        when(col("n_nonmatch") > 0,
          ExactRound.ratio6(col("n_false_pass"), col("n_nonmatch")))
          .as("measured_fpr"),
        // fill^k generated from BloomK so the estimate tracks the k
        // actually used for hashing (a hardcoded cube desynchronizes
        // silently when k changes)
        round(Seq.fill(BloomK)(dd(col("bits_set")) / BloomBits)
          .reduce(_ * _), 6).as("est_fpr"))
  }

  private val q244Sql = {
    import graft.pipeline.Sampling
    def posLeg(src: String, i: Int) =
      s"SELECT key, ${Sampling.sql.hashBucket("key", BloomBits.toInt, s"bloom$i")} AS pos FROM $src"
    val buildPos = (0 until BloomK).map(posLeg("build", _))
      .mkString("\n  UNION ALL\n  ")
    val probePos = (0 until BloomK).map(posLeg("probe", _))
      .mkString("\n  UNION ALL\n  ")
    s"""WITH build AS (SELECT DISTINCT o_custkey AS key FROM orders
       |  WHERE o_totalprice > 400000.0),
       |probe AS (SELECT c_custkey AS key FROM customer),
       |bits AS (SELECT DISTINCT pos FROM (
       |  $buildPos)),
       |ph AS (
       |  SELECT pp.key,
       |    CAST(sum(CASE WHEN bits.pos IS NOT NULL THEN 1 ELSE 0 END)
       |      AS BIGINT) AS hits
       |  FROM (
       |  $probePos) pp
       |  LEFT JOIN bits ON pp.pos = bits.pos
       |  GROUP BY 1),
       |pm AS (
       |  SELECT ph.key,
       |    CASE WHEN hits = $BloomK THEN 1 ELSE 0 END AS pass,
       |    CASE WHEN build.key IS NOT NULL THEN 1 ELSE 0 END AS is_match
       |  FROM ph LEFT JOIN build ON ph.key = build.key),
       |stats AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_probe,
       |    CAST(sum(1 - is_match) AS BIGINT) AS n_nonmatch,
       |    CAST(sum(CASE WHEN is_match = 0 THEN pass ELSE 0 END)
       |      AS BIGINT) AS n_false_pass
       |  FROM pm),
       |bs AS (SELECT CAST(count(*) AS BIGINT) AS n_build FROM build),
       |bb AS (SELECT CAST(count(*) AS BIGINT) AS bits_set FROM bits)
       |SELECT n_build, CAST($BloomBits AS BIGINT) AS m_bits,
       |  CAST($BloomK AS BIGINT) AS k_hashes, bits_set,
       |  ${ExactRound.sql.ratio6("bits_set", s"$BloomBits")} AS fill_ratio,
       |  n_probe, n_nonmatch, n_false_pass,
       |  CASE WHEN n_nonmatch > 0 THEN
       |    ${ExactRound.sql.ratio6("n_false_pass", "n_nonmatch")}
       |    END AS measured_fpr,
       |  round(${Seq.fill(BloomK)(s"(CAST(bits_set AS DOUBLE) / $BloomBits)")
                  .mkString(" * ")}, 6) AS est_fpr
       |FROM stats CROSS JOIN bs CROSS JOIN bb""".stripMargin
  }

  // -- q331: Hilbert-curve layout audit — q243's Morton comparison
  //          extended with the curve a locality-serious table format
  //          reaches for (Hilbert never takes the power-of-two "seam
  //          jumps" Morton does, so range scans touch fewer files):
  //          the SAME 16×16 (user, sec) grid, indexed by the standard
  //          xy2d walk (Hilbert 1891; the per-level quadrant+rotate
  //          recurrence) UNROLLED into 4 chained selects generated
  //          from ONE engine-neutral SQL template — Spark folds it
  //          over selectExpr, DuckDB chains CTEs, so the two engines
  //          run literally the same arithmetic (the q244 BloomK
  //          precedent). Readout per layout: q243's per-bucket span
  //          fractions (pruning quality) PLUS the mean Manhattan jump
  //          between successive occupied cells in index order — the
  //          locality number itself (a full Hilbert grid walks jumps
  //          of exactly 1; Morton averages ~1.88 on a full 16×16).
  //          HilbertCurveSpec pins the defining property (256 cells
  //          visited once, every consecutive full-grid jump = 1).
  //          Determinism: pure integer bit arithmetic; ratio6 at the
  //          end. Scale shape: one scan + the 1-row range cross; the
  //          lag window runs over the ≤256-cell frame.
  private[graft] val HilbertSide = 16L // = 1 << ZBits

  /** One xy2d level: (d, x, y) update expressions over the CURRENT
    * x/y/d columns — engine-neutral SQL, n = HilbertSide. */
  private[graft] def hilbertStep(s: Long): (String, String, String) = (
    s"d + ${s * s} * (CASE WHEN (x & $s) = 0 AND (y & $s) = 0 THEN 0" +
      s" WHEN (x & $s) = 0 THEN 1 WHEN (y & $s) > 0 THEN 2 ELSE 3 END)",
    s"CASE WHEN (y & $s) = 0 THEN (CASE WHEN (x & $s) > 0 THEN" +
      s" ${HilbertSide - 1} - y ELSE y END) ELSE x END",
    s"CASE WHEN (y & $s) = 0 THEN (CASE WHEN (x & $s) > 0 THEN" +
      s" ${HilbertSide - 1} - x ELSE x END) ELSE y END")

  private[graft] val hilbertLevels = Seq(8L, 4L, 2L, 1L)

  /** Fold the unrolled walk over a frame holding integer columns
    * x, y (∈ [0, 16)) plus carried columns; returns the frame with a
    * `d` Hilbert index added (x/y consumed). */
  private[graft] def hilbertIndex(df: DataFrame, carry: Seq[String])
      : DataFrame = {
    val start = df.withColumn("d", lit(0L))
    hilbertLevels.foldLeft(start) { (acc, s) =>
      val (de, xe, ye) = hilbertStep(s)
      acc.selectExpr(carry ++ Seq(s"$de AS d", s"$xe AS x",
        s"$ye AS y"): _*)
    }.drop("x", "y")
  }

  private def hilbertCtesSql(src: String, carry: String): String = {
    val steps = hilbertLevels.zipWithIndex.map { case (s, i) =>
      val (de, xe, ye) = hilbertStep(s)
      val from = if (i == 0) src else s"h$i"
      s"h${i + 1} AS (SELECT $carry, $de AS d, $xe AS x, $ye AS y" +
        s" FROM $from)"
    }
    steps.mkString(",\n")
  }

  private def q331(s: SparkSession, dir: String): DataFrame = {
    val zb = 1L << ZBits
    val ev = events(s, dir).select(
      expr("unix_timestamp(ts)").as("t"), col("user_id").as("u"))
    val rng = ev.agg(min(col("u")).as("u0"), max(col("u")).as("u1"),
      min(col("t")).as("t0"), max(col("t")).as("t1"))
    val b = ev.crossJoin(broadcast(rng)).select(
      col("u"), col("t"),
      expr(s"(u - u0) * $zb div (u1 - u0 + 1)").as("x"),
      expr(s"(t - t0) * $zb div (t1 - t0 + 1)").as("y"),
      (col("u1") - col("u0") + 1).as("u_range"),
      (col("t1") - col("t0") + 1).as("t_range"))
    val cells = hilbertIndex(b.withColumn("zu", col("x"))
        .withColumn("zt", col("y")),
        Seq("u", "t", "u_range", "t_range", "zu", "zt"))
      .withColumnRenamed("d", "b_h")
      .withColumn("b_z", morton(col("zu"), col("zt")))
    def layout(bucket: String, name: String): DataFrame = {
      val spans = cells.groupBy(col(bucket))
        .agg((max(col("u")) - min(col("u")) + lit(1L)).as("u_span"),
          (max(col("t")) - min(col("t")) + lit(1L)).as("t_span"),
          max(col("u_range")).as("u_range"),
          max(col("t_range")).as("t_range"),
          max(col("zu")).as("cu"), max(col("zt")).as("ct"))
      val w = Window.orderBy(col(bucket))
      val jumps = spans
        .withColumn("pu", lag(col("cu"), 1).over(w))
        .withColumn("pt", lag(col("ct"), 1).over(w))
        .withColumn("jump", when(col("pu").isNull, lit(null))
          .otherwise(abs(col("cu") - col("pu")) +
            abs(col("ct") - col("pt"))))
      jumps.agg(count(lit(1)).as("n_cells"),
          sum(col("u_span")).as("us"), sum(col("t_span")).as("ts"),
          max(col("u_range")).as("ur"), max(col("t_range")).as("tr"),
          coalesce(sum(col("jump")), lit(0L)).as("js"),
          sum(when(col("jump").isNotNull, 1L).otherwise(0L)).as("jn"))
        .select(lit(name).as("layout"), col("n_cells"),
          ExactRound.ratio6(col("us"), col("n_cells") * col("ur"))
            .as("avg_user_span"),
          ExactRound.ratio6(col("ts"), col("n_cells") * col("tr"))
            .as("avg_sec_span"),
          ExactRound.ratio6(col("js"), col("jn")).as("mean_jump"))
    }
    layout("b_z", "zorder").unionByName(layout("b_h", "hilbert"))
      .orderBy(col("layout"))
  }

  private val q331Sql = {
    val zb = 1L << ZBits
    def leg(bucket: String, name: String) =
      s"""SELECT '$name' AS layout, n_cells,
         |  ${ExactRound.sql.ratio6("us", "n_cells * ur")}
         |    AS avg_user_span,
         |  ${ExactRound.sql.ratio6("ts", "n_cells * tr")}
         |    AS avg_sec_span,
         |  ${ExactRound.sql.ratio6("js", "jn")} AS mean_jump
         |FROM (
         |  SELECT CAST(count(*) AS BIGINT) AS n_cells,
         |    CAST(sum(u_span) AS BIGINT) AS us,
         |    CAST(sum(t_span) AS BIGINT) AS ts,
         |    max(u_range) AS ur, max(t_range) AS tr,
         |    CAST(coalesce(sum(jump), 0) AS BIGINT) AS js,
         |    CAST(sum(CASE WHEN jump IS NOT NULL THEN 1 ELSE 0 END)
         |      AS BIGINT) AS jn
         |  FROM (
         |    SELECT *,
         |      CASE WHEN lag(cu) OVER w IS NULL THEN NULL
         |        ELSE abs(cu - lag(cu) OVER w) +
         |          abs(ct - lag(ct) OVER w) END AS jump
         |    FROM (
         |      SELECT $bucket,
         |        max(u) - min(u) + 1 AS u_span,
         |        max(t) - min(t) + 1 AS t_span,
         |        max(zu) AS cu, max(zt) AS ct,
         |        max(u_range) AS u_range, max(t_range) AS t_range
         |      FROM cells GROUP BY 1) g
         |    WINDOW w AS (ORDER BY $bucket)) j) a""".stripMargin
    s"""WITH ev AS (
       |  SELECT CAST(floor(epoch(ts)) AS BIGINT) AS t, user_id AS u
       |  FROM events),
       |rng AS (
       |  SELECT min(u) AS u0, max(u) AS u1, min(t) AS t0, max(t) AS t1
       |  FROM ev),
       |b AS (
       |  SELECT u, t,
       |    (u - u0) * $zb // (u1 - u0 + 1) AS x,
       |    (t - t0) * $zb // (t1 - t0 + 1) AS y,
       |    (u - u0) * $zb // (u1 - u0 + 1) AS zu,
       |    (t - t0) * $zb // (t1 - t0 + 1) AS zt,
       |    u1 - u0 + 1 AS u_range, t1 - t0 + 1 AS t_range
       |  FROM ev CROSS JOIN rng),
       |b0 AS (SELECT *, CAST(0 AS BIGINT) AS d FROM b),
       |${hilbertCtesSql("b0", "u, t, u_range, t_range, zu, zt")},
       |cells AS (
       |  SELECT u, t, u_range, t_range, zu, zt, d AS b_h,
       |    ${mortonSql("zu", "zt")} AS b_z
       |  FROM h${hilbertLevels.size})
       |SELECT * FROM (
       |  ${leg("b_z", "zorder")}
       |  UNION ALL
       |  ${leg("b_h", "hilbert")})
       |ORDER BY layout""".stripMargin
  }

  // -- q347: resharding-cost audit, rendezvous vs modulo (Thaler &
  //          Ravishankar 1998 "highest random weight" hashing; the
  //          consistent-hashing family of Karger et al. 1997) — what
  //          fraction of keys MOVE when the shard count goes 16 → 17?
  //          Modulo placement moves ≈ 16/17 of all keys (a full
  //          reshuffle); rendezvous placement (owner = argmax over
  //          shards of md5(key, shard)) moves exactly the keys the
  //          new shard wins ≈ 1/17 — measured side by side against
  //          the theory columns. The decision input for any keyed
  //          state layout (shard maps, partitioned caches, bucketed
  //          tables). Determinism: md5 integer weights, (w, shard)
  //          struct argmax, exact ratios. Scale shape: one scan
  //          exploded ×17 (the shard grid) → two keyed argmax aggs;
  //          no shuffle wider than keys × shards.
  private def q347(s: SparkSession, dir: String): DataFrame = {
    import graft.text.{TextFunctions => TF}
    val keys = Tables.load(s, dir, "documents")
      .select(col("doc_id"), TF.md5Long(col("doc_id").cast("string"))
        .as("h"))
    val grid = keys.withColumn("shard",
        explode(sequence(lit(0L), lit(16L))))
      .withColumn("w", TF.md5Long(concat(col("doc_id").cast("string"),
        lit("|s"), col("shard").cast("string"))))
    val owners = grid.groupBy(col("doc_id"))
      .agg(
        max(when(col("shard") < 16, struct(col("w").as("w"),
          col("shard").as("sh")))).as("o16"),
        max(struct(col("w").as("w"), col("shard").as("sh")))
          .as("o17"))
      .select(col("doc_id"),
        col("o16.sh").as("rdv16"), col("o17.sh").as("rdv17"))
    keys.join(owners, "doc_id")
      .select(
        (pmod(col("h"), lit(16L)) =!= pmod(col("h"), lit(17L)))
          .cast("long").as("mod_moved"),
        (col("rdv16") =!= col("rdv17")).cast("long").as("rdv_moved"))
      .agg(count(lit(1)).as("n_keys"),
        sum(col("mod_moved")).as("mm"), sum(col("rdv_moved")).as("rm"))
      .select(col("n_keys"),
        graft.functions.ExactRound.ratio6(col("mm"), col("n_keys"))
          .as("moved_modulo"),
        expr("round(16.0 / 17, 6)").as("theory_modulo"),
        graft.functions.ExactRound.ratio6(col("rm"), col("n_keys"))
          .as("moved_rendezvous"),
        expr("round(1.0 / 17, 6)").as("theory_rendezvous"))
  }

  private val q347Sql = {
    import graft.text.{TextFunctions => TF}
    import graft.functions.{ExactRound => ER}
    val hk = TF.sql.md5Long("CAST(doc_id AS VARCHAR)")
    val hw = TF.sql.md5Long(
      "(CAST(doc_id AS VARCHAR) || '|s' || CAST(shard AS VARCHAR))")
    s"""WITH keys AS (
       |  SELECT doc_id, $hk AS h FROM documents),
       |grid AS (
       |  SELECT doc_id, unnest(range(0, 17)) AS shard
       |  FROM documents),
       |weighted AS (
       |  SELECT doc_id, shard, $hw AS w FROM grid),
       |owners AS (
       |  SELECT doc_id,
       |    max(CASE WHEN shard < 16 THEN
       |      struct_pack(w := w, sh := shard) END).sh AS rdv16,
       |    max(struct_pack(w := w, sh := shard)).sh AS rdv17
       |  FROM weighted GROUP BY 1),
       |flags AS (
       |  SELECT CASE WHEN (k.h % 16 + 16) % 16 <>
       |      (k.h % 17 + 17) % 17 THEN 1 ELSE 0 END AS mod_moved,
       |    CASE WHEN o.rdv16 <> o.rdv17 THEN 1 ELSE 0 END
       |      AS rdv_moved
       |  FROM keys k JOIN owners o ON k.doc_id = o.doc_id)
       |SELECT CAST(count(*) AS BIGINT) AS n_keys,
       |  ${ER.sql.ratio6("CAST(sum(mod_moved) AS BIGINT)",
          "count(*)")} AS moved_modulo,
       |  round(16.0 / 17, 6) AS theory_modulo,
       |  ${ER.sql.ratio6("CAST(sum(rdv_moved) AS BIGINT)",
          "count(*)")} AS moved_rendezvous,
       |  round(1.0 / 17, 6) AS theory_rendezvous
       |FROM flags""".stripMargin
  }

  // -- q348: columnar encoding advisor — the write-path decision a
  //          parquet/ORC writer makes per column (dictionary vs RLE
  //          vs delta vs plain; Abadi/Madden/Ferreira SIGMOD 2006 is
  //          the canonical study), computed from three exact
  //          statistics per audited lineitem column: the distinct
  //          ratio (dictionary wins when tiny), the mean within-order
  //          run length (RLE wins on long runs — runs are measured
  //          inside the (l_orderkey, l_linenumber) natural write
  //          order, the same per-order bound every window here uses).
  //          The recommendation CASE is the operator's contract
  //          (dict when ≤ 1% distinct, else RLE when mean run ≥ 2,
  //          else plain; a delta branch would need typed numeric
  //          step stats — out of scope for the string-cast audit).
  //          Scale shape: one scan → per-order lag windows
  //          (≤ 7 rows each) → one 4-row-per-column aggregate.
  private val EncCols =
    Seq("l_quantity", "l_discount", "l_returnflag", "l_suppkey")

  private def q348(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem")
    // (l_orderkey, l_linenumber) is NOT unique in this corpus (the
    // synthetic generator repeats line numbers), so the write order
    // needs a full tie-break chain covering every audited column —
    // rows still tied are then identical on all of them, making the
    // residual order irrelevant to run counts on BOTH engines
    val w = Window.partitionBy(col("l_orderkey"))
      .orderBy(col("l_linenumber"), col("l_partkey"),
        col("l_suppkey"), col("l_returnflag"), col("l_linestatus"),
        expr("CAST(round(l_quantity * 100) AS BIGINT)"),
        expr("CAST(round(l_discount * 100) AS BIGINT)"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))
    def leg(c: String): DataFrame = {
      // compare RAW values — a double→string cast is not injective
      // the same way in both engines (observed on l_discount)
      val v = col(c)
      val prev = lag(v, 1).over(w)
      val nums = li.select(v.as("v"), prev.as("p"),
        (v === prev).cast("long").as("same"),
        when(prev.isNotNull, 1L).otherwise(0L).as("has_prev"))
      nums.agg(count(lit(1)).as("n_values"),
          countDistinct(col("v")).as("n_distinct"),
          sum(col("same")).as("n_same"),
          sum(col("has_prev")).as("n_pairs"))
        .select(lit(c).as("column"), col("n_values"),
          col("n_distinct"),
          graft.functions.ExactRound.ratio6(col("n_distinct"),
            col("n_values")).as("distinct_ratio"),
          // mean run length = n / (#runs) = n / (n − n_same)
          graft.functions.ExactRound.ratio6(col("n_values"),
            col("n_values") - col("n_same")).as("mean_run_len"),
          expr("CASE WHEN n_distinct * 100 <= n_values THEN 'dictionary' " +
            "WHEN (n_values * 1.0 / (n_values - n_same)) >= 2 THEN 'rle' " +
            "ELSE 'plain' END").as("recommendation"))
    }
    EncCols.map(leg).reduce(_ unionByName _)
      .orderBy(col("column"))
  }

  private val q348Sql = {
    import graft.functions.{ExactRound => ER}
    def leg(c: String) =
      s"""SELECT '$c' AS "column",
         |  CAST(count(*) AS BIGINT) AS n_values,
         |  CAST(count(DISTINCT v) AS BIGINT) AS n_distinct,
         |  ${ER.sql.ratio6("CAST(count(DISTINCT v) AS BIGINT)",
            "count(*)")} AS distinct_ratio,
         |  ${ER.sql.ratio6("count(*)",
            "count(*) - CAST(sum(same) AS BIGINT)")} AS mean_run_len,
         |  CASE WHEN count(DISTINCT v) * 100 <= count(*)
         |      THEN 'dictionary'
         |    WHEN (count(*) * 1.0 / (count(*) - sum(same))) >= 2
         |      THEN 'rle'
         |    ELSE 'plain' END AS recommendation
         |FROM (
         |  SELECT $c AS v,
         |    CASE WHEN $c = lag($c) OVER (PARTITION BY l_orderkey
         |      ORDER BY l_linenumber, l_partkey, l_suppkey,
         |        l_returnflag, l_linestatus,
         |        CAST(round(l_quantity * 100) AS BIGINT),
         |        CAST(round(l_discount * 100) AS BIGINT),
         |        CAST(round(l_extendedprice * 100) AS BIGINT))
         |      THEN 1 ELSE 0 END AS same
         |  FROM lineitem) t""".stripMargin
    s"""SELECT * FROM (
       |${EncCols.map(leg).mkString("\nUNION ALL\n")}) u
       |ORDER BY "column"""".stripMargin
  }

  val qs: Seq[Q] = Seq(
    Q("q242_clustering_depth", q242, Some(q242Sql)),
    Q("q243_zorder_layout", q243, Some(q243Sql)),
    Q("q244_bloom_filter_audit", q244, Some(q244Sql)),
    Q("q331_hilbert_layout", q331, Some(q331Sql)),
    Q("q347_rendezvous_reshard", q347, Some(q347Sql)),
    Q("q348_encoding_advisor", q348, Some(q348Sql)))
}
