package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{VectorFunctions => VF}
import graft.semantic.VectorSearch

/** Semantic / vector operators (SURVEY.md §2.6) + the ANN scale path:
  * exact top-k, thresholded+filtered search, k-NN join, exact similarity
  * self-join, similarity metrics, and IVF approximate search made
  * deterministic (mean centroids) so even the ANN path is oracle-checked.
  */
object VectorQueries {

  private def emb(s: SparkSession, dir: String) = Tables.load(s, dir, "embeddings")

  private def qvec(s: SparkSession, dir: String) =
    emb(s, dir).filter(col("vec_id") === 0).select(col("embedding"))

  // -- q17: exact top-k cosine against a broadcast query vector
  private def q17(s: SparkSession, dir: String): DataFrame =
    VectorSearch.topK(emb(s, dir).filter(col("vec_id") =!= 0), qvec(s, dir), 20)
      .select(col("vec_id"), round(col("sim"), 6).as("sim"))

  private val q17Sql =
    s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
       |SELECT vec_id, round(${VF.sql.cosine("embedding", "qe")}, 6) AS sim
       |FROM embeddings, q WHERE vec_id <> 0
       |ORDER BY ${VF.sql.cosine("embedding", "qe")} DESC, vec_id LIMIT 20""".stripMargin

  // -- q18: thresholded + metadata-filtered top-k (pre-filter prunes scan)
  private def q18(s: SparkSession, dir: String): DataFrame =
    VectorSearch.topKFiltered(emb(s, dir), qvec(s, dir), 50,
        threshold = 0.2, preFilter = col("label") >= 5)
      .select(col("vec_id"), round(col("sim"), 6).as("sim"))

  private val q18Sql =
    s"""WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
       |SELECT vec_id, round(${VF.sql.cosine("embedding", "qe")}, 6) AS sim
       |FROM embeddings, q
       |WHERE label >= 5 AND ${VF.sql.cosine("embedding", "qe")} >= 0.2
       |ORDER BY ${VF.sql.cosine("embedding", "qe")} DESC, vec_id LIMIT 50""".stripMargin

  // -- q19: exact similarity self-join blocked by label (equi-join blocks
  //         replace the reference's O(n²) loops)
  private def q19(s: SparkSession, dir: String): DataFrame =
    VectorSearch.similaritySelfJoin(emb(s, dir), "label", 0.35)
      .select(col("blk"), col("a_id"), col("b_id"), round(col("sim"), 6).as("sim"))
      .orderBy(col("blk"), col("a_id"), col("b_id"))

  private val q19Sql =
    s"""SELECT a.label AS blk, a.vec_id AS a_id, b.vec_id AS b_id,
       |  round(${VF.sql.cosine("a.embedding", "b.embedding")}, 6) AS sim
       |FROM embeddings a JOIN embeddings b
       |  ON a.label = b.label AND a.vec_id < b.vec_id
       |WHERE ${VF.sql.cosine("a.embedding", "b.embedding")} >= 0.35
       |ORDER BY blk, a_id, b_id""".stripMargin

  // -- q20: batch k-NN join (top-5 neighbors per query, window-ranked)
  private def q20(s: SparkSession, dir: String): DataFrame =
    VectorSearch.knnJoin(emb(s, dir), emb(s, dir).filter(col("vec_id") < 5), 5)
      .select(col("q_id"), col("vec_id"), col("rnk"), round(col("sim"), 6).as("sim"))
      .orderBy(col("q_id"), col("rnk"))

  private val q20Sql =
    s"""SELECT q_id, vec_id, rnk, round(sim, 6) AS sim FROM (
       |  SELECT q.vec_id AS q_id, e.vec_id AS vec_id,
       |    ${VF.sql.cosine("e.embedding", "q.embedding")} AS sim,
       |    CAST(row_number() OVER (PARTITION BY q.vec_id
       |      ORDER BY ${VF.sql.cosine("e.embedding", "q.embedding")} DESC, e.vec_id)
       |      AS INT) AS rnk
       |  FROM embeddings e CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < 5) q
       |  WHERE e.vec_id <> q.vec_id) x
       |WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin

  // -- q21: similarity metrics — the full metric enum of
  //         vector_store_interface.py:24-30 (cosine / L2 distance /
  //         L2-sim / inner product / sign-Hamming / sign-Jaccard)
  private def q21(s: SparkSession, dir: String): DataFrame = {
    val a = emb(s, dir).filter(col("vec_id") < 100)
      .select(col("vec_id").as("a_id"), col("embedding").as("a_vec"))
    val b = emb(s, dir)
      .select(col("vec_id").as("b_id"), col("embedding").as("b_vec"))
    a.join(b, col("b_id") === col("a_id") + 1)
      .select(col("a_id"),
        round(VF.cosine(col("a_vec"), col("b_vec")), 6).as("sim_cos"),
        round(VF.l2Distance(col("a_vec"), col("b_vec")), 6).as("dist_l2"),
        round(VF.l2Similarity(col("a_vec"), col("b_vec")), 6).as("sim_l2"),
        round(VF.dot(col("a_vec"), col("b_vec")), 6).as("ip"),
        VF.hammingSign(col("a_vec"), col("b_vec")).as("dist_hamming"),
        round(VF.jaccardSign(col("a_vec"), col("b_vec")), 6).as("sim_jaccard"))
      .orderBy(col("a_id"))
  }

  private val q21Sql =
    s"""SELECT a.vec_id AS a_id,
       |  round(${VF.sql.cosine("a.embedding", "b.embedding")}, 6) AS sim_cos,
       |  round(${VF.sql.l2Distance("a.embedding", "b.embedding")}, 6) AS dist_l2,
       |  round(${VF.sql.l2Similarity("a.embedding", "b.embedding")}, 6) AS sim_l2,
       |  round(${VF.sql.dot("a.embedding", "b.embedding")}, 6) AS ip,
       |  ${VF.sql.hammingSign("a.embedding", "b.embedding")} AS dist_hamming,
       |  round(${VF.sql.jaccardSign("a.embedding", "b.embedding")}, 6) AS sim_jaccard
       |FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
       |WHERE a.vec_id < 100
       |ORDER BY a_id""".stripMargin

  // -- q22: IVF ANN — deterministic mean centroids per label cell, assign
  //         to nearest cell, probe 2 nearest cells, exact top-10 inside
  private def q22(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val cents = VectorSearch.centroids(e, "label")
    val assigned = VectorSearch.ivfAssign(e, "label", Some(cents))
    VectorSearch.ivfSearch(assigned, cents, qvec(s, dir), k = 10, nprobe = 2)
      .select(col("vec_id"), col("cell"), round(col("sim"), 6).as("sim"))
  }

  private val q22Sql = {
    val l2 = "sqrt(list_sum(list_transform(list_zip(%s, %s), z -> (z[1]-z[2])*(z[1]-z[2]))))"
    s"""WITH el AS (
       |  SELECT vec_id, label, generate_subscripts(embedding, 1) AS pos,
       |         unnest(embedding::DOUBLE[]) AS x
       |  FROM embeddings),
       |centl AS (
       |  SELECT label AS cell, list(cx ORDER BY pos) AS centroid FROM (
       |    SELECT label, pos, avg(x) AS cx FROM el GROUP BY label, pos) c
       |  GROUP BY label),
       |dists AS (
       |  SELECT e.vec_id, c.cell,
       |    ${l2.format("e.embedding::DOUBLE[]", "c.centroid")} AS dist
       |  FROM embeddings e CROSS JOIN centl c),
       |assign AS (
       |  SELECT vec_id, cell FROM (
       |    SELECT vec_id, cell,
       |      row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell) AS rn
       |    FROM dists) x WHERE rn = 1),
       |q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
       |probe AS (
       |  SELECT cell FROM centl, q
       |  ORDER BY ${l2.format("centroid", "qv")}, cell LIMIT 2)
       |SELECT e.vec_id, a.cell, round(${VF.sql.cosine("e.embedding", "qv")}, 6) AS sim
       |FROM embeddings e
       |JOIN assign a ON e.vec_id = a.vec_id
       |JOIN probe p ON a.cell = p.cell
       |CROSS JOIN q
       |ORDER BY ${VF.sql.cosine("e.embedding", "qv")} DESC, e.vec_id LIMIT 10""".stripMargin
  }

  // -- q91: IVF_PQ ANN — product quantization (8 subspaces × label-mean
  //         codebooks) + ADC top-10 by quantized L2 (the second index
  //         family of vector_store_interface.py:24-44's enum)
  private def q91(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val books = VectorSearch.pqCodebooks(e, "label", m = 8, dim = 64)
    val encoded = VectorSearch.pqEncode(e, books, m = 8, dim = 64)
    VectorSearch.pqSearch(encoded, books, qvec(s, dir), k = 10, m = 8, dim = 64)
  }

  private val q91Sql = {
    val sq = "list_sum(list_transform(list_zip(%s, %s), z -> (z[1]-z[2])*(z[1]-z[2])))"
    s"""WITH el AS (
       |  SELECT vec_id, label,
       |    generate_subscripts(embedding, 1) - 1 AS pos,
       |    unnest(embedding::DOUBLE[]) AS x
       |  FROM embeddings),
       |b AS (
       |  SELECT CAST(floor(pos / 8) AS INT) AS sub, label AS code, pos,
       |    avg(x) AS cx
       |  FROM el GROUP BY 1, 2, 3),
       |books AS (
       |  SELECT sub, code, list(cx ORDER BY pos) AS codeword
       |  FROM b GROUP BY sub, code),
       |sv AS (
       |  SELECT vec_id, CAST(floor(pos / 8) AS INT) AS sub,
       |    list(x ORDER BY pos) AS subvec
       |  FROM el GROUP BY 1, 2),
       |enc AS (
       |  SELECT vec_id, sub, code FROM (
       |    SELECT sv.vec_id, sv.sub, books.code,
       |      row_number() OVER (PARTITION BY sv.vec_id, sv.sub
       |        ORDER BY ${sq.format("subvec", "codeword")}, code) AS rn
       |    FROM sv JOIN books USING (sub)) x
       |  WHERE rn = 1),
       |qs AS (SELECT sub, subvec AS qsub FROM sv WHERE vec_id = 0),
       |lut AS (
       |  SELECT books.sub, code, ${sq.format("codeword", "qsub")} AS pd
       |  FROM books JOIN qs ON books.sub = qs.sub),
       |adc AS (
       |  SELECT e.vec_id, round(sqrt(sum(l.pd)), 6) AS adc_dist
       |  FROM enc e JOIN lut l ON e.sub = l.sub AND e.code = l.code
       |  GROUP BY 1)
       |SELECT vec_id, adc_dist FROM adc
       |ORDER BY adc_dist, vec_id LIMIT 10""".stripMargin
  }

  // -- q92: IVF_SQ8 — per-dimension 8-bit scalar quantization, ranked by
  //         dequantized L2 (the third batch-relevant index family of the
  //         vector_store_interface.py:24-44 enum)
  private def q92(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val params = VectorSearch.sq8Params(e)
    val encoded = VectorSearch.sq8Encode(e, params)
    VectorSearch.sq8Search(encoded, params, qvec(s, dir), k = 10)
  }

  private val q92Sql =
    """WITH el AS (
      |  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS pos,
      |    unnest(embedding::DOUBLE[]) AS x
      |  FROM embeddings),
      |pm AS (SELECT pos, min(x) AS mn, max(x) AS mx FROM el GROUP BY pos),
      |enc AS (
      |  SELECT vec_id, pos,
      |    CASE WHEN mx = mn THEN 0
      |         ELSE CAST(floor((x - mn) / (mx - mn) * 255 + 0.5) AS INT)
      |    END AS c
      |  FROM el JOIN pm USING (pos)),
      |dq AS (
      |  SELECT vec_id, pos, mn + CAST(c AS DOUBLE) / 255 * (mx - mn) AS xd
      |  FROM enc JOIN pm USING (pos)),
      |q AS (SELECT pos, x AS qx FROM el WHERE vec_id = 0),
      |d AS (
      |  SELECT dq.vec_id, round(sqrt(sum((xd - qx) * (xd - qx))), 6) AS sq_dist
      |  FROM dq JOIN q USING (pos) GROUP BY dq.vec_id)
      |SELECT vec_id, sq_dist FROM d ORDER BY sq_dist, vec_id LIMIT 10""".stripMargin

  // -- q137: inter-source centroid similarity — the embedding-space
  //          drift map a corpus curator reads before mixing sources
  //          (which sources say the same things in vector space?).
  //          Exactness scheme: each dimension is quantized to integer
  //          milli-units (round(v*1000) — a float32 times 1000 can
  //          never land exactly on .5, so both engines round alike),
  //          summed EXACTLY as longs per (source, dim), and divided
  //          once — so the centroid is bit-identical cross-engine
  //          without any ordered-fold machinery on the corpus side.
  //          The only floating folds (cosine of two centroid vectors)
  //          run over the bounded #sources-row frame via the same
  //          left-to-right VectorSimExpr / list_dot_product pair that
  //          q17-q21 prove equal. Scale shape: one d-way posexplode of
  //          the scan (linear, scan-local), a per-(source,dim)
  //          aggregate whose OUTPUT is #sources x d, and a pair join
  //          bounded by #sources^2 — the BNLJ build side is the tiny
  //          centroid frame (PlanShapeSpec allowlist).
  private def q137(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(s, dir, "documents").select(col("doc_id"), col("source"))
    val e = emb(s, dir)
    val dims = e.join(d, e("vec_id") === d("doc_id"))
      .select(col("source"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .select(col("source"), col("dim"),
        round(col("v").cast("double") * 1000).cast("long").as("milli"))
    val cent = dims.groupBy(col("source"), col("dim"))
      .agg(sum(col("milli")).as("s_milli"), count(lit(1)).as("n"))
      .select(col("source"), col("dim"),
        (col("s_milli").cast("double") /
          (col("n").cast("double") * 1000.0)).as("c"))
    val vecs = cent.groupBy(col("source"))
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("c")))),
        x => x("c")).as("cvec"))
    val a = vecs.select(col("source").as("source_a"), col("cvec").as("va"))
    val b = vecs.select(col("source").as("source_b"), col("cvec").as("vb"))
    a.join(broadcast(b), col("source_a") < col("source_b"))
      .select(col("source_a"), col("source_b"),
        round(VF.cosine(col("va"), col("vb")), 6).as("centroid_cos"))
      .orderBy(col("source_a"), col("source_b"))
  }

  private val q137Sql =
    s"""WITH dims AS (
       |  SELECT d.source, i - 1 AS dim,
       |    CAST(round(CAST(e.embedding[i] AS DOUBLE) * 1000) AS BIGINT)
       |      AS milli
       |  FROM embeddings e
       |  JOIN documents d ON e.vec_id = d.doc_id,
       |  unnest(range(1, len(e.embedding) + 1)) r(i)),
       |cent AS (
       |  SELECT source, dim,
       |    CAST(sum(milli) AS DOUBLE) / (count(*) * 1000.0) AS c
       |  FROM dims GROUP BY source, dim),
       |vecs AS (
       |  SELECT source, list(c ORDER BY dim) AS cvec FROM cent
       |  GROUP BY source)
       |SELECT a.source AS source_a, b.source AS source_b,
       |  round(${VF.sql.cosine("a.cvec", "b.cvec")}, 6) AS centroid_cos
       |FROM vecs a JOIN vecs b ON a.source < b.source
       |ORDER BY source_a, source_b""".stripMargin

  // -- q217: SQ8 quantization-error audit — per-dimension reconstruction
  //          error of the q92 codec (encode with VectorSearch.sq8Encode,
  //          dequantize, compare to the original): dim range, mean and
  //          max |x − dequant(encode(x))|. The "is 4× compression safe
  //          for THIS corpus" gate a pipeline runs before switching the
  //          ANN index to SQ8 — q157 measures recall end-to-end, this
  //          isolates the codec's contribution per dimension.
  //          Determinism: every per-row error quantizes to micro units
  //          (identical doubles both engines — the encode/decode chain
  //          is the same left-assoc IEEE expression), the mean is an
  //          exact integer fold, min/max/count are order-free. Scale
  //          shape: 1-row params broadcast onto one scan (the q92
  //          shape), then a #dims-bounded aggregate.
  private def q217(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.ExactRound
    val e = emb(s, dir)
    val params = VectorSearch.sq8Params(e)
    val enc = VectorSearch.sq8Encode(e, params)
    val dimStats = params.select(posexplode(
        expr("zip_with(mins, maxs, (a, b) -> struct(a AS mn, b AS mx))"))
        .as(Seq("pos", "s")))
      .select(col("pos"), col("s.mn").as("dim_min"), col("s.mx").as("dim_max"))
    val errs = e.select(col("vec_id"), col("embedding"))
      .join(enc, Seq("vec_id"))
      .crossJoin(broadcast(params))
      .select(posexplode(expr(
        """zip_with(CAST(embedding AS array<double>),
                    transform(codes, (c, i) ->
                      CASE WHEN maxs[i] = mins[i] THEN mins[i]
                           ELSE mins[i] + CAST(c AS DOUBLE) / 255 *
                             (maxs[i] - mins[i]) END),
                    (x, d) -> abs(x - d))""")).as(Seq("pos", "err")))
      .withColumn("emicro", round(col("err") * 1e6).cast("long"))
    errs.groupBy(col("pos"))
      .agg(count(lit(1)).as("n_vals"), sum(col("emicro")).as("se"),
        max(col("err")).as("mxe"))
      .join(broadcast(dimStats), Seq("pos"))
      .select(col("pos"), col("n_vals"), col("dim_min"), col("dim_max"),
        ExactRound.microMean6(col("se"), col("n_vals")).as("mean_abs_err"),
        round(col("mxe"), 6).as("max_abs_err"))
      .orderBy(col("pos"))
  }

  private val q217Sql =
    s"""WITH el AS (
       |  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS pos,
       |    unnest(embedding::DOUBLE[]) AS x
       |  FROM embeddings),
       |st AS (SELECT pos, min(x) AS mn, max(x) AS mx FROM el GROUP BY pos),
       |er AS (
       |  SELECT el.pos,
       |    abs(el.x - (CASE WHEN st.mx = st.mn THEN st.mn
       |      ELSE st.mn + CAST(CAST(floor((el.x - st.mn) / (st.mx - st.mn)
       |        * 255 + 0.5) AS INT) AS DOUBLE) / 255 * (st.mx - st.mn)
       |      END)) AS err
       |  FROM el JOIN st USING (pos)),
       |q AS (SELECT pos, err,
       |    CAST(round(err * 1e6) AS BIGINT) AS emicro FROM er)
       |SELECT q.pos, CAST(count(*) AS BIGINT) AS n_vals,
       |  st.mn AS dim_min, st.mx AS dim_max,
       |  ${graft.functions.ExactRound.sql.microMean6("sum(emicro)", "count(*)")}
       |    AS mean_abs_err,
       |  round(max(err), 6) AS max_abs_err
       |FROM q JOIN st USING (pos)
       |GROUP BY q.pos, st.mn, st.mx
       |ORDER BY pos""".stripMargin

  // -- q229: label separability (Fisher-style) — per label, the
  //          within-class scatter (mean squared distance to own
  //          centroid) vs the between-class distance (squared distance
  //          of the class centroid to the global centroid), and their
  //          ratio: "are these labels actually separable in embedding
  //          space" — the audit run before trusting `label` as a
  //          classifier target or stratification key. q179's
  //          silhouette grades DISCOVERED k-means clusters; this
  //          grades the PROVIDED labels. Determinism: q212's pattern —
  //          per-row squared distances micro-quantize before the
  //          integer mean; the between leg runs on the #labels-bounded
  //          centroid frame. Scale shape: label-bounded centroid
  //          broadcast onto one scan, one keyed rollup.
  private def q229(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.{ExactRound, VectorFunctions}
    val e = emb(s, dir)
    val cl = VectorSearch.centroids(
      e.select(col("label"), col("embedding")), "label")
    val g = VectorSearch.centroids(
        e.select(lit(0).as("all"), col("embedding")), "all")
      .select(col("centroid").as("gcent"))
    val within = e.join(broadcast(cl), col("label") === col("cell"))
      .withColumn("d2", VectorFunctions.squaredL2(
        col("embedding").cast("array<double>"), col("centroid")))
      .withColumn("d2m", round(col("d2") * 1e6).cast("long"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"), sum(col("d2m")).as("w6"))
      .withColumn("within_d2",
        ExactRound.microMean6(col("w6"), col("n_vecs")))
    cl.crossJoin(broadcast(g))
      .select(col("cell").as("label"),
        round(VectorFunctions.squaredL2(col("centroid"), col("gcent")), 6)
          .as("between_d2"))
      .join(within, Seq("label"))
      .select(col("label"), col("n_vecs"), col("within_d2"),
        col("between_d2"),
        round(col("between_d2") / (col("within_d2") + lit(1e-9)), 6)
          .as("separability"))
      .orderBy(col("label"))
  }

  private val q229Sql = {
    val sq = "list_sum(list_transform(list_zip(%s, %s), " +
      "z -> (z[1] - z[2]) * (z[1] - z[2])))"
    val mm = graft.functions.ExactRound.sql.microMean6("w6", "n_vecs")
    s"""WITH el AS (
       |  SELECT vec_id, label, generate_subscripts(embedding, 1) AS pos,
       |    unnest(embedding::DOUBLE[]) AS x
       |  FROM embeddings),
       |cl AS (SELECT label, pos, avg(x) AS cx FROM el GROUP BY 1, 2),
       |clv AS (
       |  SELECT label, list(cx ORDER BY pos) AS centroid
       |  FROM cl GROUP BY 1),
       |gl AS (SELECT pos, avg(x) AS gx FROM el GROUP BY 1),
       |glv AS (SELECT list(gx ORDER BY pos) AS gcent FROM gl),
       |wd AS (
       |  SELECT e.label,
       |    ${sq.format("e.embedding::DOUBLE[]", "c.centroid")} AS d2
       |  FROM embeddings e JOIN clv c USING (label)),
       |w AS (
       |  SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
       |    CAST(sum(CAST(round(d2 * 1e6) AS BIGINT)) AS BIGINT) AS w6
       |  FROM wd GROUP BY 1),
       |b AS (
       |  SELECT c.label,
       |    round(${sq.format("c.centroid", "g.gcent")}, 6) AS between_d2
       |  FROM clv c, glv g)
       |SELECT w.label, w.n_vecs, $mm AS within_d2, b.between_d2,
       |  round(b.between_d2 / ($mm + 1e-9), 6) AS separability
       |FROM w JOIN b USING (label)
       |ORDER BY label""".stripMargin
  }


  // -- q255: Johnson–Lindenstrauss distortion audit — measures what the
  //          JL lemma promises for a k = 16 signed (±1) random
  //          projection of the 64-d embeddings (Achlioptas 2003's
  //          database-friendly projections): for sampled pairs,
  //          distortion = ‖Pu−Pv‖² / (k·‖u−v‖²), bucketed in 0.125
  //          steps. Exactness: embeddings quantize to MILLI-unit longs
  //          (so every distance, projection, and ratio is exact 64-bit
  //          integer arithmetic — worst-case ‖Pu−Pv‖²·2e6 stays under
  //          2^63); the sign matrix is the parity of the portable md5
  //          hash of "j#i", computed driver-side ONCE into a plan
  //          literal (1024 entries) and recomputed inline by the
  //          oracle. Pair sampling is the q176 integer scheme made
  //          LINEAR: each vector pairs with its next 4 ids (ring
  //          offsets — N·4 pairs, an equi-join, no quadratic block).
  //          Scale shape: projection is scan-local (16×64 multiply-
  //          adds per row); the audit output is 16 bucket rows.
  private val JlK = 16
  private val JlDim = 64
  private val JlOffsets = 4

  /** ±1 sign matrix: parity of the portable 32-bit md5 hash of "j#i" —
    * the Scala twin of TextFunctions.md5Long's definition. */
  private lazy val jlSigns: Seq[Seq[Long]] =
    (0 until JlK).map { j =>
      (0 until JlDim).map { i =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = md.digest(s"$j#$i".getBytes("UTF-8"))
          .take(4).map(b => f"$b%02x").mkString
        1L - 2L * (java.lang.Long.parseLong(hex, 16) % 2L)
      }
    }

  private def q255(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.ExactRound
    val e = emb(s, dir)
      .withColumn("qv", expr(
        "transform(embedding, x -> cast(round(cast(x as double) * 1000.0, 0) as bigint))"))
      .withColumn("sgn", typedLit(jlSigns))
      .withColumn("pv", expr(
        s"""transform(sequence(0, ${JlK - 1}), j ->
           |  aggregate(sequence(0, ${JlDim - 1}), cast(0 as bigint),
           |    (acc, i) -> acc + element_at(element_at(sgn, j + 1), i + 1)
           |      * element_at(qv, i + 1)))""".stripMargin))
      .select(col("vec_id"), col("qv"), col("pv"))
    val a = e.select(col("vec_id").as("a_id"), col("qv").as("qa"),
        col("pv").as("pa"),
        explode(expr(s"sequence(1, $JlOffsets)")).as("r"))
      .withColumn("b_id", col("a_id") + col("r"))
    val pairs = a.join(
      e.select(col("vec_id").as("b_id"), col("qv").as("qb"),
        col("pv").as("pb")), Seq("b_id"))
      .withColumn("d2o", expr(
        "aggregate(zip_with(qa, qb, (x, y) -> (x - y) * (x - y)), " +
          "cast(0 as bigint), (acc, v) -> acc + v)"))
      .withColumn("d2p", expr(
        "aggregate(zip_with(pa, pb, (x, y) -> (x - y) * (x - y)), " +
          "cast(0 as bigint), (acc, v) -> acc + v)"))
      .filter(col("d2o") > 0L)
      .withColumn("bucket",
        least(lit(15L), expr(s"(d2p * 8) div (d2o * $JlK)")))
      .withColumn("micro",
        ExactRound.micro6(col("d2p"), col("d2o") * JlK))
    pairs.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("micro")).as("ms"),
        min(col("micro")).as("mn"), max(col("micro")).as("mx"))
      .select(col("bucket"),
        ExactRound.ratio6(col("bucket"), lit(8L)).as("bucket_lo"),
        col("n_pairs"),
        ExactRound.microMean6(col("ms"), col("n_pairs"))
          .as("mean_distortion"),
        (col("mn") / lit(1e6)).as("min_distortion"),
        (col("mx") / lit(1e6)).as("max_distortion"))
      .orderBy(col("bucket"))
  }

  private lazy val q255Sql = {
    import graft.functions.{ExactRound => ER}
    val mdji = graft.text.TextFunctions.sql
      .md5Long("j::VARCHAR || '#' || i::VARCHAR")
    s"""WITH e AS (
       |  SELECT vec_id,
       |    list_transform(embedding,
       |      x -> CAST(round(CAST(x AS DOUBLE) * 1000.0) AS BIGINT)) AS qv
       |  FROM embeddings),
       |pe AS (
       |  SELECT vec_id, qv,
       |    list_transform(range(0, $JlK), j ->
       |      CAST(list_sum(list_transform(range(0, $JlDim), i ->
       |        (1 - 2 * ($mdji % 2)) * qv[i + 1])) AS BIGINT)) AS pv
       |  FROM e),
       |pairs AS (
       |  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
       |    CAST(list_sum(list_transform(range(0, $JlDim),
       |      i -> (a.qv[i + 1] - b.qv[i + 1]) * (a.qv[i + 1] - b.qv[i + 1])))
       |      AS BIGINT) AS d2o,
       |    CAST(list_sum(list_transform(range(0, $JlK),
       |      i -> (a.pv[i + 1] - b.pv[i + 1]) * (a.pv[i + 1] - b.pv[i + 1])))
       |      AS BIGINT) AS d2p
       |  FROM pe a JOIN pe b
       |    ON b.vec_id BETWEEN a.vec_id + 1 AND a.vec_id + $JlOffsets),
       |scored AS (
       |  SELECT least(15, (d2p * 8) // (d2o * $JlK)) AS bucket,
       |    ${ER.sql.micro6("d2p", s"d2o * $JlK")} AS micro
       |  FROM pairs WHERE d2o > 0)
       |SELECT bucket, ${ER.sql.ratio6("bucket", "8")} AS bucket_lo,
       |  CAST(count(*) AS BIGINT) AS n_pairs,
       |  ${ER.sql.microMean6("sum(micro)", "count(*)")} AS mean_distortion,
       |  min(micro) / 1e6 AS min_distortion,
       |  max(micro) / 1e6 AS max_distortion
       |FROM scored GROUP BY bucket ORDER BY bucket""".stripMargin
  }
  // -- q312: embedding-dimension audit — per-dim mean/variance over
  //          the whole store, each dim's share of total variance, and
  //          the participation ratio PR = (Σλ)²/Σλ² (how many dims
  //          effectively carry signal; PR << d flags a collapsed or
  //          under-trained embedder, dead dims flag truncation bugs).
  //          The diagonal-covariance audit a vector-store ingest runs
  //          before trusting ANN recall. Determinism: values micro-
  //          quantized (floor(v·1e6), float→double cast is exact) so
  //          the per-dim moments are exact longs regardless of row
  //          order; per-dim variance nano-floored before the d-row
  //          share/PR sums (mean-of-rounded). Scale shape: one
  //          posexplode scan → d-row grid; never a d×d covariance.
  private def q312(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
      .select(posexplode(col("embedding")).as(Seq("dim", "v")))
      .select(col("dim"),
        expr("CAST(floor(CAST(v AS DOUBLE) * 1000000) AS BIGINT)")
          .as("vm"))
    val per = e.groupBy(col("dim")).agg(
        count(lit(1)).as("n"), sum(col("vm")).as("sm"),
        sum(col("vm") * col("vm")).as("qm"))
      .select(col("dim"), col("n"), col("sm"),
        expr("CAST(floor(greatest(0.0, CAST(qm AS DOUBLE)/n - " +
          "(CAST(sm AS DOUBLE)/n) * (CAST(sm AS DOUBLE)/n)) / 1000) " +
          "AS BIGINT)").as("var_nano"))
    val tot = per.groupBy().agg(sum(col("var_nano")).as("tot_nano"),
      sum(col("var_nano") * col("var_nano")).as("tot_nano2"),
      count(lit(1)).as("d"))
    per.crossJoin(broadcast(tot))
      .select(col("dim"), col("n"),
        expr("round(CAST(sm AS DOUBLE) / n / 1e6, 6)").as("mean"),
        expr("round(var_nano / 1e9, 6)").as("variance"),
        graft.functions.ExactRound.ratio6(col("var_nano"),
          col("tot_nano")).as("var_share"),
        expr("round((CAST(tot_nano AS DOUBLE) * tot_nano) / " +
          "nullif(CAST(tot_nano2 AS DOUBLE), 0), 6)")
          .as("participation_ratio"),
        (col("var_nano") === 0L).cast("int").as("dead"))
      .orderBy(col("dim"))
  }

  // Variance is of the micro-quantized values: var_nano =
  // floor(((Σv²ₘ)/n − ((Σvₘ)/n)²)/1e3) — the moments are in micro²
  // (1e-12) units, so ÷1e3 lands on nano (1e-9) units of the
  // original scale.
  private val q312Sql =
    s"""WITH ex AS (
       |  SELECT CAST(z[2] AS INT) - 1 AS dim,
       |    CAST(floor(CAST(z[1] AS DOUBLE) * 1000000) AS BIGINT) AS vm
       |  FROM (SELECT unnest(list_zip(embedding,
       |    range(1, len(embedding) + 1))) AS z FROM embeddings)),
       |per AS (
       |  SELECT dim, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(vm) AS BIGINT) AS sm,
       |    CAST(floor(greatest(0.0, CAST(sum(vm*vm) AS DOUBLE)/count(*) -
       |      (CAST(sum(vm) AS DOUBLE)/count(*)) *
       |      (CAST(sum(vm) AS DOUBLE)/count(*))) / 1000) AS BIGINT)
       |      AS var_nano
       |  FROM ex GROUP BY 1),
       |tot AS (SELECT CAST(sum(var_nano) AS BIGINT) AS tot_nano,
       |    CAST(sum(var_nano * var_nano) AS BIGINT) AS tot_nano2,
       |    CAST(count(*) AS BIGINT) AS d
       |  FROM per)
       |SELECT dim, n, round(CAST(sm AS DOUBLE) / n / 1e6, 6) AS mean,
       |  round(var_nano / 1e9, 6) AS variance,
       |  ${graft.functions.ExactRound.sql.ratio6("var_nano", "tot_nano")}
       |    AS var_share,
       |  round((CAST(tot_nano AS DOUBLE) * tot_nano) /
       |    nullif(CAST(tot_nano2 AS DOUBLE), 0), 6)
       |    AS participation_ratio,
       |  CAST(CASE WHEN var_nano = 0 THEN 1 ELSE 0 END AS INT) AS dead
       |FROM per CROSS JOIN tot ORDER BY dim""".stripMargin

  val qs: Seq[Q] = Seq(
    Q("q17_topk_cosine", q17, Some(q17Sql), headline = true),
    Q("q18_topk_filtered", q18, Some(q18Sql)),
    Q("q19_sim_selfjoin_exact", q19, Some(q19Sql), headline = true),
    Q("q20_knn_join", q20, Some(q20Sql)),
    Q("q21_sim_metrics", q21, Some(q21Sql)),
    Q("q22_ann_ivf", q22, Some(q22Sql)),
    Q("q91_ann_ivf_pq", q91, Some(q91Sql), headline = true),
    Q("q92_ann_ivf_sq8", q92, Some(q92Sql)),
    Q("q137_source_centroid_sim", q137, Some(q137Sql)),
    Q("q217_sq8_error", q217, Some(q217Sql)),
    Q("q229_label_separability", q229, Some(q229Sql)),
    Q("q255_jl_distortion", q255, Some(q255Sql)),
    Q("q312_embedding_dim_audit", q312, Some(q312Sql)))
}
