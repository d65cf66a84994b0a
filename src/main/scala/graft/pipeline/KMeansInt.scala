package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Deterministic Lloyd k-means over int8-quantized embeddings — the
  * clustering the curation pipeline leans on (SemDeDup blocks, IVF
  * lists, topic mixes) made GATE-VERIFIABLE, which float k-means is not:
  * float centroid means depend on partial-aggregation order, so
  * [[Similarity.ivfTrain]] is deliberately ungated. Here every step is
  * 64-bit integer arithmetic:
  *
  *  - codes: [[Similarity.quantizeInt8]]'s floor(x/scale + 0.5) codes,
  *    SHIFTED by +127 into [0, 254] so every later division is of
  *    non-negative integers (Spark's BIGINT division truncates toward
  *    zero while DuckDB's `//` floors — identical only for x ≥ 0);
  *  - centroids: fixed-point means m_j = round(Σx_j · 2¹⁴ / c), i.e.
  *    the Lloyd mean at 1/16384-code precision, computed with one
  *    positive integer division (round-half-up = (2a + c) div 2c);
  *  - assignment: argmin_c Σ_j (2¹⁴·x_j − m_j)², an exact BIGINT
  *    (≤ dim · (254·2¹⁴)² ≈ 2⁶·1.7e13 ≪ 2⁶³), ties to the smallest cid.
  *
  * Deterministic under any partitioning (integer sums commute) and
  * replayed bit-for-bit by the DuckDB oracle. The reference has no
  * clustering; this extends its MR aggregate toolbox the way a
  * training-data pipeline needs (cluster-blocked dedup, data mixes).
  *
  * 100 TB shape: per round, ONE broadcast of k·dim fixed-point longs
  * for the assign pass (map-side argmin via partial min(struct)), then
  * one (cid, j) partial-aggregated sum — only k·dim rows cross the
  * shuffle, never vectors. Cluster sizes are safe to c ≤ 2⁶³/(2·254·2¹⁴)
  * ≈ 1.1e15 vectors before the mean's dividend overflows.
  */
object KMeansInt {

  val Seed = 229L

  /** Fixed-point scale (2¹⁴) for centroid components. */
  val Scale = 16384L

  /** Shift into the non-negative domain; distances are translation-
    * invariant so the geometry is unchanged. */
  val Shift = 127L

  /** (vec_id, qv): shifted int8 codes of each embedding, in [0, 254]. */
  def codes(embeddings: DataFrame, id: Column, emb: Column): DataFrame =
    embeddings
      .select(id.as("vec_id"), transform(emb, _.cast("double")).as("v"))
      .withColumn("scale", array_max(transform(col("v"), x => abs(x))) / 127.0)
      .select(col("vec_id"), transform(col("v"), x =>
        when(col("scale") === 0.0, lit(0L))
          .otherwise(floor(x / col("scale") + 0.5).cast("long")) + Shift).as("qv"))

  /** Squared fixed-point distance of codes `qv` to centroid `m` — the
    * native fused loop (r14, [[graft.functions.SqDistFx]]); the composed
    * twin below stays as its bit-identity cross-check reference. */
  private def cost(qv: Column, m: Column): Column =
    graft.functions.SqDistFx.sqDistFx(qv, m, Scale)

  /** Composed-builtin form (interpreted lambda + zipped intermediate
    * array per pair) — the SqDistFxSpec cross-check reference. */
  def costComposed(qv: Column, m: Column): Column =
    aggregate(zip_with(qv, m, (x, mj) => {
      val d = x * Scale - mj
      d * d
    }), lit(0L), _ + _)

  /** Final (vec_id, cid, cost) assignment after `iters` Lloyd rounds
    * from the k hash-seeded corpus rows (the [[Similarity.ivfCentroids]]
    * init discipline, on the code grid).
    *
    * The centroid table — k·dim fixed-point longs, the same payload the
    * assign pass broadcasts — rides the driver between rounds: each
    * round is then ONE distributed job (assign + partial-agg'd (cid, j)
    * sums, collected), instead of a chain of joins whose lineage needs
    * per-round checkpoints. That is the classic Lloyd shape (driver
    * centroids, broadcast out, aggregate back); data-sized frames never
    * reach the driver. */
  def run(embeddings: DataFrame, k: Int, iters: Int): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val q = codes(embeddings, col("vec_id"), col("embedding")).persist()
    var cents: Seq[(Long, Seq[Long])] = q
      .withColumn("h", Hashing.hash60(Seed, col("vec_id")))
      .orderBy(col("h"), col("vec_id")).limit(k)
      .select(col("vec_id").as("cid"),
        transform(col("qv"), _ * Scale).as("m"))
      .as[(Long, Seq[Long])].collect().toSeq
    def assign: DataFrame = q.crossJoin(broadcast(cents.toDF("cid", "m")))
      .groupBy("vec_id")
      .agg(min(struct(cost(col("qv"), col("m")).as("cost"), col("cid"))).as("a"),
        first(col("qv")).as("qv"))
      .select(col("vec_id"), col("a.cid").as("cid"), col("a.cost").as("cost"),
        col("qv"))
    for (_ <- 0 until iters) {
      val upd = assign
        .select(col("cid"), posexplode(col("qv")).as(Seq("j", "x")))
        .groupBy("cid", "j").agg(sum("x").as("sx"), count(lit(1)).as("c"))
        // round-half-up fixed-point mean; positive ints, so Spark's
        // truncating div == DuckDB's floor //
        .select(col("cid"), col("j"),
          expr(s"(sx * ${2 * Scale} + c) div (c * 2)").as("mj"))
        .as[(Long, Long, Long)].collect()
        .groupBy(_._1).map { case (cid, rs) =>
          cid -> rs.sortBy(_._2).map(_._3).toSeq
        }
      // a cluster that drained keeps its centroid — same rule as the oracle
      cents = cents.map { case (cid, m) => cid -> upd.getOrElse(cid, m) }
    }
    val out = assign.select("vec_id", "cid", "cost").localCheckpoint(false)
    out.count()
    q.unpersist(false)
    out
  }

  /** DuckDB twin: identical codes, seeds, unrolled rounds, and
    * fixed-point means — dims as (id, j, x) rows, zipped out of the
    * lists by parallel unnest. */
  def oracleSql(k: Int, iters: Int): String =
    s"""${oracleCtes(k, iters)}
       |SELECT vec_id, cid, cost FROM asg""".stripMargin

  /** The replica as a composable CTE prefix ending in
    * `asg(vec_id, cid, cost)` — shared by the s_kmeans oracle and the
    * k-means-blocked SemDeDup oracle. */
  def oracleCtes(k: Int, iters: Int): String = {
    val h = Hashing.hash60Sql(Seed, "vec_id")
    val rounds = (1 to iters).map { i =>
      s"""a$i AS MATERIALIZED (
         |  SELECT vec_id, cid, cost FROM (
         |    SELECT d.vec_id, c.cid,
         |      CAST(sum((d.x * $Scale - c.mj) * (d.x * $Scale - c.mj)) AS BIGINT) AS cost,
         |      row_number() OVER (PARTITION BY d.vec_id
         |        ORDER BY sum((d.x * $Scale - c.mj) * (d.x * $Scale - c.mj)), c.cid) AS rn
         |    FROM dims d JOIN c${i - 1} c ON c.j = d.j
         |    GROUP BY d.vec_id, c.cid)
         |  WHERE rn = 1),
         |u$i AS (
         |  SELECT a.cid, d.j, (sum(d.x) * ${2 * Scale} + count(*)) // (count(*) * 2) AS mj
         |  FROM a$i a JOIN dims d ON d.vec_id = a.vec_id
         |  GROUP BY a.cid, d.j),
         |c$i AS MATERIALIZED (
         |  SELECT c.cid, c.j, coalesce(u.mj, c.mj) AS mj
         |  FROM c${i - 1} c LEFT JOIN u$i u ON u.cid = c.cid AND u.j = c.j)""".stripMargin
    }.mkString(",\n")
    s"""WITH t AS (SELECT vec_id,
       |  list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
       |s AS (SELECT vec_id, v,
       |  list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale FROM t),
       |q AS MATERIALIZED (SELECT vec_id, scale,
       |  list_transform(v, x -> CASE WHEN scale = 0 THEN CAST($Shift AS BIGINT)
       |    ELSE CAST(floor(x / scale + 0.5) AS BIGINT) + $Shift END) AS qv FROM s),
       |dims AS MATERIALIZED (SELECT vec_id,
       |  unnest(range(len(qv))) AS j, unnest(qv) AS x FROM q),
       |seeds AS (SELECT vec_id AS cid, qv FROM q ORDER BY $h, vec_id LIMIT $k),
       |c0 AS MATERIALIZED (SELECT cid,
       |  unnest(range(len(qv))) AS j, unnest(list_transform(qv, x -> x * $Scale)) AS mj
       |  FROM seeds),
       |$rounds,
       |fin AS (
       |  SELECT d.vec_id, c.cid,
       |    CAST(sum((d.x * $Scale - c.mj) * (d.x * $Scale - c.mj)) AS BIGINT) AS cost,
       |    row_number() OVER (PARTITION BY d.vec_id
       |      ORDER BY sum((d.x * $Scale - c.mj) * (d.x * $Scale - c.mj)), c.cid) AS rn
       |  FROM dims d JOIN c$iters c ON c.j = d.j
       |  GROUP BY d.vec_id, c.cid),
       |asg AS (SELECT vec_id, cid, cost FROM fin WHERE rn = 1)""".stripMargin
  }
}
