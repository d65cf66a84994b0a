package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Community-quality scoring over an arbitrary (v, label) assignment —
  * the evaluation layer for [[LabelPropagation]] (and any other
  * partitioner: CC, SCC, external labels). Newman & Girvan, "Finding and
  * evaluating community structure in networks", Phys. Rev. E 2004
  * (modularity); Kannan, Vempala & Vetta, JACM 2004 (conductance).
  * The reference's OINK suite computes connectivity but never SCORES a
  * partition (`/root/reference/mapreduce-7Apr14/oink/cc_stats.cpp:36-60`
  * stops at component sizes); this closes that gap.
  *
  * Numeric discipline: every per-community quantity (vertex count,
  * intra/cut edge counts, degree sum) is an exact BIGINT aggregate of the
  * simple undirected graph; the only floats are one closing IEEE division
  * per conductance row and one for the global modularity — both divisions
  * of exactly-computed integers, so results are bit-identical under any
  * partitioning and in the DuckDB oracle (the engine-wide convention, cf.
  * [[NeighborhoodFunction]]'s estimator and [[GraphOps.transitivity]]).
  * Degree-sum squares accumulate in DECIMAL(38,0) (DuckDB: HUGEINT): at
  * 10^12 edges a community's degree sum can reach ~2·10^12, whose square
  * overflows BIGINT but sits comfortably in 38 digits.
  *
  * Scale shape: two vertex-keyed label-fetch joins tag every simple edge
  * with both endpoint communities (the label frame broadcasts when small,
  * hash-joins otherwise), then everything is map-side-combined hash
  * aggregation keyed on the community label — no self-joins, no windows,
  * one pass over the edge frame. Skew bounds at #communities, which is
  * ≤ #vertices and typically far smaller.
  */
object CommunityMetrics {

  /** Per-community structure of `labels` (v BIGINT, label BIGINT) over
    * the simple undirected graph of `edges`:
    * (label, nv, intra_edges, cut_edges, degree_sum, conductance) where
    * conductance = cut / min(vol, 2m − vol), NULL when the partition is
    * trivial (one side empty). Vertices without a label row are ignored;
    * labeled isolated vertices count toward nv with degree 0. */
  def communityStats(edges: DataFrame, labels: DataFrame): DataFrame = {
    val e = GraphOps.edgeUpper(edges)
    val tagged = e
      .join(labels.select(col("v").as("vi"), col("label").as("li")), "vi")
      .join(labels.select(col("v").as("vj"), col("label").as("lj")), "vj")
    val intra = tagged.where(col("li") === col("lj"))
      .groupBy(col("li").as("label")).agg(count(lit(1)).as("intra_edges"))
    // a cut edge contributes once to EACH side's boundary
    val cut = tagged.where(col("li") =!= col("lj"))
      .select(explode(array(col("li"), col("lj"))).as("label"))
      .groupBy("label").agg(count(lit(1)).as("cut_edges"))
    val deg = e.select(explode(array(col("vi"), col("vj"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("d"))
    val comm = labels.join(deg, Seq("v"), "left")
      .groupBy("label").agg(
        count(lit(1)).as("nv"),
        sum(coalesce(col("d"), lit(0L))).as("degree_sum"))
    // one-row total degree (2m) rides a broadcast cross join
    val twoM = e.agg((count(lit(1)) * 2).as("two_m"))
    comm
      .join(intra, Seq("label"), "left")
      .join(cut, Seq("label"), "left")
      .crossJoin(broadcast(twoM))
      .select(
        col("label"), col("nv"),
        coalesce(col("intra_edges"), lit(0L)).as("intra_edges"),
        coalesce(col("cut_edges"), lit(0L)).as("cut_edges"),
        col("degree_sum"),
        when(least(col("degree_sum"), col("two_m") - col("degree_sum")) > 0,
          coalesce(col("cut_edges"), lit(0L)).cast("double") /
            least(col("degree_sum"), col("two_m") - col("degree_sum"))
              .cast("double"))
          .as("conductance"))
  }

  /** One-row global summary: (m, communities, intra_total, q) with
    * Newman-Girvan Q = Σ_c [e_c/m − (d_c/2m)²] computed as the exact
    * rational (4m·Σe_c − Σd_c²) / 4m², one closing division. NULL q on
    * an empty graph. */
  def modularity(edges: DataFrame, labels: DataFrame): DataFrame = {
    val dec = DecimalType(38, 0)
    val stats = communityStats(edges, labels)
    val e = GraphOps.edgeUpper(edges)
    val m = e.agg(count(lit(1)).as("m"))
    stats
      .agg(
        count(lit(1)).as("communities"),
        sum(col("intra_edges")).as("intra_total"),
        sum(col("degree_sum").cast(dec) * col("degree_sum").cast(dec))
          .as("d2"))
      .crossJoin(broadcast(m))
      .select(
        col("m"), col("communities"),
        coalesce(col("intra_total"), lit(0L)).as("intra_total"),
        when(col("m") > 0,
          (lit(4).cast(dec) * col("m") * coalesce(col("intra_total"), lit(0L))
            - coalesce(col("d2"), lit(0).cast(dec))).cast("double") /
            (lit(4).cast(dec) * col("m") * col("m")).cast("double"))
          .as("q"))
  }

  /** DuckDB oracle for [[communityStats]] over [[LabelPropagation]]'s
    * final round-`rounds` labels (identical label CTE chain). */
  def statsOracleSql(edgesCte: String, rounds: Int): String =
    s"""WITH ${LabelPropagation.labelCtes(edgesCte, rounds)},
       |${statsCtes(rounds)}
       |SELECT label, nv, intra_edges, cut_edges, degree_sum,
       |  CASE WHEN least(degree_sum, (SELECT two_m FROM tot) - degree_sum) > 0
       |       THEN CAST(cut_edges AS DOUBLE) /
       |            CAST(least(degree_sum,
       |                 (SELECT two_m FROM tot) - degree_sum) AS DOUBLE)
       |  END AS conductance
       |FROM comm_full""".stripMargin

  /** DuckDB oracle for [[modularity]] over the same labels. */
  def modularityOracleSql(edgesCte: String, rounds: Int): String =
    s"""WITH ${LabelPropagation.labelCtes(edgesCte, rounds)},
       |${statsCtes(rounds)}
       |SELECT (SELECT count(*) FROM e0) AS m,
       |  count(*) AS communities,
       |  CAST(coalesce(sum(intra_edges), 0) AS BIGINT) AS intra_total,
       |  CASE WHEN (SELECT count(*) FROM e0) > 0 THEN
       |    CAST(4 * CAST((SELECT count(*) FROM e0) AS HUGEINT) *
       |           coalesce(sum(intra_edges), 0)
       |         - coalesce(sum(CAST(degree_sum AS HUGEINT) * degree_sum), 0)
       |         AS DOUBLE) /
       |    CAST(4 * CAST((SELECT count(*) FROM e0) AS HUGEINT) *
       |           (SELECT count(*) FROM e0) AS DOUBLE)
       |  END AS q
       |FROM comm_full""".stripMargin

  /** Shared metric CTEs on top of [[LabelPropagation.labelCtes]]' `e0`,
    * `und`, and `l<rounds>` tables. */
  private def statsCtes(rounds: Int): String =
    s"""lab AS (SELECT v, label FROM l$rounds),
       |tagged AS MATERIALIZED (
       |  SELECT e.vi, e.vj, a.label AS li, b.label AS lj
       |  FROM e0 e JOIN lab a ON a.v = e.vi JOIN lab b ON b.v = e.vj),
       |intra AS (SELECT li AS label, count(*) AS intra_edges
       |          FROM tagged WHERE li = lj GROUP BY 1),
       |cut AS (SELECT label, count(*) AS cut_edges FROM (
       |          SELECT li AS label FROM tagged WHERE li <> lj
       |          UNION ALL
       |          SELECT lj AS label FROM tagged WHERE li <> lj)
       |        GROUP BY 1),
       |deg AS (SELECT vi AS v, count(*) AS d FROM und GROUP BY 1),
       |comm AS (SELECT l.label, count(*) AS nv,
       |           CAST(coalesce(sum(d.d), 0) AS BIGINT) AS degree_sum
       |         FROM lab l LEFT JOIN deg d ON d.v = l.v GROUP BY 1),
       |tot AS (SELECT 2 * count(*) AS two_m FROM e0),
       |comm_full AS (
       |  SELECT c.label, c.nv,
       |    CAST(coalesce(i.intra_edges, 0) AS BIGINT) AS intra_edges,
       |    CAST(coalesce(x.cut_edges, 0) AS BIGINT) AS cut_edges,
       |    c.degree_sum
       |  FROM comm c
       |  LEFT JOIN intra i ON i.label = c.label
       |  LEFT JOIN cut x ON x.label = c.label)""".stripMargin
}
