package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph scoring (PageRank) in fixed-point integer
  * arithmetic.
  *
  * Authority scores over an interaction graph (domain links, citation
  * edges, entity references) are a standard quality-weighting signal
  * for training-data curation. This implementation runs the classic
  * damped power iteration, but entirely in scaled BIGINT arithmetic
  * (SCALE = 1e12, damping as a rational dampNum/dampDen, every
  * division a floor `div`) — so the result is bit-identical under any
  * partitioning, parallelism, or engine (the DuckDB oracle unrolls the
  * same iterations in SQL integer ops).
  *
  * Scale shape: per iteration one equi-join of edges against the rank
  * frame (shuffle on src) and one map-combined aggregation (shuffle on
  * dst); ranks are checkpointed per round to truncate lineage — the
  * same iteration discipline as [[Dedup.connectedComponents]].
  * Dangling-node mass leaks (no redistribution), identically on both
  * engines.
  */
object Graph {

  val Scale = 1000000000000L // 1e12 fixed point

  /** `iters` damped power-iteration rounds over distinct (src, dst)
    * edges; returns (id, pr) with pr in SCALE fixed point. */
  def pageRankInt(edges: DataFrame, src: String, dst: String, iters: Int,
                  dampNum: Long = 85, dampDen: Long = 100): DataFrame = {
    val e = edges.select(col(src).cast("long").as("src"),
      col(dst).cast("long").as("dst")).distinct().cache()
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct().cache()
    val n = nodes.count()
    require(n > 0, "empty graph")
    val outDeg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val base = (Scale - Scale * dampNum / dampDen) / n
    var ranks = nodes.withColumn("pr", lit(Scale / n)).localCheckpoint()
    (1 to iters).foreach { _ =>
      val contrib = e.join(outDeg, "src")
        .join(ranks.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), expr("pr div deg").as("c"))
        .groupBy("id").agg(sum(col("c")).as("s"))
      val prev = ranks
      ranks = nodes.join(contrib, Seq("id"), "left")
        .select(col("id"),
          (lit(base) + expr(s"coalesce(s, CAST(0 AS BIGINT)) * $dampNum div $dampDen"))
            .as("pr"))
        .localCheckpoint()
      prev.unpersist()
    }
    e.unpersist(); nodes.unpersist()
    ranks
  }

  /** The same computation as unrolled DuckDB SQL (iteration CTEs),
    * parameterized by the edge CTE body — the oracle generator. */
  def pageRankSql(edgeCte: String, iters: Int,
                  dampNum: Long = 85, dampDen: Long = 100): String = {
    val s = Scale
    val header =
      s"""WITH e AS ($edgeCte),
         |nodes AS (SELECT DISTINCT id FROM
         |  (SELECT src AS id FROM e UNION SELECT dst FROM e)),
         |deg AS (SELECT src, COUNT(*)::BIGINT AS deg FROM e GROUP BY src),
         |params AS (SELECT COUNT(*)::BIGINT AS n FROM nodes),
         |pr0 AS (SELECT id, (SELECT $s // n FROM params) AS pr FROM nodes)""".stripMargin
    val steps = (1 to iters).map { i =>
      val prev = if (i == 1) "pr0" else s"pr${i - 1}"
      s"""pr$i AS (
         |  SELECT nodes.id,
         |    ((SELECT ($s - $s * $dampNum // $dampDen) // n FROM params)
         |      + COALESCE(agg.s, 0) * $dampNum // $dampDen)::BIGINT AS pr
         |  FROM nodes LEFT JOIN (
         |    SELECT e.dst AS id, SUM($prev.pr // deg.deg)::BIGINT AS s
         |    FROM e JOIN deg ON e.src = deg.src
         |    JOIN $prev ON $prev.id = e.src
         |    GROUP BY e.dst) agg ON agg.id = nodes.id)""".stripMargin
    }
    (Seq(header) ++ steps).mkString(",\n") +
      s"\nSELECT id::BIGINT AS id, pr::BIGINT AS pr FROM pr$iters ORDER BY id"
  }
}
