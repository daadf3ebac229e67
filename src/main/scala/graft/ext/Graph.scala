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
    // localCheckpoint, not cache(): both frames feed every iteration,
    // and an LRU-evicted cache block would re-execute the edge distinct
    // per round (checkpoint blocks spill to disk instead)
    val e = edges.select(col(src).cast("long").as("src"),
      col(dst).cast("long").as("dst")).distinct().localCheckpoint()
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct().localCheckpoint()
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

  /** Personalized PageRank (topic-sensitive PageRank, Haveliwala
    * WWW'02): the damped power iteration of [[pageRankInt]] with the
    * teleport mass restricted to a source set — scores measure
    * proximity TO the sources through the link structure, the standard
    * seed-expansion signal for curation (start from known-good domains
    * / trusted documents, rank everything else by how much seed mass
    * flows to it). Same SCALE fixed point, same floor-`div` integer
    * arithmetic, bit-identical on any engine or partitioning; the
    * DuckDB oracle ([[personalizedPageRankSql]]) unrolls the identical
    * iterations.
    *
    * `sources` is caller metadata (seed ids), broadcast as a literal
    * IN-set — seeds are human-curated lists, thousands at most, never
    * corpus-sized. Initial and teleport mass (Scale div |S|) sit on
    * sources only; dangling mass leaks as in [[pageRankInt]].
    *
    * Scale shape per iteration: identical to [[pageRankInt]] — one
    * edge⋈rank equi-join (shuffle on src), one map-combined sum
    * (shuffle on dst), lineage checkpoint-truncated per round. */
  def personalizedPageRankInt(edges: DataFrame, src: String, dst: String,
                              sources: Seq[Long], iters: Int,
                              dampNum: Long = 85, dampDen: Long = 100)
      : DataFrame = {
    require(sources.nonEmpty, "at least one source node")
    val e = edges.select(col(src).cast("long").as("src"),
      col(dst).cast("long").as("dst")).distinct().localCheckpoint()
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct().localCheckpoint()
    val outDeg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val ns = sources.distinct.size
    val isSource = col("id").isInCollection(sources.distinct)
    val base = (Scale - Scale * dampNum / dampDen) / ns
    var ranks = nodes
      .withColumn("pr", when(isSource, lit(Scale / ns)).otherwise(lit(0L)))
      .localCheckpoint()
    (1 to iters).foreach { _ =>
      val contrib = e.join(outDeg, "src")
        .join(ranks.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), expr("pr div deg").as("c"))
        .groupBy("id").agg(sum(col("c")).as("s"))
      val prev = ranks
      ranks = nodes.join(contrib, Seq("id"), "left")
        .select(col("id"),
          (when(isSource, lit(base)).otherwise(lit(0L)) +
            expr(s"coalesce(s, CAST(0 AS BIGINT)) * $dampNum div $dampDen"))
            .as("pr"))
        .localCheckpoint()
      prev.unpersist()
    }
    ranks
  }

  /** [[personalizedPageRankInt]] as unrolled DuckDB SQL — the oracle
    * generator (x109), mirroring [[pageRankSql]]. */
  def personalizedPageRankSql(edgeCte: String, sources: Seq[Long],
                              iters: Int, dampNum: Long = 85,
                              dampDen: Long = 100): String = {
    val s = Scale
    val srcList = sources.distinct.sorted.mkString(", ")
    val ns = sources.distinct.size
    val header =
      s"""WITH e AS ($edgeCte),
         |nodes AS (SELECT DISTINCT id FROM
         |  (SELECT src AS id FROM e UNION SELECT dst FROM e)),
         |deg AS (SELECT src, COUNT(*)::BIGINT AS deg FROM e GROUP BY src),
         |pr0 AS (SELECT id,
         |  (CASE WHEN id IN ($srcList) THEN $s // $ns ELSE 0 END)::BIGINT AS pr
         |  FROM nodes)""".stripMargin
    val base = s"($s - $s * $dampNum // $dampDen) // $ns"
    val steps = (1 to iters).map { i =>
      val prev = if (i == 1) "pr0" else s"pr${i - 1}"
      s"""pr$i AS (
         |  SELECT nodes.id,
         |    ((CASE WHEN nodes.id IN ($srcList) THEN $base ELSE 0 END)
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

  /** k-core peeling, `rounds` synchronous rounds: each round drops
    * every node whose degree in the CURRENT surviving subgraph is
    * < k, then drops edges touching dropped nodes. After enough
    * rounds this is exactly the k-core (the maximal subgraph of
    * minimum degree ≥ k) — the standard spam-farm / community-core
    * filter over link graphs when weighting web corpora. The round
    * count is part of the operator contract (like [[pageRankInt]]'s
    * iteration count) so the computation is finite and identical on
    * any engine; callers verify convergence by checking rounds and
    * rounds+1 agree (GraphSpec does, and peeling converges in
    * O(diameter)-ish rounds on real graphs).
    *
    * Returns (id, deg) for surviving nodes with their degree inside
    * the surviving subgraph. Scale shape per round: one map-combined
    * degree aggregation + two semi-joins keyed on node ids; lineage
    * truncated per round with localCheckpoint — the same iteration
    * discipline as [[Dedup.connectedComponents]].
    */
  def kCoreMembers(edges: DataFrame, a: String, b: String,
                   k: Int, rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 1, "k and rounds must be positive")
    var e = edges.select(
        least(col(a), col(b)).cast("long").as("u"),
        greatest(col(a), col(b)).cast("long").as("v"))
      .filter(col("u") =!= col("v")).distinct().localCheckpoint()
    def degrees(ed: DataFrame) =
      ed.select(col("u").as("id")).union(ed.select(col("v").as("id")))
        .groupBy("id").agg(count(lit(1)).as("deg"))
    (1 to rounds).foreach { _ =>
      val keep = degrees(e).filter(col("deg") >= k).select("id")
      val prev = e
      e = e.join(keep.withColumnRenamed("id", "u"), Seq("u"), "leftsemi")
        .join(keep.withColumnRenamed("id", "v"), Seq("v"), "leftsemi")
        .localCheckpoint()
      prev.unpersist()
    }
    degrees(e).filter(col("deg") >= k)
  }

  /** [[kCoreMembers]] as unrolled DuckDB SQL (round CTEs), sharing
    * the edge-CTE parameterization with [[pageRankSql]] — the oracle
    * generator. Every round CTE is MATERIALIZED: each round references
    * its predecessor several times, and DuckDB's default CTE inlining
    * would re-expand the whole chain exponentially (≈5^rounds base
    * scans). */
  def kCoreSql(edgeCte: String, k: Int, rounds: Int): String = {
    val header =
      s"""WITH raw AS ($edgeCte),
         |e0 AS MATERIALIZED (
         |  SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
         |  FROM raw WHERE src <> dst)""".stripMargin
    val steps = (1 to rounds).map { i =>
      val prev = s"e${i - 1}"
      s"""d$i AS MATERIALIZED (SELECT id, COUNT(*)::BIGINT AS deg FROM
         |  (SELECT u AS id FROM $prev UNION ALL SELECT v FROM $prev)
         |  GROUP BY id),
         |n$i AS MATERIALIZED (SELECT id FROM d$i WHERE deg >= $k),
         |e$i AS MATERIALIZED (SELECT u, v FROM $prev
         |  WHERE u IN (SELECT id FROM n$i) AND v IN (SELECT id FROM n$i))""".stripMargin
    }
    val last = s"e$rounds"
    (Seq(header) ++ steps).mkString(",\n") +
      s"""
         |SELECT id::BIGINT AS id, deg FROM (
         |  SELECT id, COUNT(*)::BIGINT AS deg FROM
         |    (SELECT u AS id FROM $last UNION ALL SELECT v FROM $last)
         |  GROUP BY id)
         |WHERE deg >= $k ORDER BY id""".stripMargin
  }

  /** Synchronous label propagation (Raghavan et al. 2007), made fully
    * deterministic: every node starts labelled with its own id; each
    * round every node adopts the label that is most frequent among its
    * neighbours, ties broken toward the SMALLEST label (the classic
    * algorithm breaks ties randomly — useless for a reproducible
    * pipeline); isolated nodes keep their label. `rounds` is part of
    * the operator contract (synchronous LPA can oscillate on bipartite
    * structures, so a fixpoint loop would not terminate in general —
    * fixed rounds sidestep that while staying engine-exact).
    * Communities over co-occurrence graphs drive corpus balancing the
    * same way [[kCoreMembers]] drives spam filtering.
    *
    * Scale shape per round: one equi-join of the directed edge list
    * against the label frame (shuffle on src), one map-combined
    * (node, label) count, one argmax agg via min(struct) — no window,
    * no sort — then a left join back to the node set; lineage
    * truncated per round. Shuffles carry (long, long, count) only.
    */
  def labelPropagate(edges: DataFrame, a: String, b: String, rounds: Int)
      : DataFrame = {
    require(rounds >= 1, "rounds must be positive")
    val und = edges.select(
        least(col(a), col(b)).cast("long").as("u"),
        greatest(col(a), col(b)).cast("long").as("v"))
      .filter(col("u") =!= col("v")).distinct()
    // directed both ways: each edge delivers its source's label to dst
    val dir = und.select(col("u").as("src"), col("v").as("dst"))
      .union(und.select(col("v").as("src"), col("u").as("dst")))
      .localCheckpoint()
    val nodes = dir.select(col("dst").as("id")).distinct().localCheckpoint()
    var labels = nodes.select(col("id"), col("id").as("lab"))
      .localCheckpoint()
    (1 to rounds).foreach { _ =>
      val counts = dir
        .join(labels.select(col("id").as("src"), col("lab")), "src")
        .groupBy(col("dst").as("id"), col("lab"))
        .agg(count(lit(1)).as("c"))
      val picked = counts
        .groupBy("id")
        .agg(min(struct((-col("c")).as("nc"), col("lab").as("l"))).as("m"))
        .select(col("id"), col("m.l").as("newlab"))
      val prev = labels
      labels = labels.join(picked, Seq("id"), "left")
        .select(col("id"), coalesce(col("newlab"), col("lab")).as("lab"))
        .localCheckpoint()
      prev.unpersist()
    }
    labels
  }

  /** [[labelPropagate]] as unrolled DuckDB SQL (MATERIALIZED round
    * CTEs — same exponential-inlining hazard as [[kCoreSql]]); the
    * argmax is a ROW_NUMBER over (count DESC, label ASC), the same
    * total order as the engine's min(struct(−c, lab)). */
  def labelPropSql(edgeCte: String, rounds: Int): String = {
    val header =
      s"""WITH raw AS ($edgeCte),
         |und AS MATERIALIZED (
         |  SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
         |  FROM raw WHERE src <> dst),
         |dir AS MATERIALIZED (
         |  SELECT u AS src, v AS dst FROM und
         |  UNION ALL SELECT v, u FROM und),
         |nodes AS MATERIALIZED (SELECT DISTINCT dst AS id FROM dir),
         |lab0 AS MATERIALIZED (SELECT id, id AS lab FROM nodes)""".stripMargin
    val steps = (1 to rounds).map { i =>
      val prev = s"lab${i - 1}"
      s"""cnt$i AS MATERIALIZED (
         |  SELECT dir.dst AS id, l.lab, COUNT(*)::BIGINT AS c
         |  FROM dir JOIN $prev l ON l.id = dir.src
         |  GROUP BY dir.dst, l.lab),
         |pick$i AS MATERIALIZED (
         |  SELECT id, lab FROM (
         |    SELECT id, lab,
         |      ROW_NUMBER() OVER (PARTITION BY id ORDER BY c DESC, lab) AS rn
         |    FROM cnt$i) WHERE rn = 1),
         |lab$i AS MATERIALIZED (
         |  SELECT n.id, COALESCE(p.lab, o.lab) AS lab
         |  FROM nodes n JOIN $prev o ON o.id = n.id
         |  LEFT JOIN pick$i p ON p.id = n.id)""".stripMargin
    }
    (Seq(header) ++ steps).mkString(",\n") +
      s"\nSELECT id::BIGINT AS id, lab::BIGINT AS lab FROM lab$rounds ORDER BY id"
  }

  /** Per-node triangle counts by degree-ordered edge orientation (the
    * "forward"/compact-forward algorithm, Latapy 2008): each
    * undirected edge is directed from its lower-ranked endpoint to the
    * higher-ranked one under the total order (degree, id), so a
    * triangle {a,b,c} with a ≺ b ≺ c is enumerated exactly once — as
    * the wedge a→b, a→c closed by the edge b→c. Triangle density is
    * the standard cohesion signal over co-occurrence graphs (entity
    * mentions, domain links, co-purchases) when weighting training
    * corpora by community structure.
    *
    * Why orientation matters at 100 TB: naive wedge counting fans out
    * Σ deg² pairs — a single hub node with 10⁶ neighbours generates
    * 10¹² wedges. Orienting by degree caps every node's OUT-degree at
    * O(√m), so wedge volume is O(m^{3/2}) worst-case and far less on
    * power-law graphs; hubs sit on the receiving end and never
    * enumerate their neighbour pairs.
    *
    * Plan shape: degree aggregation (map-combined, shuffle on node
    * id), two equi-joins attaching endpoint ranks, one self-join of
    * the oriented edges on the source node (the wedge build), one
    * equi-join probing the closing edge on the (v, w) pair, one
    * map-combined count per node. Every shuffle carries long pairs
    * only; AQE absorbs residual wedge-key skew. The canonical and
    * oriented edge lists are each referenced three times downstream,
    * so both are materialized once (localCheckpoint — the
    * [[pageRankInt]] discipline); without it Catalyst re-derives the
    * whole edge build per reference.
    *
    * Returns (id, n_triangles) for nodes participating in ≥ 1
    * triangle. Self-loops are dropped; parallel edges collapse.
    */
  /** Newman modularity of a community assignment, per community, as
    * exact integer fractions — the quality score that tells you
    * whether [[labelPropagate]] (or any clustering) actually found
    * structure: Q = Σ_c [e_c/m − (d_c/2m)²] over communities, cleared
    * to q_num_c = 4m·e_c − d_c² over q_den = 4m² (sum q_num_c/q_den
    * for the global Q; positive contribution ⇒ denser-than-chance).
    *
    * `labels` maps node id → community (nodes without a label are
    * excluded, as are edges touching them). Self-loops drop, parallel
    * edges collapse — matching the other Graph operators.
    *
    * Plan shape: canonical edge list materialized once; two id-keyed
    * equi-joins attach endpoint communities; e_c and (n_nodes, d_c)
    * are map-combined aggregations over community keys; m rides a
    * 1-row broadcast (never a driver count). Everything shuffled is
    * id/community longs — no corpus payloads, no windows. */
  def modularity(edges: DataFrame, a: String, b: String,
                 labels: DataFrame, id: String, lab: String): DataFrame = {
    val und = edges.select(
        least(col(a), col(b)).cast("long").as("u"),
        greatest(col(a), col(b)).cast("long").as("v"))
      .filter(col("u") =!= col("v")).distinct().localCheckpoint()
    val m = und.agg(count(lit(1)).as("_m"))
    val lb = labels.select(col(id).cast("long").as("_nid"),
      col(lab).as("_lb"))
    val labeled = und
      .join(lb.select(col("_nid").as("u"), col("_lb").as("lu")), Seq("u"))
      .join(lb.select(col("_nid").as("v"), col("_lb").as("lv")), Seq("v"))
    val intra = labeled.filter(col("lu") === col("lv"))
      .groupBy(col("lu").as("community")).agg(count(lit(1)).as("e_in"))
    val deg = und.select(col("u").as("nid"))
      .union(und.select(col("v").as("nid")))
      .groupBy("nid").agg(count(lit(1)).as("_d"))
    val comm = deg.join(lb, deg("nid") === lb("_nid"))
      .groupBy(col("_lb").as("community"))
      .agg(count(lit(1)).as("n_nodes"), sum("_d").as("d_tot"))
    comm.join(intra, Seq("community"), "left")
      .select(col("community"), col("n_nodes"),
        coalesce(col("e_in"), lit(0L)).as("e_in"), col("d_tot"))
      .crossJoin(broadcast(m))
      .select(col("community"), col("n_nodes"), col("e_in"), col("d_tot"),
        (lit(4L) * col("_m") * col("e_in") - col("d_tot") * col("d_tot"))
          .as("q_num"),
        (lit(4L) * col("_m") * col("_m")).as("q_den"))
  }

  def triangleCounts(edges: DataFrame, a: String, b: String): DataFrame = {
    val e = edges.select(
        least(col(a), col(b)).cast("long").as("u"),
        greatest(col(a), col(b)).cast("long").as("v"))
      .filter(col("u") =!= col("v")).distinct().localCheckpoint()
    val deg = e.select(col("u").as("id"))
      .union(e.select(col("v").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    // rank = (deg, id); orient src→dst with rank(src) < rank(dst)
    val ranked = e
      .join(deg.select(col("id").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("id").as("v"), col("deg").as("dv")), "v")
    val uFirst = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    val oriented = ranked.select(
      when(uFirst, col("u")).otherwise(col("v")).as("src"),
      when(uFirst, col("v")).otherwise(col("u")).as("dst"),
      when(uFirst, col("dv")).otherwise(col("du")).as("ddeg"))
      .localCheckpoint()
    // wedges from the LOW end: (src→x, src→y) with rank(x) < rank(y)
    val o1 = oriented.select(col("src"), col("dst").as("x"),
      col("ddeg").as("dx"))
    val o2 = oriented.select(col("src"), col("dst").as("y"),
      col("ddeg").as("dy"))
    val wedges = o1.join(o2, Seq("src"))
      .filter(col("dx") < col("dy") ||
        (col("dx") === col("dy") && col("x") < col("y")))
    // close: the oriented edge x→y must exist (ranks align with the
    // wedge filter by construction)
    val closing = oriented.select(col("src").as("x"), col("dst").as("y"))
    val tris = wedges.join(closing, Seq("x", "y"))
      .select(col("src").as("n1"), col("x").as("n2"), col("y").as("n3"))
    tris.select(explode(array(col("n1"), col("n2"), col("n3"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("n_triangles"))
  }

  /** Local clustering coefficient per node — "how much of this node's
    * neighbourhood is itself connected", the community-cohesion /
    * link-farm discriminator (organic social and citation graphs have
    * high local clustering; synthetic spam link constellations have
    * near-zero, and bipartite scrape artifacts exactly zero). Exact
    * integers end-to-end: cc = 2·tri(v) / (deg(v)·(deg(v)−1)),
    * reported as ppm via floor division, alongside the raw counts.
    *
    * Plan shape: [[triangleCounts]]' degree-oriented wedge close (the
    * O(m^{3/2}) bound — no node ever enumerates its full neighbour
    * pair set) plus one map-combined degree agg and a left join of
    * degrees against triangle counts (nodes without triangles keep
    * cc = 0). Degree-1 nodes have no defined coefficient and emit
    * null. Nothing beyond the edge list ever shuffles. */
  def clusteringCoefficient(edges: DataFrame, a: String, b: String)
      : DataFrame = {
    val und = edges.select(
        least(col(a), col(b)).cast("long").as("u"),
        greatest(col(a), col(b)).cast("long").as("v"))
      .filter(col("u") =!= col("v")).distinct().localCheckpoint()
    val deg = und.select(col("u").as("id"))
      .union(und.select(col("v").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    val tri = triangleCounts(und, "u", "v")
    deg.join(tri, Seq("id"), "left")
      .select(col("id"), col("deg"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
        when(col("deg") >= 2,
          IntMath.ppmDiv(lit(2L) * coalesce(col("n_triangles"), lit(0L)),
            col("deg") * (col("deg") - 1))).as("cc_ppm"))
  }

  /** Distinct 2-hop neighbourhood size per node — friends-of-friends
    * excluding self and direct neighbours: the expansion/reach
    * feature behind link-graph spam scoring (link farms have huge
    * 1-hop but collapsed 2-hop diversity) and candidate generation
    * for graph-based recommendation.
    *
    * Exact by construction: wedges x→m→y from the doubled edge list,
    * distinct (x, y), minus direct edges via one anti join. Wedge
    * volume is Σ deg(m)² — the honest cost of exact 2-hop reach; at
    * web scale cap hub degrees upstream (a 10⁶-degree hub
    * contributes 10¹² wedges and its 2-hop set is "everything" —
    * analytically uninteresting) or switch to HLL sketch unions per
    * neighbourhood for the approximate variant ([[graft.ext.Hll]]).
    * AQE absorbs residual middle-key skew; every shuffle carries
    * long pairs. */
  def twoHopCounts(edges: DataFrame, a: String, b: String): DataFrame = {
    val und = edges.select(
        least(col(a), col(b)).cast("long").as("u"),
        greatest(col(a), col(b)).cast("long").as("v"))
      .filter(col("u") =!= col("v")).distinct()
    val dir = und.select(col("u").as("src"), col("v").as("dst"))
      .union(und.select(col("v").as("src"), col("u").as("dst")))
      .localCheckpoint()
    val hop2 = dir.select(col("src").as("x"), col("dst").as("m"))
      .join(dir.select(col("src").as("m"), col("dst").as("y")), "m")
      .filter(col("x") =!= col("y"))
      .select(col("x"), col("y")).distinct()
    hop2.join(dir.select(col("src").as("x"), col("dst").as("y")),
        Seq("x", "y"), "left_anti")
      .groupBy(col("x").as("id"))
      .agg(count(lit(1)).as("n_two_hop"))
  }

  /** Resource-allocation link prediction: for every NON-adjacent node
    * pair (u < v) with at least one common neighbor, the RA index
    *
    *   RA(u,v) = Σ_{w ∈ N(u)∩N(v)} 1/deg(w)
    *
    * (Zhou/Lü/Zhang's estimator — common neighbors, each discounted by
    * its degree so promiscuous hubs contribute ~nothing), rendered
    * integer-exact as `ra_scaled = Σ ⌊10⁶/deg(w)⌋` plus the raw
    * common-neighbor count. The top of this frame is the standard
    * "suggested links" list; on a doc-similarity graph it surfaces
    * transitive near-dup families one hop before CC merges them.
    *
    * Plan shape: wedges are generated hub-side — the directed
    * adjacency self-joined on the hub key, each wedge carrying the
    * hub's precomputed ⌊10⁶/deg⌋ — then one map-combined sum per
    * (u,v) and a left-anti equi-join against the edge set. Per-hub
    * wedge volume is deg², so hubs with deg > `maxHubDegree` are
    * EXCLUDED (the dropped-hub count is derivable from
    * [[degreeProfile]]'s degree histogram — sum the buckets past the
    * cap): at 10⁶ per-ppm discount a hub past
    * ~10⁶ contributes 0 anyway, and the cap makes the shuffle volume
    * provably ≤ |V|·maxHubDegree² instead of unbounded on a
    * power-law graph. Dropped hubs only LOWER scores of pairs they
    * connect — the estimator's own design says those contributions
    * are noise. */
  def resourceAllocation(edges: DataFrame, a: String, b: String,
                         maxHubDegree: Int = 10000): DataFrame = {
    require(maxHubDegree >= 2, "maxHubDegree must be at least 2")
    val und = edges.select(
        least(col(a), col(b)).cast("long").as("u"),
        greatest(col(a), col(b)).cast("long").as("v"))
      .filter(col("u") =!= col("v")).distinct()
      .localCheckpoint()
    val dir = und.select(col("u").as("w"), col("v").as("n"))
      .union(und.select(col("v").as("w"), col("u").as("n")))
    val deg = dir.groupBy("w").agg(count(lit(1)).as("deg"))
      .filter(col("deg") <= maxHubDegree.toLong)
      .withColumn("_w_ppm", IntMath.truncDiv(lit(1000000L), col("deg")))
    val adj = dir.join(deg, Seq("w"))
    val wedges = adj.select(col("w"), col("n").as("_u"), col("_w_ppm"))
      .join(adj.select(col("w"), col("n").as("_v")), Seq("w"))
      .filter(col("_u") < col("_v"))
    wedges.groupBy(col("_u"), col("_v"))
      .agg(sum(col("_w_ppm")).as("ra_scaled"),
        count(lit(1)).as("n_common"))
      .join(und.select(col("u").as("_u"), col("v").as("_v")),
        Seq("_u", "_v"), "left_anti")
      .select(col("_u").as("u"), col("_v").as("v"),
        col("ra_scaled"), col("n_common"))
  }

  /** Degree distribution in log2 buckets — the first graph-health
    * profile read before any iterative algorithm is launched (bucket
    * = ⌊log2 deg⌋ via binary digit count, integer-exact): a heavy
    * top bucket says salt/cap before you shuffle. One map-combined
    * degree agg + one map-combined bucket count. */
  def degreeProfile(edges: DataFrame, a: String, b: String): DataFrame = {
    val und = edges.select(
        least(col(a), col(b)).cast("long").as("u"),
        greatest(col(a), col(b)).cast("long").as("v"))
      .filter(col("u") =!= col("v")).distinct()
    und.select(col("u").as("id")).union(und.select(col("v").as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
      .select((length(bin(col("deg"))) - 1).cast("long").as("log2_deg"))
      .groupBy("log2_deg").agg(count(lit(1)).as("n_nodes"))
  }

  /** Component-size profile of a pair graph over a node universe —
    * the first question after any dedup/linkage pass: "how big are
    * the duplicate families, and is there a pathological
    * giant component" (one boilerplate template chaining 10⁶ docs
    * into one cluster is a pipeline bug, not a dedup win). Returns
    * one row per component size: (csize, n_components), with
    * universe members that appear in no pair counted as size-1
    * singletons — so Σ csize·n_components = |universe| exactly, an
    * invariant the caller can assert.
    *
    * Plan shape: [[Dedup.connectedComponents]] pointer-jumping over
    * the pairs (edges-only shuffles, checkpoint-truncated rounds),
    * one size agg, one histogram agg (output ≤ max-size rows), and
    * ONE 2-row count reduce for the singleton bucket — the universe
    * is scanned once and never shuffled. */
  def componentSizeProfile(pairs: DataFrame, universe: DataFrame,
                           id: String): DataFrame = {
    val comp = Dedup.connectedComponents(pairs)
    val hist = comp.groupBy(col("cluster"))
      .agg(count(lit(1)).as("csize"))
      .groupBy(col("csize")).agg(count(lit(1)).as("n_components"))
    val totals = universe.select(col(id)).agg(count(lit(1)).as("_nu"))
      .crossJoin(broadcast(comp.agg(count(lit(1)).as("_nin"))))
    // PRECONDITION: every id in `pairs` must appear in `universe`.
    // A violation makes the singleton count NEGATIVE; the row is
    // emitted (not filtered) so the caller's Σ csize·n_components ==
    // |universe| assertion catches it instead of silently passing a
    // smaller universe.
    val singles = totals.select(lit(1L).as("csize"),
        (col("_nu") - col("_nin")).as("n_components"))
      .filter(col("n_components") =!= 0)
    // pair-derived components always have csize >= 2 — the buckets
    // cannot collide with the singleton row
    hist.unionByName(singles)
  }

  /** Multi-source BFS distance labels, `maxDepth` synchronous rounds:
    * every node's hop distance to the NEAREST seed (trust/spam seed
    * propagation, crawl-frontier depth, "how far from curated
    * content" quality tiers). Nodes unreached within maxDepth are
    * absent — the consumer's sentinel choice, not ours.
    *
    * Per round one frontier⋈edges equi-join + a map-combined min —
    * the frontier SHRINKS to newly-reached nodes only (visited set
    * checked via anti join), so total work is O(edges touched), not
    * O(rounds·m); lineage truncated per round ([[pageRankInt]]
    * discipline). */
  def bfsDistances(edges: DataFrame, a: String, b: String,
                   seeds: DataFrame, seedCol: String,
                   maxDepth: Int): DataFrame = {
    require(maxDepth >= 0, "maxDepth must be non-negative")
    val und = edges.select(
        least(col(a), col(b)).cast("long").as("u"),
        greatest(col(a), col(b)).cast("long").as("v"))
      .filter(col("u") =!= col("v")).distinct()
    val dir = und.select(col("u").as("src"), col("v").as("dst"))
      .union(und.select(col("v").as("src"), col("u").as("dst")))
      .localCheckpoint()
    var visited = seeds.select(col(seedCol).cast("long").as("id"))
      .distinct().withColumn("dist", lit(0L)).localCheckpoint()
    var frontier = visited
    (1 to maxDepth).foreach { depth =>
      val next = dir.join(frontier.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id")).distinct()
        .join(visited.select("id"), Seq("id"), "left_anti")
        .withColumn("dist", lit(depth.toLong))
        .localCheckpoint()
      val prev = visited
      visited = visited.unionByName(next.select("id", "dist"))
        .localCheckpoint()
      prev.unpersist(); frontier.unpersist()
      frontier = next
    }
    visited
  }

  /** [[bfsDistances]] as unrolled DuckDB SQL round CTEs (shared
    * edge-CTE parameterization; `seedCte` must yield a column `id`). */
  def bfsSql(edgeCte: String, seedCte: String, maxDepth: Int): String = {
    val header =
      s"""WITH raw AS ($edgeCte),
         |und AS MATERIALIZED (
         |  SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
         |  FROM raw WHERE src <> dst),
         |dir AS MATERIALIZED (
         |  SELECT u AS src, v AS dst FROM und
         |  UNION ALL SELECT v, u FROM und),
         |v0 AS MATERIALIZED (
         |  SELECT DISTINCT id, 0::BIGINT AS dist FROM ($seedCte))""".stripMargin
    val steps = (1 to maxDepth).map { i =>
      s"""f$i AS MATERIALIZED (
         |  SELECT DISTINCT dir.dst AS id, $i::BIGINT AS dist
         |  FROM dir JOIN v${i - 1} f ON f.id = dir.src
         |    AND f.dist = ${i - 1}
         |  WHERE dir.dst NOT IN (SELECT id FROM v${i - 1})),
         |v$i AS MATERIALIZED (
         |  SELECT id, dist FROM v${i - 1} UNION ALL
         |  SELECT id, dist FROM f$i)""".stripMargin
    }
    (Seq(header) ++ steps).mkString(",\n") +
      s"\nSELECT id::BIGINT AS id, dist FROM v$maxDepth ORDER BY id"
  }

  /** HITS hubs-and-authorities (Kleinberg 1999), `iters` synchronous
    * rounds in scaled-integer arithmetic: good hubs point at good
    * authorities and vice versa — the complementary signal to
    * [[pageRankInt]] over link/citation/reference graphs (a page that
    * LINKS to many authoritative sources is itself a curation signal,
    * which PageRank's in-link view cannot see).
    *
    * Per round, using the previous round's hubs: auth(v) = Σ hub(u)
    * over edges u→v, L1-normalized back to `scale`; then hub(u) =
    * Σ auth(v) over u→v, normalized the same way. All arithmetic is
    * BIGINT with floor `div` — bit-identical on any engine or
    * partitioning; the oracle unrolls the same ops. `scale` = 1e6 by
    * default so the hot multiply s·scale stays inside Long for edge
    * counts up to ~9·10⁶ per node-neighbourhood sum (m·scale² ≤ 2⁶³);
    * for larger graphs lower `scale` or lift the two multiplies to
    * DECIMAL(38,0) — precision is a knob, determinism is not.
    *
    * Scale shape per round: two edge⋈score equi-joins + two
    * map-combined sums + two single-row totals (broadcast) — no
    * windows, no driver-side state beyond the 1-row totals; lineage
    * truncated per round ([[pageRankInt]] discipline).
    *
    * Returns (id, auth, hub) for every node, in `scale` fixed point.
    */
  def hitsInt(edges: DataFrame, src: String, dst: String, iters: Int,
              scale: Long = 1000000L): DataFrame = {
    require(iters >= 1, "iters must be positive")
    val e = edges.select(col(src).cast("long").as("src"),
        col(dst).cast("long").as("dst"))
      .distinct().localCheckpoint()
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct().localCheckpoint()
    val n = nodes.count()
    require(n > 0, "empty graph")
    // underflow guard, the mirror of the scaladoc's overflow bound: L1
    // normalization spreads a total of ~`scale` over n nodes, so
    // scale < n floors EVERY score to 0 and the next round's total
    // divides by zero (NULL scores) — exactly on the large graphs the
    // fixed point targets. Raising scale trades against m·scale² ≤ 2⁶³.
    require(scale >= n,
      s"hitsInt: scale ($scale) must be >= node count ($n) or integer " +
        "L1 normalization floors all scores to 0; raise scale " +
        "(keeping sum-of-neighbour-scores * scale inside Long)")
    def normalized(raw: DataFrame, out: String): DataFrame = {
      // raw: (id, s); totals are a 1-row broadcast, never a collect
      val tot = raw.agg(sum(col("s")).as("t"))
      nodes.join(raw, Seq("id"), "left")
        .crossJoin(broadcast(tot))
        .select(col("id"),
          expr(s"coalesce(s, CAST(0 AS BIGINT)) * ${scale}L div t").as(out))
    }
    var hubs = nodes.select(col("id"), lit(scale).as("hub")).localCheckpoint()
    var auths: DataFrame = null
    (1 to iters).foreach { _ =>
      val aRaw = e.join(hubs.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id")).agg(sum(col("hub")).as("s"))
      val prevA = auths
      auths = normalized(aRaw, "auth").localCheckpoint()
      if (prevA != null) prevA.unpersist()
      val hRaw = e.join(auths.withColumnRenamed("id", "dst"), "dst")
        .groupBy(col("src").as("id")).agg(sum(col("auth")).as("s"))
      val prevH = hubs
      hubs = normalized(hRaw, "hub").localCheckpoint()
      prevH.unpersist()
    }
    auths.join(hubs, "id")
  }

  /** [[hitsInt]] as unrolled DuckDB SQL (MATERIALIZED round CTEs —
    * same exponential-inlining hazard as [[kCoreSql]]), sharing the
    * edge-CTE parameterization with [[pageRankSql]]. */
  def hitsSql(edgeCte: String, iters: Int, scale: Long = 1000000L): String = {
    val header =
      s"""WITH raw AS ($edgeCte),
         |e AS MATERIALIZED (SELECT DISTINCT src, dst FROM raw),
         |nodes AS MATERIALIZED (SELECT DISTINCT id FROM
         |  (SELECT src AS id FROM e UNION SELECT dst FROM e)),
         |h0 AS MATERIALIZED (SELECT id, $scale::BIGINT AS hub FROM nodes)""".stripMargin
    val steps = (1 to iters).map { i =>
      val ph = s"h${i - 1}"
      s"""ar$i AS MATERIALIZED (
         |  SELECT e.dst AS id, SUM($ph.hub)::BIGINT AS s
         |  FROM e JOIN $ph ON $ph.id = e.src GROUP BY e.dst),
         |a$i AS MATERIALIZED (
         |  SELECT n.id,
         |    (COALESCE(ar.s, 0) * $scale // (SELECT SUM(s) FROM ar$i))::BIGINT AS auth
         |  FROM nodes n LEFT JOIN ar$i ar ON ar.id = n.id),
         |hr$i AS MATERIALIZED (
         |  SELECT e.src AS id, SUM(a$i.auth)::BIGINT AS s
         |  FROM e JOIN a$i ON a$i.id = e.dst GROUP BY e.src),
         |h$i AS MATERIALIZED (
         |  SELECT n.id,
         |    (COALESCE(hr.s, 0) * $scale // (SELECT SUM(s) FROM hr$i))::BIGINT AS hub
         |  FROM nodes n LEFT JOIN hr$i hr ON hr.id = n.id)""".stripMargin
    }
    (Seq(header) ++ steps).mkString(",\n") +
      s"""
         |SELECT a.id::BIGINT AS id, a.auth, h.hub
         |FROM a$iters a JOIN h$iters h ON h.id = a.id ORDER BY a.id""".stripMargin
  }
}
