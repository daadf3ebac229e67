package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class GraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("pageRankInt matches a hand-rolled fixed-point reference") {
    // 1→2, 1→3, 2→3, 3→1 (the classic 3-node example)
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L)).toDF("s", "d")
    val got = Graph.pageRankInt(edges, "s", "d", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // driver-side reference with identical integer ops
    val S = Graph.Scale
    val n = 3L
    val deg = Map(1L -> 2L, 2L -> 1L, 3L -> 1L)
    val in = Map(1L -> Seq(3L), 2L -> Seq(1L), 3L -> Seq(1L, 2L))
    val base = (S - S * 85 / 100) / n
    var pr = Map(1L -> S / n, 2L -> S / n, 3L -> S / n)
    (1 to 3).foreach { _ =>
      pr = pr.keys.map { id =>
        val s = in(id).map(src => pr(src) / deg(src)).sum
        id -> (base + s * 85 / 100)
      }.toMap
    }
    assert(got == pr)
    // ranks order: 3 (two in-edges) > 1 > 2
    assert(got(3L) > got(1L) && got(1L) > got(2L))
  }

  test("termDrift: disjoint-vocabulary corpora flag their unique terms") {
    val a = Seq((1L, "alpha alpha shared"), (2L, "alpha shared")).toDF("id", "text")
    val b = Seq((3L, "beta shared shared")).toDF("id", "text")
    val got = Drift.termDrift(a, b, "text").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got("alpha")._1 == 3 && got("alpha")._2 == 0)
    assert(got("beta")._1 == 0 && got("beta")._2 == 1)
    assert(got("alpha")._3 > 0 && got("beta")._3 > 0)
    // 'shared' appears at IDENTICAL relative frequency (2/5 in A — no:
    // A has 5 tokens, 2 shared; B has 3 tokens, 2 shared) → nonzero;
    // but 'alpha' (exclusive, high freq) must dominate it
    assert(got("alpha")._3 > got("shared")._3)
  }

  test("histogram: equi-width bins, max in last bin, degenerate column") {
    val xs = Seq(0.0, 1.0, 2.0, 3.0, 4.0, 4.0, 4.0).toDF("v")
    val h = Profile.histogram(xs, "v", 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // width 1: [0,1) [1,2) [2,3) [3,4]; the three 4.0s clamp to bin 3
    assert(h == Map(0L -> 1L, 1L -> 1L, 2L -> 1L, 3L -> 4L))
    val flat = Seq(7.0, 7.0).toDF("v")
    val hf = Profile.histogram(flat, "v", 4).collect()
    assert(hf.length == 1 && hf(0).getLong(0) == 0 && hf(0).getLong(1) == 2)
  }

  test("triangleCounts: hand-built graph, dirty edge list") {
    // triangle {1,2,3} + pendant edge 3-4; duplicates, reversals and a
    // self-loop must not change the count
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (2L, 1L), (3L, 4L),
      (4L, 3L), (2L, 2L)).toDF("a", "b")
    val got = Graph.triangleCounts(edges, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L)) // node 4: no row
  }

  test("triangleCounts: K4 has 4 triangles, 3 per node") {
    val nodes = Seq(1L, 2L, 3L, 4L)
    val edges = (for (a <- nodes; b <- nodes if a < b) yield (a, b))
      .toDF("a", "b")
    val got = Graph.triangleCounts(edges, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == nodes.map(_ -> 3L).toMap)
  }

  test("triangleCounts matches brute force on a random graph") {
    // deterministic pseudo-random sparse graph on 30 nodes
    val edges = (1 to 200).map { i =>
      (((i * 7919) % 30).toLong, ((i * 104729) % 30).toLong)
    }.filter(e => e._1 != e._2)
    val canon = edges.map(e => (math.min(e._1, e._2), math.max(e._1, e._2)))
      .distinct.toSet
    val ns = canon.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val brute = scala.collection.mutable.Map.empty[Long, Long]
    for {
      a <- ns; b <- ns if a < b && canon((a, b))
      c <- ns if b < c && canon((b, c)) && canon((a, c))
    } Seq(a, b, c).foreach(n => brute(n) = brute.getOrElse(n, 0L) + 1L)
    val got = Graph.triangleCounts(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == brute.toMap)
  }

  test("kCoreMembers: core survives, pendants cascade off") {
    // K4 core {1,2,3,4}; node 5 hangs off 1,2 (deg 2); 6 hangs off 5.
    // k=3: 6 drops (deg 1), then 5 (deg 2) — the cascade needs >1 round
    val nodes = Seq(1L, 2L, 3L, 4L)
    val k4 = for (a <- nodes; b <- nodes if a < b) yield (a, b)
    val edges = (k4 ++ Seq((1L, 5L), (2L, 5L), (5L, 6L))).toDF("a", "b")
    val got = Graph.kCoreMembers(edges, "a", "b", k = 3, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("kCoreMembers matches driver-side peeling to fixpoint") {
    val raw = (1 to 150).map { i =>
      (((i * 7919) % 25).toLong, ((i * 104729) % 25).toLong)
    }.filter(e => e._1 != e._2)
    var es = raw.map(e => (math.min(e._1, e._2), math.max(e._1, e._2)))
      .distinct.toSet
    val k = 4
    var changed = true
    var fixRounds = 0
    while (changed) {
      val deg = es.toSeq.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).map { case (n, xs) => n -> xs.size }
      val keep = deg.filter(_._2 >= k).keySet
      val next = es.filter(e => keep(e._1) && keep(e._2))
      changed = next != es
      es = next
      fixRounds += 1
    }
    val expect = es.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map { case (n, xs) => n -> xs.size.toLong }
      .filter(_._2 >= k)
    val got = Graph.kCoreMembers(raw.toDF("a", "b"), "a", "b", k,
        rounds = fixRounds + 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expect)
    // and one extra round changes nothing (converged)
    val again = Graph.kCoreMembers(raw.toDF("a", "b"), "a", "b", k,
        rounds = fixRounds + 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == got)
  }

  test("labelPropagate: two cliques with a bridge split into two communities") {
    // cliques {1,2,3} and {10,11,12}, bridge 3-10: min-label argmax
    // converges each clique onto its smallest member's label
    val c1 = Seq((1L, 2L), (1L, 3L), (2L, 3L))
    val c2 = Seq((10L, 11L), (10L, 12L), (11L, 12L))
    val edges = (c1 ++ c2 :+ ((3L, 10L))).toDF("a", "b")
    val got = Graph.labelPropagate(edges, "a", "b", rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 10L, 11L, 12L))
    assert(Set(got(1L), got(2L), got(3L)).size == 1)     // one community
    assert(Set(got(10L), got(11L), got(12L)).size == 1)  // the other
    assert(got(1L) != got(10L))
  }

  test("labelPropagate: deterministic across partitioning and reruns") {
    val edges = (1 to 300).map { i =>
      (((i * 7919) % 40).toLong, ((i * 104729) % 40).toLong)
    }.filter(e => e._1 != e._2).toDF("a", "b")
    val a = Graph.labelPropagate(edges.repartition(1), "a", "b", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val b = Graph.labelPropagate(edges.repartition(7), "a", "b", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(a == b && a.nonEmpty)
  }

  test("pageRankInt is reproducible across partitioning") {
    val edges = (1L to 200L).map(i => (i % 17, (i * 7) % 13)).toDF("s", "d")
    val a = Graph.pageRankInt(edges.repartition(1), "s", "d", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val b = Graph.pageRankInt(edges.repartition(7), "s", "d", 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(a == b)
  }

  test("twoHopCounts: path graph, direct and self excluded") {
    // path 1-2-3-4-5: 2-hop sets {3},{4},{1,5},{2},{3}
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("s", "d")
    val got = Graph.twoHopCounts(edges, "s", "d")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 1L, 5L -> 1L))
  }

  test("twoHopCounts: triangle has no 2-hop-only neighbours") {
    // in a triangle every 2-hop candidate is already a direct edge
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("s", "d")
    assert(Graph.twoHopCounts(edges, "s", "d").count() == 0)
  }

  test("degreeProfile: log2 buckets over star plus triangle") {
    // hub 0 with spokes 1..8 (deg 8 → bucket 3; spokes deg 1 → bucket
    // 0) and a separate triangle 10-11-12 (deg 2 → bucket 1)
    val edges = ((1L to 8L).map(i => (0L, i)) ++
      Seq((10L, 11L), (11L, 12L), (10L, 12L))).toDF("s", "d")
    val got = Graph.degreeProfile(edges, "s", "d")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 8L, 1L -> 3L, 3L -> 1L))
  }

  test("bfsDistances: nearest seed wins, depth bound respected") {
    // path 0-1-2-3-4-5 with seeds {0, 5}: distances 0,1,2,2,1,0
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("s", "d")
    val seeds = Seq(0L, 5L).toDF("id")
    val got = Graph.bfsDistances(edges, "s", "d", seeds, "id", maxDepth = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L,
      5L -> 0L))
    // depth 1: middle nodes unreached and absent
    val shallow = Graph.bfsDistances(edges, "s", "d", seeds, "id",
        maxDepth = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(shallow == Map(0L -> 0L, 1L -> 1L, 4L -> 1L, 5L -> 0L))
  }

  test("hitsInt: star graph — spokes are pure hubs, the hub is the authority") {
    // edges 1→0, 2→0, 3→0: node 0 is the only authority; 1,2,3 are
    // equal hubs; 0 has no out-edges so its hub score is 0
    val edges = Seq((1L, 0L), (2L, 0L), (3L, 0L)).toDF("s", "d")
    val got = Graph.hitsInt(edges, "s", "d", iters = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    val scale = 1000000L
    assert(got(0L) == ((scale, 0L)))          // all authority mass
    assert(got(1L) == ((0L, scale / 3)))      // equal third of hub mass
    assert(got(1L) == got(2L) && got(2L) == got(3L))
  }

  test("hitsInt matches a hand-rolled integer reference and is partition-stable") {
    val edgeSeq = (1L to 60L).map(i => (i % 9, (i * 5) % 11))
    val edges = edgeSeq.toDF("s", "d")
    // driver-side reference with identical integer ops
    val e = edgeSeq.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct.sorted
    val scale = 1000000L
    var hub = nodes.map(_ -> scale).toMap
    var auth = Map.empty[Long, Long]
    (1 to 3).foreach { _ =>
      val ar = e.groupBy(_._2).map { case (v, es) =>
        v -> es.map(ed => hub(ed._1)).sum }
      val at = ar.values.sum
      auth = nodes.map(n => n -> ar.getOrElse(n, 0L) * scale / at).toMap
      val hr = e.groupBy(_._1).map { case (u, es) =>
        u -> es.map(ed => auth(ed._2)).sum }
      val ht = hr.values.sum
      hub = nodes.map(n => n -> hr.getOrElse(n, 0L) * scale / ht).toMap
    }
    val want = nodes.map(n => (n, auth(n), hub(n)))
    val got = Graph.hitsInt(edges.repartition(5), "s", "d", iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    assert(got == want)
  }

  test("modularity: hand-computed two-triangle graph with a bridge") {
    // triangles {1,2,3} and {4,5,6} bridged by (3,4); m=7
    // each community: e_in=3, d_tot=7 -> q_num = 4*7*3 - 49 = 35, q_den=196
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L),
      (5L, 6L), (3L, 4L)).toDF("a", "b")
    val labels = Seq((1L, "A"), (2L, "A"), (3L, "A"), (4L, "B"), (5L, "B"),
      (6L, "B")).toDF("id", "c")
    val got = Graph.modularity(edges, "a", "b", labels, "id", "c")
      .orderBy("community").collect()
    assert(got.length == 2)
    got.foreach { r =>
      assert(r.getAs[Long]("n_nodes") == 3L)
      assert(r.getAs[Long]("e_in") == 3L)
      assert(r.getAs[Long]("d_tot") == 7L)
      assert(r.getAs[Long]("q_num") == 35L)
      assert(r.getAs[Long]("q_den") == 196L)
    }
  }

  test("modularity: negative contribution for anti-community split") {
    // triangle 1-2-3 plus pendant 4-1; communities {1,2,3} and {4}
    // m=4: c1 q_num = 4*4*3 - 7*7 = -1; c2 = 0 - 1 = -1 (worse than chance)
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 1L)).toDF("a", "b")
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 2L)).toDF("id", "c")
    val got = Graph.modularity(edges, "a", "b", labels, "id", "c")
      .orderBy("community").collect()
    assert(got.map(_.getAs[Long]("q_num")).toSeq == Seq(-1L, -1L))
    assert(got.map(_.getAs[Long]("q_den")).toSeq == Seq(64L, 64L))
    // dirty input: self-loops and duplicate edges must not change Q
    val dirty = edges.union(Seq((2L, 1L), (3L, 3L)).toDF("a", "b"))
    val got2 = Graph.modularity(dirty, "a", "b", labels, "id", "c")
      .orderBy("community").collect()
    assert(got2.map(_.getAs[Long]("q_num")).toSeq == Seq(-1L, -1L))
  }

  test("componentSizeProfile: families, singletons, mass invariant") {
    // pairs: {1-2, 2-3} (size 3) and {10-11} (size 2); universe 1..8 ∪ {10,11}
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val universe = ((1L to 8L) ++ Seq(10L, 11L)).toDF("id")
    val got = Graph.componentSizeProfile(pairs, universe, "id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 5L, 2L -> 1L, 3L -> 1L)) // 4..8 are singletons
    assert(got.map { case (s, n) => s * n }.sum == 10L) // Σ csize·n = |universe|
    // no singletons → no size-1 row
    val all2 = Graph.componentSizeProfile(
      Seq((1L, 2L)).toDF("id_a", "id_b"), Seq(1L, 2L).toDF("id"), "id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(all2 == Map(2L -> 1L))
  }

  test("clusteringCoefficient: K4 is fully clustered, pendants undefined") {
    val k4 = (for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j))
      .toDF("a", "b")
    val got = Graph.clusteringCoefficient(k4, "a", "b").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getAs[Long]("cc_ppm")))
    assert(got.toSeq == (1L to 4L).map(i => (i, 3L, 3L, 1000000L)))
    // triangle 1-2-3 with pendant 4 on 1: node1 cc = 2·1/(3·2) = 1/3
    val tp = Seq((1L, 2L), (2L, 3L), (1L, 3L), (1L, 4L)).toDF("a", "b")
    val m = Graph.clusteringCoefficient(tp, "a", "b").collect()
      .map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Long]))
      .toMap
    assert(m(1L) == Some(333333L) && m(2L) == Some(1000000L) &&
      m(3L) == Some(1000000L) && m(4L) == None) // deg-1 → null
  }

  test("resourceAllocation: hand-computed scores, adjacency + hub cap") {
    // path 1−3−2 plus hub 10 touching 1,2,4; edge (1,2) NOT present:
    //   RA(1,2) via 3 (deg 2 → 500000) and via 10 (deg 3 → 333333)
    //   RA(1,4) and RA(2,4) via 10 only
    //   (1,3) etc. are edges → excluded
    val e = Seq((1L, 3L), (3L, 2L), (10L, 1L), (10L, 2L), (10L, 4L))
      .toDF("a", "b")
    val got = Graph.resourceAllocation(e, "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    // (3,10) is predicted through BOTH deg-2 endpoints 1 and 2
    assert(got == Map((1L, 2L) -> ((833333L, 2L)),
      (1L, 4L) -> ((333333L, 1L)), (2L, 4L) -> ((333333L, 1L)),
      (3L, 10L) -> ((1000000L, 2L))))
    // hub cap: with maxHubDegree=2 the deg-3 hub drops as a WEDGE
    // CENTER — pairs it alone connected disappear; scores through
    // surviving centers are unchanged
    val capped = Graph.resourceAllocation(e, "a", "b", maxHubDegree = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(capped == Map((1L, 2L) -> 500000L, (3L, 10L) -> 1000000L))
  }
}
