package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("symmetrize dedups directed duplicates and emits both directions once") {
    val e = Seq((1L, 2L), (1L, 2L), (2L, 1L), (2L, 3L)).toDF("src", "dst")
    val sym = Graph.symmetrize(e).as[(Long, Long)].collect().toSet
    assert(sym == Set((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)))
  }

  test("uniform rank on a symmetric cycle, mass conserved within floor loss") {
    // 4-cycle symmetrized: every node deg 2, perfectly regular => the
    // uniform distribution is the fixed point; fixed-point floors may shave
    // at most a few units per node per round
    val e = Graph.symmetrize(
      Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst"))
    val rows = Graph.pageRank(e, iters = 5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(rows.forall(_._2 == 2L))
    val ranks = rows.map(_._3)
    // all four identical by symmetry, each ~0.25
    assert(ranks.distinct.length == 1)
    assert(math.abs(ranks.head - 0.25) < 1e-9)
    val mass = ranks.sum
    assert(mass <= 1.0 + 1e-12 && mass > 1.0 - 1e-9, s"mass=$mass")
  }

  test("hub outranks leaves on a symmetrized star") {
    val e = Graph.symmetrize(
      Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)).toDF("src", "dst"))
    val byNode = Graph.pageRank(e, iters = 10).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val leaves = (1L to 4L).map(byNode)
    assert(leaves.distinct.length == 1) // symmetry among leaves
    assert(byNode(0L) > leaves.head * 2,
      s"hub ${byNode(0L)} should dominate leaf ${leaves.head}")
  }

  test("fixed-point iteration is bit-identical across partitionings") {
    val edges = (0 until 400).map { i =>
      (i.toLong % 37, (i.toLong * 7 + 3) % 37)
    }
    val a = Graph.pageRank(Graph.symmetrize(edges.toDF("src", "dst").repartition(1)), 5)
      .orderBy("node").collect().toSeq
    val b = Graph.pageRank(Graph.symmetrize(edges.toDF("src", "dst").repartition(13)), 5)
      .orderBy("node").collect().toSeq
    assert(a == b)
  }

  test("pageRank frees its edge and degree caches on return") {
    // Under the local-mode barrier (localCheckpoint) the RESULT's own
    // materialized block legitimately stays persisted while the caller
    // holds the frame (freed on GC, the cleanCheckpoints contract);
    // intermediates (edges, degrees, superseded rounds) must not leak.
    // Bound: the result's one block — not the per-call pile the q53 leak
    // produced.
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val e = Graph.symmetrize(
      (0 until 100).map(i => (i.toLong % 11, (i.toLong * 3 + 1) % 11)).toDF("src", "dst"))
    val out = Graph.pageRank(e, 3)
    assert(out.count() == 11)
    // the cleaner is GC-driven and async: poke it before judging
    def leakedNow = spark.sparkContext.getPersistentRDDs.keySet -- before
    val deadline = System.currentTimeMillis + 15000
    while (leakedNow.size > 1 && System.currentTimeMillis < deadline) {
      System.gc(); Thread.sleep(200)
    }
    assert(leakedNow.size <= 1,
      s"leaked persisted RDDs beyond the result's own block: $leakedNow")
  }

  test("personalized walk: trust concentrates near the seed, far nodes get none") {
    // path graph 1-2-3-...-8 (symmetrized), seed at node 1: rank must
    // decay with distance, and nodes beyond the walk horizon (5 rounds)
    // hold exactly zero mass — the fixed-point arithmetic has no leakage
    val e = Graph.symmetrize(
      (1L until 8L).map(i => (i, i + 1)).toDF("src", "dst"))
    val seeds = Seq(Tuple1(1L)).toDF("node")
    val byNode = Graph.personalizedPageRank(e, seeds, iters = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // decay holds within a parity class (the walk ping-pongs on a path, so
    // adjacent distances are not comparable at small iteration counts)
    assert(byNode(2L) > byNode(4L) && byNode(4L) > byNode(6L),
      s"even-distance trust must decay: $byNode")
    assert(byNode(1L) > byNode(3L) && byNode(3L) > byNode(5L),
      s"odd-distance trust must decay: $byNode")
    // the seed's neighborhood holds the bulk of the mass
    assert(byNode(1L) + byNode(2L) > 0.5, s"mass must concentrate: $byNode")
    // 5 rounds reach at most distance 5 from the seed
    assert(byNode(7L) == 0.0 && byNode(8L) == 0.0, s"beyond horizon: $byNode")
    // global walk on the same graph gives the far end mass — different op
    val global = Graph.pageRank(e, iters = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(global(8L) > 0.0)
  }

  test("personalized walk: seeds absent from the graph are ignored, all-absent rejected") {
    val e = Graph.symmetrize(Seq((1L, 2L)).toDF("src", "dst"))
    val mixed = Seq(Tuple1(1L), Tuple1(99L)).toDF("node") // 99 not in graph
    val ranks = Graph.personalizedPageRank(e, mixed, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(ranks.keySet == Set(1L, 2L) && ranks(1L) > 0)
    intercept[IllegalArgumentException] {
      Graph.personalizedPageRank(e, Seq(Tuple1(99L)).toDF("node"), 3)
    }
  }

  test("triangles: K4, pendant edges, duplicates, and triangle-free graphs") {
    // K4: every node sits in C(3,2) = 3 triangles
    val k4 = (for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b))
      .toDF("src", "dst")
    val g1 = Graph.trianglesPerNode(k4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(g1 == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // one triangle + a pendant: pendant node reports nothing; duplicate,
    // reversed, and self-loop edges are canonicalized away
    val messy = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (1L, 1L),
      (3L, 4L), (2L, 3L)).toDF("src", "dst")
    val g2 = Graph.trianglesPerNode(messy).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(g2 == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    // star: wedges everywhere, triangles nowhere
    val star = (2L to 9L).map(i => (1L, i)).toDF("src", "dst")
    assert(Graph.trianglesPerNode(star).count() == 0)
  }

  test("directed graph: source-only nodes keep teleporting instead of vanishing") {
    // node 3 has out-edges but ZERO in-edges (it appears as a src only).
    // The dangling-free contract (every dst appears as a src) is satisfied:
    // dst set = {1,2}, both are srcs. A source-only node gathers nothing,
    // so after round 1 its rank must be exactly the teleport share
    // (1-d)/N — not a silently dropped row.
    val e = Seq((3L, 1L), (1L, 2L), (2L, 1L)).toDF("src", "dst")
    val rows = Graph.pageRank(e, iters = 5, damping = 0.85).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(rows.keySet == Set(1L, 2L, 3L), s"node 3 must survive: $rows")
    assert(math.abs(rows(3L) - 0.05) < 1e-9, s"teleport-only rank: ${rows(3L)}")
    // and it still feeds node 1 every round, so total mass stays ~1
    val mass = rows.values.sum
    assert(mass <= 1.0 + 1e-12 && mass > 1.0 - 1e-9, s"mass=$mass")
    assert(rows(1L) > rows(2L), "node 1 has two in-edges, node 2 one")
  }

  test("damping outside (0,1) hundredths is rejected") {
    val e = Seq((1L, 2L)).toDF("src", "dst")
    intercept[IllegalArgumentException](Graph.pageRank(e, 1, damping = 1.0))
    intercept[IllegalArgumentException](Graph.pageRank(e, 1, damping = 0.0))
  }

  /** Advance one round at a time until the integer rank trajectory enters
    * its terminal cycle, and return that cycle as a SET of vectors. The
    * quantized map is deterministic on a finite set, so every trajectory
    * ends in a cycle; a true fixed point is the period-1 case (the star
    * fixture), while bipartite-ish graphs (the chain) settle into a
    * period-2 ping-pong a few 1e-15 units wide. Two trajectories agree
    * when they land on the SAME terminal cycle, whatever the phase. */
  private def terminalCycle(st0: Graph.RankState,
      maxRounds: Int = 300): Set[Seq[(Long, Long)]] = {
    var st = st0
    var history = Vector(ruVector(st))
    var i = 0
    while (i < maxRounds) {
      st = Graph.rankRounds(st, 1)
      val cur = ruVector(st)
      val idx = history.lastIndexOf(cur)
      if (idx >= 0) return history.drop(idx).toSet
      history = (history :+ cur).takeRight(4) // detect periods up to 4
      i += 1
    }
    fail(s"no terminal cycle of period <= 4 within $maxRounds rounds")
  }

  private def ruVector(st: Graph.RankState): Seq[(Long, Long)] =
    st.ranks.select("node", "ru").as[(Long, Long)].collect().sortBy(_._1).toSeq

  test("incremental: warm-start insert reaches the cold-start fixpoint (chain)") {
    // The chain's quantized map has MULTIPLE terminal cycles a few 1e-15
    // units apart (warm lands on a period-1 point, cold on a period-2
    // ping-pong — measured: max gap 5 units). Contraction shrinks any two
    // trajectories to within the floor-quantization noise, bounded by
    // edges·d/(1-d) units, and no further — so the pinned contract is
    // agreement within that bound (1e-13 here, vs ranks of ~1e-1), with
    // EXACT equality asserted on the star fixture where a unique fixed
    // point exists.
    val full = Graph.symmetrize((1L until 8L).map(i => (i, i + 1)).toDF("src", "dst"))
    val prefix = Graph.symmetrize((1L until 5L).map(i => (i, i + 1)).toDF("src", "dst"))
    val batch = Graph.symmetrize((5L until 8L).map(i => (i, i + 1)).toDF("src", "dst"))
    val cold = terminalCycle(Graph.rankInit(full))
    val warm0 = Graph.rankRounds(Graph.rankInit(prefix), 5)
    val warm = terminalCycle(Graph.rankInsert(warm0, batch, rounds = 2))
    val bound = 100L // 14 directed edges * 0.85/0.15 ≈ 79 units, rounded up
    for (w <- warm; c <- cold) {
      assert(w.map(_._1) == c.map(_._1), "same node set")
      val gap = w.map(_._2).zip(c.map(_._2)).map { case (a, b) => math.abs(a - b) }.max
      assert(gap <= bound,
        s"warm and cold terminal states must agree within quantization noise, gap=$gap")
    }
  }

  test("incremental: warm-start insert reaches the cold-start fixpoint (star)") {
    val full = Graph.symmetrize((1L to 8L).map(i => (0L, i)).toDF("src", "dst"))
    val prefix = Graph.symmetrize((1L to 6L).map(i => (0L, i)).toDF("src", "dst"))
    val batch = Graph.symmetrize(Seq((0L, 7L), (0L, 8L)).toDF("src", "dst"))
    val cold = terminalCycle(Graph.rankInit(full))
    val warm = terminalCycle(Graph.rankInsert(
      Graph.rankRounds(Graph.rankInit(prefix), 5), batch, rounds = 2))
    assert(warm == cold)
  }

  test("incremental: duplicate batch edges are ignored, state unchanged at 0 rounds") {
    val e = Graph.symmetrize(Seq((1L, 2L), (2L, 3L)).toDF("src", "dst"))
    val st = Graph.rankRounds(Graph.rankInit(e), 3)
    val before = st.ranks.select("node", "deg", "tele", "ru")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    // the whole batch is already present: the delta is empty, degrees and
    // the warm rank vector must come back verbatim
    val st2 = Graph.rankInsert(st, e, rounds = 0)
    val after = st2.ranks.select("node", "deg", "tele", "ru")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(after == before)
    assert(st2.edges.count() == st.edges.count())
  }

  test("incremental: edge batches fold through a streaming pipeline (foreachBatch)") {
    // the daemon shape end to end: micro-batches of edges arrive on a
    // stream, each folds into the checkpointed rank state via rankInsert
    // (2 warm rounds) — the streaming-sketch pattern applied to rank. The
    // streamed state must settle on the full graph's terminal cycle within
    // the same quantization-noise contract as the two-phase test.
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long)]
    var st: Option[Graph.RankState] = None
    val q = source.toDF().toDF("src", "dst").writeStream.foreachBatch {
      (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val sym = Graph.symmetrize(batch)
        st = Some(st.fold(Graph.rankRounds(Graph.rankInit(sym), 5))(
          Graph.rankInsert(_, sym, rounds = 2)))
        ()
    }.start()
    val batches = Seq(
      (1L until 5L).map(i => (i, i + 1)),
      (4L until 8L).map(i => (i, i + 1)), // overlaps the first batch's tail
      Seq((0L, 1L), (0L, 8L)))            // closes the ring through node 0
    batches.foreach { b => source.addData(b: _*); q.processAllAvailable() }
    q.stop()
    val full = Graph.symmetrize(batches.flatten.toDF("src", "dst"))
    val cold = terminalCycle(Graph.rankInit(full))
    val warm = terminalCycle(st.get)
    val bound = 150L // 18 directed edges * 0.85/0.15 ≈ 102 units, rounded up
    for (w <- warm; c <- cold) {
      assert(w.map(_._1) == c.map(_._1), "same node set")
      val gap = w.map(_._2).zip(c.map(_._2)).map { case (a, b) => math.abs(a - b) }.max
      assert(gap <= bound, s"streamed and cold terminal states must agree, gap=$gap")
    }
  }

  test("lp incremental: community state folds through a streaming pipeline") {
    // the daemon shape for communities: clique edges arrive over three
    // micro-batches, each folds via lpInsert (2 warm rounds); the settled
    // labels must equal a cold run on the union
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long)]
    var st: Option[Graph.LabelState] = None
    val q = source.toDF().toDF("src", "dst").writeStream.foreachBatch {
      (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val sym = Graph.symmetrize(batch)
        st = Some(st.fold(Graph.lpRounds(Graph.lpInit(sym), 4))(
          Graph.lpInsert(_, sym, rounds = 2)))
        ()
    }.start()
    def clique(ids: Seq[Long]) = for (a <- ids; b <- ids if a < b) yield (a, b)
    val batches = Seq(
      clique(Seq(1L, 2L, 3L, 4L)),
      clique(Seq(10L, 11L, 12L, 13L)),
      Seq((13L, 20L), (20L, 21L))) // a pendant chain joins clique 2
    batches.foreach { b => source.addData(b: _*); q.processAllAvailable() }
    q.stop()
    val warm = st.get.labels.as[(Long, Long)].collect().toMap
    val cold = Graph.labelPropagation(
      Graph.symmetrize(batches.flatten.toDF("src", "dst")), 8)
      .as[(Long, Long)].collect().toMap
    assert(warm == cold, s"warm $warm vs cold $cold")
    assert((1L to 4L).map(warm).toSet == Set(1L))
  }

  test("incremental: new nodes on a personalized walk join with teleport 0") {
    val e = Graph.symmetrize(Seq((1L, 2L)).toDF("src", "dst"))
    val st = Graph.rankRounds(
      Graph.rankInit(e, seeds = Some(Seq(Tuple1(1L)).toDF("node"))), 3)
    val st2 = Graph.rankInsert(st, Graph.symmetrize(Seq((2L, 3L)).toDF("src", "dst")),
      rounds = 3)
    val tele = st2.ranks.select("node", "tele").as[(Long, Long)].collect().toMap
    assert(tele == Map(1L -> 1L, 2L -> 0L, 3L -> 0L))
    // trust still flows to the new node through the graph
    val rank3 = Graph.rankResult(st2).filter(col("node") === 3L)
      .select("rank").as[Double].head()
    assert(rank3 > 0.0)
  }

  test("label propagation: two cliques joined by a bridge split into two communities") {
    // K4 on 1-4 and K4 on 5-8, one bridge edge 4-5
    def clique(ids: Seq[Long]) = for (a <- ids; b <- ids if a < b) yield (a, b)
    val e = Graph.symmetrize(
      (clique(Seq(1L, 2L, 3L, 4L)) ++ clique(Seq(5L, 6L, 7L, 8L)) :+ (4L, 5L))
        .toDF("src", "dst"))
    val got = Graph.labelPropagation(e, 5).as[(Long, Long)].collect().toMap
    assert(got.keySet == (1L to 8L).toSet)
    // each clique converges to one label; the bridge does not merge them
    val c1 = (1L to 4L).map(got).toSet
    val c2 = (5L to 8L).map(got).toSet
    assert(c1.size == 1 && c2.size == 1 && c1 != c2, got.toString)
  }

  test("label propagation: smallest-label tie-break is deterministic across partitionings") {
    val e = Graph.symmetrize(Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), // 4-cycle: all ties
      (5L, 6L)).toDF("src", "dst"))
    val a = Graph.labelPropagation(e.repartition(1), 3)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    val b = Graph.labelPropagation(e.repartition(9), 3)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(a == b)
    // on the isolated pair each node sees only the other: labels swap each
    // round, so after an odd round count both carry the OTHER's id — pinned
    // here as the documented synchronous-update behavior
    val pair = a.filter(t => t._1 >= 5L)
    assert(pair == Seq((5L, 6L), (6L, 5L)))
  }

  test("label propagation: rounds=0 returns the identity labeling") {
    val e = Graph.symmetrize(Seq((1L, 2L), (2L, 3L)).toDF("src", "dst"))
    val got = Graph.labelPropagation(e, 0).as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("lp incremental: warm insert reaches the cold fixpoint on cliques + bridge") {
    def clique(ids: Seq[Long]) = for (a <- ids; b <- ids if a < b) yield (a, b)
    val base = Graph.symmetrize(
      (clique(Seq(1L, 2L, 3L, 4L, 5L)) ++ clique(Seq(10L, 11L, 12L, 13L, 14L)))
        .toDF("src", "dst"))
    // settle both communities cold, then fold in a bridge plus a new
    // pendant node attached to the second clique
    val warm0 = Graph.lpRounds(Graph.lpInit(base), 5)
    val batch = Graph.symmetrize(Seq((5L, 10L), (14L, 20L)).toDF("src", "dst"))
    val warm = Graph.lpInsert(warm0, batch, rounds = 3)
    val warmMap = warm.labels.as[(Long, Long)].collect().toMap
    // cold run on the merged graph to its own fixpoint
    val merged = Graph.symmetrize(base.union(batch))
    val coldMap = Graph.labelPropagation(merged, 8).as[(Long, Long)]
      .collect().toMap
    assert(warmMap == coldMap, s"warm $warmMap vs cold $coldMap")
    // and the communities are the expected ones: each clique keeps its min
    // label, the bridge does not merge them, the new node joins clique 2
    assert((1L to 5L).map(warmMap).toSet == Set(1L))
    assert(((10L to 14L) :+ 20L).map(warmMap).toSet == Set(10L))
  }

  test("lp incremental: re-inserting existing edges with 0 rounds is identity") {
    val e = Graph.symmetrize(Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst"))
    val st = Graph.lpRounds(Graph.lpInit(e), 4)
    val before = st.labels.orderBy("node").as[(Long, Long)].collect().toSeq
    val st2 = Graph.lpInsert(st, e, rounds = 0)
    val after = st2.labels.orderBy("node").as[(Long, Long)].collect().toSeq
    assert(before == after)
    assert(st2.edges.count() == st.edges.count())
  }

  test("lp incremental: invariant under input partitioning") {
    val rows = (1 to 120).map(i => (i.toLong % 30, (i.toLong * 7) % 30))
      .filter(t => t._1 != t._2)
    def run(p: Int) = {
      val e = Graph.symmetrize(rows.toDF("src", "dst").repartition(p))
      val st = Graph.lpInsert(Graph.lpRounds(Graph.lpInit(e), 2),
        Graph.symmetrize(Seq((100L, 0L)).toDF("src", "dst")), rounds = 2)
      st.labels.orderBy("node").as[(Long, Long)].collect().toSeq
    }
    assert(run(1) == run(9))
  }

  test("label propagation: parallel edges weight their endpoint's vote") {
    // node 3 sees 1 once and 2 twice (parallel edges kept as rows) -> 2 wins
    // despite the smaller-label tie-break preferring 1 on equal counts
    val e = Seq((1L, 3L), (2L, 3L), (2L, 3L),
      (3L, 1L), (3L, 2L)).toDF("src", "dst")
    val got = Graph.labelPropagation(e, 1).as[(Long, Long)].collect().toMap
    assert(got(3L) == 2L, got.toString)
  }

  // K4 on {1,2,3,4} with a pendant chain 4-5-6; duplicates, a reversed
  // duplicate, and a self-loop exercise canonicalization
  private def coreEdges = Seq(
    (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
    (4L, 5L), (5L, 4L), (5L, 6L), (5L, 6L), (6L, 6L)
  ).toDF("src", "dst")

  test("kCore peels the pendant chain, keeps the K4 at k=3") {
    val got = Graph.kCore(coreEdges, k = 3, rounds = 3)
      .as[(Long, Long)].collect().toMap
    // round 1 drops 6 (deg 1) and 5 (deg 2); K4 is 3-regular and stable
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("kCore cascade: removing the fringe can strand a former k-node") {
    // chain 1-2-3-4-5 with k=2: endpoints peel, then the new endpoints
    // peel in LATER rounds — the iterative part of the definition
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    assert(Graph.kCore(chain, k = 2, rounds = 4).collect().isEmpty)
    // one round only drops the original endpoints; 2..4 still present
    val oneRound = Graph.kCore(chain, k = 2, rounds = 1)
      .as[(Long, Long)].collect().toMap
    assert(oneRound.keySet == Set(2L, 3L, 4L))
  }

  test("kCore converges: rounds and rounds+1 agree once stable") {
    val a = Graph.kCore(coreEdges, k = 3, rounds = 2).collect().toSeq.sortBy(_.getLong(0))
    val b = Graph.kCore(coreEdges, k = 3, rounds = 3).collect().toSeq.sortBy(_.getLong(0))
    assert(a == b)
  }

  test("kCore above the max core is empty") {
    assert(Graph.kCore(coreEdges, k = 4, rounds = 3).collect().isEmpty)
  }

  /** Brute-force SCC labeling (Floyd–Warshall mutual reachability): the
    * ground truth the distributed peeling must match exactly. */
  private def bruteScc(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val idx = nodes.zipWithIndex.toMap
    val n = nodes.length
    val reach = Array.fill(n, n)(false)
    nodes.indices.foreach(i => reach(i)(i) = true)
    edges.foreach { case (a, b) => reach(idx(a))(idx(b)) = true }
    for (k <- 0 until n; i <- 0 until n; j <- 0 until n)
      if (reach(i)(k) && reach(k)(j)) reach(i)(j) = true
    nodes.map { v =>
      val i = idx(v)
      v -> nodes.indices.filter(j => reach(i)(j) && reach(j)(i))
        .map(nodes).min
    }.toMap
  }

  private def runScc(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Graph.stronglyConnectedComponents(edges.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap

  test("scc: two cycles joined by a one-way bridge stay separate SCCs") {
    // 1->2->3->1 and 10->11->10, bridged 3->10: the bridge is not part of
    // any cycle, so exactly two non-trivial SCCs
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (10L, 11L), (11L, 10L), (3L, 10L))
    val got = runScc(e)
    assert(got == bruteScc(e))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("scc: a pure chain is all singletons (the peeling worst case)") {
    val e = Seq((5L, 4L), (4L, 3L), (3L, 2L), (2L, 1L))
    val got = runScc(e)
    assert(got == Map(1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L, 5L -> 5L))
  }

  test("scc: cycle ids interleaved so min-labels cross SCC boundaries") {
    // SCC {1,4} and SCC {2,3} with DAG edges between them: forward min
    // labels from {2,3} reach 1's component and must not merge them
    val e = Seq((1L, 4L), (4L, 1L), (2L, 3L), (3L, 2L), (4L, 2L))
    val got = runScc(e)
    assert(got == bruteScc(e))
    assert(got == Map(1L -> 1L, 4L -> 1L, 2L -> 2L, 3L -> 2L))
  }

  test("scc: self-loops and duplicate edges are singletons / ignored") {
    val e = Seq((7L, 7L), (1L, 2L), (1L, 2L), (2L, 1L), (2L, 1L))
    val got = runScc(e)
    assert(got == Map(7L -> 7L, 1L -> 1L, 2L -> 1L))
  }

  test("scc: randomized graphs match brute force") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 3) {
      val n = 12 + trial * 4
      val e = (0 until n * 2).map(_ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(p => p._1 != p._2).distinct
      assert(runScc(e) == bruteScc(e), s"trial $trial edges=$e")
    }
  }

  test("scc: result matches under different input partitionings") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L), (5L, 4L),
      (5L, 6L))
    val df = e.toDF("src", "dst")
    val a = Graph.stronglyConnectedComponents(df.repartition(1))
      .as[(Long, Long)].collect().toMap
    val b = Graph.stronglyConnectedComponents(df.repartition(7))
      .as[(Long, Long)].collect().toMap
    assert(a == b)
    assert(a == bruteScc(e))
  }

  /** Brute BFS on the driver: min directed hop count from any source. */
  private def bruteHops(edges: Seq[(Long, Long)], sources: Set[Long],
      maxHops: Int): Map[Long, Long] = {
    val adj = edges.distinct.groupBy(_._1).map { case (s, es) => s -> es.map(_._2) }
    var dist = sources.map(_ -> 0L).toMap
    var frontier = sources
    var k = 0L
    while (frontier.nonEmpty && k < maxHops) {
      k += 1
      val next = frontier.flatMap(n => adj.getOrElse(n, Nil))
        .filterNot(dist.contains)
      next.foreach(n => dist += n -> k)
      frontier = next
    }
    dist
  }

  test("shortestHops matches brute BFS, stops at the cap, keeps off-graph sources") {
    // diamond + tail + an unreachable island; source 9 has no edges at all
    val e = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L), (4L, 5L), (5L, 6L),
      (7L, 8L)).toDF("src", "dst")
    val got = Graph.shortestHops(e, Seq(1L, 9L).toDF("node"), maxHops = 2)
      .as[(Long, Long)].collect().toMap
    assert(got == bruteHops(Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L), (7L, 8L)), Set(1L, 9L), 2))
    assert(got(9L) == 0L)        // off-graph source still labeled
    assert(!got.contains(5L))    // dist 3 > cap
    assert(!got.contains(7L))    // unreachable island absent
  }

  test("shortestHops settles each node at its MINIMUM distance across paths") {
    // two routes to 4: 1->4 (1 hop) and 1->2->3->4 (3 hops); BFS must keep 1
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("src", "dst")
    val got = Graph.shortestHops(e, Seq(1L).toDF("node"), maxHops = 8)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 1L))
  }

  test("shortestHops is invariant under input partitioning") {
    val e = (0 until 300).map(i => (i.toLong % 29, (i.toLong * 5 + 2) % 29))
    val src = Seq(0L, 1L)
    val a = Graph.shortestHops(e.toDF("src", "dst").repartition(1),
      src.toDF("node"), 6).as[(Long, Long)].collect().toMap
    val b = Graph.shortestHops(e.toDF("src", "dst").repartition(11),
      src.toDF("node"), 6).as[(Long, Long)].collect().toMap
    assert(a == b)
    assert(a == bruteHops(e, src.toSet, 6))
  }

  /** Brute HITS on the driver: k unnormalized integer rounds. */
  private def bruteHits(edges: Seq[(Long, Long)], iters: Int): Map[Long, (Long, Long)] = {
    val e = edges.distinct
    val nodes = e.flatMap(p => Seq(p._1, p._2)).distinct
    var hub = nodes.map(_ -> 1L).toMap
    var auth = nodes.map(_ -> 0L).toMap
    for (_ <- 1 to iters) {
      auth = nodes.map(n => n -> e.filter(_._2 == n).map(p => hub(p._1)).sum).toMap
      hub = nodes.map(n => n -> e.filter(_._1 == n).map(p => auth(p._2)).sum).toMap
    }
    nodes.map(n => n -> (hub(n), auth(n))).toMap
  }

  test("hits matches brute unnormalized iteration; pure source/sink get zeros") {
    // 1,2 -> 3 ; 3 -> 4 ; duplicates must not double-count
    val e = Seq((1L, 3L), (2L, 3L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val got = Graph.hits(e, iters = 2).as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == bruteHits(Seq((1L, 3L), (2L, 3L), (3L, 4L)), 2))
    assert(got(1L)._2 == 0L) // pure source: zero authority
    assert(got(4L)._1 == 0L) // pure sink: zero hub
  }

  test("linkPrediction: path, square, clique, and the apex-degree cap") {
    // path 1-2-3: only wedge is (1,3) through apex 2 (deg 2)
    val path = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val p = Graph.linkPrediction(path).as[(Long, Long, Long, Double, Double)]
      .collect()
    assert(p.toSeq == Seq((1L, 3L, 1L, 1.442695, 1.0))) // round(1/ln 2, 6)
    // square 1-2-3-4-1: each missing diagonal has TWO shared neighbors
    val sq = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
    val q = Graph.linkPrediction(sq).as[(Long, Long, Long, Double, Double)]
      .collect().sortBy(r => (r._1, r._2))
    assert(q.toSeq == Seq((1L, 3L, 2L, 2.88539, 1.0),
      (2L, 4L, 2L, 2.88539, 1.0)))
    // triangle: every wedge pair is already an edge -> empty queue
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst")
    assert(Graph.linkPrediction(tri).isEmpty)
    // star center deg 4 > cap 3: the only apex is dropped -> empty
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)).toDF("src", "dst")
    assert(Graph.linkPrediction(star, maxApexDegree = 3).isEmpty)
    assert(Graph.linkPrediction(star, maxApexDegree = 64).count() == 6L)
  }

  test("clusteringCoefficient: clique 1.0, chain 0.0, pendant dilutes") {
    // K4: every node deg 3 with 3 triangles -> coeff 1
    val k4 = (for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j))
      .toDF("src", "dst")
    val c4 = Graph.clusteringCoefficient(k4).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(c4.values.forall(_ == 1.0) && c4.size == 4)
    // path 1-2-3: middle node deg 2, no triangle -> 0; deg-1 ends excluded
    val path = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val cp = Graph.clusteringCoefficient(path).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(3)))).toMap
    assert(cp == Map(2L -> ((2L, 0.0))))
    // triangle + pendant on node 1: deg 3, 1 triangle -> 2/(3*2)
    val tp = Seq((1L, 2L), (2L, 3L), (1L, 3L), (1L, 4L)).toDF("src", "dst")
    val ct = Graph.clusteringCoefficient(tp).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(ct(1L) == 0.333333 && ct(2L) == 1.0 && ct(3L) == 1.0)
  }

  test("linkPrediction is invariant under input partitioning") {
    val e = (0 until 400).map(i => (i.toLong % 29, (i.toLong * 11 + 3) % 29))
      .toDF("src", "dst")
    def run(p: Int) = Graph.linkPrediction(e.repartition(p))
      .orderBy("u", "v").collect().toSeq
    assert(run(1) == run(13))
  }

  test("hits is invariant under input partitioning") {
    val e = (0 until 300).map(i => (i.toLong % 23, (i.toLong * 7 + 1) % 23))
    val a = Graph.hits(e.toDF("src", "dst").repartition(1), 2)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val b = Graph.hits(e.toDF("src", "dst").repartition(9), 2)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(a == b)
    assert(a == bruteHits(e, 2))
  }
}
