package graft.queries

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Duplicate-cluster connected components and deterministic sampling:
  * the distributed hash-min propagation must agree with an independent
  * in-test union-find on the same edges, converge on high-diameter
  * graphs, and keep all-pairs joins out of the plan; the sample must
  * match an independent JVM md5 recomputation of its membership.
  */
class TrainingOpsClusterSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  /** Plain array union-find with path compression (test-side reference). */
  private def unionFind(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def ccOf(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    TrainingOps.connectedComponents(pairs.toDF("doc_a", "doc_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("connectedComponents matches union-find on a mixed graph") {
    // two cliques bridged by one edge, an isolated pair, a star, a triangle
    val pairs = Seq[(Long, Long)](
      (1L, 2L), (2L, 3L), (1L, 3L), (3L, 10L), (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L),
      (30L, 31L), (30L, 32L), (30L, 33L), (30L, 34L),
      (40L, 41L), (41L, 42L), (40L, 42L))
    assert(ccOf(pairs) == unionFind(pairs))
  }

  test("connectedComponents converges on a high-diameter chain") {
    // a 24-node path: label 100 must walk the full diameter to reach the end
    val pairs = (100L until 123L).map(i => (i, i + 1))
    val got = ccOf(pairs)
    assert(got == (100L to 123L).map(_ -> 100L).toMap)
  }

  test("connectedComponents of an empty pair set is empty") {
    import spark.implicits._
    val empty = spark.emptyDataset[(Long, Long)].toDF("doc_a", "doc_b")
    assert(TrainingOps.connectedComponents(empty).collect().isEmpty)
  }

  test("dupClusters matches union-find over the LSH candidate pairs") {
    val cand = TrainingOps.minhashDupPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assume(cand.nonEmpty)
    val expected = unionFind(cand)
    val sizes = expected.groupBy(_._2).map { case (c, m) => c -> m.size.toLong }
    val got = TrainingOps.dupClusters(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got == expected.map { case (d, c) => d -> (c, sizes(c)) })
  }

  test("connectedComponents matches union-find on seeded random graphs") {
    val rnd = new scala.util.Random(20260816L)
    for (trial <- 1 to 10) {
      val n = 5 + rnd.nextInt(40)
      val ids = rnd.shuffle((0 until 3 * n).map(_.toLong).toList).take(n)
      val pairs = (1 to n).flatMap { _ =>
        val a = ids(rnd.nextInt(n)); val b = ids(rnd.nextInt(n))
        if (a == b) None else Some((math.min(a, b), math.max(a, b)))
      }.distinct
      if (pairs.nonEmpty)
        assert(ccOf(pairs) == unionFind(pairs), s"trial $trial: $pairs")
    }
  }

  test("sourceStats rollup totals are self-consistent") {
    val rows = TrainingOps.sourceStats(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getLong(3)))).toMap
    val leaves = rows.filter { case ((s, l), _) => s != "(all)" && l != "(all)" }
    val grand = rows(("(all)", "(all)"))
    assert(grand._1 == leaves.values.map(_._1).sum && grand._2 == leaves.values.map(_._2).sum)
    for ((src, perSrc) <- leaves.groupBy(_._1._1)) {
      val sub = rows((src, "(all)"))
      assert(sub._1 == perSrc.values.map(_._1).sum && sub._2 == perSrc.values.map(_._2).sum,
        s"subtotal mismatch for $src")
    }
  }

  test("cluster plans carry no all-pairs join") {
    val plan = TrainingOps.dupClusters(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), "BroadcastNestedLoopJoin in plan")
    assert(!plan.contains("CartesianProduct"), "CartesianProduct in plan")
  }

  test("stratifiedSample membership matches an independent md5 recomputation") {
    import spark.implicits._
    val rates = Map("de" -> 50L, "en" -> 20L, "es" -> 50L, "fr" -> 50L, "zh" -> 50L)
    val all = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "lang").as[(Long, String)].collect()
    def bucket(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"sample#$id".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.take(15), 16) % 100
    }
    val expected = all.collect {
      case (id, lang) if bucket(id) < rates.getOrElse(lang, 0L) => (id, lang, bucket(id))
    }.toSet
    val got = TrainingOps.stratifiedSample(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("keepList == unique docs plus cluster representatives") {
    import spark.implicits._
    val clusters = TrainingOps.dupClusters(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap // doc_id -> cluster_id
    val allDocs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id").as[Long].collect().sorted
    val expected = allDocs.flatMap { id =>
      clusters.get(id) match {
        case None => Some((id, "unique"))
        case Some(c) if c == id => Some((id, "rep"))
        case _ => None
      }
    }.toSeq
    val got = TrainingOps.keepList(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == expected)
    assert(expected.exists(_._2 == "rep") && expected.exists(_._2 == "unique"))
    assert(expected.length < allDocs.length, "some duplicates must drop")
  }

  test("kmeansAssign matches a local packed-argmin recompute (same fold order)") {
    import spark.implicits._
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("vec_id", "cast(embedding as array<double>)")
      .as[(Long, Array[Double])].collect()
    val cents = vecs.filter(_._1 < 8).sortBy(_._1)
    assert(cents.length == 8)
    val assigned = vecs.map { case (_, v) =>
      var pmin = Long.MaxValue
      for ((cid, cv) <- cents) {
        // the engine's zip_with + left-fold order: sequential over index
        var acc = 0.0
        var i = 0
        while (i < cv.length) { acc += (cv(i) - v(i)) * (cv(i) - v(i)); i += 1 }
        val pk = math.floor(acc * 1048576.0).toLong * 16L + cid
        if (pk < pmin) pmin = pk
      }
      (pmin % 16L, pmin / 16L)
    }
    val expected = assigned.groupBy(_._1).map { case (cid, qs) =>
      (cid, qs.length.toLong, qs.map(_._2).sum, qs.map(_._2).min, qs.map(_._2).max)
    }.toSeq.sortBy(_._1)
    val got = TrainingOps.kmeansAssign(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == expected)
    assert(expected.map(_._2).sum == vecs.length.toLong)
    assert(expected.length > 1, "assignment must spread across centroids")

    // M-step: per-(centroid, dim) integer sums over the same assignments
    val wantUpd = vecs.flatMap { case (_, v) =>
      var pmin = Long.MaxValue
      for ((cid, cv) <- cents) {
        var acc = 0.0
        var i = 0
        while (i < cv.length) { acc += (cv(i) - v(i)) * (cv(i) - v(i)); i += 1 }
        val pk = math.floor(acc * 1048576.0).toLong * 16L + cid
        if (pk < pmin) pmin = pk
      }
      v.indices.map(d => ((pmin % 16L, d.toLong), math.floor(v(d) * 1048576.0).toLong))
    }.groupBy(_._1).map { case ((cid, d), xs) =>
      (cid, d, xs.length.toLong, xs.map(_._2).sum)
    }.toSeq.sortBy(r => (r._1, r._2))
    val gotUpd = TrainingOps.kmeansUpdate(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(gotUpd == wantUpd)
    assert(gotUpd.length == expected.length * 64, "64 dims per assigned centroid")

    // scale contract: the k-row centroid side must BROADCAST (a
    // deliberate broadcast nested-loop over k rows, never a shuffled
    // cartesian of the embeddings)
    val plan = TrainingOps.kmeansAssign(spark, sf).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(600))
    assert(!plan.contains("CartesianProduct"), plan.take(600))
  }

  test("kmeansSilhouette == local sorted-packed-key recompute") {
    import spark.implicits._
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("vec_id", "cast(embedding as array<double>)")
      .as[(Long, Array[Double])].collect()
    val cents = vecs.filter(_._1 < 8).sortBy(_._1)
    val perVec = vecs.map { case (vid, v) =>
      val pks = cents.map { case (cid, cv) =>
        var acc = 0.0
        var i = 0
        while (i < cv.length) { acc += (cv(i) - v(i)) * (cv(i) - v(i)); i += 1 }
        math.floor(acc * 1048576.0).toLong * 16L + cid
      }.sorted
      val qa = pks(0) / 16L; val qb = pks(1) / 16L
      (vid, pks(0) % 16L, ((qb - qa) * 1000L) / math.max(math.max(qa, qb), 1L))
    }
    val want = perVec.groupBy(c => (c._2, c._3 / 100L)).map { case ((cid, d), cs) =>
      (cid, d, cs.length.toLong, cs.map(_._1).sum, cs.map(_._3).sum, cs.map(_._3).max)
    }.toSeq.sortBy(r => (r._1, r._2))
    val got = TrainingOps.kmeansSilhouette(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == want)
    // the 8 seed vectors ARE centroids: qa = 0, silq = 1000, decile 10 —
    // and real vectors must spread below it
    assert(want.exists(_._2 == 10L), "centroid self-rows must pin decile 10")
    assert(perVec.count(_._3 < 1000L) > vecs.length / 2,
      "most vectors must sit strictly between centroids")
    // same scale contract as kmeansAssign: broadcast, never cartesian
    val plan = TrainingOps.kmeansSilhouette(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin"), plan.take(600))
    assert(!plan.contains("CartesianProduct"), plan.take(600))
  }

  test("embDimStats == local per-dimension quantized moment recompute") {
    import spark.implicits._
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("vec_id", "embedding").as[(Long, Array[Float])].collect()
    val dims = vecs.head._2.length
    val want = (0 until dims).map { d =>
      val qs = vecs.map { case (_, v) => math.floor(v(d) * 1024.0).toLong }
      val n = qs.length.toLong
      val s1 = qs.sum; val s2 = qs.map(q => q * q).sum
      val varQ = ((BigInt(n) * s2 - BigInt(s1) * s1) / (BigInt(n) * n)).toLong
      (d.toLong, n, s1, s2, qs.min, qs.max, varQ)
    }
    val got = TrainingOps.embDimStats(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got == want)
    assert(want.size == 64)
    // the space must be nondegenerate: no dead dimension in the synthetic
    // corpus, and the variances must genuinely spread
    assert(want.forall(_._7 > 0L), "no dead dims expected here")
    assert(want.map(_._7).distinct.size > 1, "variances must spread")
  }

  test("embJlDistortion == local integer sign-projection recompute") {
    import spark.implicits._
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("vec_id", "embedding").as[(Long, Array[Float])].collect()
    def md5hex(s: String): String = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val perVec = vecs.map { case (vid, v) =>
      val q = v.map(x => math.floor(x * 1024.0).toLong)
      val nrm2 = q.map(x => x * x).sum
      val num = (0 until 8).map { j =>
        val p = q.indices.map { i =>
          if (md5hex(s"$j:$i").charAt(0) <= '7') q(i) else -q(i)
        }.sum
        p * p
      }.sum
      (vid, num * 1000L / math.max(8L * nrm2, 1L))
    }
    val want = perVec.groupBy(_._2 / 100L).toSeq.map { case (b, cs) =>
      (b, cs.length.toLong, cs.map(_._1).sum, cs.map(_._2).sum,
        cs.map(_._2).min, cs.map(_._2).max)
    }.sortBy(_._1)
    val got = TrainingOps.embJlDistortion(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == want)
    // 64 -> 8 dims: the ratio must center near 1000 and genuinely spread
    assert(perVec.exists(_._2 < 900L), "under-preserved vectors must exist")
    assert(perVec.exists(_._2 > 1100L), "over-preserved vectors must exist")
    assert(want.map(_._2).sum == vecs.length.toLong)
  }

  test("pagerank == local 3-round integer message passing over the LSH pairs") {
    val pairs = TrainingOps.minhashDupPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val edges = pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var pr: Map[Long, Long] = deg.map { case (n, _) => n -> 1000000L }
    for (_ <- 1 to 3) {
      val msum = edges.groupBy(_._2).view
        .mapValues(_.map { case (src, _) => pr(src) / deg(src) }.sum).toMap
      pr = deg.map { case (n, _) => n -> (150000L + 85L * msum.getOrElse(n, 0L) / 100L) }
    }
    val want = pr.map { case (n, p) => (n, deg(n), p) }.toSet
    val got = TrainingOps.pagerank(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
    assert(want.nonEmpty && want.exists(_._2 > 1L),
      "graph must have a node with several neighbors")
  }

  test("clusterMix == local union-find + source-count recompute") {
    import spark.implicits._
    val pairs = TrainingOps.minhashDupPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val roots = unionFind(pairs)
    val srcOf = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id", "source").as[(Long, String)].collect().toMap
    val expected = roots.toSeq.groupBy(_._2).toSeq.map { case (root, members) =>
      val srcs = members.map(m => srcOf(m._1)).groupBy(identity)
        .view.mapValues(_.size.toLong).toMap
      val n = members.size.toLong
      val same = srcs.values.map(c => c * (c - 1)).sum
      (root, n, srcs.size.toLong, same * 1000000L / (n * (n - 1)))
    }.sortBy(_._1)
    val got = TrainingOps.clusterMix(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
    // the statistic must separate: a single-source cluster (1e6) and a
    // genuinely mixed one
    assert(expected.exists(_._4 == 1000000L) && expected.exists(_._4 < 1000000L),
      "both pure and mixed clusters must exist")
  }

  test("triangles == local brute force over the LSH pairs") {
    val pairs = TrainingOps.minhashDupPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val eset = pairs.toSet
    val deg = pairs.flatMap { case (a, b) => Seq(a, b) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nodes = deg.keys.toSeq.sorted
    val tris = for {
      (a, b) <- pairs
      c <- nodes if c > b && eset((a, c)) && eset((b, c))
    } yield (a, b, c)
    val triCnt = tris.flatMap { case (a, b, c) => Seq(a, b, c) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val want = nodes.map { n =>
      val d = deg(n); val t = triCnt.getOrElse(n, 0L)
      (n, d, t, if (d < 2) 0L else 2L * t * 1000000L / (d * (d - 1)))
    }
    val got = TrainingOps.triangles(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want)
    // the LSH graph is (near-)unions of band cliques: assert both extremes
    // exist — a closed corner (cc = 1 exactly, so the fixed-point division
    // ran with t > 0) and a triangle-free node
    assert(want.exists(t => t._3 > 0L && t._4 == 1000000L),
      "LSH band cliques must close at least one triangle")
    assert(want.exists(_._3 == 0L), "a triangle-free node must exist")
  }

  test("kcore == local 3-round peeling recompute; census is non-increasing") {
    val pairs = TrainingOps.minhashDupPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    var edges = pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val want = (0 to 3).map { r =>
      val stat = (r.toLong, edges.map(_._1).distinct.size.toLong, edges.size.toLong / 2)
      if (r < 3) {
        val deg = edges.groupBy(_._1).view.mapValues(_.size).toMap
        val keep = deg.filter(_._2 >= 2).keySet
        edges = edges.filter(e => keep(e._1) && keep(e._2))
      }
      stat
    }
    val got = TrainingOps.kcore(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want)
    assert(want.head._3 > 0L, "the pair graph must be non-empty")
    assert(want.sliding(2).forall(s => s(0)._2 >= s(1)._2 && s(0)._3 >= s(1)._3),
      "peeling can only shrink the graph")
  }

  test("embSeparation == local centroid/within recompute") {
    import spark.implicits._
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("label", "embedding").as[(Int, Array[Float])].collect().toSeq
    val q = vecs.map { case (l, v) =>
      (l.toLong, v.map(x => math.floor(x.toDouble * 1024.0).toLong))
    }
    val byL = q.groupBy(_._1)
    val cents = byL.map { case (l, vs) =>
      val dims = vs.head._2.length
      l -> Array.tabulate(dims)(i => vs.map(_._2(i)).sum / vs.size)
    }
    val labels = cents.keys.toSeq.sorted
    val off = for (a <- labels; b <- labels if a < b) yield {
      val (ca, cb) = (cents(a), cents(b))
      (a, b, ca.indices.map(i => (ca(i) - cb(i)) * (ca(i) - cb(i))).sum)
    }
    val diag = labels.map { l =>
      val c = cents(l); val vs = byL(l)
      val ssw = vs.map(_._2).map(v => v.indices.map(i => (v(i) - c(i)) * (v(i) - c(i))).sum).sum
      (l, l, ssw / vs.size)
    }
    val want = (off ++ diag).sortBy(r => (r._1, r._2))
    val got = TrainingOps.embSeparation(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want)
    // structural: full upper triangle plus the diagonal, all non-negative
    val k = labels.size
    assert(got.size == k * (k - 1) / 2 + k)
    assert(got.forall(_._3 >= 0L) && diag.forall(_._3 > 0L))
  }

  test("pqAssign == local per-subspace packed-argmin recompute (same fold order)") {
    import spark.implicits._
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("vec_id", "cast(embedding as array<double>)")
      .as[(Long, Array[Double])].collect().toSeq.sortBy(_._1)
    val cents = vecs.filter(_._1 < 8)
    val assigns = for {
      (_, v) <- vecs
      m <- 0 until 4
    } yield {
      val pmin = cents.map { case (cid, cv) =>
        val d2 = (0 until 16).foldLeft(0.0) { (acc, i) =>
          val d = cv(m * 16 + i) - v(m * 16 + i); acc + d * d
        }
        math.floor(d2 * 1048576.0).toLong * 8L + cid
      }.min
      (m.toLong, pmin % 8L, pmin / 8L)
    }
    val want = assigns.groupBy(a => (a._1, a._2)).toSeq.map { case ((m, cid), xs) =>
      val qs = xs.map(_._3)
      (m, cid, qs.size.toLong, qs.sum, qs.min, qs.max)
    }.sortBy(r => (r._1, r._2))
    val got = TrainingOps.pqAssign(spark, sf).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got == want)
    // structural: every vector contributes once per subspace
    assert(want.groupBy(_._1).forall(_._2.map(_._3).sum == vecs.size.toLong))
  }

  test("dedupCensus == keepList join recompute; kept + dropped partition the corpus") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("doc_id", "source",
        "size(regexp_extract_all(lower(text), '[a-z0-9]+', 0))")
      .as[(Long, String, Int)].collect().toSeq
    val kept = TrainingOps.keepList(spark, sf).collect().map(_.getLong(0)).toSet
    val want = docs.groupBy(_._2).toSeq.map { case (src, ds) =>
      (src, ds.size.toLong, ds.count(d => kept(d._1)).toLong,
        ds.filter(d => kept(d._1)).map(_._3.toLong).sum,
        ds.filterNot(d => kept(d._1)).map(_._3.toLong).sum)
    }.sortBy(_._1)
    val got = TrainingOps.dedupCensus(spark, sf).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == want)
    assert(got.map(_._2).sum == docs.size.toLong)
    assert(got.exists(r => r._2 > r._3), "some source must drop a duplicate")
  }

  test("kmeansIterate == local Lloyd-round recompute (float E1, integer M + E2)") {
    import spark.implicits._
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("vec_id", "cast(embedding as array<double>)")
      .as[(Long, Array[Double])].collect().toSeq.sortBy(_._1)
    val cents = vecs.filter(_._1 < 8)
    // E1: the kmeansAssign float packed argmin (2^20, pack 16)
    val a1 = vecs.map { case (id, v) =>
      val pmin = cents.map { case (cid, cv) =>
        val d2 = v.indices.foldLeft(0.0) { (acc, i) =>
          val d = cv(i) - v(i); acc + d * d
        }
        math.floor(d2 * 1048576.0).toLong * 16L + cid
      }.min
      (id, pmin % 16L)
    }.toMap
    // M: per-(centroid, dim) integer mean at 2^10
    val qx = vecs.map { case (id, v) => id -> v.map(x => math.floor(x * 1024.0).toLong) }.toMap
    val dims = vecs.head._2.length
    val c2 = (0L until 8L).map { cid =>
      val members = vecs.filter(v => a1(v._1) == cid).map(v => qx(v._1))
      cid -> Array.tabulate(dims)(i => members.map(_(i)).sum / members.size)
    }.toMap
    // E2: all-integer packed argmin over the updated centroids
    val a2 = vecs.map { case (id, _) =>
      val pmin = c2.toSeq.map { case (cid, cq) =>
        val d2 = (0 until dims).map { i =>
          val d = qx(id)(i) - cq(i); d * d
        }.sum
        d2 * 8L + cid
      }.min
      (id, pmin % 8L, pmin / 8L)
    }
    val want = (0L until 8L).map { cid =>
      val nb = a1.values.count(_ == cid).toLong
      val movedOut = vecs.count(v => a1(v._1) == cid
        && a2.find(_._1 == v._1).get._2 != cid).toLong
      val into = a2.filter(_._2 == cid)
      (cid, nb, movedOut, into.size.toLong, into.map(_._3).sum)
    }.filter(r => r._2 > 0 || r._4 > 0)
    val got = TrainingOps.kmeansIterate(spark, sf).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == want)
    assert(want.map(_._2).sum == vecs.size.toLong
      && want.map(_._4).sum == vecs.size.toLong, "both assignments partition the corpus")
    assert(want.exists(_._3 > 0L), "one Lloyd round must move some vector on this data")
  }

  test("annPqRecall == brute ADC-vs-exact recompute; compression loses some recall") {
    import spark.implicits._
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("vec_id", "cast(embedding as array<double>)")
      .as[(Long, Array[Double])].collect().toSeq.sortBy(_._1)
    val cents = vecs.filter(_._1 < 8)
    def subQd(a: Array[Double], b: Array[Double], m: Int): Long =
      math.floor((0 until 16).foldLeft(0.0) { (acc, i) =>
        val d = a(m * 16 + i) - b(m * 16 + i); acc + d * d
      } * 1048576.0).toLong
    // per-(vector, subspace) code by packed argmin
    val centMap = cents.toMap
    val code = vecs.map { case (id, v) =>
      id -> (0 until 4).map(m =>
        cents.map { case (cid, cv) => subQd(cv, v, m) * 8L + cid }.min % 8L)
    }.toMap
    val queries = vecs.filter(_._1 < 10)
    def top10(scores: Seq[(Long, Long)]): Seq[Long] =
      scores.sortBy { case (d, id) => (d, id) }.take(10).map(_._2)
    val want = queries.map { case (qid, qv) =>
      val approx = top10(vecs.filter(_._1 != qid).map { case (id, _) =>
        ((0 until 4).map(m => subQd(qv, centMap(code(id)(m)), m)).sum, id)
      })
      val exact = top10(vecs.filter(_._1 != qid).map { case (id, v) =>
        (math.floor(v.indices.foldLeft(0.0) { (acc, i) =>
          val d = qv(i) - v(i); acc + d * d
        } * 1048576.0).toLong, id)
      })
      (qid, approx.toSet.intersect(exact.toSet).size.toLong * 10L)
    }
    val got = TrainingOps.annPqRecall(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == want)
    assert(want.forall(r => r._2 >= 0L && r._2 <= 100L))
    assert(want.exists(_._2 < 100L), "PQ at 4x16 must lose some recall on this data")
    assert(want.exists(_._2 > 0L), "PQ must retain some recall")
  }

  test("langConfusion == local marker-vote recompute; matrix totals the corpus") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .selectExpr("lang", "lower(text)").as[(String, String)].collect().toSeq
    val markers = Map(
      "en" -> Seq("the", "and", "of", "fast", "table"),
      "fr" -> Seq("le", "la", "et", "des", "une"),
      "de" -> Seq("der", "und", "die", "nicht", "ein"),
      "es" -> Seq("el", "y", "los", "una", "que"),
      "zh" -> Seq("de", "shi", "le", "zai", "he"))
    val want = docs.map { case (given, text) =>
      val toks = "[a-z0-9]+".r.findAllIn(text).toSeq
      // greatest(struct(score, lang)): max score, ties to the LARGEST lang
      val pred = markers.toSeq.map { case (l, ws) =>
        (ws.map(w => toks.count(_ == w)).sum, l)
      }.max._2
      (given, pred)
    }.groupBy(identity).toSeq.map { case ((g, p), xs) => (g, p, xs.size.toLong) }
      .sortBy(r => (r._1, r._2))
    val got = TrainingOps.langConfusion(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == want)
    assert(got.map(_._3).sum == docs.size.toLong, "matrix must total the corpus")
    assert(got.exists(r => r._1 != r._2), "some document must be misclassified")
  }

  test("embHamming == brute all-pairs popcount recompute (per-bit decomposition is exact)") {
    import spark.implicits._
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("label", "cast(embedding as array<double>)")
      .as[(Int, Array[Double])].collect().toSeq
    val planes = TrainingOps.HammingPlanes
    val coded = vecs.map { case (l, v) =>
      val code = planes.foldLeft(0L) { (acc, p) =>
        val dot = v.indices.foldLeft(0.0)((a, j) => a + p(j) * v(j))
        acc * 2 + (if (dot >= 0.0) 1 else 0)
      }
      (l.toLong, code)
    }
    val brute = (for {
      i <- coded.indices; j <- coded.indices if i < j
      (la, ca) = coded(i); (lb, cb) = coded(j)
    } yield ((math.min(la, lb), math.max(la, lb)),
      java.lang.Long.bitCount(ca ^ cb).toLong))
      .groupBy(_._1).toSeq.map { case ((a, b), hs) =>
        val n = hs.size.toLong; val s = hs.map(_._2).sum
        (a, b, n, s, s * 1000 / n)
      }.sortBy(r => (r._1, r._2))
    val got = TrainingOps.embHamming(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == brute)
    val k = coded.map(_._1).distinct.size
    assert(got.size == k * (k - 1) / 2 + k)
    assert(got.forall(r => r._5 >= 0L && r._5 <= 16000L))
    assert(got.exists(_._4 > 0L), "some pair must differ in at least one bit")
  }

  /** Queue BFS from the %5 seed set — the sequential reference for
    * bfsLevels. Returns level per node, -1 for unreached graph nodes.
    */
  private def bfsLocal(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val adj = (pairs ++ pairs.map(p => (p._2, p._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val nodes = adj.keySet
    val level = scala.collection.mutable.Map[Long, Long]()
    val q = scala.collection.mutable.Queue[Long]()
    nodes.filter(_ % 5 == 0).foreach { s => level(s) = 0L; q += s }
    while (q.nonEmpty) {
      val v = q.dequeue()
      adj(v).foreach { w =>
        if (!level.contains(w)) { level(w) = level(v) + 1; q += w }
      }
    }
    nodes.map(v => v -> level.getOrElse(v, -1L)).toMap
  }

  private def bfsCensus(pairs: Seq[(Long, Long)]): Seq[(Long, Long, Long)] = {
    import spark.implicits._
    TrainingOps.bfsLevels(pairs.toDF("doc_a", "doc_b").repartition(5))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
  }

  private def censusOf(lv: Map[Long, Long]): Seq[(Long, Long, Long)] =
    lv.toSeq.groupBy(_._2).map { case (l, vs) =>
      (l, vs.size.toLong, vs.map(_._1).sum)
    }.toSeq.sortBy(_._1)

  test("bfsLevels == queue BFS on seeded random graphs") {
    val rng = new scala.util.Random(117L)
    var sawDeep = false
    var sawUnreached = false
    for (trial <- 0 until 8) {
      val n = 20 + rng.nextInt(60)
      // sparse random graph: a mix of chains (depth) and random chords
      val ids = (1L to n.toLong).map(_ * (rng.nextInt(3) + 1))
      val pairs = (ids.sliding(2).collect {
        case Seq(a, b) if a != b && rng.nextDouble() < 0.7 =>
          (math.min(a, b), math.max(a, b))
      }.toSeq ++ Seq.fill(n / 4) {
        val a = ids(rng.nextInt(ids.size)); val b = ids(rng.nextInt(ids.size))
        (math.min(a, b), math.max(a, b))
      }.filter(p => p._1 != p._2)).distinct
      if (pairs.nonEmpty) {
        val want = censusOf(bfsLocal(pairs))
        assert(bfsCensus(pairs) == want, s"trial $trial")
        if (want.exists(_._1 >= 2L)) sawDeep = true
        if (want.exists(_._1 == -1L)) sawUnreached = true
      }
    }
    assert(sawDeep, "the trials must exercise a level >= 2")
    assert(sawUnreached, "the trials must exercise a seed-free component")
  }

  test("bfsLevels: a seed-free graph is entirely level -1") {
    val pairs = Seq[(Long, Long)]((1L, 2L), (2L, 3L), (7L, 8L))
    assert(bfsCensus(pairs) == Seq((-1L, 5L, 21L)))
  }

  test("bfsLevels: a chain from a single seed counts levels exactly") {
    // 5 -> 6 -> 7 -> 8 -> 9: seed 5 only (6..9 are not % 5 == 0)
    val pairs = Seq[(Long, Long)]((5L, 6L), (6L, 7L), (7L, 8L), (8L, 9L))
    assert(bfsCensus(pairs) == Seq((0L, 1L, 5L), (1L, 1L, 6L),
      (2L, 1L, 7L), (3L, 1L, 8L), (4L, 1L, 9L)))
  }
}
