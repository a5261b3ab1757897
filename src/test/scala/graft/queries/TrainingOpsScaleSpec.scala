package graft.queries

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Scale-path guards for the dedup operators: the LSH-pruned / blocked
  * plans must (a) produce byte-identical output to the exact formulations
  * and (b) contain no all-pairs escape (BroadcastNestedLoopJoin /
  * CartesianProduct) that would not survive 100x data.
  */
class TrainingOpsScaleSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def assertNoAllPairs(df: org.apache.spark.sql.DataFrame, hint: String): Unit = {
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"$hint: BroadcastNestedLoopJoin in plan")
    assert(!plan.contains("CartesianProduct"), s"$hint: CartesianProduct in plan")
  }

  test("pruned jaccardPairs equals the exact full self-join") {
    val pruned = TrainingOps.jaccardPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val exact = TrainingOps.jaccardPairsExact(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pruned == exact, s"pruned ${pruned.size} vs exact ${exact.size}")
    assert(pruned.nonEmpty)
  }

  test("blocked embNearDup matches brute force") {
    import spark.implicits._
    val got = TrainingOps.embNearDup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("vec_id", "cast(embedding as array<double>) as v")
      .as[(Long, Array[Double])].collect()
    def norm(v: Array[Double]) = math.sqrt(v.map(x => x * x).sum)
    val brute = (for {
      (ia, va) <- e.iterator
      (ib, vb) <- e.iterator
      if ia < ib
      sim = va.zip(vb).map { case (x, y) => x * y }.sum / (norm(va) * norm(vb))
      if sim > 0.45
    } yield (ia, ib)).toSet
    assert(got == brute, s"got ${got.size} vs brute ${brute.size}")
    assert(got.nonEmpty)
  }

  test("prefix-filtered setsimPairs equals the unpruned exact join (lossless recall)") {
    val pruned = TrainingOps.setsimPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val exact = TrainingOps.jaccardPairsExact(spark, sf, thresh = 500).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(pruned == exact, s"pruned ${pruned.size} vs exact ${exact.size}")
    assert(pruned.nonEmpty)
    assert(pruned.forall(_._3 >= 500L))
  }

  test("lshRecall audit row == recompute from the exact and band pair sets") {
    val exact = TrainingOps.setsimPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val bands = TrainingOps.minhashDupPairs(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val found = exact.intersect(bands).size.toLong
    val want = (exact.size.toLong, found,
      found * 1000L / math.max(exact.size.toLong, 1L))
    val got = TrainingOps.lshRecall(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(want))
    assert(want._1 > 0L && want._3 > 0L && want._3 <= 1000L)
  }

  test("dedup plans carry no all-pairs join") {
    assertNoAllPairs(TrainingOps.embNearDup(spark, sf), "embNearDup")
    assertNoAllPairs(TrainingOps.setsimPairs(spark, sf), "setsimPairs")
    assertNoAllPairs(TrainingOps.jaccardPairs(spark, sf), "jaccardPairs")
    assertNoAllPairs(TrainingOps.minhashDupPairs(spark, sf), "minhashDupPairs")
    assertNoAllPairs(TrainingOps.minhashSignatures(spark, sf), "minhashSignatures")
  }

  test("embNearDup exact mode rejects over-ceiling inputs; approx mode engages") {
    // 500 vectors > a ceiling of 100 -> the exact O(n^2) path must refuse
    val ex = intercept[IllegalArgumentException] {
      TrainingOps.embNearDupMode(spark, sf, mode = "exact", maxExactVectors = 100)
    }
    assert(ex.getMessage.contains("approx"))
    // the approx path runs on the same input: LSH-candidate pairs scored
    // exactly -> a SUBSET of the exact pairs (recall < 1 by contract),
    // non-empty on this data, and still no all-pairs join in the plan
    val approx = TrainingOps.embNearDupMode(spark, sf, mode = "approx")
    assertNoAllPairs(approx, "embNearDup approx")
    val ap = approx.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = TrainingOps.embNearDup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ap.subsetOf(exact), s"approx produced non-pairs: ${ap.diff(exact)}")
    assert(ap.nonEmpty)
    intercept[IllegalArgumentException] {
      TrainingOps.embNearDupMode(spark, sf, mode = "bogus")
    }
  }

  test("annIvfTopK at a second (6-plane) configuration matches an independent reference") {
    import spark.implicits._
    val planes = TrainingOps.ivfPlanes(6)
    val probes = TrainingOps.hamming1Probes(6)
    val got = TrainingOps.annIvfTopKWith(spark, sf, planes, probes)
      .as[(Long, Long, Long)].collect().toSeq
    // independent reference: same left-fold arithmetic in plain Scala
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("vec_id", "cast(embedding as array<double>) as v")
      .as[(Long, Array[Double])].collect()
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
    def nrm(v: Array[Double]): Double =
      math.sqrt(v.foldLeft(0.0)((acc, x) => acc + x * x))
    def bucket(v: Array[Double]): Int =
      planes.foldLeft(0)((acc, p) => acc * 2 + (if (dot(p, v) >= 0.0) 1 else 0))
    val withB = e.map { case (id, v) => (id, v, nrm(v), bucket(v)) }
    val want = withB.filter(_._1 < 10).flatMap { case (qid, qv, qn, qb) =>
      val probeSet = probes.map(qb ^ _).toSet
      withB.filter(c => c._1 != qid && probeSet.contains(c._4))
        .map { case (id, v, n, _) => (qid, id, dot(qv, v) / (qn * n)) }
        .sortBy { case (_, id, sim) => (-sim, id) }
        .take(10).zipWithIndex
        .map { case ((q2, id, _), i) => (q2, (i + 1).toLong, id) }
    }.toSeq.sortBy(r => (r._1, r._2))
    assert(got == want)
    assert(got.nonEmpty && planes.length == 6 && probes.length == 7)
  }
}
