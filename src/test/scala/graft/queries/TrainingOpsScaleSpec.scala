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

  test("dedup plans carry no all-pairs join") {
    assertNoAllPairs(TrainingOps.embNearDup(spark, sf), "embNearDup")
    assertNoAllPairs(TrainingOps.jaccardPairs(spark, sf), "jaccardPairs")
    assertNoAllPairs(TrainingOps.minhashDupPairs(spark, sf), "minhashDupPairs")
    assertNoAllPairs(TrainingOps.minhashSignatures(spark, sf), "minhashSignatures")
  }
}
