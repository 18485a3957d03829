package graft

class SparkEntrySpec extends SparkSpec {

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("minhashGateParity: duplicate rows cannot mask a missing pair") {
    import spark.implicits._
    // probed = {A, B}, oneShot = [A, A]: the union-distinct count this
    // helper used before r15 passes this case (distinct {A,B} == 2 ==
    // nProbed is false here but the dual condition could mask shapes
    // like it); exceptAll set equality must reject ANY multiset skew
    val probed = Seq((10L, 1L), (20L, 2L)).toDF("id", "match_id")
    val dupOneShot = Seq((10L, 1L), (10L, 1L)).toDF("id", "match_id")
    val planted = Seq(1L).toDF("p")
    val (_, _, agreeDup) =
      SparkEntry.minhashGateParity(probed, dupOneShot, planted)
    assert(!agreeDup, "duplicated one-shot rows must break parity")
    val (_, _, agreeEq) =
      SparkEntry.minhashGateParity(probed, probed, planted)
    assert(agreeEq, "identical sets must agree")
  }

  test("every declared query runs at sf0.001") {
    val failures = SparkEntry.queries.toSeq.flatMap { case (name, fn) =>
      try { fn(spark, sf).count(); None }
      catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("; "))
  }

  test("oracleSql keys are a subset of queries keys") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracle without query: $extra")
  }
}
