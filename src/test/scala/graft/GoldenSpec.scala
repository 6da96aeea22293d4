package graft

/** Golden regression pin for the quickstart-parity pipeline
  * (FIXTURES.md §B: "golden CSV checked in as golden after first
  * verified run"). The pipeline is fully deterministic (hash-keyed
  * sampler, decimal-accumulated sums), so every value must match the
  * checked-in run bit for bit — across partitionings, Spark upgrades,
  * and refactors of the sampler / cone join / aggregate. */
class GoldenSpec extends SparkSpec {

  test("q33 quickstart pipeline matches the checked-in golden run exactly") {
    val golden = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/golden_q33_sf0001.csv"))
      .getLines().drop(1).map { line =>
        val Array(id, ra, dec, n, inv) = line.split(',')
        (id.toLong, ra.toDouble, dec.toDouble, n.toLong, inv.toDouble)
      }.toVector
    val got = graft.operators.CosmapDomain.quickstartRaw(spark, sf0001)
      .orderBy("sample_id").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getLong(3), r.getDouble(4))).toVector
    assert(got.length === golden.length)
    got.zip(golden).foreach { case (g, w) =>
      assert(g === w, s"sample ${w._1} diverged from golden")
    }
  }
}
