package graft

import graft.operators.EditDistanceJoin
import org.apache.spark.sql.functions._

/** The unified fuzzy-join surface (round-3 verdict #6): one API, the
  * engine picks the blocking strategy by k. The spec proves the two
  * strategies agree EXACTLY across the crossover — on the same input,
  * PassJoin signatures and length-band blocking must produce the
  * identical verified pair set, since both are lossless candidate
  * generators over the same predicate. */
class EditDistanceJoinSpec extends SparkSpec {

  private def fixture = {
    import spark.implicits._
    val rng = new scala.util.Random(65)
    val alpha = "abcdefghijklmnop "
    def randStr(n: Int) = Seq.fill(n)(alpha(rng.nextInt(alpha.length))).mkString
    def edit(s: String): String = rng.nextInt(3) match {
      case 0 if s.nonEmpty =>
        s.updated(rng.nextInt(s.length), alpha(rng.nextInt(alpha.length)))
      case 1 if s.nonEmpty => s.patch(rng.nextInt(s.length), "", 1)
      case _ => s.patch(rng.nextInt(s.length + 1),
        alpha(rng.nextInt(alpha.length)).toString, 0)
    }
    val rows = (0 until 120).flatMap { i =>
      val base = randStr(25 + rng.nextInt(16))
      var v = base
      for (_ <- 0 until rng.nextInt(5)) v = edit(v)
      Seq((2L * i, base), (2L * i + 1, v))
    }
    rows.toDF("doc_id", "head").withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("head")))
  }

  test("crossover: PassJoin and length-band strategies agree exactly at the same k") {
    val d = fixture
    for (k <- Seq(2, 3, 4)) {
      val pass = EditDistanceJoin.candidatesPassJoin(d, k)
        .withColumn("ed", levenshtein(col("head_a"), col("head_b"), k))
        .filter(col("ed") >= 0 && col("ed") <= k)
        .select("doc_a", "doc_b", "ed")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      // a tolerance covering every length difference makes band
      // blocking equivalent to the bare predicate
      val band = EditDistanceJoin.candidatesLengthBand(d, "n_chars", 1000)
        .withColumn("ed", levenshtein(col("head_a"), col("head_b"), k))
        .filter(col("ed") >= 0 && col("ed") <= k)
        .select("doc_a", "doc_b", "ed")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(pass === band, s"strategy disagreement at k=$k: " +
        s"pass-only=${(pass -- band).take(5)} band-only=${(band -- pass).take(5)}")
      assert(pass.nonEmpty, s"degenerate fixture at k=$k")
    }
  }

  test("strategy routing: small k runs without a tolerance, large k demands one") {
    val d = fixture
    // k <= SmallKMax: PassJoin path, no tolerance needed
    assert(EditDistanceJoin(d, 2).columns.toSeq ===
      Seq("doc_a", "doc_b", "edit_dist"))
    // k > SmallKMax without a tolerance: explicit error, not a silent
    // all-pairs fallback
    val e = intercept[IllegalArgumentException] {
      EditDistanceJoin(d, EditDistanceJoin.SmallKMax + 1)
    }
    assert(e.getMessage.contains("length"))
    // with a tolerance the band path runs and honors the length filter
    val banded = EditDistanceJoin(d, 10, Some(("n_chars", 5)))
    val viol = banded.join(
        d.select(col("doc_id").as("doc_a"), col("n_chars").as("la")), "doc_a")
      .join(d.select(col("doc_id").as("doc_b"), col("n_chars").as("lb")), "doc_b")
      .filter(abs(col("la") - col("lb")) > 5).count()
    assert(viol === 0)
  }

  test("unified API with tolerance on the PassJoin path applies the length filter too") {
    val d = fixture
    val all = EditDistanceJoin(d, 2).collect().length
    val tight = EditDistanceJoin(d, 2, Some(("n_chars", 0)))
    val ids = d.select(col("doc_id"), col("n_chars")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    tight.collect().foreach { r =>
      assert(ids(r.getLong(0)) === ids(r.getLong(1)),
        s"pair ${r.getLong(0)}/${r.getLong(1)} violates tolerance 0")
    }
    assert(tight.count() <= all)
  }
}
