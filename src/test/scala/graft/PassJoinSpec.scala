package graft

import graft.operators.Workloads
import org.apache.spark.sql.functions._

/** PassJoin segment-signature edit-distance join (q84): candidate
  * completeness is the whole ballgame — a missed candidate is a
  * silently wrong answer, so the spec checks the full pipeline
  * against naive threshold levenshtein on the real corpus AND on
  * adversarial synthetic shifts (insertions/deletions that displace
  * every later segment, the case naive position blocking misses). */
class PassJoinSpec extends SparkSpec {

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("q84 equals naive threshold levenshtein on the real corpus") {
    val rows = Tables.load(spark, sf0001, "documents")
      .select(col("doc_id"), col("source"), substring(col("text"), 1, 40).as("head"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val naive = (for {
      (ia, sa, ha) <- rows; (ib, sb, hb) <- rows
      if ia < ib && sa == sb && lev(ha, hb) <= 2
    } yield (ia, ib, lev(ha, hb))).toSet
    val got = Workloads.queries("q84_passjoin_edit2")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got === naive)
  }

  test("randomized completeness: 150 random <=2-edit pairs, output equals naive exactly") {
    import spark.implicits._
    val rng = new scala.util.Random(84)
    val alpha = "abcdefghijklmnopqrstuvwxyz "
    def randStr(n: Int) = Seq.fill(n)(alpha(rng.nextInt(alpha.length))).mkString
    def edit(s: String): String = rng.nextInt(3) match {
      case 0 if s.nonEmpty => // substitute
        val i = rng.nextInt(s.length)
        s.updated(i, alpha(rng.nextInt(alpha.length)))
      case 1 if s.nonEmpty => s.patch(rng.nextInt(s.length), "", 1) // delete
      case _ => s.patch(rng.nextInt(s.length + 1),
        alpha(rng.nextInt(alpha.length)).toString, 0) // insert
    }
    val rows = (0 until 150).flatMap { i =>
      val base = randStr(30 + rng.nextInt(21))
      var v = base
      for (_ <- 0 until rng.nextInt(3)) v = edit(v)
      Seq((2L * i, base), (2L * i + 1, v))
    }
    val truth = (for {
      (ia, ha) <- rows; (ib, hb) <- rows
      if ia < ib && lev(ha, hb) <= 2
    } yield (ia, ib, lev(ha, hb))).toSet
    assert(truth.size >= 100, s"weak fixture: only ${truth.size} true pairs")
    val d = rows.toDF("doc_id", "head").withColumn("source", lit("s"))
    val got = Workloads.passJoinCandidates(d)
      .withColumn("edit_dist", levenshtein(col("head_a"), col("head_b"), 2))
      .filter(col("edit_dist") >= 0 && col("edit_dist") <= 2)
      .select("doc_a", "doc_b", "edit_dist")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got === truth,
      s"missed: ${(truth -- got).take(5)}; extra: ${(got -- truth).take(5)}")
  }

  test("adversarial segment shifts: all ed<=2 variants found, ed=3 excluded") {
    import spark.implicits._
    val base = "the quick brown fox jumps over lazy dogs"
    assert(base.length === 40)
    val variants = Seq(
      1L -> base,
      2L -> base.patch(3, "", 1),          // delete in segment 0: shifts seg 1,2
      3L -> ("xy" + base),                  // 2 inserts at front: ALL segments shift
      4L -> base.patch(20, "Z", 1).patch(35, "Q", 1), // 2 substitutions
      5L -> base.patch(14, "ab", 0),        // 2-char insert mid: seg 2 shifts
      6L -> base.patch(5, "AAA", 3))        // 3 substitutions: ed=3, must NOT pair with 1
    val truth = (for {
      (ia, ha) <- variants; (ib, hb) <- variants
      if ia < ib && lev(ha, hb) <= 2
    } yield (ia, ib)).toSet
    assert(truth.contains((1L, 2L)) && truth.contains((1L, 3L)) &&
      truth.contains((1L, 4L)) && truth.contains((1L, 5L)) && !truth.contains((1L, 6L)))
    val d = variants.toDF("doc_id", "head").withColumn("source", lit("s"))
    val got = Workloads.passJoinCandidates(d)
      .withColumn("ed", levenshtein(col("head_a"), col("head_b"), 2))
      .filter(col("ed") >= 0 && col("ed") <= 2)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === truth, s"missed: ${truth -- got}; extra: ${got -- truth}")
  }
}
