package graft

import graft.functions.SplitMix64Kernel
import graft.operators.Profiling
import org.apache.spark.sql.functions.col
import org.apache.spark.unsafe.types.UTF8String

/** Proofs for the q140 dataset manifest: the fingerprint is invariant
  * under partitioning and row order (the property that makes it a
  * zero-coordination 100 TB dataset-equality audit), sensitive to any
  * single changed/dropped/duplicated row, and a bit-exact replay of
  * the splitmix64 row hash. */
class ProfilingSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, String, String)]) =
    Profiling.manifest(rows.toDF("doc_id", "source", "text"))
      .collect().map(_.toSeq).toSeq

  /** The engine's row hash, replayed on the JVM kernel. */
  private def hu(docId: Long, text: String): Long =
    SplitMix64Kernel.strHash(UTF8String.fromString(s"$docId:$text")) >>> 11

  test("q140: manifest is invariant under partitioning and row order") {
    val d = Tables.load(spark, sf0001, "documents")
    val base = Profiling.manifest(d).collect().map(_.toSeq).toSeq
    val scrambled = Profiling.manifest(
      d.repartition(13, col("text")).sortWithinPartitions(col("text")))
      .collect().map(_.toSeq).toSeq
    assert(base === scrambled)
    assert(base.nonEmpty)
  }

  test("q140: a changed row flips both fingerprints; an id swap flips them too") {
    val base = run(Seq((1L, "s1", "hello"), (2L, "s1", "world")))
    val edited = run(Seq((1L, "s1", "hellx"), (2L, "s1", "world")))
    // source, n_docs, n_bytes, min_doc, max_doc, fp_xor, fp_sum
    assert(base.head(1) === edited.head(1))
    assert(base.head(5) !== edited.head(5))
    assert(base.head(6) !== edited.head(6))
    // same texts under swapped ids: counts and ranges agree, but the
    // (doc_id, text) keying registers the reassignment
    val swapped = run(Seq((2L, "s1", "hello"), (1L, "s1", "world")))
    assert(base.head.take(5) === swapped.head.take(5))
    assert(base.head(5) !== swapped.head(5))
  }

  test("q140: XOR cancels an even-multiplicity duplicate; the modular sum catches it") {
    val twice = run(Seq((1L, "s1", "hello"), (1L, "s1", "hello")))
    assert(twice.head(5) === 0L) // h ⊕ h = 0: XOR alone is blind here
    val h = hu(1L, "hello")
    assert(twice.head(6) === (2L * h) % 9007199254740992L)
    assert(twice.head(1) === 2L) // ...and the count sees it anyway
  }

  test("q140: NULL text hashes as empty — the row is counted, not skipped") {
    // concat_ws would have dropped the ':' too (key "7" vs "7:") and
    // octet_length(NULL) would have nulled nb; both sides now coalesce.
    val n = run(Seq((7L, "s1", null)))
    assert(n.head(1) === 1L)
    assert(n.head(2) === 0L)
    assert(n.head(5) === hu(7L, ""))
    assert(n === run(Seq((7L, "s1", ""))))
  }

  test("q140: the fingerprint is the kernel hash replayed") {
    val one = run(Seq((7L, "s9", "abc"), (8L, "zz", "déjà vu")))
    val Seq(r1, r2) = one.sortBy(_.head.asInstanceOf[String])
    assert(r1(5) === hu(7L, "abc"))
    assert(r1(6) === hu(7L, "abc") % 9007199254740992L)
    assert(r2(5) === hu(8L, "déjà vu"))
    assert(r2(2) === "déjà vu".getBytes("UTF-8").length.toLong)
  }
}
