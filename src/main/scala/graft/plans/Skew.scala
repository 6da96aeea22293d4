package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for large equi-joins: salting.
  *
  * AQE's skew-join splitting (`spark.sql.adaptive.skewJoin`) is the
  * first line of defense and needs no code. Salting is the explicit
  * fallback for the cases AQE can't fix — e.g. a single pathological
  * key in a shuffled aggregation, or a join where the skewed side
  * can't be subdivided post-shuffle.
  *
  * Shape: the skewed (large) side gets a random salt in [0, n); the
  * small side is replicated n times with every salt value; the join
  * key becomes (key, salt), spreading one hot key over n reducers.
  * Row multiplicity is unchanged — each left row matches exactly the
  * one replica carrying its salt.
  */
object Skew {

  /** Inner equi-join of `large ⋈ small` on `key`, with the large side
    * salted across `salts` partitions per key. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 salts: Int): DataFrame = {
    require(salts > 1, "salts must be > 1")
    val salted = large.withColumn("__salt",
      (rand(seed = 0) * salts).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Salted grouped count for one-hot-key aggregations: partial count
    * per (key, salt), then final sum per key — a manual two-phase
    * combine for cases where the single final reducer of a hot key is
    * the bottleneck. (Spark's partial aggregation already does this
    * for algebraic aggregates; this is the pattern for when the
    * aggregate state itself is heavy, e.g. collect-like.) */
  def saltedCount(df: DataFrame, key: String, salts: Int): DataFrame =
    df.withColumn("__salt", (rand(seed = 0) * salts).cast("int"))
      .groupBy(col(key), col("__salt")).agg(count(lit(1)).as("__partial"))
      .groupBy(col(key)).agg(sum(col("__partial")).as("n"))
}
