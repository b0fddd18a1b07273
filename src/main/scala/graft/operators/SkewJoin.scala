package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys: when one join key holds a
  * disproportionate share of the fact rows, a plain shuffle join
  * lands that key's whole partition on ONE reducer. Salting splits
  * every key into `salt` sub-keys — the fact side derives its salt
  * deterministically from a caller-named unique column (never
  * `rand()`: results must replay), the dim side replicates each row
  * `salt` times via a generator — so the hot key's rows spread over
  * `salt` reducers and the join result is IDENTICAL to the unsalted
  * join (each fact row meets exactly the one dim replica carrying
  * its salt).
  *
  * AQE's skew-split handles sort-merge joins after stats exist;
  * salting remains the static answer when the dim side is too big to
  * broadcast but small enough to replicate, or when the engine must
  * not rely on runtime re-planning. Replication factor is `salt` x
  * |dim| — the knob trades dim duplication for reducer fan-out.
  */
object SkewJoin {

  def saltedEquiJoin(facts: DataFrame, dim: DataFrame,
                     factKey: String, dimKey: String,
                     saltSource: Column, salt: Int): DataFrame = {
    require(salt > 0, s"salt must be positive; got $salt")
    val f = facts.withColumn("__salt",
      pmod(xxhash64(saltSource), lit(salt.toLong)))
    val d = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(salt.toLong - 1L))))
    f.join(d, f("__salt") === d("__salt") &&
              col(factKey) === col(dimKey))
      .drop("__salt")
  }
}
