package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Authored skew mitigation for shuffle joins — the half of the skew story
  * you plan for (AQE's OptimizeSkewedJoin, exercised in `SkewJoinSpec`, is
  * the half you don't). At 100 TB a single hot join key (the null-ish
  * customer, the default part, the empty-string domain) concentrates one
  * shuffle partition onto one task; salting spreads it over `salts` tasks
  * at the cost of replicating the small side `salts`×.
  */
object SkewOps {

  /** Hot-key-salted equi-join: every fact row picks a deterministic salt
    * in [0, salts); every dim row is replicated across ALL salts; the join
    * key becomes (key, salt), so a hot key's rows land on `salts`
    * different reducers instead of one. Result is EXACTLY the plain join
    * (each fact row still meets each matching dim row exactly once — on
    * its own salt) — `q62_salted_join`'s oracle is the plain-join SQL.
    *
    * `saltSrc` only needs to spread a hot key's rows (any deterministic
    * fact-side expression; a constant would still be correct, just
    * skew-blind). The merge hint pins a shuffle join: broadcasting the dim
    * would bypass the exchange salting exists to fix — when the dim fits
    * in memory, broadcast instead and skip salting entirely. Replication
    * cost: |dim|×salts rows through one exchange. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, salts: Int, saltSrc: Column): DataFrame = {
    val sf = fact.withColumn("__salt", pmod(hash(saltSrc), lit(salts)))
    val sd = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    sf.join(sd.hint("merge"),
        sf(factKey) === sd(dimKey) && sf("__salt") === sd("__salt"))
      .drop("__salt")
  }
}
