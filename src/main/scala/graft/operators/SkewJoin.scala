package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted shuffle join — the plan-level lever for HOT-KEY SKEW.
  *
  * A shuffle join hash-partitions both sides on the key, so every row of
  * a hot key lands in ONE task: one straggler holds the stage (and at
  * 100 TB, one executor's disk). AQE's skew-join split handles the
  * sort-merge case at runtime, but only when the skew is visible in map
  * statistics and the join is SMJ; salting is the deterministic,
  * strategy-independent rewrite that fixes the partitioning itself:
  *
  *   big side:  salt = hash(row-unique col) mod n   — splits each hot
  *              key's rows across n partitions
  *   dim side:  replicated once per salt             — every (key, salt)
  *              partition holds the dim rows it needs
  *   join key:  (key, salt) — co-partitioned, result EXACTLY the plain
  *              inner join (each big row meets each matching dim row
  *              once, in its own salt's replica; dim-side multiplicity
  *              preserved)
  *
  * Cost: the dim side shuffles/broadcasts n× its size — the standard
  * trade (salt the side with hot keys, replicate the side without).
  * NOT for aggregation skew: `groupBy` already splits hot keys via
  * map-side partial aggregation; salting pays there only for
  * high-cardinality-distinct aggregates.
  *
  * Determinism: the salt is crc32 of a caller-named column (not
  * `rand()`), so plans are replayable and retried tasks produce
  * identical output — the same md5-derived-determinism rule as every
  * hash in this library.
  */
object SkewJoin {

  /** Inner-join `big` ⋈ `dim` on `key`, with `big`'s rows salted across
    * `nSalts` partitions per key. `saltSrc` must be a `big`-side column
    * expression; any per-row value works (uniqueness spreads best). A
    * null `saltSrc` value salts to 0 (all such rows in one partition —
    * fine for spread, and it keeps the exactly-the-plain-join contract:
    * a null SALT must not drop a row whose JOIN key is non-null). */
  def salted(big: DataFrame, dim: DataFrame, key: String,
             saltSrc: Column, nSalts: Int): DataFrame = {
    require(nSalts >= 2, s"nSalts must be >= 2, got $nSalts")
    val bigS = big.withColumn("__salt__",
      pmod(coalesce(crc32(saltSrc.cast("string")), lit(0L)), lit(nSalts.toLong)))
    val dimS = dim.withColumn("__salt__",
      explode(sequence(lit(0L), lit(nSalts - 1L))))
    bigS.join(dimS, Seq(key, "__salt__")).drop("__salt__")
  }
}
