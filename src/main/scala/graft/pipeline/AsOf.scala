package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — an operator Spark has no native form of (SURVEY.md
  * Table B; DuckDB ships it as `ASOF JOIN`, which is the oracle).
  *
  * Semantics: for every probe row, attach the build row with the greatest
  * `ts` ≤ the probe's `ts` on the same key (ties at equal ts match the
  * build row).
  *
  * Implementation: the classic union-and-carry composition, NOT a range
  * cross-join — probe and build are tagged and unioned, shuffled ONCE on
  * the key, sorted by (ts, side), and `last(value, ignoreNulls)` carries
  * the latest build values forward to each probe row. Work is
  * O((|probe|+|build|) log partition-size) with no intermediate blowup, so
  * it scales like any single sort-merge pass. Build must be unique per
  * (key, ts) — pre-aggregate if not, or carried values are
  * nondeterministic.
  */
object AsOf {

  /** @param probe   left side; keeps all its columns
    * @param build   right side: exactly (key, ts, valueCols*)
    * @param key     equality key column name (same name both sides)
    * @param ts      event-time column name (same name both sides, numeric/ts)
    * @param valueCols build columns to carry onto probe rows (null when no
    *                  build row precedes the probe row)
    */
  def joinBackward(probe: DataFrame, build: DataFrame, key: String, ts: String,
                   valueCols: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty, "need at least one value column to carry")
    val probeCols = probe.columns.toSeq
    require(!valueCols.exists(probeCols.contains),
      s"value columns ${valueCols.mkString(",")} collide with probe columns")

    val probeT = valueCols.foldLeft(
      probe.withColumn("__side", lit(1))) { (df, c) =>
      df.withColumn(c, lit(null).cast(build.schema(c).dataType))
    }
    val buildT = probeCols.filterNot(Set(key, ts)).foldLeft(
      build.select((Seq(key, ts) ++ valueCols).map(col): _*)
        .withColumn("__side", lit(0))) { (df, c) =>
      df.withColumn(c, lit(null).cast(probe.schema(c).dataType))
    }
    val unioned = probeT.select((probeCols ++ Seq("__side") ++ valueCols).map(col): _*)
      .unionByName(buildT.select((probeCols ++ Seq("__side") ++ valueCols).map(col): _*))

    // Carry ONE struct of all value columns, not each column independently:
    // a build row with a NULL field must still win wholesale, or the output
    // would mix fields from different build rows (ASOF semantics attach a
    // single matched row). The struct is null exactly on probe rows.
    val w = Window.partitionBy(key).orderBy(col(ts), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // build rows (side 0) sort before probe rows at equal ts ⇒ ties match
    val packed = unioned.withColumn("__v",
      when(col("__side") === 0, struct(valueCols.map(col): _*)))
      .withColumn("__v", last(col("__v"), ignoreNulls = true).over(w))
    valueCols.foldLeft(packed.filter(col("__side") === 1)) { (df, c) =>
      df.withColumn(c, col(s"__v.$c"))
    }.drop("__side", "__v")
  }
}
