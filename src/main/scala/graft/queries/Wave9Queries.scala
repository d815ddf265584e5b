package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Round-13 additions: DML on a COLUMN-MAPPED Delta table through the
  * gate — the first thing a real Delta user hits after `ALTER TABLE
  * RENAME COLUMN` (rename requires mapping; every later UPDATE /
  * DV-DELETE / MERGE then routes through physical names). The whole
  * lifecycle (create mapped → append → rename → update → DV delete →
  * merge upsert+insert) runs against one table and the final rollup
  * only matches the oracle if every step wrote exactly the right rows
  * under the renamed logical schema.
  */
object Wave9Queries {

  private def t(s: SparkSession, dir: String, n: String) = Tables.table(s, dir, n)
  import Num.{d4, dsum}

  object MappedDml {
    /** UPDATE predicate bound (p_partkey < this gets the SET). */
    val UpdateBelow = 500
    /** DV DELETE bound (p_partkey >= this is deleted). */
    val DeleteFrom = 1500
    /** MERGE upsert bound (raw part rows below this re-enter with
      * doubled size).
      */
    val MergeBelow = 100
    /** The MERGE-inserted row. */
    val InsertKey = 999999L
    val InsertBrand = "Brand#99"
    val InsertSize = 7
    val InsertPrice = 42.5
    /** Conditional-MERGE bound (r15): source keys below this pair
      * with the target; only keys ≡ 0 (mod 3) satisfy the matched
      * condition and take the price bump — the rest stay UNTOUCHED.
      */
    val CondMergeBelow = 60
    /** Clause-surface MERGE leg (r15): source keys below this, plus
      * two synthetic unmatched keys, drive overlapping matched
      * clauses (first-match-wins), a conditional column-list INSERT
      * (NULL-fill), and NOT MATCHED BY SOURCE DELETE/UPDATE bands.
      */
    val BsMergeBelow = 40
    /** NOT MATCHED BY SOURCE: keys in [BsDeleteFrom, DeleteFrom) are
      * deleted; [BsTouchFrom, DeleteFrom) takes the price bump where
      * the delete clause did not fire first (net: [BsTouchFrom,
      * BsDeleteFrom)).
      */
    val BsDeleteFrom = 1400
    val BsTouchFrom = 1300
    /** The synthetic unmatched source keys: the even one inserts via
      * the conditional column-list clause, the odd one fires no
      * clause and must NOT insert.
      */
    val BsInsertKey = 1999998L
    val BsSkipKey = 1999999L
  }

  private val mappedTables = scala.collection.concurrent.TrieMap.empty[String, String]

  private def mappedField(name: String, dt: DataType, id: Int): StructField =
    StructField(name, dt, nullable = true,
      metadata = new MetadataBuilder()
        .putLong("delta.columnMapping.id", id.toLong)
        .putString(graft.tables.DeltaLog.PhysicalNameKey, f"col-$id%02d")
        .build())

  /** Column-mapped part table driven through the full DML ladder. */
  private def mappedDmlTable(s: SparkSession, dir: String): String =
    mappedTables.getOrElseUpdate(dir, {
      import graft.core.{Filter, Filters}
      import graft.tables.{DeltaDdl, DeltaWrite}
      import MappedDml._
      val path = java.nio.file.Files
        .createTempDirectory("graft_delta_mapped").toString + "/part"
      val schema = StructType(Seq(
        mappedField("p_partkey", LongType, 1),
        mappedField("p_brand", StringType, 2),
        mappedField("p_size", IntegerType, 3),
        mappedField("p_retailprice", DoubleType, 4)))
      DeltaDdl.createTable(s, path, schema, configuration = Map(
        "delta.columnMapping.mode" -> "name",
        "delta.columnMapping.maxColumnId" -> "4"))
      DeltaWrite.append(s,
        t(s, dir, "part").select("p_partkey", "p_brand", "p_size", "p_retailprice"),
        path)
      // rename p_size -> sz: metadata-only, physical col-03 stays
      DeltaDdl.renameColumn(s, path, "p_size", "sz")
      // UPDATE through the renamed logical name (CoW rewrite)
      DeltaWrite.updateWhere(s, path,
        Filters.normalize(Seq(Filter("p_partkey", "<", UpdateBelow))),
        Seq("sz" -> "sz + 100", "p_retailprice" -> "p_retailprice + 10"))
      // merge-on-read DELETE via deletion vectors
      DeltaWrite.deleteWhereDv(s, path,
        Filters.normalize(Seq(Filter("p_partkey", ">=", DeleteFrom))))
      // MERGE: upsert the low keys from RAW part with doubled size,
      // plus one brand-new row
      val src = t(s, dir, "part")
        .filter(col("p_partkey") < MergeBelow)
        .select(col("p_partkey"), col("p_brand"),
          (col("p_size") * 2).as("sz"), col("p_retailprice"))
        .unionByName(s.createDataFrame(
          java.util.Arrays.asList(org.apache.spark.sql.Row(
            InsertKey, InsertBrand, InsertSize, InsertPrice)),
          StructType(Seq(
            StructField("p_partkey", LongType),
            StructField("p_brand", StringType),
            StructField("sz", IntegerType),
            StructField("p_retailprice", DoubleType)))))
      DeltaWrite.merge(s, path, src, Seq("p_partkey"))
      path
    })

  /** Per-brand rollup of the mapped table after the DML ladder: the
    * sums only match the oracle if rename routing, the UPDATE's SET,
    * the DV delete's bitmap and the MERGE's upsert/insert all hit
    * exactly the right rows.
    */
  def qMappedDml(s: SparkSession, dir: String): DataFrame = {
    import graft.tables.{DeltaTable, ReadArgs}
    new DeltaTable("part_mapped", mappedDmlTable(s, dir))(s, ReadArgs.empty)
      .groupBy(col("p_brand"))
      .agg(
        count(lit(1)).as("n_parts"),
        sum(col("sz").cast(LongType)).as("sum_sz"),
        dsum(d4(col("p_retailprice"))).as("sum_price"))
      .orderBy("p_brand")
  }

  private val catalogDmlTables = scala.collection.concurrent.TrieMap.empty[String, String]

  /** The SAME mapped-table DML ladder as [[mappedDmlTable]], but every
    * DML statement issued as CATALOG SQL (r14, E66): `UPDATE graft.\`p\``
    * plans through [[graft.spark.GraftDmlStrategy]], `DELETE FROM`
    * through DSv2 SupportsDelete, `MERGE INTO` through the strategy's
    * key-upsert routing — all against a COLUMN-MAPPED table with DV
    * routing enabled mid-ladder, so the catalog front door proves the
    * full physical-name path end to end.
    */
  private def catalogDmlTable(s: SparkSession, dir: String): String =
    catalogDmlTables.getOrElseUpdate(dir, {
      import graft.tables.{DeltaDdl, DeltaWrite}
      import MappedDml._
      s.conf.set("spark.sql.catalog.graft", "graft.spark.GraftCatalog")
      val path = java.nio.file.Files
        .createTempDirectory("graft_catalog_dml").toString + "/part"
      val schema = StructType(Seq(
        mappedField("p_partkey", LongType, 1),
        mappedField("p_brand", StringType, 2),
        mappedField("p_size", IntegerType, 3),
        mappedField("p_retailprice", DoubleType, 4)))
      DeltaDdl.createTable(s, path, schema, configuration = Map(
        "delta.columnMapping.mode" -> "name",
        "delta.columnMapping.maxColumnId" -> "4"))
      DeltaWrite.append(s,
        t(s, dir, "part").select("p_partkey", "p_brand", "p_size", "p_retailprice"),
        path)
      DeltaDdl.renameColumn(s, path, "p_size", "sz")
      // UPDATE through catalog SQL (CoW — DV routing not yet enabled)
      s.sql(s"UPDATE graft.`$path` SET sz = sz + 100, " +
        s"p_retailprice = p_retailprice + 10 WHERE p_partkey < $UpdateBelow")
      // flip on DV routing so the catalog DELETE is merge-on-read,
      // mirroring the API ladder's deleteWhereDv step
      DeltaWrite.setTableProperties(s, path,
        Map("delta.enableDeletionVectors" -> "true"))
      s.sql(s"DELETE FROM graft.`$path` WHERE p_partkey >= $DeleteFrom")
      // MERGE through catalog SQL (routes to mergeDv under the flag)
      t(s, dir, "part")
        .filter(col("p_partkey") < MergeBelow)
        .select(col("p_partkey"), col("p_brand"),
          (col("p_size") * 2).as("sz"), col("p_retailprice"))
        .unionByName(s.createDataFrame(
          java.util.Arrays.asList(org.apache.spark.sql.Row(
            InsertKey, InsertBrand, InsertSize, InsertPrice)),
          StructType(Seq(
            StructField("p_partkey", LongType),
            StructField("p_brand", StringType),
            StructField("sz", IntegerType),
            StructField("p_retailprice", DoubleType)))))
        .createOrReplaceTempView("graft_catalog_dml_src")
      s.sql(
        s"""MERGE INTO graft.`$path` t USING graft_catalog_dml_src s
           |ON t.p_partkey = s.p_partkey
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      // r15: CONDITIONAL matched update with an expression-valued SET
      // referencing BOTH sides — only keys ≡ 0 (mod 3) under the bound
      // change; every other matched row must stay byte-identical
      // (no rewrite-induced drift on the mapped physical path)
      t(s, dir, "part")
        .filter(col("p_partkey") < CondMergeBelow)
        .select(col("p_partkey"), col("p_brand"),
          col("p_size").as("sz"), col("p_retailprice"))
        .createOrReplaceTempView("graft_catalog_dml_cond_src")
      s.sql(
        s"""MERGE INTO graft.`$path` t USING graft_catalog_dml_cond_src s
           |ON t.p_partkey = s.p_partkey
           |WHEN MATCHED AND s.p_partkey % 3 = 0
           |  THEN UPDATE SET p_retailprice = t.p_retailprice + 5
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      // r15: the full clause surface in one statement — overlapping
      // matched clauses resolve first-match-wins (k ≡ 0 mod 10
      // updates BEFORE the mod-5 delete can fire), a conditional
      // column-list INSERT NULL-fills unassigned columns (the odd
      // synthetic key fires no clause and must not insert), and NOT
      // MATCHED BY SOURCE bands delete [BsDeleteFrom, DeleteFrom)
      // then bump [BsTouchFrom, BsDeleteFrom) — all against the
      // mapped, DV-routed physical path
      t(s, dir, "part")
        .filter(col("p_partkey") < BsMergeBelow)
        .select(col("p_partkey"), col("p_brand"))
        .unionByName(s.createDataFrame(
          java.util.Arrays.asList(
            org.apache.spark.sql.Row(BsInsertKey, "Brand#98"),
            org.apache.spark.sql.Row(BsSkipKey, "Brand#99")),
          StructType(Seq(
            StructField("p_partkey", LongType),
            StructField("p_brand", StringType)))))
        .createOrReplaceTempView("graft_catalog_dml_bs_src")
      s.sql(
        s"""MERGE INTO graft.`$path` t USING graft_catalog_dml_bs_src s
           |ON t.p_partkey = s.p_partkey
           |WHEN MATCHED AND s.p_partkey % 10 = 0 THEN UPDATE SET sz = t.sz + 1
           |WHEN MATCHED AND s.p_partkey % 5 = 0 THEN DELETE
           |WHEN NOT MATCHED AND s.p_partkey % 2 = 0
           |  THEN INSERT (p_partkey, p_brand) VALUES (s.p_partkey, s.p_brand)
           |WHEN NOT MATCHED BY SOURCE
           |  AND t.p_partkey >= $BsDeleteFrom AND t.p_partkey < $DeleteFrom
           |  THEN DELETE
           |WHEN NOT MATCHED BY SOURCE
           |  AND t.p_partkey >= $BsTouchFrom AND t.p_partkey < $DeleteFrom
           |  THEN UPDATE SET p_retailprice = t.p_retailprice + 1""".stripMargin)
      // r15: RESIDUAL predicates — modulo shapes sit outside the
      // pruning algebra, so the algebra conjunct prunes files and the
      // full predicate evaluates row-by-row inside the DV writers
      s.sql(s"UPDATE graft.`$path` SET p_retailprice = p_retailprice + 2 " +
        s"WHERE p_partkey % 7 = 0 AND p_partkey < $UpdateBelow")
      s.sql(s"DELETE FROM graft.`$path` " +
        s"WHERE p_partkey % 11 = 3 AND p_partkey >= $BsTouchFrom")
      path
    })

  private val icebergUpdated = scala.collection.concurrent.TrieMap.empty[String, String]

  /** Nation as a native Iceberg table, a merge-on-read position
    * DELETE, then catalog-SQL `UPDATE` (r15: copy-on-write rewrite of
    * the matched files in ONE snapshot, the MoR deletes materialized
    * into it — a resurrected deleted row or a touched unmatched row
    * breaks the oracle).
    */
  private def icebergUpdatedTable(s: SparkSession, dir: String): String =
    icebergUpdated.getOrElseUpdate(dir, {
      import graft.tables.IcebergWrite
      import graft.core.{Filter, Filters}
      s.conf.set("spark.sql.catalog.graft", "graft.spark.GraftCatalog")
      val path = java.nio.file.Files
        .createTempDirectory("graft_ice_upd").toString + "/nation"
      IcebergWrite.append(s,
        t(s, dir, "nation").select("n_nationkey", "n_name", "n_regionkey"), path)
      IcebergWrite.deleteWhere(s, path,
        Filters.normalize(Seq(Filter("n_nationkey", ">=", 20))))
      s.sql(s"UPDATE graft.`$path` SET n_name = concat(n_name, '_EU') " +
        "WHERE n_regionkey = 1")
      // r15: conditional matched MERGE on the ICEBERG leg too — only
      // keys ≡ 0 (mod 4) under 12 take the SET (referencing BOTH
      // sides); every other matched row must stay untouched and the
      // source's synthetic key inserts
      t(s, dir, "nation")
        .filter(col("n_nationkey") < 12)
        .select(col("n_nationkey"), col("n_name"),
          (col("n_regionkey") + 10).as("n_regionkey"))
        .unionByName(s.createDataFrame(
          java.util.Arrays.asList(org.apache.spark.sql.Row(990, "SYNTHESIA", 9)),
          StructType(Seq(
            StructField("n_nationkey", IntegerType),
            StructField("n_name", StringType),
            StructField("n_regionkey", IntegerType)))))
        .createOrReplaceTempView("graft_ice_upd_src")
      s.sql(
        s"""MERGE INTO graft.`$path` t USING graft_ice_upd_src s
           |ON t.n_nationkey = s.n_nationkey
           |WHEN MATCHED AND s.n_nationkey % 4 = 0
           |  THEN UPDATE SET n_regionkey = s.n_regionkey + t.n_regionkey
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      // r15: RESIDUAL catalog UPDATE on the Iceberg leg — the modulo
      // predicate sits outside the pruning algebra, so the CoW
      // rewrite evaluates it row-by-row (keys ≡ 2 mod 5 get a suffix)
      s.sql(s"UPDATE graft.`$path` SET n_name = concat(n_name, '_R') " +
        "WHERE n_nationkey % 5 = 2 AND n_nationkey < 20")
      path
    })

  def qIcebergUpdate(s: SparkSession, dir: String): DataFrame = {
    import graft.tables.{IcebergTable, ReadArgs}
    new IcebergTable("nation_upd", icebergUpdatedTable(s, dir))(s, ReadArgs())
      .orderBy("n_nationkey")
  }

  /** Rollup identical to [[qMappedDml]]'s, read back through catalog
    * SQL — matches the same oracle only if the three catalog-issued
    * DML statements hit exactly the rows the API ladder does.
    */
  def qCatalogDml(s: SparkSession, dir: String): DataFrame = {
    val path = catalogDmlTable(s, dir)
    s.sql(s"SELECT * FROM graft.delta.`$path`")
      .groupBy(col("p_brand"))
      .agg(
        count(lit(1)).as("n_parts"),
        sum(col("sz").cast(LongType)).as("sum_sz"),
        dsum(d4(col("p_retailprice"))).as("sum_price"))
      .orderBy("p_brand")
  }
}
