package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    QueryCatalog.q01Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueryCatalog.all ++ QueryCatalogAgg.all ++ QueryCatalogScalar.all ++
      QueryCatalogText.all ++ QueryCatalogSim.all ++ QueryCatalogDomain.all ++
      QueryCatalogDomain2.all ++ QueryCatalogDomain3.all ++
      QueryCatalogCuration.all ++ QueryCatalogVocab.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    QueryCatalog.oracle ++ QueryCatalogAgg.oracle ++ QueryCatalogScalar.oracle ++
      QueryCatalogText.oracle ++ QueryCatalogSim.oracle ++ QueryCatalogDomain.oracle ++
      QueryCatalogDomain2.oracle ++ QueryCatalogDomain3.oracle ++
      QueryCatalogCuration.oracle ++ QueryCatalogVocab.oracle
}
