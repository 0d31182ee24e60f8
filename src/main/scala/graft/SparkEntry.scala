package graft

import scala.collection.immutable.ListMap
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.expr.Placeholder
import graft.ops.{Dedup, Multimodal, Similarity, TextAnalysis}
import graft.pipeline._

/** Driver contract — one `queries` entry per implemented operator family from
  * SURVEY.md §2 (+ the LLM-data-pipeline extensions), each with a DuckDB
  * oracle over the same parquet tables.
  *
  * Oracle-determinism rules (SURVEY.md §5/§7.5): no `rand()`, no wall-clock;
  * pseudo-randomness is integer arithmetic on keys; cross-engine hashing is
  * md5; money sums are exact floor-to-cents BIGINTs; double ratios are
  * rounded before comparison/ordering; every output is explicitly ordered and
  * every computed column aliased identically in Spark and SQL.
  */
object SparkEntry {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Exact, engine-portable money sum: Σ floor(x·100) as BIGINT cents. */
  private def cents(c: Column): Column = floor(c * 100).cast("long")

  /** Flagship: the four-stage DLP pipeline end-to-end at small scale —
    * plan → rendered corpus → mapping → validator report (per-SIT rollup).
    * Driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val cfg = PipelineConfig.scaled(perSit = 4)
    val docs = MetaGen.docs(spark, cfg)
    val corpus = ContentGen.corpus(docs)
    val mapping = ContentGen.mappingFromCorpus(corpus)
    val (report, _, _) = Validator.run(
      mapping, corpus.select("filename", "text"), cfg.sitDim(spark).toDF())
    report
  }

  // ------------------------------------------------------------------
  //  §2.6/§2.7 — aggregates, windows, sorts, limits
  // ------------------------------------------------------------------

  /** A1/A2/A5 — grouped count/sum/avg rollup (validator-report shape). */
  private def q01(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity")).cast("long").as("sum_qty"),
        sum(cents(col("l_extendedprice"))).as("revenue_cents"),
        round(avg(col("l_discount")), 6).as("avg_disc"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag", "l_linestatus")

  /** A9/W6 — grouped top-K with a rank window (sample capping). */
  private def q02(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    t(s, dir, "orders")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rank")
      .orderBy("o_custkey", "rank")
  }

  /** A7 — value_counts histogram. */
  private def q03(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")

  /** A6 — per-group sorted distinct set, `;`-joined (tcs canonical form). */
  private def q04(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").groupBy("o_custkey")
      .agg(array_join(array_sort(collect_set(col("o_orderpriority"))), ";")
        .as("priority_set"))
      .orderBy("o_custkey")

  /** A8/G4 — Bernoulli-style label from key arithmetic + global ratio. */
  private def q05(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .withColumn("label",
        when((col("l_orderkey") * 2654435761L) % 100 < 50, "TP").otherwise("FP"))
      .groupBy("label").agg(count(lit(1)).as("n"))
      .orderBy("label")

  // ------------------------------------------------------------------
  //  §2.5 — joins
  // ------------------------------------------------------------------

  /** J1/J2 — broadcast dimension star join. */
  private def q06(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .join(broadcast(t(s, dir, "customer")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(count(lit(1)).as("n_orders"),
        sum(cents(col("o_totalprice"))).as("revenue_cents"))
      .orderBy("r_name", "n_name")

  /** J3/J4 — full-outer upsert with per-column coalesce (library fn). */
  private def q07(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val existing = o.filter(col("o_orderkey") % 3 =!= 0)
      .select(col("o_orderkey").as("doc_id"),
        col("o_totalprice").as("price"), lit("old").as("src"))
    val incoming = o.filter(col("o_orderkey") % 2 === 0)
      .select(col("o_orderkey").as("doc_id"),
        (col("o_totalprice") * 2).as("price"), lit("new").as("src"))
    ContentGen.upsertMapping(existing, incoming)
      .orderBy("doc_id")
  }

  /** Anti-join — the "needed SITs" filter shape. */
  private def q08(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(t(s, dir, "orders"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  /** J6 — first-existing-candidate resolution via coalesce/nullif. */
  private def q09(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .withColumn("cand1",
        when(col("o_orderkey") % 7 === 0, lit(null).cast("string"))
          .otherwise(concat(lit("p1_"), col("o_orderkey"))))
      .withColumn("cand2",
        when(col("o_orderkey") % 3 === 0, lit(null).cast("string"))
          .otherwise(concat(lit("p2_"), col("o_orderkey"))))
      .select(col("o_orderkey"),
        coalesce(col("cand1"), col("cand2"), lit("fallback")).as("resolved"))
      .orderBy("o_orderkey")

  // ------------------------------------------------------------------
  //  §2.2 — generators/samplers (deterministic, key-hash driven)
  // ------------------------------------------------------------------

  /** G2/G3 — inverse-CDF bucket sampling + within-bucket expansion. */
  private def q10(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .withColumn("r", (col("o_orderkey") * 48271) % 100)
      .withColumn("bucket",
        when(col("r") < 30, "1").when(col("r") < 60, "2-3")
          .when(col("r") < 90, "4-6").otherwise(">6"))
      .withColumn("n_sits",
        when(col("r") < 30, lit(1L))
          .when(col("r") < 60, lit(2L) + (col("o_orderkey") * 16807) % 2)
          .when(col("r") < 90, lit(4L) + (col("o_orderkey") * 69621) % 3)
          .otherwise(lit(7L) + (col("o_orderkey") * 40692) % 4))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"), sum("n_sits").as("total_sits"))
      .orderBy("bucket")

  /** G5 — rule-based confidence CASE (library column fn). */
  private def q11(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .withColumn("label",
        when((col("l_orderkey") + col("l_linenumber")) % 2 === 0, "TP")
          .otherwise("FP"))
      .withColumn("instances", (col("l_partkey") % 12 + 1).cast("int"))
      .withColumn("confidence",
        MetaGen.confidenceCol(col("label"), col("instances")))
      .groupBy("label", "confidence").agg(count(lit(1)).as("n"))
      .orderBy("label", "confidence")

  /** G7/G9 — format choice + printf filename. */
  private def q12(s: SparkSession, dir: String): DataFrame = {
    val formats = PipelineConfig.default.formats
    t(s, dir, "orders")
      .withColumn("format",
        element_at(array(formats.map(lit): _*),
          (col("o_orderkey") % 5).cast("int") + 1))
      .select(col("o_orderkey").as("doc_id"), col("format"),
        format_string("doc_%05d_%s.txt", col("o_orderkey"), col("format"))
          .as("filename"))
      .orderBy("doc_id")
  }

  // ------------------------------------------------------------------
  //  §2.8 — predicates / scalar functions
  // ------------------------------------------------------------------

  /** P8 — `;`-packed parallel arrays → split/zip/posexplode through the
    * validator's library fn. The packed columns are synthesized identically
    * in both engines (ordered string_agg). */
  private def q13(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast("int").as("q"))
    val packed = li.groupBy(col("l_orderkey").as("doc_id"))
      .agg(
        array_join(transform(array_sort(collect_list(
          struct(col("l_linenumber").as("ln")))),
          x => concat(lit("S"), x.getField("ln"))), ";").as("sit_ids"),
        array_join(transform(array_sort(collect_list(
          struct(col("l_linenumber").as("ln")))),
          x => when(x.getField("ln") % 2 === 0, "TP").otherwise("FP")), ";")
          .as("labels"),
        array_join(transform(array_sort(collect_list(
          struct(col("l_linenumber").as("ln"), col("q")))),
          x => x.getField("q").cast("string")), ";").as("instances"))
      .withColumn("filename", lit(""))
    Validator.explodeAssignments(packed)
      .select("doc_id", "sit_id", "label", "instances")
      .orderBy("doc_id", "sit_id")
  }

  // ------------------------------------------------------------------
  //  assembled maps (ListMap: stable iteration order for Bench output)
  // ------------------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = ListMap(
    "q01_groupby_rollup" -> (q01 _),
    "q02_grouped_topk" -> (q02 _),
    "q03_histogram" -> (q03 _),
    "q04_distinct_set" -> (q04 _),
    "q05_label_ratio" -> (q05 _),
    "q06_star_join" -> (q06 _),
    "q07_upsert" -> (q07 _),
    "q08_anti_join" -> (q08 _),
    "q09_coalesce_path" -> (q09 _),
    "q10_bucket_sampler" -> (q10 _),
    "q11_confidence_case" -> (q11 _),
    "q12_filename_format" -> (q12 _),
    "q13_split_zip_explode" -> (q13 _))

  def oracleSql: Map[String, String] = ListMap(
    "q01_groupby_rollup" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
         CAST(sum(CAST(floor(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS revenue_cents,
         round(avg(l_discount), 6) AS avg_disc,
         count(*) AS n_rows
         FROM lineitem GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q02_grouped_topk" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rank FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
           FROM orders) WHERE rank <= 3
         ORDER BY o_custkey, rank""",
    "q03_histogram" ->
      """SELECT o_orderpriority, count(*) AS n_orders FROM orders
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q04_distinct_set" ->
      """SELECT o_custkey,
         string_agg(DISTINCT o_orderpriority, ';' ORDER BY o_orderpriority) AS priority_set
         FROM orders GROUP BY o_custkey ORDER BY o_custkey""",
    "q05_label_ratio" ->
      """SELECT CASE WHEN (l_orderkey*2654435761)%100 < 50 THEN 'TP' ELSE 'FP' END AS label,
         count(*) AS n FROM lineitem GROUP BY 1 ORDER BY label""",
    "q06_star_join" ->
      """SELECT r_name, n_name, count(*) AS n_orders,
         sum(CAST(floor(o_totalprice*100) AS BIGINT)) AS revenue_cents
         FROM orders
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name, n_name ORDER BY r_name, n_name""",
    "q07_upsert" ->
      """SELECT coalesce(i.doc_id, e.doc_id) AS doc_id,
                coalesce(i.price, e.price) AS price,
                coalesce(i.src, e.src) AS src
         FROM (SELECT o_orderkey AS doc_id, o_totalprice AS price, 'old' AS src
               FROM orders WHERE o_orderkey % 3 <> 0) e
         FULL OUTER JOIN
              (SELECT o_orderkey AS doc_id, o_totalprice*2 AS price, 'new' AS src
               FROM orders WHERE o_orderkey % 2 = 0) i
         ON e.doc_id = i.doc_id
         ORDER BY doc_id""",
    "q08_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         ORDER BY c_custkey""",
    "q09_coalesce_path" ->
      """SELECT o_orderkey,
         coalesce(
           CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE 'p1_' || o_orderkey END,
           CASE WHEN o_orderkey % 3 = 0 THEN NULL ELSE 'p2_' || o_orderkey END,
           'fallback') AS resolved
         FROM orders ORDER BY o_orderkey""",
    "q10_bucket_sampler" ->
      """WITH r AS (SELECT o_orderkey, (o_orderkey*48271)%100 AS r FROM orders)
         SELECT CASE WHEN r < 30 THEN '1' WHEN r < 60 THEN '2-3'
                     WHEN r < 90 THEN '4-6' ELSE '>6' END AS bucket,
           count(*) AS n_docs,
           sum(CASE WHEN r < 30 THEN 1
                    WHEN r < 60 THEN 2 + (o_orderkey*16807)%2
                    WHEN r < 90 THEN 4 + (o_orderkey*69621)%3
                    ELSE 7 + (o_orderkey*40692)%4 END) AS total_sits
         FROM r GROUP BY 1 ORDER BY bucket""",
    "q11_confidence_case" ->
      """SELECT label,
           CASE WHEN label = 'TP' THEN
                  CASE WHEN instances >= 6 THEN 'High'
                       WHEN instances BETWEEN 3 AND 5 THEN 'Medium'
                       ELSE 'Low' END
                ELSE CASE WHEN instances >= 3 THEN 'Medium' ELSE 'Low' END
           END AS confidence,
           count(*) AS n
         FROM (SELECT CASE WHEN (l_orderkey + l_linenumber) % 2 = 0
                           THEN 'TP' ELSE 'FP' END AS label,
                      l_partkey % 12 + 1 AS instances
               FROM lineitem)
         GROUP BY label, confidence ORDER BY label, confidence""",
    "q13_split_zip_explode" ->
      """WITH packed AS (
           SELECT l_orderkey AS doc_id,
             string_agg('S' || l_linenumber, ';' ORDER BY l_linenumber) AS sit_ids,
             string_agg(CASE WHEN l_linenumber % 2 = 0 THEN 'TP' ELSE 'FP' END,
                        ';' ORDER BY l_linenumber) AS labels,
             string_agg(CAST(CAST(l_quantity AS INT) AS VARCHAR),
                        ';' ORDER BY l_linenumber) AS instances
           FROM lineitem GROUP BY l_orderkey),
         exploded AS (
           SELECT doc_id,
             unnest(string_split(sit_ids, ';')) AS sit_id,
             unnest(string_split(labels, ';')) AS label,
             unnest(list_transform(string_split(instances, ';'),
               x -> CAST(x AS INT))) AS instances
           FROM packed)
         SELECT doc_id, sit_id, label, instances FROM exploded
         ORDER BY doc_id, sit_id""",
    "q12_filename_format" ->
      """SELECT o_orderkey AS doc_id,
         ['email','chat','document','pdf','email_with_attachment'][(o_orderkey % 5) + 1] AS format,
         printf('doc_%05d_%s.txt', o_orderkey,
           ['email','chat','document','pdf','email_with_attachment'][(o_orderkey % 5) + 1]) AS filename
         FROM orders ORDER BY doc_id""")
}
