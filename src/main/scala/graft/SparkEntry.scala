package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.VectorFunctions._
import graft.operators.VectorStore

/** Driver contract — see /root/repo/SURVEY.md §2/§7.
  *
  * Every operator claimed in SURVEY.md §2 has a `queries` entry; every
  * SQL-expressible one also has an `oracleSql` entry the driver runs in
  * DuckDB over the same parquet tables. Determinism rules shared by both
  * sides: all float math folds left-to-right in DOUBLE, scores rounded to
  * 6 decimals on output, big SUMs go through exact DECIMAL, every result
  * has a total ORDER BY with an id tiebreaker (SURVEY.md §4 deltas).
  */
object SparkEntry {

  /** Flagship: top-10 cosine query over embeddings (O3 hot path). */
  def entry(spark: SparkSession): DataFrame =
    queries("o3_topk")(spark, "/root/testdata/sf0.001")

  // ------------------------------------------------------------ helpers

  /** Oracle-path store: DOUBLE vectors for bitwise-deterministic scores. */
  private def storeD(s: SparkSession, dir: String): VectorStore =
    VectorStore.fromDataFrame(
      Tables.embeddings(s, dir), "vec_id", "embedding", 64, elemType = DoubleType)

  /** The shared query vector: embedding of vec_id = 0 (1-row lookup). */
  private def qvec(s: SparkSession, dir: String): Array[Float] =
    Tables.embeddings(s, dir).filter(col("vec_id") === 0)
      .select("embedding").head().getSeq[Float](0).toArray

  private def vid: Column = col(VectorStore.IdCol).cast(LongType)

  /** The shared upsert batch: vec_id<5 as vector-updates (reversed vector,
    * label+100 which must be DISCARDED per quirk O2a), and vec_id+1000000
    * as inserts (label+100 kept). */
  private def upsertBatch(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir).filter(col("vec_id") < 5)
    val upd = e.select(
      col("vec_id").cast(StringType).as("__id__"),
      reverse(col("embedding")).cast(ArrayType(DoubleType)).as("vector"),
      (col("label") + 100).as("label"))
    val ins = e.select(
      (col("vec_id") + 1000000).cast(StringType).as("__id__"),
      col("embedding").cast(ArrayType(DoubleType)).as("vector"),
      (col("label") + 100).as("label"))
    upd.unionByName(ins)
  }

  // ------------------------------------------------------------ queries

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // O1: schema-validated scan of the collection.
    "o1_scan" -> ((s, dir) => {
      storeD(s, dir).df
        .select(col("__id__"), size(col("vector")).cast(LongType).as("dim"), col("label"))
        .orderBy(vid)
    }),

    // O2: upsert returns (updated_ids, inserted_ids) — lib.rs:150-185.
    "o2_upsert_ids" -> ((s, dir) => {
      val r = storeD(s, dir).upsert(upsertBatch(s, dir))
      r.updatedIds.withColumn("op", lit("updated"))
        .unionByName(r.insertedIds.withColumn("op", lit("inserted")))
        .orderBy(col("op"), vid)
    }),

    // O2a: post-upsert state — updated rows keep OLD fields (stale-fields
    // quirk, lib.rs:157-163) but get the new normalized vector.
    "o2a_upsert_state" -> ((s, dir) => {
      val r = storeD(s, dir).upsert(upsertBatch(s, dir))
      r.store.df
        .filter(vid < 5 || vid >= 1000000)
        .select(col("__id__"), col("label"),
          round(element_at(col("vector"), 1), 6).as("v0"))
        .orderBy(vid)
    }),

    // O3: flagship top-k cosine (k=10).
    "o3_topk" -> ((s, dir) => {
      storeD(s, dir).query(qvec(s, dir), 10)
        .withColumn("__metrics__", round(col("__metrics__"), 6))
    }),

    // O4: metadata predicate applied BEFORE scoring (lib.rs:211-216).
    "o4_filter_topk" -> ((s, dir) => {
      storeD(s, dir).query(qvec(s, dir), 5, filter = Some(col("label") === 3))
        .withColumn("__metrics__", round(col("__metrics__"), 6))
    }),

    // O5: inclusive better_than threshold (lib.rs:198,222).
    "o5_threshold_topk" -> ((s, dir) => {
      storeD(s, dir).query(qvec(s, dir), 100, betterThan = Some(0.2))
        .withColumn("__metrics__", round(col("__metrics__"), 6))
    }),

    // O6: point lookup; missing ids silently dropped (lib.rs:263-270).
    "o6_get" -> ((s, dir) => {
      storeD(s, dir).get(Seq("1", "7", "42", "499", "123456789"))
        .select(col("__id__"), col("label"),
          round(element_at(col("vector"), 1), 6).as("v0"))
        .orderBy(vid)
    }),

    // O7: delete by ids = anti-join (lib.rs:273-286).
    "o7_delete" -> ((s, dir) => {
      storeD(s, dir).delete((0L until 10L).map(_.toString))
        .df.filter(vid < 20)
        .select(col("__id__"), col("label"))
        .orderBy(vid)
    }),

    // O10: len / vector element count (lib.rs:306-318).
    "o10_counts" -> ((s, dir) => {
      storeD(s, dir).df
        .agg(count(lit(1)).as("n"),
          sum(size(col("vector")).cast(LongType)).as("total_elems"))
    }),

    // F1: dot product over consecutive-id pairs (lib.rs:321-344).
    "f1_dot" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir)
      val a = e.filter(col("vec_id") < 50)
        .select(col("vec_id").as("id_a"), col("embedding").as("va"))
      val b = e.select((col("vec_id") - 1).as("id_a"), col("embedding").as("vb"))
      a.join(b, "id_a")
        .select(col("id_a"),
          round(dotD(col("va"), col("vb")), 6).as("dot"),
          round(cosineD(col("va"), col("vb")), 6).as("cos"))
        .orderBy(col("id_a"))
    }),

    // F2: L2 normalize (lib.rs:347-359) — norm + first normalized element.
    "f2_normalize" -> ((s, dir) => {
      val e = Tables.embeddings(s, dir).filter(col("vec_id") < 50)
      e.select(col("vec_id"),
          round(l2normD(col("embedding")), 6).as("norm"),
          round(element_at(col("embedding"), 1).cast(DoubleType) / l2normD(col("embedding")), 6).as("v0"))
        .orderBy(col("vec_id"))
    }),

    // F3: deterministic ordering under ties — scores bucketed to 1 decimal
    // force ties, broken by id (SURVEY.md §4.2; reference leaves ties
    // unspecified, lib.rs:100).
    "f3_ties" -> ((s, dir) => {
      val st = storeD(s, dir)
      val q = VectorStore.normalizeLocal(qvec(s, dir))
      st.df
        .withColumn("bucket", round(dotD(col("vector"), array(q.map(lit): _*)), 1))
        .select(col("__id__"), col("bucket"))
        .orderBy(col("bucket").desc, vid)
        .limit(20)
    })
  )

  // ------------------------------------------------------------- oracle

  /** Shared DuckDB CTE fragments. */
  private val qCte =
    "q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)"
  private val cosExpr =
    "list_dot_product(e.embedding::DOUBLE[], q.qv) / " +
      "(sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) * " +
      "sqrt(list_dot_product(q.qv, q.qv)))"

  def oracleSql: Map[String, String] = Map(
    "o1_scan" ->
      """SELECT CAST(vec_id AS VARCHAR) AS __id__, CAST(len(embedding) AS BIGINT) AS dim, label
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    "o2_upsert_ids" ->
      """SELECT * FROM (
        |  SELECT CAST(vec_id AS VARCHAR) AS __id__, 'updated' AS op FROM embeddings WHERE vec_id < 5
        |  UNION ALL
        |  SELECT CAST(vec_id + 1000000 AS VARCHAR) AS __id__, 'inserted' AS op FROM embeddings WHERE vec_id < 5)
        |ORDER BY op, CAST(__id__ AS BIGINT)""".stripMargin,

    "o2a_upsert_state" ->
      """WITH u AS (SELECT vec_id, list_reverse(embedding::DOUBLE[]) AS v FROM embeddings WHERE vec_id < 5),
        |i AS (SELECT vec_id + 1000000 AS vec_id, embedding::DOUBLE[] AS v, label + 100 AS label
        |      FROM embeddings WHERE vec_id < 5),
        |st AS (
        |  SELECT CAST(u.vec_id AS VARCHAR) AS __id__, e.label AS label,
        |         u.v[1] / sqrt(list_dot_product(u.v, u.v)) AS v0
        |  FROM u JOIN embeddings e ON u.vec_id = e.vec_id
        |  UNION ALL
        |  SELECT CAST(vec_id AS VARCHAR), label, v[1] / sqrt(list_dot_product(v, v)) FROM i)
        |SELECT __id__, label, round(v0, 6) AS v0 FROM st ORDER BY CAST(__id__ AS BIGINT)""".stripMargin,

    "o3_topk" ->
      s"""WITH $qCte,
         |s AS (SELECT e.vec_id, e.label, $cosExpr AS sc FROM embeddings e CROSS JOIN q)
         |SELECT CAST(vec_id AS VARCHAR) AS __id__, label, round(sc, 6) AS __metrics__
         |FROM s ORDER BY sc DESC, vec_id LIMIT 10""".stripMargin,

    "o4_filter_topk" ->
      s"""WITH $qCte,
         |s AS (SELECT e.vec_id, e.label, $cosExpr AS sc FROM embeddings e CROSS JOIN q WHERE e.label = 3)
         |SELECT CAST(vec_id AS VARCHAR) AS __id__, label, round(sc, 6) AS __metrics__
         |FROM s ORDER BY sc DESC, vec_id LIMIT 5""".stripMargin,

    "o5_threshold_topk" ->
      s"""WITH $qCte,
         |s AS (SELECT e.vec_id, e.label, $cosExpr AS sc FROM embeddings e CROSS JOIN q)
         |SELECT CAST(vec_id AS VARCHAR) AS __id__, label, round(sc, 6) AS __metrics__
         |FROM s WHERE sc >= 0.2 ORDER BY sc DESC, vec_id LIMIT 100""".stripMargin,

    "o6_get" ->
      """SELECT CAST(vec_id AS VARCHAR) AS __id__, label,
        |       round(embedding[1]::DOUBLE / sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])), 6) AS v0
        |FROM embeddings WHERE vec_id IN (1, 7, 42, 499, 123456789) ORDER BY vec_id""".stripMargin,

    "o7_delete" ->
      """SELECT CAST(vec_id AS VARCHAR) AS __id__, label FROM embeddings
        |WHERE vec_id >= 10 AND vec_id < 20 ORDER BY vec_id""".stripMargin,

    "o10_counts" ->
      """SELECT count(*) AS n, CAST(sum(len(embedding)) AS BIGINT) AS total_elems FROM embeddings""",

    "f1_dot" ->
      """SELECT a.vec_id AS id_a,
        |       round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS dot,
        |       round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
        |             (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
        |              sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 6) AS cos
        |FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
        |WHERE a.vec_id < 50 ORDER BY a.vec_id""".stripMargin,

    "f2_normalize" ->
      """SELECT vec_id,
        |       round(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])), 6) AS norm,
        |       round(embedding[1]::DOUBLE / sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])), 6) AS v0
        |FROM embeddings WHERE vec_id < 50 ORDER BY vec_id""".stripMargin,

    "f3_ties" ->
      s"""WITH $qCte,
         |n AS (SELECT e.vec_id, list_transform(e.embedding::DOUBLE[],
         |        x -> x / sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))) AS nv
         |      FROM embeddings e),
         |s AS (SELECT n.vec_id,
         |        round(list_dot_product(n.nv, list_transform(q.qv, x -> x / sqrt(list_dot_product(q.qv, q.qv)))), 1) AS bucket
         |      FROM n CROSS JOIN q)
         |SELECT CAST(vec_id AS VARCHAR) AS __id__, bucket
         |FROM s ORDER BY bucket DESC, vec_id LIMIT 20""".stripMargin
  )
}
