package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Solar
import graft.sources.Tables

/** Driver contract — see SURVEY.md §7.
  *
  * Every query is a pure function (SparkSession, sfDir) => DataFrame whose
  * column names match its DuckDB oracle exactly (the driver sorts columns by
  * name before hashing). Double-typed outputs are rounded (4 decimals, or 1
  * where the reference itself rounds) in BOTH engines so that
  * summation-order nondeterminism in parallel sums can't flip the hash.
  */
object SparkEntry {

  /** Round a double output column to 4 decimals, keeping its name. */
  private def r4(name: String) = round(col(name), 4).as(name)

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q08_flagship_anomalies")(spark, "/root/testdata/sf0.001")

  // ---------------------------------------------------------------------
  // Solar pipeline stages (SURVEY.md §2 rows 1-16) over the events table,
  // mapped per FIXTURES.md §2: panel=event_type, module=user_id, power=value.
  // ---------------------------------------------------------------------

  private val moduleOut = Seq(col("w_start"), col("panel"), col("module"),
    col("m_cnt"), r4("m_sum_power"), col("m_avg_power"))
  private val panelFinalOut = Seq(col("p_cnt"), r4("p_sum_power"),
    col("p_avg_power"), r4("squares_sum"), r4("variance"), col("deviance"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // rows 1-3: parquet scan + projection + filter (pushdown-friendly)
    "q01_scan_project" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(col("event_id"), col("event_type").as("panel"),
          col("user_id").cast("string").as("module"), col("value").as("power"))
        .filter(col("power") > 50.0)),

    // rows 5-7: groupBy + tumbling window + count/sum/round(avg,1)
    "q02_module_window_agg" -> ((s, dir) =>
      Solar.moduleAgg(Tables.events(s, dir)).select(moduleOut: _*)),

    // rows 10-11: window-preserving re-key + per-panel aggregate
    "q03_panel_agg" -> ((s, dir) =>
      Solar.panelAgg(Solar.moduleAgg(Tables.events(s, dir)))
        .select(col("w_start"), col("panel"), col("p_cnt"),
          r4("p_sum_power"), col("p_avg_power"))),

    // row 12: windowed inner join #1 (panel-agg broadcast onto module-agg)
    "q04_join_panel_module" -> ((s, dir) => {
      val st = Solar.stages(Tables.events(s, dir))
      Solar.joinPanelModule(st.module, st.panel)
        .select(moduleOut ++ Seq(col("p_cnt"), r4("p_sum_power"), col("p_avg_power")): _*)
    }),

    // row 13: rounded-mean variance / deviance re-aggregation (SURVEY §2.12)
    "q05_variance_deviance" -> ((s, dir) =>
      Solar.stages(Tables.events(s, dir)).panelStats
        .select(Seq(col("w_start"), col("panel")) ++ panelFinalOut: _*)),

    // row 14: windowed inner join #2 (module-agg ⋈ final panel stats)
    "q06_join_module_panel" -> ((s, dir) =>
      Solar.stages(Tables.events(s, dir)).joined
        .select(moduleOut ++ panelFinalOut: _*)),

    // rows 15-16: z-score anomaly predicate + window-unwrap projection
    "q07_anomaly_filter" -> ((s, dir) =>
      Solar.anomalies(Solar.stages(Tables.events(s, dir)).joined)
        .select(col("w_start"), col("panel"), col("module"),
          round(abs(col("m_sum_power") - col("p_avg_power")), 4).as("abs_diff"),
          col("deviance"))),

    // full topology: events → anomalies (batch twin of SolarConsumer.java)
    "q08_flagship_anomalies" -> ((s, dir) =>
      Solar.pipeline(Tables.events(s, dir)).select(moduleOut ++ panelFinalOut: _*)),

    // rows 2 + 17: JSON decode (from_json) / encode (to_json) round-trip
    "q09_json_roundtrip" -> ((s, dir) =>
      Tables.events(s, dir)
        .select(col("event_id"),
          from_json(col("props"), StructType(Seq(StructField("k", LongType))))
            .getField("k").as("k"))
        .withColumn("props_json", to_json(struct(col("k"))))),
  )

  // ---------------------------------------------------------------------
  // DuckDB oracles — same math, same names, same rounding.
  // ---------------------------------------------------------------------

  /** Shared CTE chain mirroring [[Solar]] stage for stage. */
  private val solarCtes: String =
    """WITH module_agg AS (
      |  SELECT CAST(floor(epoch(ts)/30)*30 AS BIGINT) AS w_start,
      |         event_type AS panel, CAST(user_id AS VARCHAR) AS module,
      |         count(*) AS m_cnt, sum(value) AS m_sum_power,
      |         round(avg(value), 1) AS m_avg_power
      |  FROM events GROUP BY 1, 2, 3),
      |panel_agg AS (
      |  SELECT w_start, panel, count(*) AS p_cnt,
      |         sum(m_sum_power) AS p_sum_power,
      |         round(avg(m_sum_power), 1) AS p_avg_power
      |  FROM module_agg GROUP BY 1, 2),
      |j1 AS (
      |  SELECT m.w_start, m.panel, m.module, m.m_cnt, m.m_sum_power,
      |         m.m_avg_power, p.p_cnt, p.p_sum_power, p.p_avg_power
      |  FROM module_agg m JOIN panel_agg p
      |    ON m.w_start = p.w_start AND m.panel = p.panel),
      |panel_final AS (
      |  SELECT w_start, panel, count(*) AS p_cnt,
      |         max(p_sum_power) AS p_sum_power, max(p_avg_power) AS p_avg_power,
      |         sum(pow(m_sum_power - p_avg_power, 2)) AS squares_sum
      |  FROM j1 GROUP BY 1, 2),
      |panel_final2 AS (
      |  SELECT *, squares_sum / p_cnt AS variance,
      |         round(sqrt(squares_sum / p_cnt), 1) AS deviance
      |  FROM panel_final),
      |j2 AS (
      |  SELECT m.w_start, m.panel, m.module, m.m_cnt, m.m_sum_power,
      |         m.m_avg_power, p.p_cnt, p.p_sum_power, p.p_avg_power,
      |         p.squares_sum, p.variance, p.deviance
      |  FROM module_agg m JOIN panel_final2 p
      |    ON m.w_start = p.w_start AND m.panel = p.panel)
      |""".stripMargin

  private val moduleOutSql =
    "w_start, panel, module, m_cnt, round(m_sum_power, 4) AS m_sum_power, m_avg_power"
  private val panelFinalOutSql =
    "p_cnt, round(p_sum_power, 4) AS p_sum_power, p_avg_power, " +
      "round(squares_sum, 4) AS squares_sum, round(variance, 4) AS variance, deviance"

  def oracleSql: Map[String, String] = Map(
    "q01_scan_project" ->
      """SELECT event_id, event_type AS panel, CAST(user_id AS VARCHAR) AS module,
        |       value AS power
        |FROM events WHERE value > 50.0""".stripMargin,

    "q02_module_window_agg" ->
      (solarCtes + s"SELECT $moduleOutSql FROM module_agg"),

    "q03_panel_agg" ->
      (solarCtes + "SELECT w_start, panel, p_cnt, round(p_sum_power, 4) AS p_sum_power, " +
        "p_avg_power FROM panel_agg"),

    "q04_join_panel_module" ->
      (solarCtes + s"SELECT $moduleOutSql, p_cnt, round(p_sum_power, 4) AS p_sum_power, " +
        "p_avg_power FROM j1"),

    "q05_variance_deviance" ->
      (solarCtes + s"SELECT w_start, panel, $panelFinalOutSql FROM panel_final2"),

    "q06_join_module_panel" ->
      (solarCtes + s"SELECT $moduleOutSql, $panelFinalOutSql FROM j2"),

    "q07_anomaly_filter" ->
      (solarCtes + """SELECT w_start, panel, module,
        |       round(abs(m_sum_power - p_avg_power), 4) AS abs_diff, deviance
        |FROM j2 WHERE abs(m_sum_power - p_avg_power) > 1.0 * deviance""".stripMargin),

    "q08_flagship_anomalies" ->
      (solarCtes + s"SELECT $moduleOutSql, $panelFinalOutSql FROM j2 " +
        "WHERE abs(m_sum_power - p_avg_power) > 1.0 * deviance"),

    "q09_json_roundtrip" ->
      """SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k,
        |       '{"k":' || CAST(json_extract(props, '$.k') AS BIGINT) || '}' AS props_json
        |FROM events""".stripMargin,
  )
}
