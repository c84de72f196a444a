package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** V3 semi-structured VARIANT operators (SURVEY.md §7.5; reference
  * README.md:1127–1153): Spark 4's native VariantType — `parse_json` into
  * VARIANT, `variant_get` dot-path extraction (the `payload:action`
  * shorthand), nested paths, and aggregation over extracted fields.
  *
  * The `events.props` column carries the JSON fixtures. VARIANT stores a
  * parsed binary form, so repeated path extraction skips re-parsing — the
  * reason the tutorial moves JSON columns to VARIANT.
  */
object VariantOps {

  /** `payload:action`-style extraction through a real VARIANT value
    * (README.md:1143–1144): parse once, extract typed. */
  private val variantGet = QueryDef(
    "variant_get",
    (s, dir) =>
      Tables.events(s, dir)
        .select(col("event_id"), parse_json(col("props")).as("payload"))
        .select(
          col("event_id"),
          expr("variant_get(payload, '$.k', 'long')").as("k"))
        .orderBy("event_id"),
    Some("""SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
            FROM events ORDER BY event_id"""),
  )

  /** Nested dot-path (`payload:metadata:version` analog, README.md:1144):
    * builds a nested document around the fixture value, then extracts
    * through two levels of VARIANT path. */
  private val variantNested = QueryDef(
    "variant_nested",
    (s, dir) =>
      Tables.events(s, dir)
        .select(
          col("event_id"),
          parse_json(concat(
            lit("""{"meta":{"v":"""), get_json_object(col("props"), "$.k"),
            lit(""","tag":"evt"},"src":"events"}"""))).as("payload"))
        .select(
          col("event_id"),
          expr("variant_get(payload, '$.meta.v', 'long')").as("v"),
          expr("variant_get(payload, '$.meta.tag', 'string')").as("tag"),
          expr("variant_get(payload, '$.src', 'string')").as("src"))
        .orderBy("event_id"),
    Some("""SELECT event_id,
            CAST(json_extract_string(props, '$.k') AS BIGINT) AS v,
            'evt' AS tag, 'events' AS src
            FROM events ORDER BY event_id"""),
  )

  /** JSON_VALUE-style aggregation over an extracted VARIANT field
    * (README.md:1148–1152): group by a typed path extraction. */
  private val variantAgg = QueryDef(
    "variant_agg",
    (s, dir) =>
      Tables.events(s, dir)
        .select(
          col("event_type"),
          expr("variant_get(parse_json(props), '$.k', 'long')").as("k"))
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("cnt"),
          sum(col("k")).as("sum_k"),
          max(col("k")).as("max_k"))
        .orderBy("event_type"),
    Some("""SELECT event_type, CAST(count(*) AS BIGINT) AS cnt,
            CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
            CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
            FROM events GROUP BY event_type ORDER BY event_type"""),
  )

  /** try_parse_json on malformed input → null, valid input → extractable
    * (the safe-ingestion path for dirty data). */
  private val variantTryParse = QueryDef(
    "variant_try_parse",
    (s, dir) =>
      Tables.events(s, dir)
        .filter(col("event_id") < 100)
        .select(
          col("event_id"),
          when(col("event_id") % 3 === 0, concat(lit("not json:"), col("props")))
            .otherwise(col("props")).as("raw"))
        .select(
          col("event_id"),
          expr("variant_get(try_parse_json(raw), '$.k', 'long')").as("k"),
          expr("try_parse_json(raw) IS NULL").as("malformed"))
        .orderBy("event_id"),
    Some("""SELECT event_id,
            CASE WHEN event_id % 3 = 0 THEN NULL
                 ELSE CAST(json_extract_string(props, '$.k') AS BIGINT) END AS k,
            event_id % 3 = 0 AS malformed
            FROM events WHERE event_id < 100 ORDER BY event_id"""),
  )

  val defs: Seq[QueryDef] = Seq(variantGet, variantNested, variantAgg, variantTryParse)
}
