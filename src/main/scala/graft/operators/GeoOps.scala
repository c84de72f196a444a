package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.functions._

/** GEOMETRY/GEOGRAPHY gap items (SURVEY.md §7.6; reference
  * README.md:1185–1192 teases V3 geo types). Spark has no native geo type,
  * so geometries travel as WKT strings with constructor/accessor/predicate
  * helpers — the documented representation choice. Coordinates are derived
  * deterministically from keys (the fixtures carry no real geography), with
  * always-fractional values so double→string formatting agrees across
  * engines.
  */
object GeoOps {

  /** WKT roundtrip: construct POINT, parse coordinates back, bbox
    * membership predicate, euclidean distance accessor. */
  private val geoWktRoundtrip = QueryDef(
    "geo_wkt_roundtrip",
    (s, dir) => {
      val lon = (col("c_custkey") % 360 - 180).cast("double") + 0.5
      val lat = (col("c_custkey") % 170 - 85).cast("double") + 0.25
      val base = Tables.customer(s, dir)
        .select(col("c_custkey"),
          concat(lit("POINT("), lon.cast("string"), lit(" "), lat.cast("string"), lit(")"))
            .as("wkt"))
      val px = regexp_extract(col("wkt"), """POINT\(([-0-9.]+) ([-0-9.]+)\)""", 1).cast("double")
      val py = regexp_extract(col("wkt"), """POINT\(([-0-9.]+) ([-0-9.]+)\)""", 2).cast("double")
      base.select(
        col("c_custkey"), col("wkt"),
        px.as("x"), py.as("y"),
        (px >= -10 && px <= 40 && py >= 30 && py <= 60).as("in_europe_bbox"),
        round(sqrt(px * px + py * py), 4).as("dist_origin"))
        .orderBy("c_custkey")
    },
    Some("""WITH pts AS (
              SELECT c_custkey,
                     'POINT(' || CAST(CAST(c_custkey % 360 - 180 AS DOUBLE) + 0.5 AS VARCHAR)
                     || ' ' || CAST(CAST(c_custkey % 170 - 85 AS DOUBLE) + 0.25 AS VARCHAR) || ')' AS wkt
              FROM customer),
            parsed AS (
              SELECT c_custkey, wkt,
                     CAST(regexp_extract(wkt, 'POINT\(([-0-9.]+) ([-0-9.]+)\)', 1) AS DOUBLE) AS x,
                     CAST(regexp_extract(wkt, 'POINT\(([-0-9.]+) ([-0-9.]+)\)', 2) AS DOUBLE) AS y
              FROM pts)
            SELECT c_custkey, wkt, x, y,
                   x >= -10 AND x <= 40 AND y >= 30 AND y <= 60 AS in_europe_bbox,
                   round(sqrt(x*x + y*y), 4) AS dist_origin
            FROM parsed ORDER BY c_custkey"""),
  )

  /** Spatial-predicate aggregation: count points per bbox quadrant. */
  private val geoBboxAgg = QueryDef(
    "geo_bbox_agg",
    (s, dir) => {
      val lon = (col("c_custkey") % 360 - 180).cast("double") + 0.5
      val lat = (col("c_custkey") % 170 - 85).cast("double") + 0.25
      Tables.customer(s, dir)
        .select(
          when(lon >= 0, "E").otherwise("W").as("ew"),
          when(lat >= 0, "N").otherwise("S").as("ns"))
        .groupBy("ew", "ns")
        .agg(count(lit(1)).as("cnt"))
        .orderBy("ew", "ns")
    },
    Some("""SELECT CASE WHEN CAST(c_custkey % 360 - 180 AS DOUBLE) + 0.5 >= 0 THEN 'E' ELSE 'W' END AS ew,
                   CASE WHEN CAST(c_custkey % 170 - 85 AS DOUBLE) + 0.25 >= 0 THEN 'N' ELSE 'S' END AS ns,
                   CAST(count(*) AS BIGINT) AS cnt
            FROM customer GROUP BY 1, 2 ORDER BY ew, ns"""),
  )

  val defs: Seq[QueryDef] = Seq(geoWktRoundtrip, geoBboxAgg)
}
