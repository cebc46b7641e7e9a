package graft.geo

import graft.partitioning.Extent

/** Bundled name → bounding-box lookups for country/continent queries
  * (reference get_country_extent / get_continent_extent resolve names
  * against Natural-Earth-derived tables bundled in gpm-api;
  * satbucket/partitioning.py:1154-1162, readers.py:247-267).
  *
  * Boxes below are coarse WGS84 bounds compiled from public Natural Earth
  * admin-0 data; pruning correctness only needs them to *cover* the region —
  * row-level refinement decides final membership.
  */
object NamedExtents {

  val continents: Map[String, Extent] = Map(
    "africa"        -> Extent(-17.6, 51.4, -34.8, 37.3),
    "antarctica"    -> Extent(-180, 180, -90, -60.5),
    "asia"          -> Extent(26.0, 180.0, -10.9, 81.9),
    "europe"        -> Extent(-31.3, 69.0, 34.8, 81.9),
    "north america" -> Extent(-168.1, -52.6, 7.2, 83.6),
    "oceania"       -> Extent(112.9, 180.0, -47.3, 20.0),
    "south america" -> Extent(-81.4, -34.8, -55.9, 12.5))

  val countries: Map[String, Extent] = Map(
    "argentina"      -> Extent(-73.6, -53.6, -55.1, -21.8),
    "australia"      -> Extent(112.9, 153.6, -43.6, -10.6),
    "brazil"         -> Extent(-73.9, -34.8, -33.8, 5.3),
    "canada"         -> Extent(-141.0, -52.6, 41.7, 83.1),
    "china"          -> Extent(73.6, 134.8, 18.2, 53.6),
    "egypt"          -> Extent(24.7, 36.9, 22.0, 31.7),
    "france"         -> Extent(-5.1, 9.6, 41.3, 51.1),
    "germany"        -> Extent(5.9, 15.0, 47.3, 55.1),
    "india"          -> Extent(68.2, 97.4, 6.7, 35.5),
    "indonesia"      -> Extent(95.0, 141.0, -11.0, 6.1),
    "italy"          -> Extent(6.6, 18.5, 35.5, 47.1),
    "japan"          -> Extent(122.9, 145.8, 24.0, 45.5),
    "kenya"          -> Extent(33.9, 41.9, -4.7, 5.5),
    "mexico"         -> Extent(-117.1, -86.7, 14.5, 32.7),
    "mozambique"     -> Extent(30.2, 40.8, -26.9, -10.5),
    "nigeria"        -> Extent(2.7, 14.7, 4.3, 13.9),
    "norway"         -> Extent(4.6, 31.1, 58.0, 71.2),
    "spain"          -> Extent(-9.3, 4.3, 35.9, 43.8),
    "switzerland"    -> Extent(6.0, 10.5, 45.8, 47.8),
    "united kingdom" -> Extent(-8.6, 1.8, 49.9, 60.9),
    "united states"  -> Extent(-171.8, -66.9, 18.9, 71.4))

  def country(name: String, padding: Double = 0.0): Extent =
    lookup(countries, name, "country", padding)

  def continent(name: String, padding: Double = 0.0): Extent =
    lookup(continents, name, "continent", padding)

  private def lookup(table: Map[String, Extent], name: String,
                     kind: String, padding: Double): Extent = {
    val e = table.getOrElse(name.trim.toLowerCase,
      throw new IllegalArgumentException(
        s"unknown $kind '$name'; known: ${table.keys.toSeq.sorted.mkString(", ")}"))
    Extent(
      math.max(e.xmin - padding, -180), math.min(e.xmax + padding, 180),
      math.max(e.ymin - padding, -90), math.min(e.ymax + padding, 90))
  }
}
