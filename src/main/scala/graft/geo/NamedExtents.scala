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
    "united states"  -> Extent(-171.8, -66.9, 18.9, 71.4),
    "algeria"        -> Extent(-8.7, 12.0, 18.9, 37.1),
    "bangladesh"     -> Extent(88.0, 92.7, 20.6, 26.6),
    "bolivia"        -> Extent(-69.6, -57.5, -22.9, -9.7),
    "chile"          -> Extent(-75.7, -66.4, -55.9, -17.5),
    "colombia"       -> Extent(-79.0, -66.9, -4.2, 12.5),
    "democratic republic of the congo" -> Extent(12.2, 31.3, -13.5, 5.4),
    "ecuador"        -> Extent(-81.1, -75.2, -5.0, 1.4),
    "ethiopia"       -> Extent(33.0, 48.0, 3.4, 14.9),
    "finland"        -> Extent(20.5, 31.6, 59.8, 70.1),
    "greece"         -> Extent(19.4, 28.2, 34.8, 41.8),
    "iceland"        -> Extent(-24.5, -13.5, 63.3, 66.6),
    "iran"           -> Extent(44.0, 63.3, 25.1, 39.8),
    "iraq"           -> Extent(38.8, 48.6, 29.1, 37.4),
    "ireland"        -> Extent(-10.5, -5.4, 51.4, 55.4),
    "israel"         -> Extent(34.3, 35.9, 29.5, 33.3),
    "madagascar"     -> Extent(43.2, 50.5, -25.6, -12.0),
    "malaysia"       -> Extent(99.6, 119.3, 0.9, 7.4),
    "myanmar"        -> Extent(92.2, 101.2, 9.8, 28.5),
    "nepal"          -> Extent(80.1, 88.2, 26.3, 30.4),
    "netherlands"    -> Extent(3.3, 7.2, 50.8, 53.6),
    "new zealand"    -> Extent(166.4, 178.6, -47.3, -34.4),
    "pakistan"       -> Extent(60.9, 77.8, 23.7, 37.1),
    "peru"           -> Extent(-81.3, -68.7, -18.4, -0.0),
    "philippines"    -> Extent(117.2, 126.6, 5.6, 18.5),
    "poland"         -> Extent(14.1, 24.1, 49.0, 54.8),
    "portugal"       -> Extent(-9.5, -6.2, 37.0, 42.2),
    "russia"         -> Extent(19.6, 180.0, 41.2, 81.9),
    "saudi arabia"   -> Extent(34.6, 55.7, 16.3, 32.2),
    "south africa"   -> Extent(16.5, 32.9, -34.8, -22.1),
    "south korea"    -> Extent(126.1, 129.6, 33.2, 38.6),
    "sweden"         -> Extent(11.1, 24.2, 55.3, 69.1),
    "tanzania"       -> Extent(29.3, 40.4, -11.7, -1.0),
    "thailand"       -> Extent(97.3, 105.6, 5.6, 20.5),
    "turkey"         -> Extent(25.7, 44.8, 35.8, 42.1),
    "ukraine"        -> Extent(22.1, 40.2, 44.4, 52.4),
    "vietnam"        -> Extent(102.1, 109.5, 8.6, 23.4))

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
