package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Geodesic

class GeodesicSpec extends AnyFunSuite {

  test("WGS84 inverse distance matches published geodesic values") {
    // 1 degree of latitude along a meridian from the equator (GeographicLib)
    assert(math.abs(Geodesic.inverse(0, 0, 0, 1) - 110574.389) < 0.01)
    // 1 degree of longitude along the equator
    assert(math.abs(Geodesic.inverse(0, 0, 1, 0) - 111319.491) < 0.01)
    // Vincenty's classic test line: Flinders Peak -> Buninyong (GDA94-ish)
    val d = Geodesic.inverse(144.424868, -37.951033, 143.926495, -37.652821)
    assert(math.abs(d - 54972.271) < 0.05)
    // symmetric + zero
    assert(Geodesic.inverse(10, 45, 10, 45) == 0.0)
    assert(math.abs(Geodesic.inverse(5, 5, 6, 6) -
      Geodesic.inverse(6, 6, 5, 5)) < 1e-6)
  }

  test("near-antipodal falls back without exploding") {
    val d = Geodesic.inverse(0, 0, 179.9, 0.1)
    assert(d > 19000e3 && d < 20100e3)
  }
}
