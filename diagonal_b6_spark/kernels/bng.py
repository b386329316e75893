"""British National Grid (EPSG:27700) -> WGS84, from published formulas.

Sources (public): Ordnance Survey, "A guide to coordinate systems in
Great Britain" -- Annexe C gives the inverse Transverse Mercator series
on the Airy 1830 ellipsoid (E,N -> OSGB36 latitude/longitude) and the
7-parameter small-angle Helmert transformation between OSGB36 and
WGS84 (~3.5 m accuracy vs the definitive OSTN15 grid; the same
approximation proj/GDAL apply for EPSG:27700 when no grid file is
installed, which is what the reference's b6-ingest-gb-codepoint tool
gets from its gdal.CreateCoordinateTransform call,
cmd/b6-ingest-gb-codepoint/b6-ingest-gb-codepoint.go:122-151).

Two twin surfaces kept in lockstep:
  * `bng_to_wgs84(E, N)` -- vectorized numpy over double arrays.
  * `sql_ctes(src)` -- the SAME operation chain (identical constant
    literals, identical fixed-count iteration unrolls) emitted as a
    DuckDB CTE chain, so catalog oracles can replay the transform
    relationally.  Transcendentals may differ by a few ULPs between
    numpy's SIMD libm and DuckDB's; consumers round coordinates
    (>= 7 dp is ~1 cm, far above ULP noise).
"""

from __future__ import annotations

import numpy as np

# Airy 1830 ellipsoid + National Grid projection constants (OS guide, C.1)
AIRY_A = 6377563.396
AIRY_B = 6356256.909
F0 = 0.9996012717
PHI0_DEG = 49.0
LAM0_DEG = -2.0
E0 = 400000.0
N0 = -100000.0

# WGS84 / GRS80 ellipsoid
WGS84_A = 6378137.0
WGS84_F = 1.0 / 298.257223563

# OSGB36 -> WGS84 Helmert parameters: the OS guide publishes the
# WGS84 -> OSGB36 set (tx -446.448 m, ty +125.157 m, tz -542.060 m,
# s +20.4894 ppm, rx -0.1502", ry -0.2470", rz -0.8421"); for the
# small-parameter transformation the inverse is the sign flip.
HELMERT_TX = 446.448
HELMERT_TY = -125.157
HELMERT_TZ = 542.060
HELMERT_S = -20.4894e-6
HELMERT_RX_ARCSEC = 0.1502
HELMERT_RY_ARCSEC = 0.2470
HELMERT_RZ_ARCSEC = 0.8421

TM_ITERS = 6  # footpoint-latitude refinement (error shrinks ~170x/step)
GEO_ITERS = 8  # cartesian->geodetic refinement (error shrinks ~150x/step)

_ARCSEC = np.pi / (180.0 * 3600.0)


def _airy_e2() -> float:
    return 1.0 - (AIRY_B * AIRY_B) / (AIRY_A * AIRY_A)


def _meridional_arc(phi: np.ndarray, phi0: float) -> np.ndarray:
    """M(phi) on Airy 1830 scaled by F0 (OS guide C.3)."""
    n = (AIRY_A - AIRY_B) / (AIRY_A + AIRY_B)
    dphi = phi - phi0
    sphi = phi + phi0
    return AIRY_B * F0 * (
        (1.0 + n + 1.25 * n * n + 1.25 * n**3) * dphi
        - (3.0 * n + 3.0 * n * n + (21.0 / 8.0) * n**3) * np.sin(dphi) * np.cos(sphi)
        + ((15.0 / 8.0) * (n * n + n**3)) * np.sin(2.0 * dphi) * np.cos(2.0 * sphi)
        - (35.0 / 24.0) * n**3 * np.sin(3.0 * dphi) * np.cos(3.0 * sphi)
    )


def osgb36_from_bng(easting: np.ndarray, northing: np.ndarray):
    """Inverse Transverse Mercator: (E, N) -> OSGB36 (lat, lng) degrees."""
    E = np.asarray(easting, dtype=np.float64)
    N = np.asarray(northing, dtype=np.float64)
    e2 = _airy_e2()
    phi0 = np.radians(PHI0_DEG)
    lam0 = np.radians(LAM0_DEG)

    phi = phi0 + (N - N0) / (AIRY_A * F0)
    for _ in range(TM_ITERS):
        phi = phi + (N - N0 - _meridional_arc(phi, phi0)) / (AIRY_A * F0)

    sin_phi = np.sin(phi)
    nu = AIRY_A * F0 / np.sqrt(1.0 - e2 * sin_phi * sin_phi)
    rho = AIRY_A * F0 * (1.0 - e2) * (1.0 - e2 * sin_phi * sin_phi) ** -1.5
    eta2 = nu / rho - 1.0
    t = np.tan(phi)
    t2 = t * t
    sec = 1.0 / np.cos(phi)

    vii = t / (2.0 * rho * nu)
    viii = t / (24.0 * rho * nu**3) * (5.0 + 3.0 * t2 + eta2 - 9.0 * t2 * eta2)
    ix = t / (720.0 * rho * nu**5) * (61.0 + 90.0 * t2 + 45.0 * t2 * t2)
    x = sec / nu
    xi = sec / (6.0 * nu**3) * (nu / rho + 2.0 * t2)
    xii = sec / (120.0 * nu**5) * (5.0 + 28.0 * t2 + 24.0 * t2 * t2)
    xiia = sec / (5040.0 * nu**7) * (
        61.0 + 662.0 * t2 + 1320.0 * t2 * t2 + 720.0 * t2 * t2 * t2
    )

    de = E - E0
    lat = phi - vii * de**2 + viii * de**4 - ix * de**6
    lng = lam0 + x * de - xi * de**3 + xii * de**5 - xiia * de**7
    return np.degrees(lat), np.degrees(lng)


def bng_to_wgs84(easting: np.ndarray, northing: np.ndarray):
    """(E, N) on the National Grid -> WGS84 (lat, lng) degrees."""
    lat_deg, lng_deg = osgb36_from_bng(easting, northing)
    phi = np.radians(lat_deg)
    lam = np.radians(lng_deg)
    e2 = _airy_e2()

    # OSGB36 geodetic -> Airy cartesian (H = 0)
    sphi = np.sin(phi)
    nu = AIRY_A / np.sqrt(1.0 - e2 * sphi * sphi)
    X = nu * np.cos(phi) * np.cos(lam)
    Y = nu * np.cos(phi) * np.sin(lam)
    Z = (1.0 - e2) * nu * sphi

    # small-angle Helmert to WGS84
    rx = HELMERT_RX_ARCSEC * _ARCSEC
    ry = HELMERT_RY_ARCSEC * _ARCSEC
    rz = HELMERT_RZ_ARCSEC * _ARCSEC
    s1 = 1.0 + HELMERT_S
    Xw = HELMERT_TX + s1 * X - rz * Y + ry * Z
    Yw = HELMERT_TY + rz * X + s1 * Y - rx * Z
    Zw = HELMERT_TZ - ry * X + rx * Y + s1 * Z

    # WGS84 cartesian -> geodetic (fixed-point iteration on latitude)
    e2w = 2.0 * WGS84_F - WGS84_F * WGS84_F
    p = np.sqrt(Xw * Xw + Yw * Yw)
    lng_w = np.arctan2(Yw, Xw)
    phi_w = np.arctan2(Zw, p * (1.0 - e2w))
    for _ in range(GEO_ITERS):
        s = np.sin(phi_w)
        nu_w = WGS84_A / np.sqrt(1.0 - e2w * s * s)
        phi_w = np.arctan2(Zw + e2w * nu_w * s, p)
    return np.degrees(phi_w), np.degrees(lng_w)


# --- the same chain as DuckDB SQL -------------------------------------------


def sql_ctes(src: str) -> str:
    """CTE chain replaying bng_to_wgs84 relationally.

    `src` must be a CTE/table exposing (rid, easting DOUBLE,
    northing DOUBLE); the emitted text defines a chain ending in
    ``bng(rid, lat, lng)`` (WGS84 degrees, unrounded).  Every constant
    literal and iteration count matches the numpy twin above.
    """
    e2 = _airy_e2()
    n = (AIRY_A - AIRY_B) / (AIRY_A + AIRY_B)
    af0 = AIRY_A * F0
    phi0 = float(np.radians(PHI0_DEG))
    lam0 = float(np.radians(LAM0_DEG))

    def marc(phi: str) -> str:
        return (
            f"{AIRY_B * F0!r} * ("
            f"{1.0 + n + 1.25 * n * n + 1.25 * n**3!r} * ({phi} - {phi0!r})"
            f" - {3.0 * n + 3.0 * n * n + (21.0 / 8.0) * n**3!r}"
            f" * sin({phi} - {phi0!r}) * cos({phi} + {phi0!r})"
            f" + {(15.0 / 8.0) * (n * n + n**3)!r}"
            f" * sin(2.0 * ({phi} - {phi0!r})) * cos(2.0 * ({phi} + {phi0!r}))"
            f" - {(35.0 / 24.0) * n**3!r}"
            f" * sin(3.0 * ({phi} - {phi0!r})) * cos(3.0 * ({phi} + {phi0!r})))"
        )

    ctes = [
        f"tm0 AS (SELECT rid, easting AS e, northing AS nn,"
        f" {phi0!r} + (northing - {N0!r}) / {af0!r} AS phi FROM {src})"
    ]
    for k in range(TM_ITERS):
        ctes.append(
            f"tm{k + 1} AS (SELECT rid, e, nn,"
            f" phi + (nn - {N0!r} - {marc('phi')}) / {af0!r} AS phi FROM tm{k})"
        )
    last = f"tm{TM_ITERS}"
    ctes.append(
        f"""tmv AS (
  SELECT rid, e, phi,
         {af0!r} / sqrt(1.0 - {e2!r} * sin(phi) * sin(phi)) AS nu,
         {af0 * (1.0 - e2)!r} * power(1.0 - {e2!r} * sin(phi) * sin(phi), -1.5) AS rho,
         tan(phi) AS t, 1.0 / cos(phi) AS sec
  FROM {last}
)""".strip()
    )
    ctes.append(
        f"""osgb AS (
  SELECT rid,
    phi - (t / (2.0 * rho * nu)) * power(e - {E0!r}, 2)
        + (t / (24.0 * rho * power(nu, 3)) * (5.0 + 3.0 * t * t + (nu / rho - 1.0) - 9.0 * t * t * (nu / rho - 1.0))) * power(e - {E0!r}, 4)
        - (t / (720.0 * rho * power(nu, 5)) * (61.0 + 90.0 * t * t + 45.0 * t * t * t * t)) * power(e - {E0!r}, 6) AS phi,
    {lam0!r} + (sec / nu) * (e - {E0!r})
        - (sec / (6.0 * power(nu, 3)) * (nu / rho + 2.0 * t * t)) * power(e - {E0!r}, 3)
        + (sec / (120.0 * power(nu, 5)) * (5.0 + 28.0 * t * t + 24.0 * t * t * t * t)) * power(e - {E0!r}, 5)
        - (sec / (5040.0 * power(nu, 7)) * (61.0 + 662.0 * t * t + 1320.0 * t * t * t * t + 720.0 * t * t * t * t * t * t)) * power(e - {E0!r}, 7) AS lam
  FROM tmv
)""".strip()
    )
    rx = HELMERT_RX_ARCSEC * _ARCSEC
    ry = HELMERT_RY_ARCSEC * _ARCSEC
    rz = HELMERT_RZ_ARCSEC * _ARCSEC
    s1 = 1.0 + HELMERT_S
    ctes.append(
        f"""cart AS (
  SELECT rid,
    ({AIRY_A!r} / sqrt(1.0 - {e2!r} * sin(phi) * sin(phi))) * cos(phi) * cos(lam) AS x,
    ({AIRY_A!r} / sqrt(1.0 - {e2!r} * sin(phi) * sin(phi))) * cos(phi) * sin(lam) AS y,
    {1.0 - e2!r} * ({AIRY_A!r} / sqrt(1.0 - {e2!r} * sin(phi) * sin(phi))) * sin(phi) AS z
  FROM osgb
)""".strip()
    )
    ctes.append(
        f"""helm AS (
  SELECT rid,
    {HELMERT_TX!r} + {s1!r} * x - {rz!r} * y + {ry!r} * z AS x,
    {HELMERT_TY!r} + {rz!r} * x + {s1!r} * y - {rx!r} * z AS y,
    {HELMERT_TZ!r} - {ry!r} * x + {rx!r} * y + {s1!r} * z AS z
  FROM cart
)""".strip()
    )
    e2w = 2.0 * WGS84_F - WGS84_F * WGS84_F
    ctes.append(
        f"geo0 AS (SELECT rid, x, y, z, sqrt(x * x + y * y) AS p,"
        f" atan2(z, sqrt(x * x + y * y) * {1.0 - e2w!r}) AS phi FROM helm)"
    )
    for k in range(GEO_ITERS):
        nu_w = f"({WGS84_A!r} / sqrt(1.0 - {e2w!r} * sin(phi) * sin(phi)))"
        ctes.append(
            f"geo{k + 1} AS (SELECT rid, x, y, z, p,"
            f" atan2(z + {e2w!r} * {nu_w} * sin(phi), p) AS phi FROM geo{k})"
        )
    ctes.append(
        f"bng AS (SELECT rid, degrees(phi) AS lat, degrees(atan2(y, x)) AS lng"
        f" FROM geo{GEO_ITERS})"
    )
    return ",\n".join(ctes)
