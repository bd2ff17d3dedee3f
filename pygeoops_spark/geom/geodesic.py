"""Exact ellipsoidal geodesic polygon area (Bessel auxiliary sphere,
numerically evaluated — no truncated series).

Parity target: the reference's geographic-CRS ring area
(/root/reference/pygeoops/_general.py:530-537) delegates to
pyproj ``Geod.geometry_area_perimeter`` (Karney's ellipsoidal area).
This module re-derives the same quantity from first principles instead
of porting GeographicLib's 6th-order series:

* The area element of an oblate ellipsoid integrates in closed form
  over latitude: the "zone function"

      Z(phi) = (a^2 (1-e^2) / 2) *
               [ sin(phi) / (1 - e^2 sin^2 phi) + atanh(e sin phi)/e ]

  is the area between the equator and latitude phi per radian of
  longitude (d/dphi Z = a^2 (1-e^2) cos phi / (1-e^2 sin^2 phi)^2, the
  exact area element; total ellipsoid area T = 4 pi Z(pi/2), the
  textbook oblate-spheroid surface formula).

* By Green's theorem, the area of a region bounded by geodesic edges
  is  A = -oint Z(phi) dlambda + |w| T/2, where w is the winding
  number of the boundary around the poles (w = 0 for rings that do
  not enclose a pole; the smaller-side convention below folds the
  enclosing cases).

* Along one geodesic edge, Bessel's classical auxiliary-sphere
  relations (reduced latitude tan(beta) = (1-f) tan(phi), Clairaut
  constant sin(alpha0) = sin(alpha) cos(beta), arc parameter sigma
  with sin(beta) = cos(alpha0) sin(sigma)) give the exact ODEs

      dlambda/dsigma = sin(alpha0) (1-f) sqrt(1 + k^2 sin^2 sigma)
                       / (1 - cos^2 alpha0 sin^2 sigma),
      k^2 = e'^2 cos^2 alpha0,

  so  S_edge = int Z(phi(sigma)) (dlambda/dsigma) dsigma  is a smooth
  1-D integral evaluated with composite Gauss-Legendre to ~1e-15
  relative.  The azimuths come from a Vincenty-style fixed-point
  iteration on the auxiliary sphere where the longitude defect
  lambda - omega is the exact integral of
  [(1-f) sqrt(1 + k^2 sin^2 sigma) - 1] / (1 - cos^2 alpha0
  sin^2 sigma)  (again Gauss-Legendre), rather than a truncated
  series.

Accuracy: all formulas above are exact; the only error is quadrature
(composite GL-12 x 8 panels, ~1e-15 relative for edges that stay away
from the poles) and inverse-iteration convergence (~f per iteration).
Edges passing within ~1e-4 rad of a pole are re-evaluated with an
adaptive Simpson fallback that resolves the near-polar peak of
1/(1 - cos^2 alpha0 sin^2 sigma).  NEAR-ANTIPODAL edges — where the
fixed point is known to oscillate because the shortest geodesic turns
near-meridional over a pole — are detected by the iteration residual
and solved exactly by SHOOTING the geodesic ODE on the departure
azimuth (_edge_area_shoot: bracket + bisect + fine secant polish,
in-step crossing refinement; ~1e-11 relative, a few seconds per such
edge — they are pathological ~20,000 km ring edges).  Tests validate
against an independent exact geodesic ODE integrator (RK4 on the
textbook meridional/normal curvature-radius equations), against the
exact closed forms for pole wedges and hemispheres, and against
split-through-the-true-geodesic consistency for the antipodal case.

Vertices exactly at a pole are handled like the covering-space Green
contour: the incoming and outgoing meridian edges carry their
neighbours' longitudes and the polar "phantom" segment contributes
Z(+-pi/2) * dlambda.
"""

from __future__ import annotations

import math

import numpy as np

WGS84_A = 6378137.0
WGS84_F = 1.0 / 298.257223563

_GL_X, _GL_W = np.polynomial.legendre.leggauss(12)
_N_PANELS = 8
# flattened composite nodes/weights over [0, 1]
_FRAC = np.concatenate(
    [(p + (_GL_X + 1.0) / 2.0) / _N_PANELS for p in range(_N_PANELS)]
)
_FRAC_W = np.concatenate([_GL_W / (2.0 * _N_PANELS) for _ in range(_N_PANELS)])
# lighter grid for the longitude-defect integral inside the inverse
# iteration: the defect is O(f) and only needs ~1e-12 rad absolute, so
# GL-8 x 4 panels is ample and runs ~3x cheaper per iteration
_GL8_X, _GL8_W = np.polynomial.legendre.leggauss(8)
_FRAC_DEF = np.concatenate([(p + (_GL8_X + 1.0) / 2.0) / 4.0 for p in range(4)])
_FRAC_DEF_W = np.concatenate([_GL8_W / 8.0 for _ in range(4)])


def zone_area(sinphi, a: float = WGS84_A, f: float = WGS84_F):
    """Z(phi): area between equator and phi per radian of longitude."""
    e2 = f * (2.0 - f)
    s = np.asarray(sinphi, dtype=float)
    if e2 < 1e-14:
        return a * a * s
    e = math.sqrt(e2)
    return (a * a * (1.0 - e2) / 2.0) * (
        s / (1.0 - e2 * s * s) + np.arctanh(e * s) / e
    )


def ellipsoid_area(a: float = WGS84_A, f: float = WGS84_F) -> float:
    """Total surface area T = 4 pi Z(pi/2)."""
    return 4.0 * math.pi * float(zone_area(1.0, a, f))


def _reduced_lat(phi: np.ndarray, f: float) -> np.ndarray:
    """beta = atan((1-f) tan(phi)), pole-safe."""
    return np.arctan2((1.0 - f) * np.sin(phi), np.cos(phi))


def _lambda_defect_integrand(sig, sina0, cosa0_sq, f):
    """[(1-f) sqrt(1+k^2 sin^2 s) - 1] / (1 - cos^2(a0) sin^2 s)."""
    e2 = f * (2.0 - f)
    ep2 = e2 / (1.0 - e2)
    sin2 = np.sin(sig) ** 2
    k2 = ep2 * cosa0_sq
    # denominator clamp: exact-meridian edges (sin a0 = 0) hit 0/0 at
    # sigma = pi/2; their contribution is multiplied by sin(a0) = 0
    # anyway, so any finite value is correct
    den = np.maximum(1.0 - cosa0_sq * sin2, 1e-30)
    return ((1.0 - f) * np.sqrt(1.0 + k2 * sin2) - 1.0) / den


def _area_integrand(sig, sina0, cosa0_sq, a, f):
    """Z(phi(sigma)) * dlambda/dsigma along the geodesic."""
    e2 = f * (2.0 - f)
    ep2 = e2 / (1.0 - e2) if e2 < 1.0 else 0.0
    sin_s = np.sin(sig)
    sin2 = sin_s * sin_s
    k2 = ep2 * cosa0_sq
    sinbeta = np.sqrt(cosa0_sq) * sin_s
    # sin(phi) from sin(beta): sin^2 phi = sin^2 beta / (1 - e^2 cos^2 beta)
    sinphi = sinbeta / np.sqrt(1.0 - e2 * (1.0 - sinbeta * sinbeta))
    den = np.maximum(1.0 - cosa0_sq * sin2, 1e-30)  # see _lambda_defect_integrand
    dlam_dsig = sina0 * (1.0 - f) * np.sqrt(1.0 + k2 * sin2) / den
    return zone_area(sinphi, a, f) * dlam_dsig


def _adaptive_simpson(fun, lo, hi, tol, depth=30):
    def simp(x0, x2, f0, f1, f2):
        return (x2 - x0) / 6.0 * (f0 + 4.0 * f1 + f2)

    def rec(x0, x2, f0, f1, f2, whole, d):
        xm = 0.5 * (x0 + x2)
        xl, xr = 0.5 * (x0 + xm), 0.5 * (xm + x2)
        fl, fr = fun(xl), fun(xr)
        left = simp(x0, xm, f0, fl, f1)
        right = simp(xm, x2, f1, fr, f2)
        if d <= 0 or abs(left + right - whole) < 15.0 * tol:
            return left + right + (left + right - whole) / 15.0
        return rec(x0, xm, f0, fl, f1, left, d - 1) + rec(
            xm, x2, f1, fr, f2, right, d - 1
        )

    mid = 0.5 * (lo + hi)
    f0, f1, f2 = fun(lo), fun(mid), fun(hi)
    return rec(lo, hi, f0, f1, f2, simp(lo, hi, f0, f1, f2), depth)


def _solve_edges(beta1, beta2, L, f):
    """Vectorized inverse solve on the auxiliary sphere.

    Returns (sina0, cosa0_sq, sig1, sigd, degenerate_mask, residual).
    Iterates the exact longitude-defect relation
    Lambda = L - sin(alpha0) * I to convergence (Vincenty's fixed
    point with the exact integrand).  The per-edge residual is the
    final |Lambda_new - Lambda|: the fixed point is known to oscillate
    without converging for near-antipodal endpoints (|L| within ~0.5
    deg of pi), where the true geodesic is near-meridional over a
    pole; callers must route edges with residual > ~1e-9 to the exact
    ODE-shooting fallback (_edge_area_shoot) instead of trusting the
    returned parameters.
    """
    sinb1, cosb1 = np.sin(beta1), np.cos(beta1)
    sinb2, cosb2 = np.sin(beta2), np.cos(beta2)
    lam = L.copy()
    sina0 = np.zeros_like(L)
    cosa0_sq = np.ones_like(L)
    sig1 = np.zeros_like(L)
    sigd = np.zeros_like(L)
    degen = np.zeros(len(L), dtype=bool)
    resid = np.zeros_like(L)
    for _ in range(30):
        sinl, cosl = np.sin(lam), np.cos(lam)
        n1 = cosb2 * sinl
        n2 = cosb1 * sinb2 - sinb1 * cosb2 * cosl
        sinsig = np.hypot(n1, n2)
        cossig = sinb1 * sinb2 + cosb1 * cosb2 * cosl
        degen = sinsig < 1e-15
        sigd = np.arctan2(sinsig, cossig)
        alpha1 = np.arctan2(n1, n2)
        sina0 = np.sin(alpha1) * cosb1
        cosa0_sq = np.clip(1.0 - sina0 * sina0, 0.0, 1.0)
        sig1 = np.arctan2(sinb1, cosb1 * np.cos(alpha1))
        # exact longitude defect integral per edge (composite GL)
        nodes = sig1[:, None] + sigd[:, None] * _FRAC_DEF[None, :]
        g = _lambda_defect_integrand(
            nodes, sina0[:, None], cosa0_sq[:, None], f
        )
        defect = sigd * (g * _FRAC_DEF_W[None, :]).sum(axis=1)
        lam_new = np.where(degen, lam, L - sina0 * defect)
        resid = np.abs(lam_new - lam)
        if np.max(resid) < 1e-15:
            lam = lam_new
            break
        lam = lam_new
    return sina0, cosa0_sq, sig1, sigd, degen, resid


def _edge_polar_flag(sina0, cosa0_sq, sig1, sigd):
    """Edges whose sigma-span strictly contains sigma = pi/2 (mod pi)
    while sin^2(alpha0) is small: the 1/(1 - cos^2 a0 sin^2 s) peak
    needs adaptive quadrature.  Exact meridians (|sin a0| < 1e-15,
    i.e. a geodesic passing within ~1e-9 m of the pole) are excluded —
    they run through the pole and contribute exactly zero."""
    s2 = sina0 * sina0
    peaky = (s2 < 1e-3) & (np.abs(sina0) >= 1e-15)
    lo, hi = sig1, sig1 + sigd
    # nearest odd multiple of pi/2 at or above lo
    kk = np.ceil((lo - math.pi / 2.0) / math.pi)
    peak = math.pi / 2.0 + kk * math.pi
    return peaky & (peak > lo + 1e-12) & (peak < hi - 1e-12) & (sigd > 1e-12)


def _rk4_geodesic_vec(phi, lam, alpha, h, a, f):
    """One vectorized RK4 step of the exact geodesic ODEs in arc
    length (dphi/ds = cos a / M, dlam/ds = sin a / (N cos phi),
    da/ds = sin a tan phi / N) over candidate-azimuth state arrays."""
    e2 = f * (2.0 - f)

    def deriv(p, al):
        s2 = np.sin(p) ** 2
        w = np.sqrt(1.0 - e2 * s2)
        M = a * (1.0 - e2) / w**3
        N = a / w
        return (
            np.cos(al) / M,
            np.sin(al) / (N * np.cos(p)),
            np.sin(al) * np.tan(p) / N,
        )

    k1p, k1l, k1a = deriv(phi, alpha)
    k2p, k2l, k2a = deriv(phi + 0.5 * h * k1p, alpha + 0.5 * h * k1a)
    k3p, k3l, k3a = deriv(phi + 0.5 * h * k2p, alpha + 0.5 * h * k2a)
    k4p, k4l, k4a = deriv(phi + h * k3p, alpha + h * k3a)
    return (
        phi + (h / 6.0) * (k1p + 2 * k2p + 2 * k3p + k4p),
        lam + (h / 6.0) * (k1l + 2 * k2l + 2 * k3l + k4l),
        alpha + (h / 6.0) * (k1a + 2 * k2a + 2 * k3a + k4a),
    )


def _shoot_crossing(phi1, alphas, L, a, f, n_steps, refine=True):
    """Integrate the geodesic ODE from latitude phi1 (longitude
    measured relative to the start) for each candidate
    departure azimuth until the accumulated longitude reaches L
    (lambda is strictly monotone along a non-meridian geodesic by
    Clairaut).  Returns (phi_at_crossing, s_at_crossing) arrays with
    nan where no crossing happened within the length budget."""
    m = len(alphas)
    phi = np.full(m, phi1)
    lam = np.zeros(m)
    alpha = alphas.copy()
    cross_phi = np.full(m, np.nan)
    cross_s = np.full(m, np.nan)
    live = np.ones(m, dtype=bool)
    s_max = math.pi * a * 1.02  # just over half the circumference
    h = s_max / n_steps
    target = abs(L)
    sgn = 1.0 if L >= 0 else -1.0
    s = 0.0
    for _ in range(n_steps):
        if not live.any():
            break
        p2, l2, a2 = _rk4_geodesic_vec(phi, lam, alpha, h, a, f)
        crossed = live & (sgn * l2 >= target)
        if crossed.any() and not refine:
            # coarse/bracketing use: linear interpolation is plenty
            t = (target - sgn * lam[crossed]) / (
                sgn * (l2[crossed] - lam[crossed])
            )
            cross_phi[crossed] = phi[crossed] + t * (p2[crossed] - phi[crossed])
            cross_s[crossed] = s + t * h
            live &= ~crossed
        elif crossed.any():
            # refine the crossing INSIDE the step by bisection on the
            # partial-step size (a single RK4 partial step has error
            # (t h)^5 — linear interpolation's h^2 curvature error
            # would floor the landing accuracy at ~1e-7 rad)
            for i in np.nonzero(crossed)[0]:
                lo_t, hi_t = 0.0, 1.0
                ph = np.array([phi[i]])
                lm = np.array([lam[i]])
                al = np.array([alpha[i]])
                pt, lt = float(ph[0]), float(lm[0])
                for _b in range(40):
                    mid_t = 0.5 * (lo_t + hi_t)
                    pm, lm2, _am = _rk4_geodesic_vec(ph, lm, al, mid_t * h, a, f)
                    if sgn * float(lm2[0]) >= target:
                        hi_t = mid_t
                        pt, lt = float(pm[0]), float(lm2[0])
                    else:
                        lo_t = mid_t
                cross_phi[i] = pt
                cross_s[i] = s + hi_t * h
            live &= ~crossed
        # freeze finished candidates, and any that blew past a pole
        bad = live & (np.abs(p2) > math.pi / 2 - 1e-12)
        live &= ~bad
        upd = live
        phi = np.where(upd, p2, phi)
        lam = np.where(upd, l2, lam)
        alpha = np.where(upd, a2, alpha)
        s += h
    return cross_phi, cross_s


def _edge_area_shoot(
    phi1: float,
    phi2: float,
    L: float,
    a: float,
    f: float,
    n_steps: int = 4096,
) -> float:
    """Exact fallback for edges where the auxiliary-sphere fixed point
    does not converge (near-antipodal endpoints, where the shortest
    geodesic is near-meridional over a pole).  Solves the inverse
    problem by SHOOTING the exact geodesic ODE on the departure
    azimuth — bracketing sign changes of phi(at longitude L) - phi2
    over an azimuth grid, bisecting, and picking the shortest
    crossing — then Simpson-integrates Z(phi) dlambda along the
    converged path.  Self-validating: raises if no azimuth lands on
    the target vertex."""
    sgn = 1.0 if L >= 0 else -1.0
    # bracket on a coarse integrator (RK4 at ~40 km steps is already
    # ~1e-9 rad accurate — bracketing and bisection need far less),
    # integrate the chosen root at full resolution
    n_coarse = max(n_steps // 8, 256)
    grid = sgn * np.linspace(1e-6, math.pi - 1e-6, 97)
    gphi, gs = _shoot_crossing(phi1, grid, L, a, f, n_coarse, refine=False)
    g = gphi - phi2
    roots = []
    for i in range(len(grid) - 1):
        if np.isnan(g[i]) or np.isnan(g[i + 1]) or g[i] * g[i + 1] > 0:
            continue
        lo, hi = grid[i], grid[i + 1]
        glo = g[i]
        # bisection only needs to land inside the fine secant's basin
        for _ in range(20):
            mid = 0.5 * (lo + hi)
            mphi, ms = _shoot_crossing(
                phi1, np.array([mid]), L, a, f, n_coarse, refine=False
            )
            gm = float(mphi[0]) - phi2
            if math.isnan(gm):
                break
            if glo * gm <= 0:
                hi = mid
            else:
                lo, glo = mid, gm
        alpha = 0.5 * (lo + hi)
        _p, s_cross = _shoot_crossing(
            phi1, np.array([alpha]), L, a, f, n_steps
        )
        if not math.isnan(float(s_cross[0])):
            roots.append((float(s_cross[0]), float(alpha)))
    if not roots:
        raise ValueError(
            "geodesic edge inverse failed: near-antipodal endpoints with "
            "no shooting bracket; densify the ring"
        )
    s_cross, alpha1 = min(roots)  # shortest geodesic

    # polish the azimuth on the FULL-resolution integrator: the
    # coarse-model root lands ~1e-7 rad off at fine resolution, and
    # the area error is landing-offset x edge-length; secant brings
    # the landing to ~1e-12 rad in 2-3 steps
    def _g_fine(al):
        p, sc = _shoot_crossing(phi1, np.array([al]), L, a, f, n_steps)
        return float(p[0]) - phi2, float(sc[0])

    g0, s_cross = _g_fine(alpha1)
    da = 1e-8
    for _ in range(4):
        if abs(g0) < 1e-12:
            break
        g1, _sc = _g_fine(alpha1 + da)
        deriv = (g1 - g0) / da
        if deriv == 0 or math.isnan(deriv):
            break
        alpha1 -= g0 / deriv
        g0, s_cross = _g_fine(alpha1)

    # final pass: uniform steps ending exactly at the crossing, with
    # Simpson over Z(phi) * dlambda/ds (needs even step count)
    n = n_steps if n_steps % 2 == 0 else n_steps + 1
    h = s_cross / n
    e2 = f * (2.0 - f)
    phi = np.array([phi1])
    lam = np.array([0.0])
    alpha = np.array([alpha1])
    vals = []
    phis = [phi1]

    def integrand(p, al):
        w = math.sqrt(1.0 - e2 * math.sin(p) ** 2)
        dlam_ds = math.sin(al) / ((a / w) * math.cos(p))
        return float(zone_area(math.sin(p), a, f)) * dlam_ds

    vals.append(integrand(float(phi[0]), float(alpha[0])))
    for _ in range(n):
        phi, lam, alpha = _rk4_geodesic_vec(phi, lam, alpha, h, a, f)
        vals.append(integrand(float(phi[0]), float(alpha[0])))
        phis.append(float(phi[0]))
    # landing check: the path must end on the target vertex
    end_err = math.hypot(float(phi[0]) - phi2, float(lam[0]) - L)
    if end_err > 1e-9:
        raise ValueError(
            f"geodesic edge shooting landed {end_err * a:.1f} m off the "
            "target vertex; densify the ring"
        )
    v = np.asarray(vals)
    simpson = (h / 3.0) * (
        v[0] + v[-1] + 4.0 * v[1:-1:2].sum() + 2.0 * v[2:-1:2].sum()
    )
    return float(simpson)


def ring_area_ellipsoidal(
    ring: np.ndarray, a: float = WGS84_A, f: float = WGS84_F
) -> float:
    """Unsigned ellipsoidal geodesic area of a lon/lat ring (degrees),
    in m^2 (with the default WGS84 a).  Edges are geodesics (same
    convention as pyproj Geod).  Rings larger than half the ellipsoid
    return the complement (smaller side), matching
    kernels.ring_area_geodesic's spherical convention."""
    arr = np.asarray(ring, dtype=float)[:, :2]
    if len(arr) >= 2 and np.array_equal(arr[0], arr[-1]):
        arr = arr[:-1]
    if len(arr) >= 2:  # drop consecutive duplicates
        keep = np.ones(len(arr), dtype=bool)
        keep[1:] = np.any(arr[1:] != arr[:-1], axis=1)
        arr = arr[keep]
    if len(arr) < 3:
        return 0.0

    lon = np.radians(arr[:, 0])
    lat = np.radians(arr[:, 1])

    # pole vertices -> split into (pole, lambda_prev), (pole, lambda_next)
    # so the polar phantom segment is an explicit same-pole edge
    at_pole = np.abs(np.abs(lat) - math.pi / 2.0) < 1e-15
    if at_pole.any():
        lon2, lat2 = [], []
        n = len(arr)
        for i in range(n):
            if at_pole[i]:
                lon2.append(lon[(i - 1) % n])
                lat2.append(lat[i])
                lon2.append(lon[(i + 1) % n])
                lat2.append(lat[i])
            else:
                lon2.append(lon[i])
                lat2.append(lat[i])
        lon, lat = np.asarray(lon2), np.asarray(lat2)

    lon_n = np.roll(lon, -1)
    lat_n = np.roll(lat, -1)
    # normalized per-edge longitude difference (geodesics take the
    # short way; |dL| <= pi)
    dL = np.remainder(lon_n - lon + math.pi, 2.0 * math.pi) - math.pi

    T = ellipsoid_area(a, f)
    z_pole = float(zone_area(1.0, a, f))

    # phantom edges: both endpoints at the same pole
    pole_edge = (np.abs(np.abs(lat) - math.pi / 2.0) < 1e-15) & (lat == lat_n)
    # Z is odd in phi: Z(north pole) = +z_pole, Z(south pole) = -z_pole
    oint = 0.0
    for i in np.nonzero(pole_edge)[0]:
        oint += (z_pole if lat[i] > 0 else -z_pole) * float(dL[i])

    live = ~pole_edge
    if live.any():
        beta1 = _reduced_lat(lat[live], f)
        beta2 = _reduced_lat(lat_n[live], f)
        L = dL[live]
        sina0, cosa0_sq, sig1, sigd, degen, resid = _solve_edges(
            beta1, beta2, L, f
        )
        # exact meridians contribute zero (and their clamped integrand
        # would only add quadrature noise)
        ok = ~degen & (np.abs(sina0) >= 1e-15)
        # near-antipodal edges: the fixed point oscillates without
        # converging (the true geodesic is near-meridional over a
        # pole) — route to the exact ODE-shooting fallback instead of
        # silently using the wrong parameters
        shoot = ok & (resid > 1e-9)
        ok &= ~shoot
        nodes = sig1[:, None] + sigd[:, None] * _FRAC[None, :]
        vals = _area_integrand(nodes, sina0[:, None], cosa0_sq[:, None], a, f)
        s_edges = sigd * (vals * _FRAC_W[None, :]).sum(axis=1)
        s_edges = np.where(ok, s_edges, 0.0)
        # near-polar edges: adaptive re-evaluation resolves the peak
        for i in np.nonzero(_edge_polar_flag(sina0, cosa0_sq, sig1, sigd) & ok)[0]:
            scale = abs(s_edges[i]) + z_pole * abs(L[i]) + 1.0
            s_edges[i] = _adaptive_simpson(
                lambda s: float(
                    _area_integrand(
                        np.array([s]), sina0[i], cosa0_sq[i], a, f
                    )[0]
                ),
                float(sig1[i]),
                float(sig1[i] + sigd[i]),
                1e-14 * scale,
            )
        # near-antipodal edges via the exact shooting path
        lat_l, latn_l = lat[live], lat_n[live]
        for i in np.nonzero(shoot)[0]:
            s_edges[i] = _edge_area_shoot(
                float(lat_l[i]), float(latn_l[i]), float(L[i]), a, f
            )
        oint += float(s_edges.sum())

    w = round(float(dL.sum()) / (2.0 * math.pi))
    area = -oint + abs(w) * T / 2.0
    area = abs(area)
    if area > T / 2.0:
        area = T - area
    return area


def polygon_area_ellipsoidal(geom, a: float = WGS84_A, f: float = WGS84_F) -> float:
    """Unsigned ellipsoidal area: |shell| minus |holes| over parts."""
    from pygeoops_spark.geom.wkb import POLYGON, get_parts

    total = 0.0
    for part in get_parts(geom):
        if part.type_id != POLYGON or not part.data:
            continue
        total += ring_area_ellipsoidal(np.asarray(part.data[0]), a, f)
        for hole in part.data[1:]:
            total -= ring_area_ellipsoidal(np.asarray(hole), a, f)
    return total


def geodesic_inverse(
    lon1,
    lat1,
    lon2,
    lat2,
    a: float = WGS84_A,
    f: float = WGS84_F,
):
    """Vectorized inverse geodesic: (distance_m, fwd_azimuth_rad) per
    coordinate pair (degrees in, shortest-path convention |dlon| <= pi).

    Uses the same auxiliary-sphere solve as the area kernel; the
    distance is  b * int sqrt(1 + k^2 sin^2 sigma) dsigma  (exact,
    composite Gauss-Legendre), the forward azimuth comes from
    Clairaut's relations.  Equatorial arcs reduce to the closed form
    a * dlambda exactly (the driver oracle); meridional arcs to the
    meridian elliptic arc.  Near-antipodal pairs — where the fixed
    point oscillates — fall back to the exact ODE shooting solver.
    Coincident points return (0, 0)."""
    lon1 = np.atleast_1d(np.asarray(lon1, dtype=float))
    lat1 = np.atleast_1d(np.asarray(lat1, dtype=float))
    lon2 = np.atleast_1d(np.asarray(lon2, dtype=float))
    lat2 = np.atleast_1d(np.asarray(lat2, dtype=float))
    phi1, phi2 = np.radians(lat1), np.radians(lat2)
    L = np.remainder(np.radians(lon2 - lon1) + math.pi, 2.0 * math.pi) - math.pi
    beta1 = _reduced_lat(phi1, f)
    beta2 = _reduced_lat(phi2, f)
    sina0, cosa0_sq, sig1, sigd, degen, resid = _solve_edges(beta1, beta2, L, f)
    e2 = f * (2.0 - f)
    ep2 = e2 / (1.0 - e2) if e2 > 0 else 0.0
    nodes = sig1[:, None] + sigd[:, None] * _FRAC[None, :]
    w = np.sqrt(1.0 + (ep2 * cosa0_sq)[:, None] * np.sin(nodes) ** 2)
    s12 = a * (1.0 - f) * sigd * (w * _FRAC_W[None, :]).sum(axis=1)
    # forward azimuth: sin a1 = sin a0 / cos b1, cos a1 = cos a0
    # cos sig1 / cos b1 (the common cos b1 > 0 cancels in atan2)
    az1 = np.arctan2(sina0, np.sqrt(cosa0_sq) * np.cos(sig1))
    s12 = np.where(degen, 0.0, s12)
    az1 = np.where(degen, 0.0, az1)
    # near-antipodal pairs: exact shooting fallback (rare, scalar)
    for i in np.nonzero(~degen & (resid > 1e-9))[0]:
        s_i, az_i = _inverse_shoot(
            float(phi1[i]), float(phi2[i]), float(L[i]), a, f
        )
        s12[i] = s_i
        az1[i] = az_i
    return s12, az1


def geodesic_direct(
    lon1,
    lat1,
    azimuth,
    distance,
    a: float = WGS84_A,
    f: float = WGS84_F,
):
    """Vectorized direct geodesic: destination (lon2, lat2) in degrees
    from per-row start points (degrees), forward azimuths (radians,
    clockwise from north) and distances (metres).

    Clairaut gives sin(a0) = sin(az) cos(beta1) and the start arc
    sigma1; the end arc sigma2 comes from Newton-inverting the exact
    length integral b * int sqrt(1 + k^2 sin^2 sigma) dsigma = s
    (Gauss-Legendre per iteration), and the longitude from the
    unwrapped spherical omega plus the exact defect integral — the
    same pieces as the inverse solve, so direct(inverse(p1, p2)) is an
    identity to machine precision.  Supported for distances up to
    ~half the circumference (sigma span < pi); longer distances raise
    ValueError instead of silently mis-unwrapping the longitude."""
    lon1 = np.atleast_1d(np.asarray(lon1, dtype=float))
    lat1 = np.atleast_1d(np.asarray(lat1, dtype=float))
    az = np.atleast_1d(np.asarray(azimuth, dtype=float))
    s12 = np.atleast_1d(np.asarray(distance, dtype=float))
    phi1 = np.radians(lat1)
    beta1 = _reduced_lat(phi1, f)
    sinb1, cosb1 = np.sin(beta1), np.cos(beta1)
    sina0 = np.sin(az) * cosb1
    cosa0_sq = np.clip(1.0 - sina0 * sina0, 0.0, 1.0)
    sig1 = np.arctan2(sinb1, cosb1 * np.cos(az))
    e2 = f * (2.0 - f)
    ep2 = e2 / (1.0 - e2) if e2 > 0 else 0.0
    k2 = ep2 * cosa0_sq
    b = a * (1.0 - f)

    def arc_len(sigd):
        nodes = sig1[:, None] + sigd[:, None] * _FRAC[None, :]
        w = np.sqrt(1.0 + k2[:, None] * np.sin(nodes) ** 2)
        return b * sigd * (w * _FRAC_W[None, :]).sum(axis=1)

    # Newton on the sigma span (integrand bounded in [1, 1/(1-f)], so
    # the initial guess is within ~f and 4 iterations reach 1e-15)
    sigd = s12 / b
    for _ in range(6):
        fval = arc_len(sigd) - s12
        fprime = b * np.sqrt(1.0 + k2 * np.sin(sig1 + sigd) ** 2)
        step = fval / fprime
        sigd = sigd - step
        if np.max(np.abs(step)) < 1e-15:
            break
    if np.any(sigd >= math.pi):
        # documented support limit: the single-wrap longitude unwrap
        # below is only correct for sigma spans < pi (~half the
        # circumference) — reject loudly instead of returning
        # silently-unwrapped longitudes (ADVICE r03)
        n_bad = int(np.count_nonzero(sigd >= math.pi))
        raise ValueError(
            f"geodesic_direct: {n_bad} distance(s) exceed ~half the "
            "ellipsoid circumference (sigma span >= pi), which is "
            "outside the supported range"
        )
    sig2 = sig1 + sigd

    sinb2 = np.sqrt(cosa0_sq) * np.sin(sig2)
    cosb2 = np.sqrt(np.clip(1.0 - sinb2 * sinb2, 0.0, 1.0))
    lat2 = np.degrees(np.arctan2(sinb2, (1.0 - f) * cosb2))

    # unwrapped spherical longitude: omega = atan2(sin a0 sin sigma,
    # cos sigma) is monotone with the sign of sin(a0) along the path
    w1 = np.arctan2(sina0 * np.sin(sig1), np.cos(sig1))
    w2 = np.arctan2(sina0 * np.sin(sig2), np.cos(sig2))
    raw = w2 - w1
    two_pi = 2.0 * math.pi
    raw = np.where((sina0 > 0) & (raw < 0), raw + two_pi, raw)
    raw = np.where((sina0 < 0) & (raw > 0), raw - two_pi, raw)
    nodes = sig1[:, None] + sigd[:, None] * _FRAC_DEF[None, :]
    g = _lambda_defect_integrand(nodes, sina0[:, None], cosa0_sq[:, None], f)
    defect = sigd * (g * _FRAC_DEF_W[None, :]).sum(axis=1)
    dlam = raw + sina0 * defect
    lon2 = np.remainder(lon1 + np.degrees(dlam) + 180.0, 360.0) - 180.0
    # zero-distance rows keep the start point exactly
    zero = s12 == 0.0
    lon2 = np.where(zero, lon1, lon2)
    lat2 = np.where(zero, lat1, lat2)
    return lon2, lat2


def _inverse_shoot(phi1: float, phi2: float, L: float, a: float, f: float):
    """Shortest-geodesic (distance, departure azimuth) by ODE shooting
    — the same bracket/bisect/secant machinery as _edge_area_shoot."""
    sgn = 1.0 if L >= 0 else -1.0
    n_coarse, n_fine = 512, 4096
    grid = sgn * np.linspace(1e-6, math.pi - 1e-6, 97)
    gphi, _gs = _shoot_crossing(phi1, grid, L, a, f, n_coarse, refine=False)
    g = gphi - phi2
    roots = []
    for i in range(len(grid) - 1):
        if np.isnan(g[i]) or np.isnan(g[i + 1]) or g[i] * g[i + 1] > 0:
            continue
        lo, hi, glo = grid[i], grid[i + 1], g[i]
        for _ in range(20):
            mid = 0.5 * (lo + hi)
            mp, _ms = _shoot_crossing(
                phi1, np.array([mid]), L, a, f, n_coarse, refine=False
            )
            gm = float(mp[0]) - phi2
            if math.isnan(gm):
                break
            if glo * gm <= 0:
                hi = mid
            else:
                lo, glo = mid, gm
        alpha = 0.5 * (lo + hi)

        def g_fine(al):
            p, sc = _shoot_crossing(phi1, np.array([al]), L, a, f, n_fine)
            return float(p[0]) - phi2, float(sc[0])

        g0, sc = g_fine(alpha)
        da = 1e-8
        for _ in range(4):
            if abs(g0) < 1e-12 or math.isnan(g0):
                break
            g1, _s = g_fine(alpha + da)
            deriv = (g1 - g0) / da
            if deriv == 0 or math.isnan(deriv):
                break
            alpha -= g0 / deriv
            g0, sc = g_fine(alpha)
        if not math.isnan(sc):
            roots.append((sc, alpha))
    if not roots:
        raise ValueError(
            "geodesic inverse failed: no shooting bracket for "
            "near-antipodal pair"
        )
    s_cross, alpha1 = min(roots)
    return s_cross, alpha1


# -- exact ODE ground truth (tests only) ----------------------------------
def geodesic_ode_path(
    phi1: float,
    lam1: float,
    alpha1: float,
    s_total: float,
    n_steps: int,
    a: float = WGS84_A,
    f: float = WGS84_F,
) -> np.ndarray:
    """Integrate the exact geodesic ODEs in geographic coordinates with
    RK4 (textbook meridional radius M and normal radius N):

        dphi/ds    = cos(alpha) / M(phi)
        dlambda/ds = sin(alpha) / (N(phi) cos(phi))
        dalpha/ds  = sin(alpha) tan(phi) / N(phi)

    Returns an (n_steps+1, 3) array of (phi, lambda, alpha).  Used as
    independent ground truth for the auxiliary-sphere area integrals;
    O(h^4) accurate, so ~1e-12 relative at 1e4 steps for ~100 km arcs.
    """
    e2 = f * (2.0 - f)

    def deriv(y):
        phi, _lam, alpha = y
        s2 = math.sin(phi) ** 2
        wfac = math.sqrt(1.0 - e2 * s2)
        M = a * (1.0 - e2) / wfac**3
        N = a / wfac
        return np.array(
            [
                math.cos(alpha) / M,
                math.sin(alpha) / (N * math.cos(phi)),
                math.sin(alpha) * math.tan(phi) / N,
            ]
        )

    h = s_total / n_steps
    y = np.array([phi1, lam1, alpha1], dtype=float)
    out = [y.copy()]
    for _ in range(n_steps):
        k1 = deriv(y)
        k2 = deriv(y + 0.5 * h * k1)
        k3 = deriv(y + 0.5 * h * k2)
        k4 = deriv(y + h * k3)
        y = y + (h / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)
        out.append(y.copy())
    return np.asarray(out)


def edge_length_ellipsoidal(
    sina0, cosa0_sq, sig1, sigd, a: float = WGS84_A, f: float = WGS84_F
) -> float:
    """Geodesic edge length b * int sqrt(1 + k^2 sin^2 sigma) dsigma
    (for the ODE cross-check in tests)."""
    e2 = f * (2.0 - f)
    ep2 = e2 / (1.0 - e2)
    k2 = ep2 * cosa0_sq
    nodes = sig1 + sigd * _FRAC
    vals = np.sqrt(1.0 + k2 * np.sin(nodes) ** 2)
    return float(a * (1.0 - f) * sigd * (vals * _FRAC_W).sum())
