"""Dense per-series numerical kernels for temporal disaggregation.

Pure NumPy/SciPy — importable and unit-testable without Spark.  On the
cluster these run *inside* a grouped-map pandas UDF (one call per series), so
every function here operates on a single series' small dense arrays
(n = high-frequency length, typically 10^2-10^3).

The math reproduces the reference semantics (cites into
``/root/reference/tsdisagg/ts_disagg.py``) but the code is an independent
implementation:

* conversion (aggregation-constraint) matrix    — ts_disagg.py:24-81
* Denton / Denton-Cholette smoothing            — ts_disagg.py:155-176
* Chow-Lin AR(1) / Litterman random-walk GLS    — ts_disagg.py:100-152
* maximum-likelihood (rho, sigma^2) fit         — ts_disagg.py:426-448
* distribution step  y_hat = p + D(y - Cp)      — ts_disagg.py:96-97,460-464
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

import numpy as np

AGG_FUNCS = ("sum", "mean", "first", "last")
METHODS = ("denton", "denton-cholette", "chow-lin", "litterman")
REGRESSION_METHODS = ("chow-lin", "litterman")


# ---------------------------------------------------------------------------
# period labelling + conversion matrix
# ---------------------------------------------------------------------------

def period_labels(ts, low_family: str) -> np.ndarray:
    """Integer calendar-period label for each timestamp.

    The reference buckets high-frequency stamps with ``to_period('Y'|'Q')``
    (ts_disagg.py:60-66) — i.e. membership is by *calendar* year/quarter of
    the stamp regardless of any month anchor on the frequency code.  We encode
    the same label as an integer so the identical expression works in Spark
    SQL: ``year`` for yearly lows, ``4*year + (month-1)//3`` for quarterly.
    """
    import pandas as pd

    idx = pd.DatetimeIndex(ts)
    if low_family == "yearly":
        return idx.year.to_numpy()
    return (idx.year * 4 + (idx.month - 1) // 3).to_numpy()


def conversion_matrix(
    low_labels: np.ndarray,
    high_labels: np.ndarray,
    factor: int,
    agg_func: str,
) -> np.ndarray:
    """Aggregation-constraint matrix C in R^{n_low x n_high}.

    Row i encodes how high-frequency rows combine to reproduce low-freq
    observation i: weight 1 on members (``sum``), 1/factor (``mean``), or 1 on
    the first/last member (``first``/``last``).  Periods with a member count
    different from ``factor`` are *partial* and get an all-zero row so the
    caller can prune them (ts_disagg.py:24-42,68-79).

    Inputs are the integer labels from :func:`period_labels`; ``high_labels``
    must be in time order.
    """
    if agg_func not in AGG_FUNCS:
        raise ValueError(f"Invalid agg_func {agg_func!r}")

    n_low, n_high = len(low_labels), len(high_labels)
    C = np.zeros((n_low, n_high))
    weight = 1.0 / factor if agg_func == "mean" else 1.0

    for i, label in enumerate(low_labels):
        members = np.flatnonzero(high_labels == label)
        if members.size == 0 or members.size != factor:
            # absent or partial period -> stays all-zero
            continue
        if agg_func == "first":
            C[i, members[0]] = weight
        elif agg_func == "last":
            C[i, members[-1]] = weight
        else:
            C[i, members] = weight
    return C


# ---------------------------------------------------------------------------
# structural matrices
# ---------------------------------------------------------------------------

def difference_matrix(n: int, order: int = 1) -> np.ndarray:
    """h-th order differencing operator: (I - L)^h with L the lag matrix
    (ts_disagg.py:90-93)."""
    D1 = np.eye(n) - np.eye(n, k=-1)
    return np.linalg.matrix_power(D1, order)


def _proportional_rescale(delta: np.ndarray, x: np.ndarray) -> np.ndarray:
    """Scale the difference operator columns by 1/(x_t * mean(x)) so squared
    *relative* deviations are penalized (ts_disagg.py:158,168)."""
    x = np.asarray(x, dtype=float).ravel()
    return delta * (1.0 / (x * x.mean()))[None, :]


def denton_covariance(
    n: int, x: np.ndarray, order: int = 1, criterion: str = "proportional"
) -> np.ndarray:
    """Sigma_D = (Delta' Delta)^{-1}, the implicit covariance that makes GLS
    smoothing minimize sum of squared h-th differences (ts_disagg.py:155-161)."""
    delta = difference_matrix(n, order)
    if criterion == "proportional":
        delta = _proportional_rescale(delta, x)
    return np.linalg.solve(delta.T @ delta, np.eye(n))


def denton_cholette_distribution(
    n: int,
    n_low: int,
    C: np.ndarray,
    x: np.ndarray,
    order: int = 1,
    criterion: str = "proportional",
) -> np.ndarray:
    """Cholette's boundary-corrected Denton weights (ts_disagg.py:164-176).

    Drops the first ``order`` rows of the difference operator (removing the
    spurious penalty on the pre-sample level) and solves the equality-
    constrained least squares through its KKT system; returns the n x n_low
    block mapping low-freq residuals onto the high-freq path.
    """
    delta = difference_matrix(n, order)[order:, :]
    if criterion == "proportional":
        delta = _proportional_rescale(delta, x)
    gram = delta.T @ delta
    kkt_lhs = np.block([[gram, C.T], [C, np.zeros((n_low, n_low))]])
    kkt_rhs = np.block([[gram, np.zeros((n, n_low))], [C, np.eye(n_low)]])
    solution = np.linalg.solve(kkt_lhs, kkt_rhs)
    return solution[:n, n:]


def chow_lin_covariance(rho: float, sigma2: float, n: int) -> np.ndarray:
    """Stationary AR(1) covariance: Sigma[i,j] = sigma2/(1-rho^2) * rho^|i-j|
    (ts_disagg.py:100-107)."""
    lags = np.abs(np.subtract.outer(np.arange(n), np.arange(n)))
    return (sigma2 / (1.0 - rho**2)) * rho**lags


def litterman_covariance(rho: float, sigma2: float, n: int) -> np.ndarray:
    """Random walk with AR(1) innovations:
    Sigma_L = sigma2 * (Delta' H' H Delta)^{-1}, H = I - rho L
    (ts_disagg.py:110-114)."""
    delta = difference_matrix(n, 1)
    H = np.eye(n) - rho * np.eye(n, k=-1)
    A = delta.T @ H.T @ H @ delta
    return sigma2 * np.linalg.solve(A, np.eye(n))


COVARIANCE_BUILDERS: dict[str, Callable[[float, float, int], np.ndarray]] = {
    "chow-lin": chow_lin_covariance,
    "litterman": litterman_covariance,
}


# ---------------------------------------------------------------------------
# GLS + maximum likelihood
# ---------------------------------------------------------------------------

@dataclass
class FitResult:
    """Minimal stand-in for ``scipy.optimize.OptimizeResult`` (scipy is not a
    dependency of this engine): the fitted point, objective value, and
    bookkeeping counters."""

    x: np.ndarray
    fun: float
    success: bool = True
    nit: int = 0
    nfev: int = 0
    message: str = "converged"
    extras: dict = field(default_factory=dict)


def gls_beta(Sigma: np.ndarray, y: np.ndarray, X: np.ndarray, C: np.ndarray) -> np.ndarray:
    """GLS estimate on the aggregated model y = CX b + Cu:

        b = (X'C' (C Sigma C')^{-1} C X)^{-1} X'C' (C Sigma C')^{-1} y

    A single factorization of C Sigma C' serves both right-hand sides by
    stacking them into one multi-RHS solve (ts_disagg.py:117-131 reuses an LU
    the same way).
    """
    V = np.linalg.multi_dot([C, Sigma, C.T])
    CX = C @ X
    y2d = np.asarray(y, dtype=float).reshape(V.shape[0], -1)
    solved = np.linalg.solve(V, np.hstack([CX, y2d]))
    Vinv_CX, Vinv_y = solved[:, : CX.shape[1]], solved[:, CX.shape[1] :]
    beta = np.linalg.solve(CX.T @ Vinv_CX, CX.T @ Vinv_y)
    return beta.ravel() if np.ndim(y) == 1 else beta


def gaussian_loglik(n_low: int, V: np.ndarray, resid: np.ndarray) -> float:
    """Log-likelihood of the low-frequency residuals under N(0, V)
    (ts_disagg.py:84-87)."""
    _sign, logdet = np.linalg.slogdet(V)
    quad = resid.T @ np.linalg.solve(V, resid)
    return -0.5 * n_low * np.log(2.0 * np.pi) - 0.5 * (logdet + quad)


def negative_loglik(
    params: np.ndarray,
    y: np.ndarray,
    X: np.ndarray,
    C: np.ndarray,
    cov_builder: Callable[[float, float, int], np.ndarray],
) -> float:
    """ML objective over (rho, sigma2) (ts_disagg.py:134-152).

    Parity quirk reproduced deliberately: the reference rescales
    ``sigma2 <- (1 + rho) * sigma2`` before building Sigma — the author's
    admitted "pure magic" correction that changes the Chow-Lin scaling from
    sigma2/(1-rho^2) to sigma2/(1-rho) and makes results match R's
    ``tempdisagg`` (comment at ts_disagg.py:140-144).  Golden parity requires
    the identical objective surface, so we keep it.
    """
    rho, sigma2 = params
    sigma2 = (1.0 + rho) * sigma2
    n = X.shape[0]
    Sigma = cov_builder(rho, sigma2, n)
    beta = gls_beta(Sigma, y, X, C)
    resid = y - C @ (X @ beta)
    V = np.linalg.multi_dot([C, Sigma, C.T])
    return -gaussian_loglik(y.shape[0], V, resid)


#: rho search interval matching the reference's bounds (ts_disagg.py:438-439)
_RHO_LO, _RHO_HI = 1e-5, 1.0 - 1e-5
_GOLDEN = 0.3819660112501051  # (3 - sqrt(5)) / 2


def _nelder_mead_minimize(
    f: Callable[[np.ndarray], float],
    x0: np.ndarray,
    lower: np.ndarray,
    upper: np.ndarray,
    xatol: float = 1e-4,
    fatol: float = 1e-4,
    max_iter: int | None = None,
) -> tuple[np.ndarray, float, int, int]:
    """Bounded Nelder-Mead simplex (Nelder & Mead 1965 — public algorithm;
    bounds handled by clipping candidate points into the box, the same
    strategy scipy documents for its bounded Nelder-Mead).  Returns
    ``(x_min, f_min, nit, nfev)`` with scipy-compatible counter semantics:
    ``nit`` counts simplex iterations, ``nfev`` objective evaluations.
    """
    n = len(x0)
    if max_iter is None:
        max_iter = 200 * n

    def clip(p: np.ndarray) -> np.ndarray:
        return np.clip(p, lower, upper)

    def initial_simplex(center: np.ndarray) -> np.ndarray:
        # scipy-style: 5% relative perturbation per coordinate; when the
        # perturbed vertex would clip onto a bound, reflect it to the
        # interior instead so the simplex never starts degenerate.
        nonzdelt, zdelt = 0.05, 0.00025
        sim = [clip(np.asarray(center, dtype=float))]
        for i in range(n):
            p = sim[0].copy()
            step = p[i] * nonzdelt if p[i] != 0.0 else zdelt
            p[i] = p[i] + step if p[i] + step <= upper[i] else p[i] - step
            sim.append(clip(p))
        return np.array(sim)

    refl, expa, contr, shrk = 1.0, 2.0, 0.5, 0.5
    nit = 0
    nfev = 0

    def nm_pass(center: np.ndarray) -> tuple[np.ndarray, float]:
        nonlocal nit, nfev
        sim = initial_simplex(center)
        fs = np.array([f(p) for p in sim])
        nfev += n + 1
        while nit < max_iter:
            order = np.argsort(fs, kind="stable")
            sim, fs = sim[order], fs[order]
            if (
                np.max(np.abs(sim[1:] - sim[0])) <= xatol
                and np.max(np.abs(fs[1:] - fs[0])) <= fatol
            ):
                break
            nit += 1
            centroid = sim[:-1].mean(axis=0)
            xr = clip(centroid + refl * (centroid - sim[-1]))
            fr = f(xr)
            nfev += 1
            if fr < fs[0]:
                xe = clip(centroid + expa * refl * (centroid - sim[-1]))
                fe = f(xe)
                nfev += 1
                sim[-1], fs[-1] = (xe, fe) if fe < fr else (xr, fr)
            elif fr < fs[-2]:
                sim[-1], fs[-1] = xr, fr
            else:
                if fr < fs[-1]:  # outside contraction
                    xc = clip(centroid + contr * refl * (centroid - sim[-1]))
                    fc = f(xc)
                    nfev += 1
                    shrink = fc > fr
                else:  # inside contraction
                    xc = clip(centroid - contr * (centroid - sim[-1]))
                    fc = f(xc)
                    nfev += 1
                    shrink = fc >= fs[-1]
                if shrink:
                    for i in range(1, n + 1):
                        sim[i] = clip(sim[0] + shrk * (sim[i] - sim[0]))
                        fs[i] = f(sim[i])
                        nfev += 1
                else:
                    sim[-1], fs[-1] = xc, fc
        order = np.argsort(fs, kind="stable")
        return sim[order[0]], fs[order[0]]

    # Restart loop: a clipped simplex can degenerate against a bound mid-way
    # along a curved valley (observed on the Chow-Lin ML surface, where the
    # path from (0.8, 0.8) rides rho onto its upper bound before sigma2 has
    # grown).  Re-seeding a fresh simplex at the incumbent (with inward
    # reflection at the bounds) restores the lost dimension; stop when a
    # restart no longer improves.  Classic Nelder-Mead robustification.
    best_x, best_f = nm_pass(np.asarray(x0, dtype=float))
    for _ in range(10):
        if nit >= max_iter:
            break
        x2, f2 = nm_pass(best_x)
        if f2 >= best_f - fatol:
            if f2 < best_f:
                best_x, best_f = x2, f2
            break
        best_x, best_f = x2, f2
    return best_x, best_f, nit, nfev


def _chow_lin_covariance_stack(grid: np.ndarray, n: int) -> np.ndarray:
    """Unit-scale AR(1) covariances for every rho in ``grid`` at once:
    one vectorized power over a (G, n, n) tensor instead of G toeplitz
    builds (same values as :func:`chow_lin_covariance` with sigma2=1)."""
    lags = np.abs(np.subtract.outer(np.arange(n), np.arange(n)))
    g = np.asarray(grid, dtype=float)
    # rho^|i-j| has only n distinct exponents: power-table then gather, so
    # the tensor costs G*n pows + an indexed broadcast instead of G*n^2 pows
    pow_table = g[:, None] ** np.arange(n)[None, :]          # (G, n)
    scale = 1.0 / (1.0 - g**2)
    return scale[:, None, None] * pow_table[:, lags]


# chow-lin's unit-scale covariance stack vectorizes over the rho grid (the
# batched profile-likelihood scan dispatches on this attribute; litterman
# falls back to a per-rho loop — its builder needs a linear solve each time)
chow_lin_covariance.batched = _chow_lin_covariance_stack  # type: ignore[attr-defined]


def _litterman_V0_stack(grid: np.ndarray, n: int, C: np.ndarray) -> np.ndarray:
    """C Sigma_L(rho) C' for every rho at once, without forming Sigma_L.

    Sigma_L = (Delta' H'H Delta)^{-1} with H = I - rho L, and
    H'H = I - rho (L + L') + rho^2 L'L, so the stacked Gram is the quadratic
    pencil ``M0 - rho M1 + rho^2 M2`` built from three fixed matrices; the
    grid of C Sigma C' then comes from ONE batched solve with n_low
    right-hand sides — the scalar builder's per-rho full n x n inverse
    (litterman_covariance) never happens on the grid path.
    """
    delta = difference_matrix(n, 1)
    L = np.eye(n, k=-1)
    M0 = delta.T @ delta
    M1 = delta.T @ (L + L.T) @ delta
    M2 = delta.T @ (L.T @ L) @ delta
    g = np.asarray(grid, dtype=float)[:, None, None]
    A = M0[None] - g * M1[None] + g**2 * M2[None]            # (G, n, n)
    X = np.linalg.solve(A, np.broadcast_to(C.T, (len(grid), *C.T.shape)))
    return np.matmul(C, X)                                    # (G, n_low, n_low)


litterman_covariance.batched_V0 = _litterman_V0_stack  # type: ignore[attr-defined]


#: fixed coarse scan grid for the profile likelihood (fit_rho_sigma); being
#: a module constant is what makes the V0 cache below valid — the cached
#: values are keyed on (builder, n, C) with the grid implicit
_COARSE_GRID = np.linspace(_RHO_LO, _RHO_HI, 41)
_COARSE_GRID.setflags(write=False)

#: coarse-pass V0 = C Sigma0(rho) C' stacks and their slogdets, keyed
#: (builder name, n, C bytes).  At fleet width an applyInPandas worker
#: solves hundreds of series that share the SAME period structure (same n,
#: same constraint matrix) — only y/X differ — so the rho-independent
#: coarse-scan algebra is identical across them and was measured at ~20%
#: of per-series CPU (chow-lin; more for litterman, whose V0 stack needs a
#: batched linear solve to even build).  Values are read-only; a bounded
#: FIFO keeps the cache a few MB.
_COARSE_V0_CACHE: dict = {}
_COARSE_V0_CACHE_MAX = 64  # coarse + refinement-bracket entries


def _coarse_v0(
    C: np.ndarray,
    n: int,
    cov_builder: Callable[[float, float, int], np.ndarray],
) -> tuple[np.ndarray, np.ndarray]:
    """(V0 stack, logdet stack) for the fixed coarse grid, cached."""
    # key on the builder OBJECT (kept alive by the cache entry), not its
    # name: two distinct builders can share a __name__ (lambdas), and an
    # id() can be reused after GC — either would silently cross-wire
    # covariance families
    key = (cov_builder, n, C.tobytes())
    hit = _COARSE_V0_CACHE.get(key)
    if hit is None:
        V0 = _grid_v0(_COARSE_GRID, n, C, cov_builder)
        _sign, logdet0 = np.linalg.slogdet(V0)
        # don't let one long-series fleet pin hundreds of MB per worker:
        # a (41, n_low, n_low) stack past a few MB (n_low ~ 180+) is cheap
        # to rebuild relative to its own solve cost anyway
        if V0.nbytes > (4 << 20):
            return V0, logdet0
        V0.setflags(write=False)
        logdet0.setflags(write=False)
        if len(_COARSE_V0_CACHE) >= _COARSE_V0_CACHE_MAX:
            _COARSE_V0_CACHE.pop(next(iter(_COARSE_V0_CACHE)))
        hit = _COARSE_V0_CACHE[key] = (V0, logdet0)
    return hit


def _bracket_v0(
    C: np.ndarray,
    n: int,
    cov_builder: Callable[[float, float, int], np.ndarray],
    best: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(fine grid, V0 stack, logdet stack) for the refinement bracket
    around coarse point ``best`` — cached like :func:`_coarse_v0`.

    The fine grid is fully determined by the coarse argmin index (one of
    41 possible brackets), and a fleet of same-structure series lands on a
    handful of brackets, so the refinement pass caches as well as the
    coarse one.  Grid values are bit-identical to the uncached
    ``np.linspace(lo, hi, 33)``."""
    lo = _COARSE_GRID[max(best - 1, 0)]
    hi = _COARSE_GRID[min(best + 1, len(_COARSE_GRID) - 1)]
    key = (cov_builder, n, C.tobytes(), int(best))
    hit = _COARSE_V0_CACHE.get(key)
    if hit is None:
        fine = np.linspace(lo, hi, 33)
        V0 = _grid_v0(fine, n, C, cov_builder)
        _sign, logdet0 = np.linalg.slogdet(V0)
        if V0.nbytes > (4 << 20):
            return fine, V0, logdet0
        for arr in (fine, V0, logdet0):
            arr.setflags(write=False)
        if len(_COARSE_V0_CACHE) >= _COARSE_V0_CACHE_MAX:
            _COARSE_V0_CACHE.pop(next(iter(_COARSE_V0_CACHE)))
        hit = _COARSE_V0_CACHE[key] = (fine, V0, logdet0)
    return hit


def _grid_v0(
    grid: np.ndarray,
    n: int,
    C: np.ndarray,
    cov_builder: Callable[[float, float, int], np.ndarray],
) -> np.ndarray:
    """V0 = C Sigma0(rho) C' for every rho in ``grid`` — builder dispatch
    shared by the cached coarse pass and the per-series fine pass."""
    v0_fn = getattr(cov_builder, "batched_V0", None)
    if v0_fn is not None:
        return v0_fn(grid, n, C)
    stack_fn = getattr(cov_builder, "batched", None)
    if stack_fn is not None:
        Sig = stack_fn(grid, n)
    else:
        Sig = np.empty((len(grid), n, n))
        for i, r in enumerate(grid):
            Sig[i] = cov_builder(r, 1.0, n)
    return np.matmul(np.matmul(C, Sig), C.T)


def _profile_grid_nll(
    grid: np.ndarray,
    y: np.ndarray,
    X: np.ndarray,
    C: np.ndarray,
    cov_builder: Callable[[float, float, int], np.ndarray],
) -> np.ndarray:
    """Concentrated negative log-likelihood at every grid point via *stacked*
    linalg: the per-point algebra of :func:`profile_negative_loglik` is
    expressed over a (G, n, n) covariance tensor so the whole scan costs a
    handful of batched LAPACK calls instead of G sequential ones.  At fleet
    width (thousands of series inside ``applyInPandas`` groups) the grid scan
    dominated the solve; batching removes the per-call numpy overhead and is
    numerically the same computation.
    """
    n = X.shape[0]
    # the scan only ever needs V0 = C Sigma C' — builders may supply it
    # directly (litterman avoids G full inverses that way); the coarse
    # fixed-grid pass reuses the rho-independent (V0, logdet) across every
    # series with the same period structure
    if grid is _COARSE_GRID:
        V0, logdet0 = _coarse_v0(np.ascontiguousarray(C), n, cov_builder)
    else:
        V0 = _grid_v0(grid, n, C, cov_builder)
        _sign, logdet0 = np.linalg.slogdet(V0)
    return _nll_from_v0(V0, logdet0, len(grid), y, X, C)


def _nll_from_v0(
    V0: np.ndarray,
    logdet0: np.ndarray,
    G: int,
    y: np.ndarray,
    X: np.ndarray,
    C: np.ndarray,
) -> np.ndarray:
    """The per-series half of the grid scan: everything downstream of the
    (rho-independent, cacheable) V0 stack."""
    n_low = y.shape[0]
    CX = C @ X                                  # (n_low, k)
    y2 = np.asarray(y, dtype=float).reshape(-1, 1)
    rhs = np.hstack([CX, y2])                   # (n_low, k+1)
    solved = np.linalg.solve(V0, np.broadcast_to(rhs, (G, *rhs.shape)))
    Vinv_CX, Vinv_y = solved[:, :, : CX.shape[1]], solved[:, :, CX.shape[1] :]
    A = np.matmul(CX.T, Vinv_CX)                # (G, k, k)
    b = np.matmul(CX.T, Vinv_y)                 # (G, k, 1)
    beta = np.linalg.solve(A, b)                # (G, k, 1)
    resid = y2 - np.matmul(CX, beta)            # (G, n_low, 1)
    # V0^{-1} resid reuses the factored RHS: V0^{-1}y - V0^{-1}CX @ beta
    Vinv_resid = Vinv_y - np.matmul(Vinv_CX, beta)
    q0 = np.einsum("gij,gij->g", resid, Vinv_resid)
    s_star = np.maximum(q0 / n_low, 1e-300)
    return 0.5 * (
        n_low * np.log(2.0 * np.pi) + n_low * np.log(s_star) + logdet0 + n_low
    )


def profile_negative_loglik(
    rho: float,
    y: np.ndarray,
    X: np.ndarray,
    C: np.ndarray,
    cov_builder: Callable[[float, float, int], np.ndarray],
) -> tuple[float, float]:
    """Concentrated ML objective: sigma2 enters the covariance as a pure scale
    (Sigma = s * Sigma0(rho) for both Chow-Lin and Litterman), so the Gaussian
    likelihood profiles it out exactly at s* = resid' V0^{-1} resid / n_low.

    Returns ``(nll_at_optimal_scale, s_star)`` where ``s_star`` is the scale
    *after* the reference's (1+rho) rescale (see :func:`negative_loglik`);
    i.e. the reported sigma2 is ``s_star / (1 + rho)``.
    """
    n = X.shape[0]
    n_low = y.shape[0]
    Sigma0 = cov_builder(rho, 1.0, n)
    beta = gls_beta(Sigma0, y, X, C)
    resid = y - C @ (X @ beta)
    V0 = np.linalg.multi_dot([C, Sigma0, C.T])
    _sign, logdet0 = np.linalg.slogdet(V0)
    q0 = float(resid.T @ np.linalg.solve(V0, resid))
    s_star = max(q0 / n_low, 1e-300)
    nll = 0.5 * (n_low * np.log(2.0 * np.pi) + n_low * np.log(s_star) + logdet0 + n_low)
    return nll, s_star


def fit_rho_sigma(
    y: np.ndarray,
    X: np.ndarray,
    C: np.ndarray,
    cov_builder: Callable[[float, float, int], np.ndarray],
    optimizer_kwargs: dict | None = None,
) -> FitResult:
    """Bounded ML fit of (rho, sigma2) with rho in (1e-5, 1-1e-5), matching
    the reference's feasible region (ts_disagg.py:438-448).

    Default strategy differs from the reference (which runs a 2-D scipy
    solver from (0.8, 0.8)): sigma2 is concentrated out analytically, leaving
    a 1-D profile likelihood in rho that a coarse grid scan + Brent refinement
    solves to ~1e-10 — tighter than any of the reference's optimizer
    configurations.

    ``optimizer_kwargs['method']`` is honored, not ignored: ``'nelder-mead'``
    runs a real bounded 2-D Nelder-Mead on the reference's objective from the
    reference's x0=(0.8, 0.8) (ts_disagg.py:441-448), so ``return_optim_res``
    consumers get scipy-semantics ``nit``/``nfev``.  ``'powell'`` and
    ``'l-bfgs-b'`` (scipy solvers the reference passes through; scipy is not
    a dependency here) are solved via the same bounded Nelder-Mead with the
    substitution recorded in ``FitResult.message``.  Unknown method names
    raise ``ValueError`` instead of being silently accepted.
    ``optimizer_kwargs['options']`` supports ``xatol``/``fatol``/``maxiter``.
    """
    kwargs = dict(optimizer_kwargs or {})
    method = str(kwargs.get("method", "brent-profile")).lower()
    options = dict(kwargs.get("options") or {})
    if method in ("nelder-mead", "powell", "l-bfgs-b"):
        def f2(params: np.ndarray) -> float:
            return negative_loglik(params, y, X, C, cov_builder)

        x, fx, nit, nfev = _nelder_mead_minimize(
            f2,
            np.full(2, 0.8),  # reference x0 (ts_disagg.py:441)
            lower=np.array([_RHO_LO, 1e-5]),
            upper=np.array([_RHO_HI, np.inf]),
            xatol=float(options.get("xatol", 1e-6)),
            fatol=float(options.get("fatol", 1e-8)),
            max_iter=options.get("maxiter"),
        )
        message = (
            "converged"
            if method == "nelder-mead"
            else f"method '{method}' solved via bounded Nelder-Mead "
            "(scipy is not a dependency of this engine)"
        )
        return FitResult(x=x, fun=fx, nit=nit, nfev=nfev, message=message)
    if method not in ("brent-profile", "profile"):
        raise ValueError(
            f"Unsupported optimizer method {method!r}: use 'nelder-mead', "
            "'powell', 'l-bfgs-b', or omit for the concentrated "
            "Brent-profile default."
        )

    # Coarse global scan guards against non-convex profiles, then a second
    # stacked scan inside the winning bracket plus one parabolic step.  Both
    # levels run as single batched-LAPACK passes (_profile_grid_nll); the
    # earlier Brent refinement converged to ~1e-10 but paid ~40 sequential
    # dense solves per fit — at fleet width that was ~40% of kernel CPU for
    # precision far below what the distribution step can observe (y_hat is
    # stationary in rho at the optimum; goldens pass at rtol 1e-3 with the
    # two-level grid's ~1e-6 rho accuracy).
    grid = _COARSE_GRID
    values = _profile_grid_nll(grid, y, X, C, cov_builder)
    best = int(np.argmin(values))
    fine, fine_V0, fine_logdet = _bracket_v0(
        np.ascontiguousarray(C), X.shape[0], cov_builder, best
    )
    fvals = _nll_from_v0(fine_V0, fine_logdet, len(fine), y, X, C)
    j = int(np.argmin(fvals))
    rho_star = float(fine[j])
    nfev = len(grid) + len(fine)
    if 0 < j < len(fine) - 1:
        f0, f1, f2 = fvals[j - 1], fvals[j], fvals[j + 1]
        denom = f0 - 2.0 * f1 + f2
        if denom > 0:  # proper local parabola: vertex for equispaced points
            h = fine[1] - fine[0]
            step = 0.5 * h * (f0 - f2) / denom
            rho_star = float(np.clip(fine[j] + step, fine[j - 1], fine[j + 1]))
    nll_star, s_star = profile_negative_loglik(rho_star, y, X, C, cov_builder)
    nfev += 1
    if nll_star > fvals[j]:  # parabola overshot a non-quadratic kink
        rho_star = float(fine[j])
        nll_star, s_star = profile_negative_loglik(rho_star, y, X, C, cov_builder)
        nfev += 1
    sigma2 = s_star / (1.0 + rho_star)
    return FitResult(
        x=np.array([rho_star, sigma2]),
        fun=nll_star,
        nfev=nfev,
        extras={"scaled_sigma2": s_star},
    )


def distribution_matrix(Sigma: np.ndarray, C: np.ndarray) -> np.ndarray:
    """D = Sigma C' (C Sigma C')^{-1} — maps low-frequency residuals onto the
    high-frequency path (ts_disagg.py:96-97)."""
    V = np.linalg.multi_dot([C, Sigma, C.T])
    return np.linalg.solve(V, C @ Sigma).T


def beta_std_errors(Sigma: np.ndarray, X: np.ndarray) -> np.ndarray:
    """sqrt(diag((X' Sigma^{-1} X)^{-1})) (ts_disagg.py:452-455)."""
    Sinv_X = np.linalg.solve(Sigma, X)
    return np.sqrt(np.diagonal(np.linalg.inv(X.T @ Sinv_X)))


# ---------------------------------------------------------------------------
# banded solver for single very-long series (SURVEY.md §7 M8 extension)
#
# Spark parallelism is across SERIES; a single 10^5-point series still hits
# the dense kernels' O(n^3) wall.  For the Denton family the solve is an
# equality-constrained least squares
#
#     min ||W (x - p)||^2   s.t.   C x = y - C p  (shifted: d = x - p)
#
# whose KKT system [[W'W, C'], [C, 0]] is BANDED once constraint rows are
# interleaved after their period's last member: W'W couples x_t only with
# x_{t +/- order}, and each constraint row touches one period's members.
# Bandwidth ~ factor + order + 1, so the whole solve is O(n * b^2) time and
# O(n * b) memory — a 100k-point daily series solves in seconds where the
# dense path would need 10^15 flops and 80 GB for Sigma alone.
# ---------------------------------------------------------------------------

def banded_lu_solve(ab: np.ndarray, kl: int, ku: int, b: np.ndarray) -> np.ndarray:
    """Solve ``A x = b`` for banded ``A`` via Gaussian elimination with
    partial pivoting (LAPACK ``dgbtrf`` storage: ``ab[kl + ku + i - j, j] =
    A[i, j]``, rows ``0..kl-1`` reserved for pivoting fill-in; ab has
    ``2*kl + ku + 1`` rows).  Pure NumPy (scipy is not a dependency);
    the per-column loop costs O(n * (kl + ku) * kl) scalar work — linear in
    n, which is the whole point.  ``ab`` and ``b`` are modified in place.
    """
    n = ab.shape[1]
    if b.shape[0] != n:
        raise ValueError(f"b has {b.shape[0]} rows, expected {n}")
    diag = kl + ku
    for j in range(n):
        # pivot among A[j .. j+kl, j]
        col = ab[diag : diag + min(kl, n - 1 - j) + 1, j]
        pj = int(np.argmax(np.abs(col)))
        piv = col[pj]
        if piv == 0.0:
            raise np.linalg.LinAlgError("singular banded matrix")
        jend = min(j + ku + kl, n - 1)
        if pj:
            cols = np.arange(j, jend + 1)
            r1, r2 = diag + j - cols, diag + j + pj - cols
            tmp = ab[r1, cols].copy()
            ab[r1, cols] = ab[r2, cols]
            ab[r2, cols] = tmp
            b[j], b[j + pj] = b[j + pj], b[j]
        nm = min(kl, n - 1 - j)
        if nm:
            m = ab[diag + 1 : diag + nm + 1, j] / ab[diag, j]
            for c in range(j + 1, jend + 1):
                start = diag + j + 1 - c
                ab[start : start + nm, c] -= m * ab[diag + j - c, c]
            b[j + 1 : j + nm + 1] -= m * b[j]
    x = np.empty(n)
    for i in range(n - 1, -1, -1):
        cend = min(i + ku + kl, n - 1)
        if cend > i:
            cols = np.arange(i + 1, cend + 1)
            s = ab[diag + i - cols, cols] @ x[cols]
        else:
            s = 0.0
        x[i] = (b[i] - s) / ab[diag, i]
    return x


def _difference_gram_band(
    n: int, order: int, scale: np.ndarray | None, trimmed: bool
) -> list[np.ndarray]:
    """Diagonals of ``G = W'W`` where ``W`` is the (optionally column-scaled,
    optionally first-``order``-rows-trimmed) h-th difference operator —
    computed directly in band form, never materializing W.  Returns
    ``diags[e][i] = G[i, i + e]`` for ``e = 0..order``.

    Row ``t`` of ``(I - L)^order`` carries binomial coefficients
    ``(-1)^d C(order, d)`` at columns ``t - d`` (truncated for ``t < order``
    in the untrimmed form); trimming drops rows ``t < order``
    (denton-cholette, ts_disagg.py:164-176).
    """
    from math import comb

    coeff = np.array(
        [(-1.0) ** d * comb(order, d) for d in range(order + 1)]
    )
    s = np.ones(n) if scale is None else np.asarray(scale, dtype=float)
    diags = []
    for e in range(order + 1):
        g = np.zeros(n - e)
        i = np.arange(n - e)
        for d1 in range(0, order + 1 - e):
            t = i + e + d1  # the W row where columns i and i+e meet
            valid = t <= n - 1
            if trimmed:
                valid = valid & (t >= order)
            g[valid] += coeff[d1] * coeff[d1 + e]
        diags.append(g * s[i] * s[i + e])
    return diags


def _constraint_blocks(C: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-row contiguous support ``[lo_i, hi_i]`` of the constraint matrix,
    validating the banded-path preconditions (contiguous support, strictly
    increasing end columns) — ``ValueError`` otherwise so callers can fall
    back to the dense path."""
    n_low = C.shape[0]
    lo = np.full(n_low, -1, dtype=int)
    hi = np.full(n_low, -1, dtype=int)
    for i in range(n_low):
        nz = np.flatnonzero(C[i])
        if nz.size == 0:
            raise ValueError(f"constraint row {i} is empty")
        lo[i], hi[i] = nz[0], nz[-1]
        if not np.all(np.diff(nz) == 1):
            raise ValueError(f"constraint row {i} support is not contiguous")
    if np.any(np.diff(hi) <= 0):
        raise ValueError("constraint rows must end at strictly increasing columns")
    return lo, hi


def _interleave_positions(
    n: int, hi: np.ndarray
) -> tuple[np.ndarray, np.ndarray, int]:
    """Interleaved KKT ordering: x_t, then every lambda_i whose period ends
    at t — the permutation that makes the KKT system banded."""
    n_low = hi.shape[0]
    pos = np.empty(n, dtype=int)       # position of x_t
    lpos = np.empty(n_low, dtype=int)  # position of lambda_i
    ci = 0
    nxt = 0
    for t in range(n):
        pos[t] = nxt
        nxt += 1
        while ci < n_low and hi[ci] == t:
            lpos[ci] = nxt
            nxt += 1
            ci += 1
    if ci != n_low:
        raise ValueError("constraint end column beyond the high-freq axis")
    return pos, lpos, n + n_low


def denton_banded(
    y: np.ndarray,
    X: np.ndarray,
    C: np.ndarray,
    method: str,
    order: int = 1,
    criterion: str = "proportional",
) -> np.ndarray:
    """Banded-KKT Denton / Denton-Cholette solve: identical output to the
    dense ``distribution_matrix`` / ``denton_cholette_distribution`` path
    (asserted in tests to ~1e-8), O(n b^2) instead of O(n^3).

    ``C`` must have row-contiguous nonzero support with strictly increasing
    end columns (true for every time-ordered period constraint the
    relational layer produces — sum/mean blocks or first/last singletons);
    a ``ValueError`` otherwise, so callers can fall back to the dense path.
    """
    n, k = X.shape
    if k != 1:
        raise ValueError("denton supports exactly one indicator column")
    x = X.ravel().astype(float)
    p = x
    scale = None
    if criterion == "proportional":
        scale = 1.0 / (x * x.mean())
    gdiags = _difference_gram_band(
        n, order, scale, trimmed=(method == "denton-cholette")
    )

    lo, hi = _constraint_blocks(C)
    n_low = C.shape[0]
    pos, lpos, N = _interleave_positions(n, hi)

    # collect symmetric entries (a <= b) of the permuted KKT
    rows_a, rows_b, vals = [], [], []
    for e, g in enumerate(gdiags):
        i = np.arange(n - e)
        a, b2 = pos[i], pos[i + e]
        rows_a.append(np.minimum(a, b2))
        rows_b.append(np.maximum(a, b2))
        vals.append(g)
    for i in range(n_low):
        cols = np.arange(lo[i], hi[i] + 1)
        a = np.minimum(pos[cols], lpos[i])
        b2 = np.maximum(pos[cols], lpos[i])
        rows_a.append(a)
        rows_b.append(b2)
        vals.append(C[i, cols])
    ra = np.concatenate(rows_a)
    rb = np.concatenate(rows_b)
    vv = np.concatenate(vals)

    bw = int(np.max(rb - ra))
    kl = ku = bw
    ab = np.zeros((2 * kl + ku + 1, N))
    diag = kl + ku
    # upper triangle + mirrored lower triangle (skip diagonal double-add)
    ab[diag + ra - rb, rb] += vv
    off = ra != rb
    ab[diag + rb[off] - ra[off], ra[off]] += vv[off]

    rhs = np.zeros(N)
    rhs[lpos] = y - C @ p
    sol = banded_lu_solve(ab, kl, ku, rhs)
    return p + sol[pos]


#: above this high-frequency length the Denton family dispatches to the
# ---------------------------------------------------------------------------
# banded Chow-Lin (SURVEY.md §4 scale path: the AR(1) covariance has a
# closed-form TRIDIAGONAL inverse, so the whole GLS fit — profile likelihood
# included — runs through the same interleaved banded KKT as the Denton
# family, O(n b^2) per rho instead of O(n^3), never materializing Sigma)
#
# Identities used (M = unit-sigma2 AR(1) covariance, rho^|i-j| / (1-rho^2)):
#   * M^{-1} = tridiag(diag=[1, 1+rho^2, ..., 1+rho^2, 1], off=-rho)
#   * [[M^{-1}, C'], [C, 0]] [w; mu] = [0; b]  =>  mu = -(C M C')^{-1} b
#     and w = M C' (C M C')^{-1} b — one banded solve yields BOTH the GLS
#     normal-equation pieces (mu rows) and the distribution step (w rows).
#   * log det(C M C') = log|det KKT| - log det M^{-1},
#     log det M^{-1} = log(1 - rho^2)  (det of the AR(1) precision).
# ---------------------------------------------------------------------------

def banded_lu_solve_grid(
    ab: np.ndarray, kl: int, ku: int, b: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized multi-RHS :func:`banded_lu_solve` over a leading stack
    axis: ``ab`` is ``(G, 2*kl + ku + 1, n)`` in LAPACK band layout,
    ``b`` is ``(G, n, m)``; the same elimination runs data-parallel across
    all ``G`` systems (the rho grid of a profile-likelihood scan),
    amortizing the per-column Python overhead that would otherwise dominate
    G sequential factorizations.

    Returns ``(x, logabsdet)`` with ``x`` of shape ``(G, n, m)`` and
    ``logabsdet`` the log|det| of each system (sum of log|pivot|).  ``b``
    is modified in place.
    """
    abt = np.ascontiguousarray(ab.transpose(0, 2, 1))
    return _banded_lu_solve_grid_t(abt, kl, ku, b)


def _banded_lu_solve_grid_t(
    abt: np.ndarray, kl: int, ku: int, b: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Grid banded LU on TRANSPOSED band storage ``abt`` (G, n, W) with
    ``abt[g, c, kl + ku + i - c] = A[i, c]`` (one system-column per
    C-contiguous row).  In this layout the elimination's parallelogram
    update, multiplier row, and back-substitution row are all REGULAR
    STRIDED VIEWS of the flat buffer (element (i, c) lives at flat
    ``c*(W-1) + kl + ku + i``, so fixed-i-varying-c is a stride-(W-1)
    walk) — one fused vector op each, no per-column index-array
    gather/scatter.  The per-member pivot row swap still needs fancy
    indexing but only fires at the (rare) columns where a member pivots.
    ``abt`` and ``b`` are modified in place.
    """
    from numpy.lib.stride_tricks import as_strided

    G, n, W = abt.shape
    if W != 2 * kl + ku + 1:
        raise ValueError(f"band storage has {W} rows, expected {2 * kl + ku + 1}")
    diag = kl + ku
    Fv = abt.reshape(G, n * W)
    sG, sE = Fv.strides
    sC = (W - 1) * sE
    gi = np.arange(G)
    cbase = np.arange(n + kl + ku)
    pivs = np.empty((G, n))                # log|det| summed once at the end
    for j in range(n):
        nm = min(kl, n - 1 - j)
        col = abt[:, j, diag : diag + nm + 1]
        pj = np.argmax(np.abs(col), axis=1)
        jend = min(j + ku + kl, n - 1)
        if pj.any():
            # swap system-rows j and j+pj[g] over columns j..jend: flat
            # positions c*(W-1) + diag + j (+ pj) — per-member offsets, so
            # fancy indexing, but only at pivoting columns
            idx = cbase[j : jend + 1] * (W - 1) + (diag + j)
            idx2 = idx[None, :] + pj[:, None]
            r1 = Fv[:, idx].copy()
            Fv[:, idx] = Fv[gi[:, None], idx2]
            Fv[gi[:, None], idx2] = r1
            tb = b[:, j, :].copy()
            b[:, j, :] = b[gi, j + pj, :]
            b[gi, j + pj, :] = tb
        piv = abt[:, j, diag]
        pivs[:, j] = piv
        L2 = jend - j
        if nm:
            m = abt[:, j, diag + 1 : diag + nm + 1] / piv[:, None]
            if L2:
                off0 = (j + 1) * (W - 1) + diag + j
                rowj = as_strided(Fv[:, off0:], shape=(G, L2), strides=(sG, sC))
                blk = as_strided(
                    Fv[:, off0 + 1 :], shape=(G, L2, nm), strides=(sG, sC, sE)
                )
                blk -= m[:, None, :] * rowj[:, :, None]
            b[:, j + 1 : j + nm + 1, :] -= m[:, :, None] * b[:, j, None, :]
    if not np.all(pivs):
        raise np.linalg.LinAlgError("singular banded matrix in grid solve")
    logdet = np.log(np.abs(pivs)).sum(axis=1)
    x = np.empty_like(b)
    for i in range(n - 1, -1, -1):
        cend = min(i + ku + kl, n - 1)
        L = cend - i
        if L:
            off = (i + 1) * (W - 1) + diag + i
            rowi = as_strided(Fv[:, off:], shape=(G, L), strides=(sG, sC))
            s = np.einsum("gl,glm->gm", rowi, x[:, i + 1 : cend + 1, :])
            x[:, i, :] = (b[:, i, :] - s) / abt[:, i, diag][:, None]
        else:
            x[:, i, :] = b[:, i, :] / abt[:, i, diag][:, None]
    return x, logdet


def _gls_kkt_indices(C, n: int | None = None, n_diags: int = 2) -> dict:
    """rho-independent skeleton of the banded GLS KKT: constraint blocks,
    interleaved ordering, flattened scatter indices, and bandwidth.  Built
    once per series, reused by every grid evaluation.  ``n_diags`` is the
    precision band width: 2 (tridiagonal) for Chow-Lin's AR(1), 3
    (pentadiagonal) for Litterman's random-walk-with-AR(1)-innovations.

    ``C`` is either the dense constraint matrix, or — for series long
    enough that a dense (n_low, n) would itself be the memory wall, e.g.
    8000 x 96000 = 6 GB — the block form ``(lo, hi, vals)`` with per-row
    contiguous support ``[lo_i, hi_i]`` and ``vals`` the concatenated
    nonzero coefficients (requires explicit ``n``)."""
    if isinstance(C, np.ndarray):
        n_low, n = C.shape
        lo, hi = _constraint_blocks(C)
        lens = hi - lo + 1
        row_idx = np.repeat(np.arange(n_low), lens)
        col_idx = _block_col_idx(lo, lens)
        cvals = C[row_idx, col_idx].astype(float)
    else:
        lo, hi, cvals = C
        if n is None:
            raise ValueError("block-form constraints need an explicit n")
        lo, hi = np.asarray(lo, dtype=int), np.asarray(hi, dtype=int)
        n_low = lo.shape[0]
        if np.any(np.diff(hi) <= 0):
            raise ValueError(
                "constraint rows must end at strictly increasing columns"
            )
        if hi[-1] >= n or lo[0] < 0 or np.any(hi < lo):
            raise ValueError("constraint block support out of range")
        lens = hi - lo + 1
        row_idx = np.repeat(np.arange(n_low), lens)
        col_idx = _block_col_idx(lo, lens)
        cvals = np.asarray(cvals, dtype=float)
        if cvals.shape[0] != col_idx.shape[0]:
            raise ValueError("vals length must equal total block support")
    pos, lpos, N = _interleave_positions(n, hi)
    # scatter targets: the banded precision's diagonals (x_i, x_{i+e}) for
    # e = 0..n_diags-1, then C entries (x_col, lambda_row) — lambda sits
    # after its period's last member, so lpos[row] > pos[col] always:
    # (a, b) = (pos[col], lpos[row])
    ra = np.concatenate(
        [pos[: n - e] for e in range(n_diags)] + [pos[col_idx]]
    )
    rb = np.concatenate(
        [pos[e:] for e in range(n_diags)] + [lpos[row_idx]]
    )
    bw = int(np.max(rb - ra))
    return {
        "n": n, "n_low": n_low, "N": N, "pos": pos, "lpos": lpos,
        "ra": ra, "rb": rb, "cvals": cvals, "bw": bw,
        "row_idx": row_idx, "col_idx": col_idx, "n_diags": n_diags,
    }


def _block_col_idx(lo: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Concatenated ``arange(lo_i, lo_i + lens_i)`` per constraint block."""
    if lens.sum() == 0:
        return np.empty(0, dtype=int)
    step = np.ones(int(lens.sum()), dtype=int)
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    # +1 within a block; at each block start, jump from the previous block's
    # last column to this block's first
    step[starts[1:]] = lo[1:] - (lo[:-1] + lens[:-1] - 1)
    step[0] = lo[0] + 1  # cumsum yields lo[0] + 1 - 1 = lo[0] at position 0
    return np.cumsum(step) - 1


def _gram_band_chow_lin(rho: np.ndarray, n: int) -> tuple[np.ndarray, np.ndarray]:
    """Stacked band diagonals of Chow-Lin's AR(1) precision M^{-1} =
    tridiag([1, 1+rho^2, ..., 1], -rho) for every rho, concatenated in
    e-order, plus log det M^{-1} = log(1 - rho^2) per member."""
    G = len(rho)
    d0 = np.ones((G, n))
    d0[:, 1:-1] = 1.0 + rho[:, None] ** 2
    vv = np.concatenate(
        [d0, np.broadcast_to(-rho[:, None], (G, n - 1))], axis=1
    )
    return vv, np.log(1.0 - rho**2)


def _gram_band_litterman(rho: np.ndarray, n: int) -> tuple[np.ndarray, np.ndarray]:
    """Stacked band diagonals of Litterman's precision Delta' H' H Delta
    (H = I - rho L, Delta = I - L): B = H Delta = I - (1+rho) L + rho L^2
    has rows [1, -(1+rho), rho], so the Gram is PENTADIAGONAL with

        g0 = 1 + (1+rho)^2 + rho^2   (edge-truncated at the last two rows)
        g1 = -(1+rho)^2              (last entry -(1+rho))
        g2 = rho

    Both Delta and H are unit lower-triangular, so det(precision) = 1 and
    the KKT log-det correction is ZERO per member."""
    G = len(rho)
    r = rho[:, None]
    g0 = np.broadcast_to(1.0 + (1.0 + r) ** 2 + r**2, (G, n)).copy()
    if n >= 2:
        g0[:, -2] = 1.0 + (1.0 + rho) ** 2
    g0[:, -1] = 1.0
    g1 = np.broadcast_to(-((1.0 + r) ** 2), (G, max(n - 1, 0))).copy()
    if n >= 2:
        g1[:, -1] = -(1.0 + rho)
    g2 = np.broadcast_to(r, (G, max(n - 2, 0)))
    return np.concatenate([g0, g1, g2], axis=1), np.zeros(G)


_GRAM_BANDS = {"chow-lin": (_gram_band_chow_lin, 2), "litterman": (_gram_band_litterman, 3)}


def _gls_kkt_solve(
    grid: np.ndarray, skel: dict, B_low: np.ndarray, reg_method: str = "chow-lin"
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Assemble + solve the banded GLS KKT for every rho in ``grid`` with
    the low-frequency RHS ``B_low`` (n_low, m) placed on the lambda rows.

    Returns ``(Ainv_B, W_B, logdetA)``: ``Ainv_B[g] = (C M C')^{-1} B_low``
    (G, n_low, m), ``W_B[g] = M C' (C M C')^{-1} B_low`` (G, n, m), and
    ``log det(C M C')`` per grid member, where M is the unit-scale
    covariance of ``reg_method``.
    """
    n, N = skel["n"], skel["N"]
    pos, lpos = skel["pos"], skel["lpos"]
    ra, rb, cvals, bw = skel["ra"], skel["rb"], skel["cvals"], skel["bw"]
    kl = ku = bw
    diag = kl + ku
    rho = np.asarray(grid, dtype=float)
    G = len(rho)

    gram_fn, _nd = _GRAM_BANDS[reg_method]
    gram_vv, logdet_prec = gram_fn(rho, n)
    vv = np.concatenate(
        [gram_vv, np.broadcast_to(cvals, (G, cvals.shape[0]))], axis=1
    )
    # assemble straight into the transposed layout the strided solver wants
    # (abt[g, c, diag + i - c] = A[i, c]); no duplicate (a, b) pairs by
    # construction (same invariant the dense denton_banded assembly relies
    # on), so fancy += is a plain scatter
    abt = np.zeros((G, N, 2 * kl + ku + 1))
    abt[:, rb, diag + ra - rb] += vv
    off = ra != rb
    abt[:, ra[off], diag + rb[off] - ra[off]] += vv[:, off]

    m = B_low.shape[1]
    B = np.zeros((G, N, m))
    B[:, lpos, :] = B_low[None, :, :]
    sol, logdetK = _banded_lu_solve_grid_t(abt, kl, ku, B)
    # mu rows carry -(C M C')^{-1} B; w rows carry M C' (C M C')^{-1} B
    Ainv_B = -sol[:, lpos, :]
    W_B = sol[:, pos, :]
    # log det(C M C') = log|det KKT| - log det M^{-1}
    logdetA = logdetK - logdet_prec
    return Ainv_B, W_B, logdetA


#: memory budget for one banded profile-scan pass; the grid chunk adapts to
#: it.  The wall-clock cost of the scan is dominated by the PER-COLUMN
#: Python overhead of the elimination loop, paid once per pass — so the
#: fewer passes the better, as long as the (chunk, 3bw+1, N) stack fits.
_BANDED_SCAN_BYTES = 2 << 30


def _gls_profile_grid_banded(
    grid: np.ndarray,
    y: np.ndarray,
    CX: np.ndarray,
    skel: dict,
    reg_method: str = "chow-lin",
) -> np.ndarray:
    """Banded twin of ``_profile_grid_nll``: the same concentrated
    objective values, computed through the KKT identities instead of dense
    Sigma stacks."""
    n_low, k = CX.shape
    B_low = np.hstack([CX, y.reshape(-1, 1)])
    out = np.empty(len(grid))
    member_bytes = (3 * skel["bw"] + 1) * skel["N"] * 8
    chunk = max(1, min(len(grid), _BANDED_SCAN_BYTES // max(member_bytes, 1)))
    for s in range(0, len(grid), chunk):
        sub = np.asarray(grid[s : s + chunk], dtype=float)
        Ainv_B, _W, logdetA = _gls_kkt_solve(sub, skel, B_low, reg_method)
        Ainv_CX, Ainv_y = Ainv_B[:, :, :k], Ainv_B[:, :, k]
        M1 = np.einsum("ij,gil->gjl", CX, Ainv_CX)
        r1 = np.einsum("ij,gi->gj", CX, Ainv_y)
        beta = np.linalg.solve(M1, r1[..., None])[..., 0]
        resid = y[None, :] - beta @ CX.T
        Ainv_resid = Ainv_y - np.einsum("gik,gk->gi", Ainv_CX, beta)
        q0 = np.einsum("gi,gi->g", resid, Ainv_resid)
        s_star = np.maximum(q0 / n_low, 1e-300)
        out[s : s + len(sub)] = 0.5 * (
            n_low * np.log(2.0 * np.pi)
            + n_low * np.log(s_star)
            + logdetA
            + n_low
        )
    return out


def _gls_banded_eval(
    rho_val: float,
    y: np.ndarray,
    X: np.ndarray,
    CX: np.ndarray,
    skel: dict,
    reg_method: str = "chow-lin",
) -> tuple[float, float, np.ndarray, np.ndarray]:
    """One full GLS evaluation at fixed rho through the banded KKT:
    concentrated NLL, profiled scale, GLS beta, and distributed series —
    the banded mirror of (profile_negative_loglik, gls_beta,
    distribution_matrix) combined, from ONE factorization."""
    n_low, k = CX.shape
    B_low = np.hstack([CX, y.reshape(-1, 1)])
    Ainv_B, W_B, logdetA = _gls_kkt_solve(
        np.array([rho_val]), skel, B_low, reg_method
    )
    Ainv_CX, Ainv_y = Ainv_B[0, :, :k], Ainv_B[0, :, k]
    beta = np.linalg.solve(CX.T @ Ainv_CX, CX.T @ Ainv_y)
    resid = y - CX @ beta
    q0 = float(resid @ (Ainv_y - Ainv_CX @ beta))
    s_star = max(q0 / n_low, 1e-300)
    nll = 0.5 * (
        n_low * np.log(2.0 * np.pi)
        + n_low * np.log(s_star)
        + float(logdetA[0])
        + n_low
    )
    # distribution by linearity: w(resid) = w(y) - w(CX) @ beta
    y_hat = X @ beta + (W_B[0, :, k] - W_B[0, :, :k] @ beta)
    return nll, s_star, beta, y_hat


def _banded_CX(X: np.ndarray, C, skel: dict) -> np.ndarray:
    """C @ X for dense or block-form constraints."""
    if isinstance(C, np.ndarray):
        return C @ X
    CX = np.zeros((skel["n_low"], X.shape[1]))
    np.add.at(CX, skel["row_idx"], skel["cvals"][:, None] * X[skel["col_idx"]])
    return CX


def _apply_precision_band(rho: float, X: np.ndarray, reg_method: str) -> np.ndarray:
    """M^{-1} @ X through the band diagonals (no dense precision)."""
    gram_fn, n_diags = _GRAM_BANDS[reg_method]
    n = X.shape[0]
    vv, _ = gram_fn(np.array([rho]), n)
    out = np.zeros_like(X, dtype=float)
    start = 0
    for e in range(n_diags):
        g = vv[0, start : start + n - e]
        start += n - e
        if e == 0:
            out += g[:, None] * X
        else:
            out[: n - e] += g[:, None] * X[e:]
            out[e:] += g[:, None] * X[: n - e]
    return out


def _gls_banded_solve_fixed(
    y: np.ndarray, X: np.ndarray, C, rho: float, reg_method: str
) -> tuple[np.ndarray, np.ndarray, float, float]:
    y = np.asarray(y, dtype=float)
    n, _k = X.shape
    _gram_fn, n_diags = _GRAM_BANDS[reg_method]
    skel = _gls_kkt_indices(C, n=n, n_diags=n_diags)
    CX = _banded_CX(X, C, skel)
    nll, s_star, beta, y_hat = _gls_banded_eval(rho, y, X, CX, skel, reg_method)
    return y_hat, beta, s_star, nll


def chow_lin_banded_solve(
    y: np.ndarray, X: np.ndarray, C, rho: float
) -> tuple[np.ndarray, np.ndarray, float, float]:
    """Fixed-rho banded Chow-Lin: ``(y_hat, beta, s_star, nll)`` — the
    distribution/GLS machinery alone, for callers that bring their own rho
    (and for parity testing against the dense pipeline config-by-config,
    the direct analog of the Denton banded-vs-dense battery)."""
    return _gls_banded_solve_fixed(y, X, C, rho, "chow-lin")


def litterman_banded_solve(
    y: np.ndarray, X: np.ndarray, C, rho: float
) -> tuple[np.ndarray, np.ndarray, float, float]:
    """Fixed-rho banded Litterman — same contract as
    :func:`chow_lin_banded_solve` with the pentadiagonal random-walk
    precision.  The dense path additionally pays an O(n^3) INVERSE just to
    build Sigma (litterman_covariance); here the precision goes straight
    into the KKT band."""
    return _gls_banded_solve_fixed(y, X, C, rho, "litterman")


def _gls_banded_fit(
    y: np.ndarray,
    X: np.ndarray,
    C,
    reg_method: str,
    optimizer_kwargs: dict | None = None,
) -> tuple[np.ndarray, "FitResult", dict]:
    kwargs = dict(optimizer_kwargs or {})
    method = str(kwargs.get("method", "brent-profile")).lower()
    if method not in ("brent-profile", "profile"):
        raise ValueError(
            "banded GLS fits support only the concentrated profile "
            f"optimizer, got method={method!r}"
        )
    y = np.asarray(y, dtype=float)
    n, k = X.shape
    _gram_fn, n_diags = _GRAM_BANDS[reg_method]
    skel = _gls_kkt_indices(C, n=n, n_diags=n_diags)
    CX = _banded_CX(X, C, skel)

    # identical two-level scan to fit_rho_sigma's default path
    grid = np.linspace(_RHO_LO, _RHO_HI, 41)
    values = _gls_profile_grid_banded(grid, y, CX, skel, reg_method)
    best = int(np.argmin(values))
    lo_g = grid[max(best - 1, 0)]
    hi_g = grid[min(best + 1, len(grid) - 1)]
    fine = np.linspace(lo_g, hi_g, 33)
    fvals = _gls_profile_grid_banded(fine, y, CX, skel, reg_method)
    j = int(np.argmin(fvals))
    rho_star = float(fine[j])
    nfev = len(grid) + len(fine)
    if 0 < j < len(fine) - 1:
        f0, f1, f2 = fvals[j - 1], fvals[j], fvals[j + 1]
        denom = f0 - 2.0 * f1 + f2
        if denom > 0:
            h = fine[1] - fine[0]
            step = 0.5 * h * (f0 - f2) / denom
            rho_star = float(np.clip(fine[j] + step, fine[j - 1], fine[j + 1]))

    nll_star, s_star, beta, y_hat = _gls_banded_eval(
        rho_star, y, X, CX, skel, reg_method
    )
    nfev += 1
    if nll_star > fvals[j]:  # parabola overshot a non-quadratic kink
        rho_star = float(fine[j])
        nll_star, s_star, beta, y_hat = _gls_banded_eval(
            rho_star, y, X, CX, skel, reg_method
        )
        nfev += 1
    sigma2 = s_star / (1.0 + rho_star)

    # std errors through the banded precision: X' Sigma^{-1} X with
    # Sigma = sigma2 * M (the dense solve_series builds Sigma from the
    # UN-rescaled sigma2 — mirror that, not the (1+rho) ML-internal scale)
    xtsx = (X.T @ _apply_precision_band(rho_star, X, reg_method)) / sigma2
    std_beta = np.sqrt(np.diagonal(np.linalg.inv(xtsx)))

    result = FitResult(
        x=np.array([rho_star, sigma2]),
        fun=nll_star,
        nfev=nfev,
        extras={"scaled_sigma2": s_star},
    )
    info = {
        "beta": beta,
        "rho": rho_star,
        "sigma2": sigma2,
        "std_beta": std_beta,
    }
    return y_hat, result, info


def chow_lin_banded_fit(
    y: np.ndarray,
    X: np.ndarray,
    C,
    optimizer_kwargs: dict | None = None,
) -> tuple[np.ndarray, "FitResult", dict]:
    """Full banded Chow-Lin solve — the very-long-series twin of the dense
    ``fit_rho_sigma`` + ``gls_beta`` + ``distribution_matrix`` pipeline,
    with the SAME two-level profile-likelihood grid (identical rho
    semantics) but O(n b^2) per evaluation and O(n b) memory.  A 96k-point
    series fits in seconds where dense Sigma alone would need 74 GB.

    Only the default (profile) optimizer is supported; callers wanting the
    reference's 2-D Nelder-Mead surface fall back to the dense path.
    Raises ``ValueError`` for non-contiguous constraint support (same
    contract as :func:`denton_banded`).
    """
    return _gls_banded_fit(y, X, C, "chow-lin", optimizer_kwargs)


def litterman_banded_fit(
    y: np.ndarray,
    X: np.ndarray,
    C,
    optimizer_kwargs: dict | None = None,
) -> tuple[np.ndarray, "FitResult", dict]:
    """Full banded Litterman solve — same contract and grid semantics as
    :func:`chow_lin_banded_fit`, using the pentadiagonal random-walk
    precision (whose unit-triangular factors make the KKT log-det
    correction zero)."""
    return _gls_banded_fit(y, X, C, "litterman", optimizer_kwargs)


#: banded KKT path (dense is O(n^3): ~10 s and ~200 MB at 3000, hopeless at
#: 10^5; the banded path is linear in n)
BANDED_THRESHOLD = 2000


# ---------------------------------------------------------------------------
# whole-series solve (shared by the pandas API and the Spark grouped kernel)
# ---------------------------------------------------------------------------

def solve_series(
    y: np.ndarray,
    X: np.ndarray,
    C: np.ndarray,
    method: str,
    criterion: str = "proportional",
    order: int = 1,
    optimizer_kwargs: dict | None = None,
) -> tuple[np.ndarray, FitResult | None, dict]:
    """Run one series through the full method dispatch (ts_disagg.py:414-464).

    Parameters are already relational-layer outputs: ``y`` the pruned
    low-frequency vector (n_low,), ``X`` the high-frequency indicator matrix
    (n, k) in time order, ``C`` the pruned constraint matrix (n_low, n).

    Returns ``(y_hat, optimize_result_or_None, info)`` where ``info`` carries
    regression diagnostics (beta, rho, sigma2, std errors) for report output.
    """
    if method not in METHODS:
        raise ValueError(
            f"Method should be one of 'denton', 'denton-cholette', 'chow-lin', "
            f"'litterman'. Got {method}."
        )
    if criterion not in ("proportional", "additive"):
        raise ValueError(
            f"Criterion should be one of 'proportional', 'additive'. Got {criterion}"
        )

    n, k = X.shape
    n_low = y.shape[0]
    result: FitResult | None = None
    info: dict = {}

    if method in ("denton", "denton-cholette"):
        if k != 1:
            raise ValueError(f"{method} supports exactly one indicator column")
        if n >= BANDED_THRESHOLD:
            try:
                y_hat = denton_banded(y, X, C, method, order, criterion)
                return y_hat, None, {}
            except ValueError:
                pass  # non-contiguous constraints: fall through to dense
        if method == "denton":
            Sigma = denton_covariance(n, X, order, criterion)
            D = distribution_matrix(Sigma, C)
        else:
            D = denton_cholette_distribution(n, n_low, C, X, order, criterion)
        p = X.ravel()
    else:
        if n >= BANDED_THRESHOLD:
            # dense Sigma is O(n^2) memory / O(n^3) flops (litterman even
            # pays an O(n^3) inverse just to BUILD it); the banded AR
            # precisions make the whole fit O(n b^2).  Falls through to
            # dense for non-contiguous constraints or a non-profile
            # optimizer request (both only realistic at small n).
            try:
                return _gls_banded_fit(y, X, C, method, optimizer_kwargs)
            except ValueError:
                pass
        cov_builder = COVARIANCE_BUILDERS[method]
        result = fit_rho_sigma(y, X, C, cov_builder, optimizer_kwargs)
        rho, sigma2 = result.x
        Sigma = cov_builder(rho, sigma2, n)
        beta = gls_beta(Sigma, y, X, C)
        info = {
            "beta": beta,
            "rho": rho,
            "sigma2": sigma2,
            "std_beta": beta_std_errors(Sigma, X),
        }
        p = X @ beta
        D = distribution_matrix(Sigma, C)

    y_hat = p + D @ (y - C @ p)
    return y_hat, result, info
