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
    n_low = y.shape[0]
    G = len(grid)
    # the scan only ever needs V0 = C Sigma C' — builders may supply it
    # directly (litterman avoids G full inverses that way)
    v0_fn = getattr(cov_builder, "batched_V0", None)
    if v0_fn is not None:
        V0 = v0_fn(grid, n, C)
    else:
        stack_fn = getattr(cov_builder, "batched", None)
        if stack_fn is not None:
            Sig = stack_fn(grid, n)
        else:
            Sig = np.empty((G, n, n))
            for i, r in enumerate(grid):
                Sig[i] = cov_builder(r, 1.0, n)
        V0 = np.matmul(np.matmul(C, Sig), C.T)  # (G, n_low, n_low)
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
    _sign, logdet0 = np.linalg.slogdet(V0)
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
    grid = np.linspace(_RHO_LO, _RHO_HI, 41)
    values = _profile_grid_nll(grid, y, X, C, cov_builder)
    best = int(np.argmin(values))
    lo = grid[max(best - 1, 0)]
    hi = grid[min(best + 1, len(grid) - 1)]
    fine = np.linspace(lo, hi, 33)
    fvals = _profile_grid_nll(fine, y, X, C, cov_builder)
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

    if method == "denton":
        if k != 1:
            raise ValueError("denton supports exactly one indicator column")
        Sigma = denton_covariance(n, X, order, criterion)
        D = distribution_matrix(Sigma, C)
        p = X.ravel()
    elif method == "denton-cholette":
        if k != 1:
            raise ValueError("denton-cholette supports exactly one indicator column")
        D = denton_cholette_distribution(n, n_low, C, X, order, criterion)
        p = X.ravel()
    else:
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
