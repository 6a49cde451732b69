"""Fused stationary GP covariance kernel (Pallas/TPU).

The GP library's hot op is building the N×M kernel matrix
``K = f(|x-x'|²)`` (cf. reference ``pymc3/gp/cov.py:272-440``: ``square_dist``
followed by the covariance function). Done naively that is several N×M
HBM round-trips (distance matrix, then sqrt, then polynomial, then exp).
This kernel computes the *exact pairwise-difference* squared distance (the
float32-safe form — the x²+x'²-2xx' trick cancels catastrophically for
nearby points) and applies the covariance function in one VMEM-resident
pass per 128×128 output tile, so the only HBM traffic is reading X/Xs tiles
and writing K once.

Gradients: the op is wrapped in ``jax.custom_vjp``. The backward pass needs
only two matmuls plus elementwise work on d² (dK/dd² has a closed form for
every kernel here), so it runs as plain XLA — recomputing d² is cheaper
than saving an N×M residual in HBM.

Selection: ``stationary_cov`` dispatches to Pallas on TPU backends for
problems ≥ 128×128 and falls back to fused jnp everywhere else (CPU test
meshes, tiny N). ``PYMC3_TPU_DISABLE_PALLAS=1`` forces the fallback.

Measured (TPU v5e, ``scripts/bench_gp_pallas.py``): at n=16384, d=4 the
Pallas kernel and XLA's own fusion of the fallback tie at ~173 GB/s
effective — both sit at the VPU transcendental ceiling (~45G exp/s), so
there is no headroom left in this op; max|err| = 0 between the paths, and
end-to-end GP marginal-likelihood+grad (cholesky-dominated) is identical.
At n=4096 timings are tunnel-dispatch-bound and noisy (0.6–1.4x). The
Pallas path is kept as the TPU default: equal-or-better, and it guarantees
the single-pass VMEM schedule regardless of what surrounds it in the jit.
"""
from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["stationary_cov", "pallas_stationary_available",
           "STATIONARY_KINDS"]

# kind -> f(d2); d2 is the squared distance in lengthscale units
STATIONARY_KINDS = ("expquad", "matern52", "matern32", "matern12",
                    "exponential")

_TILE = 128
_EPS = 1e-12


def _apply_covfn(kind, d2):
    """K = f(d²) — shared by the Pallas kernel body and the XLA fallback."""
    if kind == "expquad":
        return jnp.exp(-0.5 * d2)
    if kind == "matern52":
        t = jnp.sqrt(5.0 * d2 + _EPS)
        return (1.0 + t + (t * t) / 3.0) * jnp.exp(-t)
    if kind == "matern32":
        t = jnp.sqrt(3.0 * d2 + _EPS)
        return (1.0 + t) * jnp.exp(-t)
    if kind == "matern12":
        return jnp.exp(-jnp.sqrt(d2 + _EPS))
    if kind == "exponential":
        # k = exp(-r/2) — matches gp.cov.Exponential (reference cov.py:415)
        return jnp.exp(-0.5 * jnp.sqrt(d2 + _EPS))
    raise ValueError(f"unknown stationary kind: {kind}")


def _dcov_dd2(kind, d2):
    """dK/d(d²) in closed form (see module docstring)."""
    if kind == "expquad":
        return -0.5 * jnp.exp(-0.5 * d2)
    if kind == "matern52":
        t = jnp.sqrt(5.0 * d2 + _EPS)
        return -(5.0 / 6.0) * (1.0 + t) * jnp.exp(-t)
    if kind == "matern32":
        return -1.5 * jnp.exp(-jnp.sqrt(3.0 * d2 + _EPS))
    if kind == "matern12":
        r = jnp.sqrt(d2 + _EPS)
        return jnp.exp(-r) * (-0.5 / r)
    if kind == "exponential":
        r = jnp.sqrt(d2 + _EPS)
        return jnp.exp(-0.5 * r) * (-0.25 / r)
    raise ValueError(f"unknown stationary kind: {kind}")


def _sqdist_exact(X, Xs):
    """Float32-safe pairwise squared distance.

    Low-dim (the usual GP case): exact pairwise-difference form — the
    x²+x'²-2xx' matmul trick cancels catastrophically in float32. High-dim:
    the (n, m, d) intermediate would dominate memory, so fall back to the
    matmul form (same tradeoff as gp/cov.py:261-269)."""
    if X.shape[-1] <= 32:
        d2 = jnp.sum((X[:, None, :] - Xs[None, :, :]) ** 2, axis=-1)
    else:
        d2 = (jnp.sum(X ** 2, axis=-1)[:, None]
              + jnp.sum(Xs ** 2, axis=-1)[None, :] - 2 * X @ Xs.T)
    return jnp.clip(d2, 0.0, jnp.inf)


def _fallback(kind, X, Xs):
    return _apply_covfn(kind, _sqdist_exact(X, Xs))


# --------------------------------------------------------------------------
# Pallas path
# --------------------------------------------------------------------------

def _kernel_body(kind, n_feat, x_ref, yt_ref, o_ref):
    """One (TILE, TILE) output tile: exact d² accumulated feature-by-feature
    on the VPU, covariance function applied in-register.

    Y arrives pre-transposed as (n_feat, TILE) so ``yt_ref[d:d+1, :]`` is
    already lane-major — no in-kernel sublane→lane transposes (each one
    costs a cross-lane shuffle per feature per tile)."""
    acc = jnp.zeros((_TILE, _TILE), jnp.float32)
    for d in range(n_feat):
        xi = x_ref[:, d:d + 1].astype(jnp.float32)      # (TILE, 1) sublane
        yj = yt_ref[d:d + 1, :].astype(jnp.float32)     # (1, TILE) lane
        diff = xi - yj
        acc += diff * diff
    o_ref[:] = _apply_covfn(kind, acc).astype(o_ref.dtype)


@functools.lru_cache(maxsize=None)
def _build_pallas_call(kind, n, m, n_feat, dtype_name, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid = (n // _TILE, m // _TILE)
    body = functools.partial(_kernel_body, kind, n_feat)
    kwargs = {}
    if not interpret:
        # ~n_feat VPU adds + one transcendental per output element
        kwargs["cost_estimate"] = pl.CostEstimate(
            flops=3 * n * m * n_feat, transcendentals=n * m,
            bytes_accessed=4 * (n * n_feat + m * n_feat + n * m))
    return pl.pallas_call(
        body,
        out_shape=jax.ShapeDtypeStruct((n, m), jnp.dtype(dtype_name)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TILE, n_feat), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_feat, _TILE), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TILE, _TILE), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        interpret=bool(interpret),
        **kwargs,
    )


def _pad_rows(A, to):
    pad = to - A.shape[0]
    if pad == 0:
        return A
    return jnp.concatenate(
        # pad with 1e6 so padded rows are far away (K≈0, no NaN risk)
        [A, jnp.full((pad, A.shape[1]), 1e6, A.dtype)], axis=0)


def _pallas_cov(kind, X, Xs, interpret=False):
    n, d = X.shape
    m = Xs.shape[0]
    n_pad = -(-n // _TILE) * _TILE
    m_pad = -(-m // _TILE) * _TILE
    Xp = _pad_rows(X, n_pad)
    Xsp = _pad_rows(Xs, m_pad)
    call = _build_pallas_call(kind, n_pad, m_pad, d, X.dtype.name,
                              interpret)
    K = call(Xp, Xsp.T)
    return K[:n, :m]


def pallas_stationary_available(n=None, m=None):
    """True when the TPU Pallas path would be used for an n×m problem.

    Measured on TPU v5e (BENCHMARKS.md r3): the hand-written kernel is
    0.6-0.75x the fused-XLA form at n=4096 and only TIES at n=16384 —
    both sit at the VPU transcendental ceiling, and XLA's fusion wins the
    smaller tiles. The XLA form is therefore the default; the Pallas
    kernel stays available (force_pallas / PYMC3_TPU_FORCE_PALLAS=1) for
    its guaranteed single-pass VMEM schedule independent of surrounding
    fusion context.
    """
    if os.environ.get("PYMC3_TPU_DISABLE_PALLAS"):
        return False
    if not os.environ.get("PYMC3_TPU_FORCE_PALLAS"):
        return False
    if jax.default_backend() != "tpu":
        return False
    if n is not None and m is not None and (n * m) < _TILE * _TILE:
        return False
    return True


# --------------------------------------------------------------------------
# public op with custom VJP
# --------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _make_op(kind, use_pallas, interpret):
    @jax.custom_vjp
    def cov(X, Xs):
        if use_pallas:
            return _pallas_cov(kind, X, Xs, interpret=interpret)
        return _fallback(kind, X, Xs)

    def fwd(X, Xs):
        return cov(X, Xs), (X, Xs)

    def bwd(res, g):
        X, Xs = res
        # w = g * dK/dd²; then dX = 2(rowsum(w)·X − w@Xs) — two MXU matmuls
        d2 = _sqdist_exact(X, Xs)
        w = g * _dcov_dd2(kind, d2)
        dX = 2.0 * (jnp.sum(w, axis=1, keepdims=True) * X - w @ Xs)
        dXs = 2.0 * (jnp.sum(w, axis=0)[:, None] * Xs - w.T @ X)
        return dX, dXs

    cov.defvjp(fwd, bwd)
    return cov


def stationary_cov(X, Xs=None, kind="expquad", *, force_pallas=None,
                   interpret=False):
    """K = f(pairwise squared distance) for lengthscale-scaled inputs.

    Parameters
    ----------
    X : (n, d) array.  Xs : (m, d) array or None (=> Xs = X).
    kind : one of ``STATIONARY_KINDS``.
    force_pallas : override backend dispatch (tests).
    interpret : run the Pallas kernel in interpreter mode (tests on CPU).
    """
    if kind not in STATIONARY_KINDS:
        raise ValueError(f"kind must be one of {STATIONARY_KINDS}")
    X = jnp.asarray(X)
    Xs_in = X if Xs is None else jnp.asarray(Xs)
    if X.ndim != 2 or Xs_in.ndim != 2:
        raise ValueError("X and Xs must be rank-2 (n, d)")
    if force_pallas is None:
        use_pallas = pallas_stationary_available(X.shape[0], Xs_in.shape[0])
    else:
        use_pallas = bool(force_pallas)
    op = _make_op(kind, use_pallas, bool(interpret))
    return op(X, Xs_in)
