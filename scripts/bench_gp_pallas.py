"""TPU microbench: fused Pallas stationary covariance vs fused-XLA fallback.

Run on the real TPU (default env). Prints per-kind timings for an N x N
kernel matrix build and for a full GP marginal-likelihood+grad step
(VERDICT r1 item 6: record the speedup, or the negative result).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from pymc3_tpu.ops.pallas.gp_cov import stationary_cov, _fallback


def timed(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    n = int(os.environ.get("GP_BENCH_N", 4096))
    d = int(os.environ.get("GP_BENCH_D", 4))
    print(f"backend={jax.default_backend()} n={n} d={d}")
    rng = np.random.RandomState(0)
    X = jnp.asarray(rng.randn(n, d).astype(np.float32))

    for kind in ("expquad", "matern52", "exponential"):
        pallas_fn = jax.jit(lambda A, k=kind: stationary_cov(
            A, None, kind=k, force_pallas=True))
        xla_fn = jax.jit(lambda A, k=kind: _fallback(k, A, A))
        # correctness first
        kp = np.asarray(pallas_fn(X))
        kx = np.asarray(xla_fn(X))
        err = float(np.max(np.abs(kp - kx)))
        tp = timed(pallas_fn, X)
        tx = timed(xla_fn, X)
        gb = 4 * (n * n + 2 * n * d) / 1e9
        print(f"{kind:12s} pallas {tp*1e3:7.3f} ms ({gb/tp:6.1f} GB/s)  "
              f"xla {tx*1e3:7.3f} ms ({gb/tx:6.1f} GB/s)  "
              f"speedup {tx/tp:5.2f}x  max|err| {err:.2e}")

    if os.environ.get("GP_BENCH_SKIP_MLL"):
        return

    # end-to-end: GP marginal likelihood value+grad wrt (ls, sigma)
    y = jnp.asarray(np.sin(np.asarray(X[:, 0])) +
                    0.1 * rng.randn(n).astype(np.float32))

    def mll(params, use_pallas):
        ls, sn = params
        K = stationary_cov(X / ls, None, kind="expquad",
                           force_pallas=use_pallas)
        K = K + (sn ** 2 + 1e-5) * jnp.eye(n, dtype=K.dtype)
        L = jnp.linalg.cholesky(K)
        a = jax.scipy.linalg.cho_solve((L, True), y)
        return -0.5 * y @ a - jnp.sum(jnp.log(jnp.diag(L)))

    p0 = (jnp.float32(1.0), jnp.float32(0.3))
    for use_pallas in (True, False):
        vg = jax.jit(jax.value_and_grad(lambda p: mll(p, use_pallas)))
        t = timed(vg, p0, reps=10)
        v, g = vg(p0)
        name = "pallas" if use_pallas else "xla"
        print(f"mll+grad [{name:6s}] {t*1e3:8.3f} ms  "
              f"val {float(v):.3f} dls {float(g[0]):.4f}")


if __name__ == "__main__":
    main()
