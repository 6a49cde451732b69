#!/usr/bin/env python
"""Benchmark of record: NUTS effective samples/sec/chip on the radon
hierarchical model (cf. BASELINE.md; reference harness
``benchmarks/benchmarks/benchmarks.py:25-45,160-169`` — the
``glm_hierarchical`` model with county varying intercept+slope).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Runs on whatever JAX backend the environment provides (TPU under axon;
true CPU when PYTHONPATH strips the axon site).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def build_model(pm):
    import pandas as pd
    data = pd.read_csv(os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "pymc3_tpu", "examples", "data", "radon.csv"))
    data["log_radon"] = data["log_radon"].astype(np.float32)
    county_idx = data.county_code.values.astype("int32")
    n_counties = len(data.county.unique())

    with pm.Model() as model:
        mu_a = pm.Normal("mu_a", mu=0.0, sigma=100.0 ** 2)
        sigma_a = pm.HalfCauchy("sigma_a", 5)
        mu_b = pm.Normal("mu_b", mu=0.0, sigma=100.0 ** 2)
        sigma_b = pm.HalfCauchy("sigma_b", 5)
        a = pm.Normal("a", mu=mu_a, sigma=sigma_a, shape=n_counties)
        b = pm.Normal("b", mu=mu_b, sigma=sigma_b, shape=n_counties)
        eps = pm.HalfCauchy("eps", 5)
        radon_est = a[county_idx] + b[county_idx] * data.floor.values
        pm.Normal("radon_like", mu=radon_est, sigma=eps,
                  observed=data.log_radon)
    return model


def main():
    import pymc3_tpu as pm
    from pymc3_tpu.config import enable_compilation_cache
    import jax
    enable_compilation_cache("bench")

    draws = int(os.environ.get("BENCH_DRAWS", 2000))
    tune = int(os.environ.get("BENCH_TUNE", 500))
    chains = int(os.environ.get("BENCH_CHAINS", 8))

    model = build_model(pm)

    def run(seed):
        t0 = time.time()
        trace = pm.sample(draws=draws, tune=tune, chains=chains, model=model,
                          progressbar=False, random_seed=seed,
                          compute_convergence_checks=False)
        wall = time.time() - t0
        return trace, wall

    # first call pays compile; second measures steady-state throughput
    run(1)
    trace, wall = run(2)

    ess = pm.ess(trace, var_names=["mu_a"])["mu_a"]
    ess_per_sec = float(np.asarray(ess)) / wall
    rhat = float(np.asarray(pm.rhat(trace, var_names=["mu_a"])["mu_a"]))

    # No published reference numbers exist (BASELINE.md: "unpublished" and
    # theano is unavailable in this image), so vs_baseline is null.
    out = {
        "metric": "radon_nuts_ess_per_sec_per_chip",
        "value": round(ess_per_sec, 2),
        "unit": "ess/s",
        "vs_baseline": None,
        "detail": {
            "draws": draws, "tune": tune, "chains": chains,
            "wall_s": round(wall, 2), "ess_mu_a": round(float(ess), 1),
            "rhat_mu_a": round(rhat, 4),
            "backend": jax.default_backend(),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
