#!/usr/bin/env python
"""Benchmark of record: NUTS effective samples/sec/chip on the radon
hierarchical model (cf. BASELINE.md; reference harness
``benchmarks/benchmarks/benchmarks.py:25-45,160-186`` — the
``glm_hierarchical`` model with county varying intercept+slope,
metric = ESS(mu_a)/second, sampling wall time only).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Configuration is TPU-native: chains are a vmap batch axis (hundreds per
chip), mass-matrix adaptation is pooled across chains with an exact
cross-chain Welford ``psum`` (``quadpotential.py:welford_merge_psum``), and
draws stream device->host in fixed blocks so HBM stays bounded.

``vs_baseline``: the reference (Theano, CPU) cannot run in this image, so
the documented stand-in baseline is THIS framework on the true-CPU backend
at the CONFIG-IDENTICAL draws/tune split (2000/1000, 4 chains — the asv
chain count, ``benchmarks.py:160-169``). Generate the per-config table for
ALL FIVE baseline configs with ``python scripts/bench_baseline_cpu_all.py``
(writes BASELINE_CPU.json); vs_baseline = TPU ESS/s / CPU ESS/s.
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

    # exact reference parameterization (benchmarks.py:25-45): NON-centered
    # county effects (a = mu_a + sigma_a * a_raw)
    with pm.Model() as model:
        mu_a = pm.Normal("mu_a", mu=0.0, sigma=100.0 ** 2)
        sigma_a = pm.HalfCauchy("sigma_a", 5)
        mu_b = pm.Normal("mu_b", mu=0.0, sigma=100.0 ** 2)
        sigma_b = pm.HalfCauchy("sigma_b", 5)
        a_raw = pm.Normal("a", mu=0.0, sigma=1.0, shape=n_counties)
        b_raw = pm.Normal("b", mu=0.0, sigma=1.0, shape=n_counties)
        a = mu_a + sigma_a * a_raw
        b = mu_b + sigma_b * b_raw
        eps = pm.HalfCauchy("eps", 5)
        radon_est = a[county_idx] + b[county_idx] * data.floor.values
        pm.Normal("radon_like", mu=radon_est, sigma=eps,
                  observed=data.log_radon)
    return model


def run_config(pm, model, draws, tune, chains, target_accept, pooled, seed):
    axis_name = "chains_local" if pooled else None
    # Record only the metric variable (reference list-`trace` semantics,
    # `pymc3/sampling.py:268`). In this dev harness the device->host link
    # is a ~5 MB/s network tunnel, so streaming the full ~370-float/draw
    # decode would measure the tunnel, not the chip (BENCHMARKS.md r3);
    # on real hardware (PCIe D2H) the full trace costs ~nothing — set
    # BENCH_FULL_TRACE=1 to measure that configuration.
    trace_arg = None if os.environ.get("BENCH_FULL_TRACE") else ["mu_a"]
    t0 = time.time()
    trace = pm.sample(draws=draws, tune=tune, chains=chains, model=model,
                      progressbar=False, random_seed=seed,
                      target_accept=target_accept, axis_name=axis_name,
                      trace=trace_arg,
                      # only the divergence stat crosses the (tunnel) D2H
                      # link; full stats cost ~10s/run at 2048 chains here
                      record_stats=["diverging"],
                      compute_convergence_checks=False)
    wall = time.time() - t0
    return trace, wall


def main():
    import pymc3_tpu as pm
    from pymc3_tpu.config import enable_compilation_cache
    import jax
    enable_compilation_cache("bench")

    draws = int(os.environ.get("BENCH_DRAWS", 2000))
    tune = int(os.environ.get("BENCH_TUNE", 1000))
    chains = int(os.environ.get("BENCH_CHAINS", 2048))
    target_accept = float(os.environ.get("BENCH_TARGET_ACCEPT", 0.9))
    pooled = os.environ.get("BENCH_POOLED", "1") != "0"

    model = build_model(pm)

    # first call pays compile; second measures steady-state throughput
    tr1, _ = run_config(pm, model, draws, tune, chains, target_accept,
                        pooled, seed=1)
    compile_info = dict(tr1.report._t_compile or {})
    trace, wall = run_config(pm, model, draws, tune, chains, target_accept,
                             pooled, seed=2)

    ess = float(np.asarray(pm.ess(trace, var_names=["mu_a"])["mu_a"]))
    ess_per_sec = ess / wall
    rhat = float(np.asarray(pm.rhat(trace, var_names=["mu_a"])["mu_a"]))
    n_div = int(np.sum(np.asarray(trace.get_sampler_stats("diverging"))))
    div_frac = n_div / float(draws * chains)

    # posterior-moment cross-check vs the CPU stand-in run (BASELINE.md:
    # "verify posterior moments agree within Monte-Carlo error")
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "scripts"))
    from bench_suite import posterior_moments, moment_check
    tpu_moments = posterior_moments(pm, trace, ["mu_a"])
    moment_detail = None

    vs_baseline = None
    baseline_detail = None
    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BASELINE_CPU.json")
    if os.path.exists(base_path):
        with open(base_path) as f:
            base = json.load(f)
        # per-config table (scripts/bench_baseline_cpu_all.py) with
        # back-compat for the old radon-only flat schema
        cfg_tbl = base.get("configs", {}).get("radon") or base
        if cfg_tbl.get("moments"):
            check = moment_check(tpu_moments, cfg_tbl["moments"])
            moment_detail = {
                "check": "pass" if check["pass"] else "FAIL",
                "max_z": check["max_z"],
                "max_sd_rel": check["max_sd_rel"],
                "tpu_mu_a": {k: [round(x, 4) for x in
                                 tpu_moments["mu_a"][k]]
                             for k in ("mean", "sd")},
                "cpu_mu_a": {k: [round(float(x), 4) for x in
                                 np.atleast_1d(cfg_tbl["moments"]
                                               ["mu_a"][k])]
                             for k in ("mean", "sd")},
            }
        if cfg_tbl.get("ess_per_sec"):
            vs_baseline = round(ess_per_sec / float(cfg_tbl["ess_per_sec"]),
                                1)
            baseline_detail = {
                "cpu_ess_per_sec": cfg_tbl["ess_per_sec"],
                "cpu_config": {k: cfg_tbl.get(k) for k in
                               ("draws", "tune", "chains", "wall_s")},
                "note": "stand-in: this framework on true-CPU backend at the "
                        "reference asv config (Theano reference unavailable "
                        "in this image)"}

    out = {
        "metric": "radon_nuts_ess_per_sec_per_chip",
        "value": round(ess_per_sec, 2),
        "unit": "ess/s",
        "vs_baseline": vs_baseline,
        "detail": {
            "draws": draws, "tune": tune, "chains": chains,
            "target_accept": target_accept, "pooled_adaptation": pooled,
            "wall_s": round(wall, 2), "ess_mu_a": round(ess, 1),
            "rhat_mu_a": round(rhat, 4),
            "divergences": n_div,
            "divergence_frac": round(div_frac, 5),
            # trace + pure-XLA compile walls of the block program (a
            # persistent-cache warm start shows compile_s ~ 0; see
            # BENCHMARKS.md "Compile cost")
            "lower_s": compile_info.get("lower_s"),
            "compile_s": compile_info.get("compile_s"),
            "backend": jax.default_backend(),
            "baseline": baseline_detail,
            "moment_check": moment_detail,
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
