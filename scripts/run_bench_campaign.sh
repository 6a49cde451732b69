#!/bin/bash
# Round-3 TPU benchmark campaign: strictly serialized (one JAX/tunnel
# process at a time). Appends results under bench_out/.
set -u
cd /root/repo
mkdir -p bench_out
run() {
  name=$1; shift
  echo "=== $name start $(date -u +%H:%M:%S) ===" >> bench_out/campaign.log
  "$@" > "bench_out/${name}_r03.log" 2>&1
  echo "=== $name done rc=$? $(date -u +%H:%M:%S) ===" >> bench_out/campaign.log
}
run sweep     env SWEEP_DRAWS=500 SWEEP_TUNE=500 timeout 7200 python scripts/bench_sweep.py 256 512 1024 2048 4096
run profile256  env PROF_CHAINS=256 timeout 1800 python scripts/bench_nuts_profile.py
run profile2048 env PROF_CHAINS=2048 timeout 3600 python scripts/bench_nuts_profile.py
run suite     timeout 7200 python scripts/bench_suite.py best mixture ode
run gp        timeout 1800 python scripts/bench_gp_pallas.py
run advi      timeout 1800 python scripts/bench_advi_minibatch.py
run smc       timeout 1800 python scripts/bench_smc.py
echo "CAMPAIGN COMPLETE $(date -u)" >> bench_out/campaign.log
