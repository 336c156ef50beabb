#!/bin/bash
# Round-3 TPU measurement session: run everything in one tunnel window.
# Sequential on purpose — the axon compile service serializes machine-wide
# and timings are garbage under host contention (docs/PERF.md rules).
# Logs to /tmp/tpu_r3_logs/<step>.log; a failing step does not stop the rest.
cd /root/repo || exit 1
L=/tmp/tpu_r3_logs
mkdir -p "$L"

run() {
  local name=$1; shift
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "${T:-2400}" "$@" >"$L/$name.log" 2>&1
  echo "rc=$? $(tail -3 "$L/$name.log" | tr '\n' ' | ')"
}

T=120  run probe          python -c "import jax; print(jax.devices())"
grep -qiE "tpu|axon" "$L/probe.log" || { echo "tunnel down, aborting"; exit 2; }

# timings are garbage under host contention: stop a known CPU-heavy job
# (exact PID only — never kill by pattern) and let the host settle
if [ -f /tmp/cpu_heavy.pid ]; then
  kill "$(cat /tmp/cpu_heavy.pid)" 2>/dev/null && sleep 10
  rm -f /tmp/cpu_heavy.pid
fi

# --- missing-documentation items first (short tunnel windows happen) ---
# scale-cascade steady-state table (VGA + 1080p) for docs/PERF.md
T=3000 run scale_cascade  python scripts/prof_scale_cascade.py
# BASELINE config 5: fused 3-cascade batch vs 3 separate runs
T=3000 run multi_cascade  python scripts/prof_multi_cascade.py
# headline
T=2400 run bench_default  python bench.py

# --- hardware equivalence suites (front kernel, tail kernels, TPU modes) ---
T=2400 run tpu_kernels    env CLFD_TEST_TPU=1 python -m pytest \
                              tests/test_front_kernel.py \
                              tests/test_tail_kernel.py -q
T=3000 run tpu_modes      env CLFD_TEST_TPU=1 python -m pytest \
                              tests/test_tpu_modes.py -q

# --- re-confirmation sweeps (numbers already recorded in PERF.md) ---
# front-depth sweep at a cap that fits fk9-11 survivor counts
# (CPU-measured: fk9=30040 fk10=18389 fk11=11544 on the bench scene)
T=2400 run fk_sweep       env CLFD_PROF_FKS=9,10,11,12 CLFD_PROF_CAP=32768 \
                              python scripts/prof_r3.py
T=1800 run fk8_cap64k     env CLFD_PROF_FKS=8 CLFD_PROF_CAP=65536 \
                              python scripts/prof_r3.py
# column-slice cache A/B at the current default depth
T=1200 run colcache_off   env CLFD_PROF_FKS=12 python scripts/prof_r3.py
T=1800 run colcache_on    env CLFD_FRONT_COLCACHE=1 CLFD_PROF_FKS=12 \
                              python scripts/prof_r3.py

# strips program on the real chip (1-strip mesh == unsharded check)
T=2400 run strips         python scripts/prof_strips.py

# candidate bench configs
T=2400 run bench_fk10     env CLFD_BENCH_FRONT=10 CLFD_BENCH_CAP=32768 \
                              python bench.py
T=2400 run bench_fk9      env CLFD_BENCH_FRONT=9 CLFD_BENCH_CAP=65536 \
                              python bench.py

echo "=== done ($(date +%H:%M:%S)); logs in $L ==="
