#!/bin/bash
# Round-5 TPU measurement session: one tunnel window, sequential on
# purpose (the axon compile service serializes machine-wide and timings
# are garbage under host contention -- docs/PERF.md rules).  This host
# has ONE CPU core, so NOTHING else may run during timing.
# Logs to /tmp/tpu_r5_logs/<step>.log; a failing step does not stop the
# rest.  Evidence artifacts (committed): TPU_TESTS_r05.txt.
cd /root/repo || exit 1
L=/tmp/tpu_r5_logs
mkdir -p "$L"

run() {
  local name=$1; shift
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "${T:-2400}" "$@" >"$L/$name.log" 2>&1
  echo "rc=$? $(tail -3 "$L/$name.log" | tr '\n' ' | ')"
}

T=240 run probe          python -c "import jax; print(jax.devices())"
grep -qiE "tpu|axon" "$L/probe.log" || { echo "tunnel down, aborting"; exit 2; }

# timings are garbage under host contention: stop a known CPU-heavy job
# (exact PID only -- never kill by pattern) and let the host settle
if [ -f /tmp/cpu_heavy.pid ]; then
  kill "$(cat /tmp/cpu_heavy.pid)" 2>/dev/null && sleep 10
  rm -f /tmp/cpu_heavy.pid
fi

# --- headline bench FIRST (freshest tunnel, cache warmed by its own
#     throwaway precompile child; VERDICT r4 items 1-2, 6) -------------
T=5400 run bench_default  python bench.py

# --- hardware test evidence (round-5 re-run of the TPU-only lane) ------
T=5400 run tpu_tests      env CLFD_TEST_TPU=1 python -m pytest \
                              tests/test_front_kernel.py \
                              tests/test_tail_kernel.py \
                              tests/test_tpu_modes.py \
                              tests/test_compaction.py -v
{ echo "# TPU hardware test lane, round 5 ($(date -u +%Y-%m-%dT%H:%MZ))";
  echo "# CLFD_TEST_TPU=1 pytest tests/test_front_kernel.py \\";
  echo "#   tests/test_tail_kernel.py tests/test_tpu_modes.py \\";
  echo "#   tests/test_compaction.py -v";
  grep -E "PASSED|FAILED|ERROR|SKIPPED" "$L/tpu_tests.log";
  tail -2 "$L/tpu_tests.log"; } > /root/repo/TPU_TESTS_r05.txt

# --- f32 bench-config parity pin (both swept front/cap pairs) ----------
T=5400 run bench_parity   env CLFD_TEST_TPU=1 python -m pytest \
                              tests/test_bench_parity.py -v -s
{ echo ""; echo "# f32 bench-config parity (tests/test_bench_parity.py):";
  grep -E "PASSED|FAILED|jaccard|candidates" "$L/bench_parity.log"; } \
  >> /root/repo/TPU_TESTS_r05.txt

echo "=== done ($(date +%H:%M:%S)); logs in $L ==="
