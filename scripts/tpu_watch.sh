#!/bin/bash
# Tunnel watcher: probe the TPU every 5 minutes (child process, killable
# on timeout — an in-process jax.devices() hangs forever when the tunnel
# is down, docs/PERF.md); when reachable, run the round-3 measurement
# session once and exit.  Exit codes: 0 = session ran, 3 = gave up.
DEADLINE=$(( $(date +%s) + ${WATCH_MAX_S:-36000} ))
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  if timeout 150 python -c \
      "import jax,numpy as np,jax.numpy as jnp;print(np.asarray(jnp.arange(4)*2),jax.devices())" \
      >/tmp/tpu_probe_watch.log 2>&1; then
    echo "tunnel up at $(date +%H:%M:%S), starting session"
    bash /root/repo/scripts/tpu_session_r3.sh
    exit 0
  fi
  echo "tunnel down at $(date +%H:%M:%S), sleeping"
  sleep 300
done
echo "gave up waiting for the tunnel"
exit 3
