#!/bin/bash
# Quiet-window trigger: probe host weather every ~3 min; when two
# consecutive probes read stretch <= MAX_STRETCH, run the given command
# once and exit.  Used to fire bench/scaling measurements only in
# adjudicable windows (see tools/weather_probe.py bands).
#
# Usage: quiet_trigger.sh <max_stretch> <max_wait_s> -- cmd args...
set -u
MAX_STRETCH=$1; MAX_WAIT=$2; shift 3   # third arg is the literal --
cd /root/repo
t0=$(date +%s)
streak=0
while true; do
  now=$(date +%s)
  if (( now - t0 > MAX_WAIT )); then
    echo "TIMEOUT waiting for quiet window; running anyway" >&2
    break
  fi
  probe=$(python tools/weather_probe.py 2>/dev/null | tail -1)
  echo "probe: $probe" >&2
  stretch=$(python - "$probe" <<'EOF'
import json, sys
print(json.loads(sys.argv[1]).get("stretch", 99))
EOF
)
  ok=$(python -c "print(1 if float('$stretch') <= float('$MAX_STRETCH') else 0)")
  if [ "$ok" = "1" ]; then
    streak=$((streak+1))
    if [ "$streak" -ge 2 ]; then break; fi
    sleep 30
  else
    streak=0
    sleep 150
  fi
done
echo "FIRING at $(date -u +%H:%M:%S)" >&2
exec "$@"
