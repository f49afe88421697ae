#!/bin/bash
# Queue the allspectra fine-tune (VERDICT r3 next-6) behind the rbg
# bucketed-rate probe. EXTRA sized to the remaining round wall clock.
set -u
cd "$(dirname "$0")/.."
p=$(cat /tmp/bucket_probe.pid 2>/dev/null || echo "")
[ -n "$p" ] && while kill -0 "$p" 2>/dev/null; do sleep 20; done
exec bash tools/r4_allspectra.sh "${1:-15000}"
