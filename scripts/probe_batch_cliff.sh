#!/bin/bash
# Batch-sweep probe for the >24 throughput cliff (ROADMAP: 24->155x,
# 26->87x). Hypothesis under test: the cliff tracks batch*beam crossing
# the 128-row MXU/VPU tile boundary (24x5=120 <= 128 < 130=26x5), not
# batch itself. Points chosen to separate the two:
#   25x5=125  (<=128: fast if rows-hypothesis holds)
#   26x5=130  (>128: known slow, reconfirm)
#   32x4=128  (<=128 at beam 4)
#   33x4=132  (>128 at beam 4)
# Engine companion metric off: these are core-loop A/Bs.
set -u
cd "$(dirname "$0")/.."
out=${1:-/tmp/cliff_probe.jsonl}
: > "$out"
run() {
  local batch=$1 beam=$2
  echo "=== batch=$batch beam=$beam (rows=$((batch*beam))) ===" >&2
  ARIES_BENCH_ENGINE=0 ARIES_BENCH_BATCH=$batch ARIES_BENCH_BEAM=$beam \
    timeout 900 python bench.py 2>>"$out.log" | tail -1 | \
    python -c "import sys,json;d=json.loads(sys.stdin.read());print(json.dumps({'batch':$batch,'beam':$beam,'rows':$batch*$beam,'rtfx':d['value']}))" \
    >> "$out" || echo "{\"batch\":$batch,\"beam\":$beam,\"error\":true}" >> "$out"
}
run 25 5
run 26 5
run 32 4
run 33 4
cat "$out"
