#!/usr/bin/env bash
# Round-3 late-addition measurement runbook (ROADMAP.md §Performance).
# Run on a box with the axon TPU tunnel up. Each step compiles 1-4 min
# (persistent cache warms reruns). Stop after any step; results are additive.
set -uo pipefail
cd "$(dirname "$0")/.."
log() { echo; echo "=== $* ($(date -u +%H:%M:%S)) ==="; }

log "A. mapper stage baseline (pair OFF)"
STAGES=mapper timeout 580 python benchmarks/infer_stage_breakdown.py

log "B. mapper stage, FFVC_MIXER_PAIR=1"
FFVC_MIXER_PAIR=1 STAGES=mapper timeout 580 python benchmarks/infer_stage_breakdown.py

log "C. synth stage, upsample mode 2 (lhs-dilated, default) then mode 0 (reference graph)"
STAGES=synth timeout 580 python benchmarks/infer_stage_breakdown.py
FFVC_FAST_UPSAMPLE=0 STAGES=synth timeout 580 python benchmarks/infer_stage_breakdown.py

log "D. full bench, defaults (upsample mode 2, pair off)"
timeout 580 python bench.py

log "E. full bench, FFVC_MIXER_PAIR=1 (only meaningful if B won)"
FFVC_MIXER_PAIR=1 timeout 580 python bench.py

log "F. train bench (chained), f32 moments"
FFVC_BENCH_MODE=train timeout 580 python bench.py

log "G. train bench, bf16 moments"
FFVC_BENCH_MODE=train FFVC_BENCH_OPT_DTYPE=bfloat16 timeout 580 python bench.py

log "H. latency bench (stream kernel, batch 1)"
FFVC_BENCH_MODE=latency timeout 580 python bench.py

log "done — update BENCH_NOTES.md / README / defaults per results"
