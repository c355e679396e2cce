#!/bin/bash
# Round-5 experiment chain, phased by value (VERDICT r4 "What's missing"):
#   phase 1 — the z10 analysis chain INCLUDING the patient x control
#             in/out inversion sweep (start_pso_optimize.sh:6-7 semantics),
#   phase 2 — the latent-dim sweep tail whose round-4 artifacts the
#             container recycle destroyed (z8/z20/z30 -> 9-dim curve),
#   phase 3 — optional fresh evidence legs, only if time remains.
# Launched detached (setsid) so a dying builder session cannot kill the
# chain mid-leg (that is exactly how round 5's first attempt died at
# pso_z10). Each run_experiment invocation gets a deadline derived from
# one absolute end-of-dispatch timestamp so no leg straddles the driver's
# round-end bench window (CLAUDE.md: no TPU holder alive at round end).
set -u
cd /root/repo
END_TS=${GDPT_CHAIN_END_TS:?set GDPT_CHAIN_END_TS (epoch s, dispatch cutoff)}

mins_left() {
  local now rem
  now=$(date +%s)
  rem=$(( (END_TS - now) / 60 ))
  (( rem < 1 )) && rem=0
  echo "$rem"
}

run_phase() {
  local name=$1; shift
  local rem
  rem=$(mins_left)
  if (( rem == 0 )); then
    echo "[chain_r5] $name: dispatch window closed — skipping" >&2
    return 1
  fi
  echo "[chain_r5] $name: deadline ${rem} min, legs: $*" >&2
  python tools/run_experiment.py "$@" --deadline-min "$rem"
}

run_phase phase1 \
  cae classifiers cnn_multipatient dcgan_z10 pso_z10 \
  inverter_adv_z10 iid_extract_z10 \
  pso_inverter_p5_z10 pso_inverter_p1_z10 \
  pso_inverter_p5_out_z10 pso_inverter_p1_out_z10 \
  regularize_inverter_z10 regularize_inverter_stats_z10 \
  pso_analysis_z10 pso_analysis_clustering_z10 pso_analysis_distance_z10 \
  pso_inverter_analysis_z10 pso_inverter_analysis_p5_out_z10 \
  pso_inverter_analysis_p1_in_z10 pso_inverter_analysis_p1_out_z10

GDPT_DIMS=2,10,100,8,20,30 run_phase phase2 \
  dcgan_z8 pso_z8 dcgan_z20 pso_z20 dcgan_z30 pso_z30

# fresh round-5 evidence for the two z10 legs phase 1 skips (their round-4
# history snapshots are committed; re-run only with >45 min to spare)
if (( $(mins_left) > 45 )); then
  run_phase phase3 inverter_pixrec_z10 ood_extract_z10
fi

echo "[chain_r5] chain complete at $(date -u)" >&2
