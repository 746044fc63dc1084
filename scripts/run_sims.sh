#!/usr/bin/env bash
# Campaign runner preserving the reference's run_sims.sh contract
# (reference run_sims.sh:7-25): first arg SEQL|PARA, remaining args are
# case names forwarded to the campaign registry; command lines are
# emitted by --emit and executed here.
#
# Note: on TPU the parallelism lives inside each run (batched codewords
# over the mesh), so PARA mostly matters for CPU-bound cases (LP) or
# multi-process host setups — for one chip SEQL is usually what you want.
#
# Usage: ./scripts/run_sims.sh SEQL REG_BAD --data_dir=/tmp/out
set -euo pipefail

mode="${1:?usage: run_sims.sh SEQL|PARA <case...> [extra args]}"
shift

cases=()
extra=()
for arg in "$@"; do
  case "$arg" in
    -*) extra+=("$arg") ;;
    *) cases+=("$arg") ;;
  esac
done

# Collect lines first (a `| while read` pipeline would background the
# jobs inside a subshell, leaving the outer `wait` nothing to wait on).
mapfile -t lines < <(python -m ldpc_decoders_tpu.campaign "${cases[@]}" --emit)

for line in "${lines[@]}"; do
  cmd="python -u -m ldpc_decoders_tpu.main $line ${extra[*]-}"
  echo ">> $cmd"
  if [ "$mode" = "PARA" ]; then
    eval "$cmd" &
  else
    eval "$cmd"
  fi
done

[ "$mode" = "PARA" ] && wait
echo "run_sims done"
