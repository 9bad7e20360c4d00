#!/bin/bash
# Tiny (debug) run: phase-1 training + static eval battery, timed.
# Mirrors the reference run.sh (reference: run.sh:1-15).
set -e

python - <<'EOF'
import jax
print("JAX devices:", jax.devices())
EOF

# TO DEFAULT OUTPUT DIRS, TINY (DEBUG) RUN
hypers="--tiny 1 --resume_result_json 0 --dataset synthetic"
override_runname=""   # e.g. --runname myrun

git log --graph --full-history --all --oneline | head -n 15 || true
git status || true

loadpath=""  # empty to start fresh; set to resume another phase-1 run
# set static_eval_long=1 for the state-dump + latent-analysis pass

# GNU time gives the reference's -v resource report; fall back to the
# shell builtin where the binary is absent (e.g. slim containers)
if [ -x /usr/bin/time ]; then
    timer() { /usr/bin/time -v "$@"; }
else
    timer() { time "$@"; }
fi

timer python main.py $override_runname $loadpath $hypers --phase 1
timer python static_eval.py $override_runname $hypers --phase 1 ${static_eval_long:+--long}
