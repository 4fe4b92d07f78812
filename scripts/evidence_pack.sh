#!/usr/bin/env bash
# Record the TPU evidence pack (VERDICT round-3 task 1c) sequentially -
# only one process may own the tunneled TPU at a time. Outputs land in
# docs/evidence/; STATUS.md quotes them.
set -u
cd "$(dirname "$0")/.."
mkdir -p docs/evidence
for job in "$@"; do
    case "$job" in
        large)   timeout 1800 python bench_large.py \
                     > docs/evidence/bench_large.txt 2>&1 ;;
        stages)  timeout 1800 python scripts/profile_stages.py \
                     > docs/evidence/profile_stages.txt 2>&1 ;;
        ba)      timeout 1800 python bench_ba.py \
                     > docs/evidence/bench_ba.txt 2>&1 ;;
        bench)   timeout 1800 python bench.py \
                     > docs/evidence/bench.txt 2>&1 ;;
        match)   timeout 1800 python bench_match.py \
                     > docs/evidence/bench_match.txt 2>&1 ;;
        spatial) timeout 3500 python scripts/bench_spatial_single.py \
                     > docs/evidence/bench_spatial.txt 2>&1 ;;
        dog)     timeout 1800 python bench.py \
                     > docs/evidence/bench_dog.txt 2>&1 ;;
        *)       echo "unknown job $job" ;;
    esac
    echo "== $job done (rc=$?)"
done
