# Shared setup for demo scripts. Source, don't execute.
#
# Copies the needed reference images into a writable work dir (the demo
# data dir may be read-only, and `hess` writes <img>.sift next to each
# input, matching hessgpucmd.cpp:70-80).
set -e
DATA="${1:-/root/reference/data}"
HERE="$(cd "$(dirname "${BASH_SOURCE[1]}")/.." && pwd)"
WORK="${DEMO_WORK:-/tmp/hess_demos}/$(basename "${BASH_SOURCE[1]}" .sh)"
mkdir -p "$WORK"
export PYTHONPATH="$HERE${PYTHONPATH:+:$PYTHONPATH}"
# Run on CPU unless the caller asks for the real device: first-compile on
# the tunneled TPU takes minutes, which is the wrong default for a demo.
if [ -z "$DEMO_TPU" ]; then
    unset PALLAS_AXON_POOL_IPS
    export JAX_PLATFORMS=cpu
fi

hess() {
    python -m hessgpu_tpu.cli.hess "$@"
}

fetch() {  # fetch <name>... -> copies into $WORK, echoes local paths
    for n in "$@"; do
        cp -n "$DATA/$n" "$WORK/$n" 2>/dev/null || true
        echo "$WORK/$n"
    done
}
