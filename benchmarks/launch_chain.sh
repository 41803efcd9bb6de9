#!/bin/sh
# Launch (or resume) the reference-scale chain, detached, under the stall
# supervisor.  Safe to rerun at any time: the chain's stages resume from
# their own markers (export sentinel, pair-archive row memmaps, Orbax
# train-state checkpoints), so a relaunch after a stop loses at most one
# row block / one checkpoint interval.
#
# bench.py stops this chain cooperatively (SIGTERM -> flush -> release)
# before benching and calls this script afterwards to resume it.
cd "$(dirname "$0")/.." || exit 1
PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
# the axon TPU backend registers via sitecustomize in /root/.axon_site;
# a PYTHONPATH that omits it breaks backend registration entirely (the
# chain would restart-loop on "Backend 'axon' is not in the list")
case ":$PYTHONPATH:" in
    *:/root/.axon_site:*) ;;
    *) [ -d /root/.axon_site ] && PYTHONPATH="$PYTHONPATH:/root/.axon_site" ;;
esac
export PYTHONPATH
# `launch_chain.sh --partial` launches the partial-target variant instead
# (own pidfile/evidence/log dir; shares the base tree + pair archives)
SUFFIX=""
EXTRA_ARGS=""
if [ "$1" = "--partial" ]; then
    SUFFIX="_partial"
    EXTRA_ARGS="--partial"
fi
PIDFILE="/tmp/refscale$SUFFIX.pid"
if [ -f "$PIDFILE" ] && kill -0 "$(cat "$PIDFILE")" 2>/dev/null; then
    echo "chain already running (pid $(cat "$PIDFILE"))"
    exit 0
fi
# --window 300 --quiet-windows 6: a fresh reference-scale program compiles
# server-side for many minutes with ZERO local CPU; the default 10-minute
# quiet budget killed the eval child mid-compile (discarding the compile,
# looping forever).  30 min of silence is the honest stall threshold here.
# the working tree lives INSIDE the repo: /root/repo is the only path that
# comes back after a VM re-image (three of them killed /root/ref_scale_tree
# mid-chain in rounds 3-4), and the chain git-commits its evidence +
# expensive artifacts from there after every stage
mkdir -p /root/repo/ref_scale_tree
setsid nohup python benchmarks/supervise.py --max-restarts 60 \
    --window 300 --quiet-windows 6 -- \
    python benchmarks/reference_scale.py \
    "/root/repo/reference_scale$SUFFIX.json" $EXTRA_ARGS \
    --base /root/repo/ref_scale_tree \
    >> "/root/repo/ref_scale_tree/chain$SUFFIX.log" 2>&1 &
echo $! > "$PIDFILE"
echo "chain launched (pid $(cat "$PIDFILE")," \
     "log /root/repo/ref_scale_tree/chain$SUFFIX.log)"
