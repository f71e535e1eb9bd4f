# Shared helpers for multi-step detached jobs (the setsid-nohup pattern in
# CLAUDE.md).  Convention, after the round-4 provenance failure where a
# crashed step's ls-t fallback silently attributed the PREVIOUS step's JSON
# to the crashed configuration (finish_prod40.sh step 4, /tmp log :870):
#
#   * every step runs through run_step — nonzero rc ABORTS the whole job
#     with a loud "!!! STEP <tag> FAILED" marker, so a SUMMARY block can
#     never be printed over stale results;
#   * outputs are captured per step with newest_since, which only accepts
#     files CREATED BY THAT STEP (mtime after the step's start marker) and
#     aborts if the step produced none.
#
# Usage:
#   source "$(dirname "$0")/detached_lib.sh"
#   step_begin my_tag
#   run_step my_tag 3600 python run_test.py ...
#   MY_JSON=$(newest_since my_tag 'exp_data/x/results/shapenet6d_val_*.json')

step_begin() {  # step_begin TAG — mark the step start (for newest_since)
    touch "/tmp/.step_marker_$1"
}

run_step() {    # run_step TAG TIMEOUT_S CMD... — abort the job on failure
    local tag=$1 to=$2; shift 2
    touch "/tmp/.step_marker_$tag"
    echo "--- STEP $tag start $(date -u +%FT%TZ): $*"
    timeout "$to" "$@"
    local rc=$?
    if [ "$rc" -ne 0 ]; then
        echo "!!! STEP $tag FAILED rc=$rc $(date -u +%FT%TZ) — ABORTING JOB"
        exit 1
    fi
    echo "--- STEP $tag ok $(date -u +%FT%TZ)"
}

newest_since() {  # newest_since TAG GLOB — newest GLOB file from this step
    local tag=$1 glob=$2 marker="/tmp/.step_marker_$tag" f
    f=$(find $glob -newer "$marker" -type f 2>/dev/null | xargs -r ls -t 2>/dev/null | head -1)
    if [ -z "$f" ]; then
        echo "!!! STEP $tag produced no output matching $glob — ABORTING JOB" >&2
        exit 1
    fi
    echo "$f"
}
