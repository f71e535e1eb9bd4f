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

# newest_since TAG GLOB — newest GLOB file created after step TAG began.
# Prints the path; rc=1 + empty output when the step produced nothing.
# NOTE 1: `local a=$1 b=$a` expands $a BEFORE any assignment lands (all
# words expand first, then `local` assigns) — marker must be its own line;
# this exact bug shipped an empty marker path in the first round-5 chain.
# NOTE 2: this runs inside $(...) at call sites, so it cannot abort the
# job itself (exit only leaves the subshell) — callers MUST write
#     VAR=$(newest_since tag glob) || exit 1
newest_since() {
    local tag=$1
    local glob=$2
    local marker="/tmp/.step_marker_$tag"
    local f
    f=$(find $glob -newer "$marker" -type f 2>/dev/null | xargs -r ls -t 2>/dev/null | head -1)
    if [ -z "$f" ]; then
        echo "!!! STEP $tag produced no output matching $glob — ABORTING JOB" >&2
        return 1
    fi
    echo "$f"
}
