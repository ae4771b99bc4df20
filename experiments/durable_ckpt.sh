#!/bin/bash
# Bounded-history durable checkpoint store (round-4 VERDICT-4 fix).
#
# Replaces the round-3 pattern of committing 120-170 MB orbax blobs to main
# every ~20 epochs (which grew .git to 1.4 GB and made the repo unpushable:
# ADVICE.md round-3 items 2 and 5). Instead each snapshot becomes a ROOT
# (parentless) commit on a force-updated ref, so exactly one snapshot per
# slot is reachable at any time; superseded snapshots become unreachable and
# are dropped by the periodic `git gc --prune=now` below. main's history
# never sees a checkpoint blob again.
#
#   durable_ckpt.sh save <slot> <src_dir>    snapshot src_dir -> refs/heads/ckpt-<slot>
#   durable_ckpt.sh restore <slot> <dst_dir> extract the snapshot into dst_dir
#   durable_ckpt.sh list                     show existing slots
#
# save stages into a TEMP index (never touches the real index, so it cannot
# collide with the main chain's `git add`: ADVICE.md round-3 item 3), and
# serializes ref updates + gc behind a flock so a sidecar and the main chain
# can both call it.
set -u
# DURABLE_CKPT_REPO overrides the target repo (hermetic tests use a tmp repo).
cd "${DURABLE_CKPT_REPO:-/root/repo}"
CMD=${1:?save|restore|list}
# Per-repo lock so a test repo never serializes against the real sidecars.
LOCK="${TMPDIR:-/tmp}/durable_ckpt.$(pwd | cksum | cut -d' ' -f1).lock"

case "$CMD" in
  save)
    SLOT=${2:?slot}
    SRC=${3:?src_dir}
    [ -d "$SRC" ] || { echo "no such dir: $SRC" >&2; exit 1; }
    TMPIDX=$(mktemp -u /tmp/ckpt_index.XXXXXX)
    # Stage the snapshot from a temp copy so a writer appending to SRC midway
    # can't give us a torn tree (caller should still pass a quiescent dir).
    STAGE=$(mktemp -d /tmp/ckpt_stage.XXXXXX)
    # Keep the source dir's basename (e.g. epoch_460) as the top-level entry
    # so `restore <slot> <ck_dir>` recreates <ck_dir>/epoch_460 directly.
    mkdir -p "$STAGE/snap"
    cp -r "$SRC" "$STAGE/snap/" || { rm -rf "$STAGE"; exit 1; }
    (
      flock 9
      GIT_INDEX_FILE=$TMPIDX git --work-tree="$STAGE" add -f snap &&
      TREE=$(GIT_INDEX_FILE=$TMPIDX git write-tree) &&
      COMMIT=$(git commit-tree "$TREE" -m "durable ckpt $SLOT $(date -u +%FT%TZ)") &&
      git update-ref "refs/heads/ckpt-$SLOT" "$COMMIT" &&
      echo "saved $SLOT -> $COMMIT"
      # refs/heads/* updates append REFLOG entries that keep superseded
      # snapshots reachable (measured: 2.1 GB of "unreachable" loose
      # objects that git prune could not drop) — expire the slot's reflog
      # so exactly one snapshot per slot is reachable, then prune.
      git reflog expire --expire=now "refs/heads/ckpt-$SLOT" 2>/dev/null || true
      # Superseded snapshots are then unreachable LOOSE objects (never
      # packed); `git prune` drops them without the full-repack cost of
      # `git gc`, which matters on this 1-core host.
      git prune --expire=30.minutes.ago 2>/dev/null || true
    ) 9>"$LOCK"
    RC=$?
    rm -rf "$STAGE" "$TMPIDX"
    exit $RC
    ;;
  restore)
    SLOT=${2:?slot}
    DST=${3:?dst_dir}
    git rev-parse -q --verify "refs/heads/ckpt-$SLOT" >/dev/null || {
      echo "no snapshot for slot $SLOT" >&2; exit 1; }
    mkdir -p "$DST"
    git archive "refs/heads/ckpt-$SLOT" | tar -x -C "$DST" --strip-components=1
    echo "restored $SLOT -> $DST"
    ;;
  list)
    git for-each-ref 'refs/heads/ckpt-*' \
      --format='%(refname:short) %(objectname:short) %(subject)'
    ;;
  *)
    echo "unknown command $CMD" >&2; exit 1;;
esac
