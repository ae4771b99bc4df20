"""Hermetic tests for the bounded-history durable checkpoint store.

experiments/durable_ckpt.sh is the machinery that keeps multi-hour chip
runs resumable across VM resets without ever landing checkpoint blobs on
main (round-3 VERDICT item 4 / ADVICE items 2+5). It snapshots a
checkpoint dir as a ROOT commit on a force-updated refs/heads/ckpt-<slot>
ref, so exactly one snapshot per slot is ever reachable.

These tests run the real script against a throwaway git repo via the
DURABLE_CKPT_REPO override (no jax involved).
"""

import os
import pathlib
import subprocess

import pytest

SCRIPT = str(pathlib.Path(__file__).resolve().parent.parent
             / "experiments" / "durable_ckpt.sh")


def _run(repo, *args, check=True):
    env = dict(os.environ, DURABLE_CKPT_REPO=str(repo))
    proc = subprocess.run(
        ["bash", SCRIPT, *args], env=env, cwd=str(repo),
        capture_output=True, text=True)
    if check:
        assert proc.returncode == 0, proc.stderr + proc.stdout
    return proc


def _git(repo, *args):
    proc = subprocess.run(["git", "-C", str(repo), *args],
                          capture_output=True, text=True)
    assert proc.returncode == 0, proc.stderr
    return proc.stdout.strip()


@pytest.fixture()
def repo(tmp_path):
    r = tmp_path / "repo"
    r.mkdir()
    _git(r, "init", "-q", "-b", "main")
    _git(r, "config", "user.email", "t@t")
    _git(r, "config", "user.name", "t")
    (r / "README").write_text("x")
    _git(r, "add", "README")
    _git(r, "commit", "-qm", "init")
    return r


def _make_epoch(repo, n, payload):
    d = repo / "ck" / f"epoch_{n}"
    (d / "sub").mkdir(parents=True)
    (d / "meta.json").write_text(payload)
    (d / "sub" / "blob.bin").write_bytes(payload.encode() * 100)
    return d


def test_save_restore_roundtrip(repo, tmp_path):
    src = _make_epoch(repo, 40, "forty")
    out = _run(repo, "save", "slot-a", str(src))
    assert "saved slot-a" in out.stdout
    dst = tmp_path / "restored"
    out = _run(repo, "restore", "slot-a", str(dst))
    assert "restored slot-a" in out.stdout
    assert (dst / "epoch_40" / "meta.json").read_text() == "forty"
    assert (dst / "epoch_40" / "sub" / "blob.bin").read_bytes() \
        == b"forty" * 100


def test_bounded_history_one_reachable_snapshot(repo, tmp_path):
    e40 = _make_epoch(repo, 40, "forty")
    _run(repo, "save", "slot-a", str(e40))
    old_commit = _git(repo, "rev-parse", "refs/heads/ckpt-slot-a")
    e60 = _make_epoch(repo, 60, "sixty")
    _run(repo, "save", "slot-a", str(e60))
    new_commit = _git(repo, "rev-parse", "refs/heads/ckpt-slot-a")
    assert new_commit != old_commit
    # Root commit: no parents, so superseded snapshots become unreachable.
    assert _git(repo, "rev-list", "--count", new_commit) == "1"
    # Only the newest epoch dir is in the tree.
    tree = _git(repo, "ls-tree", "--name-only", new_commit, "snap/")
    assert tree == "snap/epoch_60"
    # Restore yields the newest snapshot.
    dst = tmp_path / "restored"
    _run(repo, "restore", "slot-a", str(dst))
    assert (dst / "epoch_60").is_dir()
    assert not (dst / "epoch_40").exists()


def test_main_branch_untouched_and_index_clean(repo):
    head_before = _git(repo, "rev-parse", "main")
    src = _make_epoch(repo, 40, "forty")
    _run(repo, "save", "slot-a", str(src))
    assert _git(repo, "rev-parse", "main") == head_before
    # The real index must not have staged the snapshot (temp-index staging).
    assert _git(repo, "diff", "--cached", "--name-only") == ""


def test_slots_are_independent(repo, tmp_path):
    _run(repo, "save", "a", str(_make_epoch(repo, 1, "one")))
    _run(repo, "save", "b", str(_make_epoch(repo, 2, "two")))
    listing = _run(repo, "list").stdout
    assert "ckpt-a" in listing and "ckpt-b" in listing
    dst = tmp_path / "r"
    _run(repo, "restore", "b", str(dst))
    assert (dst / "epoch_2" / "meta.json").read_text() == "two"


def test_restore_missing_slot_fails(repo, tmp_path):
    proc = _run(repo, "restore", "nope", str(tmp_path / "r"), check=False)
    assert proc.returncode != 0
    assert "no snapshot" in proc.stderr


def test_save_missing_dir_fails(repo):
    proc = _run(repo, "save", "slot-a", str(repo / "ck" / "epoch_99"),
                check=False)
    assert proc.returncode != 0


def test_superseded_snapshots_are_prunable(repo):
    """Reflog entries must not keep superseded snapshots alive.

    ckpt-* lives under refs/heads/, where update-ref appends reflog
    entries by default; without expiring them, git prune can never
    collect old snapshots and the object store grows without bound
    (measured: 2.1 GB of stale loose objects on the real repo).
    """
    _run(repo, "save", "slot-a", str(_make_epoch(repo, 40, "forty")))
    old = _git(repo, "rev-parse", "refs/heads/ckpt-slot-a")
    _run(repo, "save", "slot-a", str(_make_epoch(repo, 60, "sixty")))
    # No reflog entry may reference the superseded commit.
    proc = subprocess.run(
        ["git", "-C", str(repo), "reflog", "show", "refs/heads/ckpt-slot-a"],
        capture_output=True, text=True)
    assert old not in proc.stdout
    # After an immediate-expiry prune the old commit object is gone.
    _git(repo, "prune", "--expire=now")
    gone = subprocess.run(
        ["git", "-C", str(repo), "cat-file", "-e", old],
        capture_output=True)
    assert gone.returncode != 0, "superseded snapshot survived prune"
