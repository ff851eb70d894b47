"""Storage-layer contract tests (store/storage.py).

The publish/recover protocol is what makes every directory swap in the
engine crash-safe WITHOUT relying on POSIX-only atomic rename — the same
two contract clauses an object-store backend must satisfy (see the
module docstring's crash matrix, which these tests walk line by line).
"""

import os

import pytest

from sneldb_spark.store.storage import LocalStorage


def _mkdir_with(path, fname="f.txt", content="x"):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, fname), "w") as f:
        f.write(content)


def _read(path, fname="f.txt"):
    with open(os.path.join(path, fname)) as f:
        return f.read()


@pytest.fixture()
def st():
    return LocalStorage()


def test_publish_replaces_live_copy(tmp_path, st):
    dst = str(tmp_path / "data")
    _mkdir_with(dst, content="old")
    _mkdir_with(st.stage_path(dst), content="new")
    st.publish_dir(dst)
    assert _read(dst) == "new"
    assert not os.path.exists(st.stage_path(dst))
    assert not os.path.exists(dst + ".old")


def test_publish_first_time_no_previous_copy(tmp_path, st):
    dst = str(tmp_path / "data")
    _mkdir_with(st.stage_path(dst), content="new")
    st.publish_dir(dst)
    assert _read(dst) == "new"


def test_publish_without_staged_copy_raises(tmp_path, st):
    with pytest.raises(FileNotFoundError):
        st.publish_dir(str(tmp_path / "data"))


def test_publish_clears_stale_old_leftover(tmp_path, st):
    dst = str(tmp_path / "data")
    _mkdir_with(dst, content="live")
    _mkdir_with(dst + ".old", content="stale-crash-leftover")
    _mkdir_with(st.stage_path(dst), content="new")
    st.publish_dir(dst)
    assert _read(dst) == "new"
    assert not os.path.exists(dst + ".old")


# -- recover_dir crash matrix -------------------------------------------


def test_recover_clean_dir_is_noop(tmp_path, st):
    dst = str(tmp_path / "data")
    _mkdir_with(dst, content="live")
    st.recover_dir(dst)
    assert _read(dst) == "live"


def test_recover_gcs_strays_when_dst_present(tmp_path, st):
    # crash after step 2 (staged copy live) but before old-GC, or a
    # writer crash mid-staging with the live copy untouched
    dst = str(tmp_path / "data")
    _mkdir_with(dst, content="live")
    _mkdir_with(dst + ".old", content="old")
    _mkdir_with(st.stage_path(dst), content="partial")
    st.recover_dir(dst)
    assert _read(dst) == "live"
    assert not os.path.exists(dst + ".old")
    assert not os.path.exists(st.stage_path(dst))


def test_recover_restores_old_when_dst_missing(tmp_path, st):
    # crash between step 1 (dst -> .old) and step 2 (staging -> dst):
    # the previous live copy comes back — it is the copy the manifest
    # hwm describes; the staged one is discarded and re-derived
    dst = str(tmp_path / "data")
    _mkdir_with(dst + ".old", content="previous")
    _mkdir_with(st.stage_path(dst), content="staged")
    st.recover_dir(dst)
    assert _read(dst) == "previous"
    assert not os.path.exists(st.stage_path(dst))


def test_recover_promotes_staging_on_first_publish_crash(tmp_path, st):
    # there never was a live copy (first publish): staging is complete
    # by protocol precondition, promote it
    dst = str(tmp_path / "data")
    _mkdir_with(st.stage_path(dst), content="staged")
    st.recover_dir(dst)
    assert _read(dst) == "staged"


def test_recover_is_idempotent(tmp_path, st):
    dst = str(tmp_path / "data")
    _mkdir_with(dst + ".old", content="previous")
    st.recover_dir(dst)
    st.recover_dir(dst)
    assert _read(dst) == "previous"


def test_never_zero_copies_during_publish(tmp_path, st, monkeypatch):
    """Clause 1 of the contract: at every rename boundary inside
    publish_dir, at least one complete copy (dst, .old, or .staging)
    exists on disk."""
    dst = str(tmp_path / "data")
    _mkdir_with(dst, content="old")
    _mkdir_with(st.stage_path(dst), content="new")

    real_rename = LocalStorage.rename
    copies_seen = []

    def spying_rename(self, src, d):
        copies_seen.append(_count_copies(dst))
        real_rename(self, src, d)
        copies_seen.append(_count_copies(dst))

    def _count_copies(base):
        return sum(
            os.path.exists(p)
            for p in (base, base + ".old", base + ".staging")
        )

    monkeypatch.setattr(LocalStorage, "rename", spying_rename)
    st.publish_dir(dst)
    assert copies_seen and min(copies_seen) >= 1


# -- engine integration: crashed swap is repaired by SHOW ----------------


def test_show_repairs_crashed_swap(engine):
    engine.execute('DEFINE order FIELDS {"amount": "int"}')
    for i in range(4):
        engine.execute(f'STORE order FOR ctx{i} PAYLOAD {{"amount": {i}}}')
    engine.execute("FLUSH")
    engine.execute("REMEMBER QUERY order WHERE amount >= 0 AS mat")
    engine.execute(f'STORE order FOR ctx9 PAYLOAD {{"amount": 9}}')
    engine.execute("FLUSH")
    assert engine.execute("SHOW mat").df.count() == 5

    # simulate a crash mid-publish: live copy moved aside, staged copy
    # not yet promoted (the exact window ADVICE r4 flagged for compact())
    data = os.path.join(engine.materializer._dir("mat"), "data")
    os.replace(data, data + ".old")
    out = engine.execute("SHOW mat")
    assert out.df.count() == 5


def test_compact_then_show_roundtrip(engine):
    engine.execute('DEFINE ev FIELDS {"n": "int"}')
    for i in range(3):
        engine.execute(f'STORE ev FOR c{i} PAYLOAD {{"n": {i}}}')
    engine.execute("FLUSH")
    engine.execute("REMEMBER QUERY ev WHERE n >= 0 AS m")
    engine.execute('STORE ev FOR c9 PAYLOAD {"n": 9}')
    engine.execute("FLUSH")
    engine.execute("SHOW m")  # creates a delta segment
    engine.materializer.compact("m")
    assert engine.execute("SHOW m").df.count() == 4
