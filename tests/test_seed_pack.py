"""Compile-cache seed machinery: bench.SectionTracker (relatime first-read
attribution) + scripts/pack_seed.py (manifest -> committed per-entry seed).

A wrong section map silently regresses the driver's cold start — the seed
would miss headline-path programs (or re-grow to r3's half-GB tarball), so
pin the selection semantics here (VERDICT r3 #7 / ADVICE r3).
"""

import json
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture()
def bench_mod(tmp_path, monkeypatch):
    import jax

    import bench

    # keep pytest compiles out of the repo's real .jax_cache (bench's import
    # points the persistent cache there for chip runs)
    jax.config.update("jax_compilation_cache_dir", None)
    monkeypatch.setattr(bench, "CACHE_DIR", tmp_path / "cache")
    monkeypatch.setattr(bench, "MANIFEST", tmp_path / "manifest.json")
    (tmp_path / "cache").mkdir()
    return bench


def test_tracker_attributes_first_read_and_fresh_compiles(bench_mod):
    cache = bench_mod.CACHE_DIR
    for i in range(3):
        (cache / f"jit_e{i}-cache").write_bytes(b"x" * 100)
    tr = bench_mod.SectionTracker()
    (cache / "jit_e0-cache").read_bytes()
    tr.mark("init")
    (cache / "jit_e1-cache").read_bytes()  # seeded entry read later
    (cache / "jit_new-cache").write_bytes(b"y")  # fresh compile this section
    tr.mark("first_window")
    tr.mark("euler")  # e2 never touched
    tr.dump()
    m = json.loads(bench_mod.MANIFEST.read_text())["entries"]
    assert m["jit_e0-cache"]["section"] == "init"
    assert m["jit_e1-cache"]["section"] == "first_window"
    assert m["jit_new-cache"]["section"] == "first_window"
    assert "jit_e2-cache" not in m  # unread entries stay out of the seed


def test_tracker_first_section_wins(bench_mod):
    cache = bench_mod.CACHE_DIR
    (cache / "jit_a-cache").write_bytes(b"x")
    tr = bench_mod.SectionTracker()
    (cache / "jit_a-cache").read_bytes()
    tr.mark("init")
    (cache / "jit_a-cache").read_bytes()
    tr.mark("euler")
    assert tr.sections["jit_a-cache"] == "init"


@pytest.fixture()
def pack_mod(tmp_path, monkeypatch):
    sys.path.insert(0, str(REPO / "scripts"))
    import pack_seed

    monkeypatch.setattr(pack_seed, "CACHE_DIR", tmp_path / "cache")
    monkeypatch.setattr(pack_seed, "SEED_DIR", tmp_path / "seed")
    monkeypatch.setattr(pack_seed, "MANIFEST", tmp_path / "manifest.json")
    (tmp_path / "cache").mkdir()
    return pack_seed


def _write_manifest(pack_mod, entries):
    for name, info in entries.items():
        (pack_mod.CACHE_DIR / name).write_bytes(b"x" * info["bytes"])
    pack_mod.MANIFEST.write_text(
        json.dumps({"section_order": [], "entries": entries})
    )


def test_pack_selects_core_and_small_only(pack_mod, monkeypatch, capsys):
    _write_manifest(pack_mod, {
        "a-cache": {"section": "init", "bytes": 50},
        "b-cache": {"section": "first_window", "bytes": 3_000_000},
        "c-cache": {"section": "sustained", "bytes": 60},
        "d-cache": {"section": "euler", "bytes": 5_000_000},   # big, non-core
        "e-cache": {"section": "overlap8", "bytes": 70},       # small extra
    })
    monkeypatch.setattr(sys, "argv", ["pack_seed.py"])
    assert pack_mod.main() == 0
    names = {p.name for p in pack_mod.SEED_DIR.glob("*-cache")}
    assert names == {"a-cache", "b-cache", "c-cache", "e-cache"}
    idx = json.loads((pack_mod.SEED_DIR / "INDEX.json").read_text())
    assert "d-cache" in idx["not_committed"]
    assert idx["total_bytes"] == 50 + 3_000_000 + 60 + 70


def test_pack_removes_stale_and_is_idempotent(pack_mod, monkeypatch):
    _write_manifest(pack_mod, {"a-cache": {"section": "init", "bytes": 10}})
    pack_mod.SEED_DIR.mkdir()
    (pack_mod.SEED_DIR / "old-cache").write_bytes(b"z")  # from a prior round
    monkeypatch.setattr(sys, "argv", ["pack_seed.py"])
    assert pack_mod.main() == 0
    assert not (pack_mod.SEED_DIR / "old-cache").exists()
    mtime = (pack_mod.SEED_DIR / "a-cache").stat().st_mtime_ns
    assert pack_mod.main() == 0  # second run: content-addressed, no rewrite
    assert (pack_mod.SEED_DIR / "a-cache").stat().st_mtime_ns == mtime


def test_pack_fails_loudly_when_core_exceeds_budget(pack_mod, monkeypatch):
    _write_manifest(pack_mod, {
        "a-cache": {"section": "first_window", "bytes": 4_000_000},
    })
    monkeypatch.setattr(sys, "argv", ["pack_seed.py", "--budget-mb", "0.001"])
    assert pack_mod.main() == 1
    assert not (pack_mod.SEED_DIR / "a-cache").exists()


def test_pack_budget_drops_largest_extras_first(pack_mod, monkeypatch):
    _write_manifest(pack_mod, {
        "core-cache": {"section": "init", "bytes": 100},
        "x1-cache": {"section": "euler", "bytes": 900_000},
        "x2-cache": {"section": "euler", "bytes": 1_500_000},
    })
    monkeypatch.setattr(sys, "argv", ["pack_seed.py", "--budget-mb", "1.1"])
    assert pack_mod.main() == 0
    names = {p.name for p in pack_mod.SEED_DIR.glob("*-cache")}
    assert names == {"core-cache", "x1-cache"}
