"""Invalidation axes of the on-disk artifact cache (artifacts.py).

Round-8 ADVICE pinned two staleness holes, both closed here:

- CODE: slot keys mix in a stamp of the builder's defining module, so
  editing an operator module invalidates its artifacts without a manual
  name bump (previously a builder edit silently served stale values —
  and the golden tests read through the same cache).
- DATA (in-process): the fixture fingerprint is recomputed per call
  (memo dropped), so regenerating testdata mid-process invalidates for
  the live process too, not just fresh ones.
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys
import textwrap

from dataengineeringutils_spark import artifacts


def _fake_fixture(tmp_path, stamp: int) -> str:
    d = tmp_path / "sf"
    d.mkdir(exist_ok=True)
    f = d / "t.parquet"
    f.write_bytes(b"x" * (10 + stamp))
    os.utime(f, ns=(1_000_000_000 + stamp, 1_000_000_000 + stamp))
    return str(d)


def _builder_module(tmp_path, fname: str, ret: int):
    p = tmp_path / fname
    p.write_text(
        textwrap.dedent(
            f"""
            def build():
                return {ret}
            """
        )
    )
    spec = importlib.util.spec_from_file_location(fname[:-3], p)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[fname[:-3]] = mod
    spec.loader.exec_module(mod)
    return mod


def test_code_edit_invalidates_json_artifact(tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_ARTIFACT_ROOT", str(tmp_path / "cache"))
    sf = _fake_fixture(tmp_path, 0)

    mod = _builder_module(tmp_path, "art_builder_a.py", 1)
    assert artifacts.json_artifact(sf, "val", mod.build) == 1

    # same code → served from cache even though the module object is new
    mod2 = _builder_module(tmp_path, "art_builder_a.py", 1)
    assert artifacts.json_artifact(sf, "val", mod2.build) == 1

    # EDIT the builder module: same artifact name, new code stamp — the
    # stale value must not be served
    mod3 = _builder_module(tmp_path, "art_builder_a.py", 2)
    assert artifacts.json_artifact(sf, "val", mod3.build) == 2

    # both slots exist on disk (superseded entries are dead files, not
    # corruption) and carry the code stamp in the filename
    fp = artifacts.fixture_fingerprint(sf)
    slots = sorted(os.listdir(os.path.join(str(tmp_path / "cache"), fp)))
    assert len(slots) == 2 and all(".c" in s for s in slots)


def test_fixture_regen_invalidates_in_process(tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_ARTIFACT_ROOT", str(tmp_path / "cache"))
    sf = _fake_fixture(tmp_path, 0)
    fp0 = artifacts.fixture_fingerprint(sf)

    calls = []

    def build():
        calls.append(1)
        return len(calls)

    assert artifacts.json_artifact(sf, "n", build) == 1
    assert artifacts.json_artifact(sf, "n", build) == 1  # memo hit

    # regenerate the fixture IN-PROCESS: fingerprint must move and the
    # builder must run again (no per-process fingerprint memo)
    _fake_fixture(tmp_path, 7)
    fp1 = artifacts.fixture_fingerprint(sf)
    assert fp1 != fp0
    assert artifacts.json_artifact(sf, "n", build) == 2


def test_code_stamp_sourceless_requires_explicit_version():
    # C callables have no source file — round-9 ADVICE: the silent
    # 'static' pin is gone. Unversioned names raise; an explicit .v<N>
    # suffix opts in to the pinned stamp (caller owns invalidation).
    import functools

    import pytest

    with pytest.raises(ValueError, match="no hashable source file"):
        artifacts._code_stamp(len, "unversioned")
    assert artifacts._code_stamp(len, "thing.v1") == "static"
    # partial/__wrapped__ chains unwrap to the innermost real function
    fn = _fake_fixture  # module-level, has a source file
    direct = artifacts._code_stamp(fn, "n")
    chained = artifacts._code_stamp(
        functools.partial(functools.partial(fn)), "n"
    )
    assert direct == chained and direct != "static"


def test_commit_sidecar_roundtrip(tmp_path, monkeypatch):
    # dir_artifact builds once, returns the same path for same code+data
    monkeypatch.setenv("SPARK_GRAFT_ARTIFACT_ROOT", str(tmp_path / "cache"))
    sf = _fake_fixture(tmp_path, 0)

    def build(d):
        with open(os.path.join(d, "x.json"), "w") as f:
            json.dump({"ok": True}, f)

    p1 = artifacts.dir_artifact(sf, "dirart", build)
    p2 = artifacts.dir_artifact(sf, "dirart", build)
    assert p1 == p2 and os.path.isfile(os.path.join(p1, "x.json"))
