"""TierManager / LifecyclePolicy tests (reference storage/ subsystem)."""

import time

import pytest

from diagon_tpu.observability.storage_tiers import (
    LifecyclePolicy,
    StorageTier,
    TierManager,
)


def test_budget_eviction_lru():
    demoted = []
    tm = TierManager(
        hbm_budget_bytes=100,
        demote_to_host=demoted.append,
    )
    tm.register("a", StorageTier.DEVICE, bytes_device=40)
    tm.register("b", StorageTier.DEVICE, bytes_device=40)
    tm.register("c", StorageTier.HOST, bytes_device=40)
    tm.touch("a")  # b becomes LRU
    evicted = tm.ensure_device("c")
    assert evicted == ["b"]
    assert demoted == ["b"]
    assert tm.tier_of("c") == StorageTier.DEVICE
    assert tm.tier_of("b") == StorageTier.HOST
    assert tm.device_bytes() <= 100


def test_pinned_never_evicted():
    tm = TierManager(hbm_budget_bytes=50)
    tm.register("pinned", StorageTier.DEVICE, bytes_device=40, pinned=True)
    tm.register("x", StorageTier.HOST, bytes_device=40)
    with pytest.raises(MemoryError):
        tm.ensure_device("x")
    assert tm.tier_of("pinned") == StorageTier.DEVICE


def test_lifecycle_demotion():
    tm = TierManager(
        hbm_budget_bytes=1000,
        policy=LifecyclePolicy(
            demote_to_host_after=0.0, demote_to_disk_after=0.0
        ),
    )
    tm.register("old", StorageTier.DEVICE, bytes_device=10)
    tm._entries["old"].last_access -= 10
    moved = tm.apply_lifecycle()
    assert moved["old"] == StorageTier.HOST
    tm._entries["old"].last_access -= 10
    moved = tm.apply_lifecycle()
    assert moved["old"] == StorageTier.DISK


def test_stats_and_touch():
    tm = TierManager(hbm_budget_bytes=10)
    tm.register("s", StorageTier.DEVICE, bytes_device=5)
    age0 = tm.stats()["s"]["age_s"]
    time.sleep(0.01)
    tm.touch("s")
    assert tm.stats()["s"]["age_s"] <= age0 + 0.01
    assert tm.stats()["s"]["tier"] == "device"


def test_validator_tool(tmp_path):
    import subprocess
    import sys

    import diagon_tpu.api as dg

    path = str(tmp_path / "idx")
    w = dg.open_writer(path)
    for t in ["oil price up", "trade deal done", "oil supply cut"]:
        dg.add_document(w, {"body": t})
    dg.delete_documents(w, "body", "deal")
    dg.commit(w)
    dg.close_writer(w)

    r = subprocess.run(
        [sys.executable, "tools/validate_bundle.py", path, "--deep"],
        capture_output=True,
        text=True,
        cwd="/root/repo",
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert "RESULT: OK" in r.stdout
