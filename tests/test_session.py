"""Driver-memory sizing: the host-derived default must respect both the
host's MemAvailable and the process's OWN cgroup cap (round-5 review
finding: reading only the v2 root file misses systemd-slice/nested caps)."""

from __future__ import annotations

import stackai_vector_db_spark.session as session


def test_default_memory_within_bounds():
    v = session._default_driver_memory()
    assert v.endswith("g") and 4 <= int(v[:-1]) <= 31


def test_cgroup_limit_caps_default(monkeypatch):
    monkeypatch.setattr(
        session, "_cgroup_memory_limit_bytes", lambda: 8 * 2**30
    )
    v = session._default_driver_memory()
    assert int(v[:-1]) == max(4, int(8 * 0.6))  # 60% of the 8 GiB cap


def test_cgroup_limit_is_none_or_sane():
    """On any host the resolver returns None (uncapped) or real headroom —
    never the v1 'unlimited' sentinel (a huge value), which must be
    classified as no cap. Headroom may legitimately read 0 on a full
    cgroup (the 4g floor then applies)."""
    lim = session._cgroup_memory_limit_bytes()
    assert lim is None or 0 <= lim < 2**60


def test_cgroup_headroom_subtracts_usage(tmp_path):
    """The effective figure is limit MINUS current usage: a 32 GiB slice
    with 28 GiB already used by a sibling has 4 GiB to give — sizing off
    the raw cap would OOM-kill the JVM as its heap fills."""
    v2 = tmp_path / "cg2"
    (v2 / "slice").mkdir(parents=True)
    (v2 / "slice" / "memory.max").write_text(str(32 * 2**30))
    (v2 / "slice" / "memory.current").write_text(str(28 * 2**30))
    proc = tmp_path / "cgroup"
    proc.write_text("0::/slice\n")
    lim = session._cgroup_memory_limit_bytes(
        proc_path=str(proc), v2_root=str(v2), v1_root=str(tmp_path / "none")
    )
    assert lim == 4 * 2**30


def test_cgroup_headroom_ignores_reclaimable_cache(tmp_path):
    """Usage counters include page cache the kernel would reclaim under
    pressure: a cgroup that just streamed 26 GiB of parquet through the
    page cache reads memory.current ≈ limit even though almost all of it
    is inactive_file. Headroom must discount that slice, or the heap gets
    floored to 4g on exactly the I/O-heavy hosts that need it most
    (round-5 advisor finding)."""
    v2 = tmp_path / "cg2"
    (v2 / "slice").mkdir(parents=True)
    (v2 / "slice" / "memory.max").write_text(str(32 * 2**30))
    (v2 / "slice" / "memory.current").write_text(str(30 * 2**30))
    (v2 / "slice" / "memory.stat").write_text(
        f"anon {4 * 2**30}\nfile {26 * 2**30}\ninactive_file {26 * 2**30}\n"
        f"active_file 0\n"
    )
    proc = tmp_path / "cgroup"
    proc.write_text("0::/slice\n")
    lim = session._cgroup_memory_limit_bytes(
        proc_path=str(proc), v2_root=str(v2), v1_root=str(tmp_path / "none")
    )
    # used = 30 GiB current − 26 GiB reclaimable = 4 GiB → headroom 28 GiB
    assert lim == 28 * 2**30


def test_cgroup_ancestor_cap_binds(tmp_path):
    """A cap on a PARENT slice must bind even when the leaf's own
    memory.max reads 'max' (the systemd-slice/pod layout): the resolver
    takes the min over the leaf and every ancestor."""
    v2 = tmp_path / "cg2"
    (v2 / "pod" / "scope").mkdir(parents=True)
    (v2 / "memory.max").write_text("max\n")
    (v2 / "pod" / "memory.max").write_text(str(8 * 2**30) + "\n")
    (v2 / "pod" / "scope" / "memory.max").write_text("max\n")
    proc = tmp_path / "cgroup"
    proc.write_text("0::/pod/scope\n")
    lim = session._cgroup_memory_limit_bytes(
        proc_path=str(proc), v2_root=str(v2), v1_root=str(tmp_path / "none")
    )
    assert lim == 8 * 2**30


def test_cgroup_min_of_nested_caps(tmp_path):
    """When both the leaf and an ancestor are capped, the EFFECTIVE cap is
    the smaller one, regardless of which level holds it."""
    v2 = tmp_path / "cg2"
    (v2 / "pod" / "scope").mkdir(parents=True)
    (v2 / "pod" / "memory.max").write_text(str(16 * 2**30))
    (v2 / "pod" / "scope" / "memory.max").write_text(str(4 * 2**30))
    proc = tmp_path / "cgroup"
    proc.write_text("0::/pod/scope\n")
    lim = session._cgroup_memory_limit_bytes(
        proc_path=str(proc), v2_root=str(v2), v1_root=str(tmp_path / "none")
    )
    assert lim == 4 * 2**30


def test_local_cluster_rejects_unit_suffixed_worker_memory():
    """local-cluster[n,c,MB] takes a bare-MB integer; a unit-suffixed
    spelling like 6g would both fail Spark's own master parse AND have
    produced a nonsense executor.memory ('6gm') here — reject it with
    the expected format named (r9 advisor)."""
    import pytest

    with pytest.raises(ValueError, match=r"bare MB integer"):
        session.get_spark(master="local-cluster[4,8,6g]")
