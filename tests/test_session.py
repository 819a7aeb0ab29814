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
    """On any host the resolver returns None (uncapped) or a real cap —
    never the v1 'unlimited' sentinel (a huge value), which must be
    classified as no cap."""
    lim = session._cgroup_memory_limit_bytes()
    assert lim is None or 0 < lim < 2**60
