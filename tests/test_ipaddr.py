"""ip_prefix / ip_range helpers: pure-function semantics (the engine
paths are oracle-checked by the contract pipelines)."""

import pytest

from elasticsearch_assets_ray.search.ipaddr import (
    U32,
    cidr_bounds,
    ip_bound,
    ip_prefix_script,
    ip_prefix_sql,
    ip_to_u32,
    u32_to_ip,
)


def test_ip_u32_roundtrip():
    for ip, v in [("0.0.0.0", 0), ("255.255.255.255", U32 - 1),
                  ("192.168.1.5", (192 << 24) | (168 << 16) | (1 << 8) | 5),
                  ("10.0.0.1", (10 << 24) | 1)]:
        assert ip_to_u32(ip) == v
        assert u32_to_ip(v) == ip
    with pytest.raises(ValueError):
        ip_to_u32("1.2.3")
    with pytest.raises(ValueError):
        ip_to_u32("1.2.3.256")
    with pytest.raises(ValueError):
        u32_to_ip(U32)


def test_cidr_bounds():
    assert cidr_bounds("10.0.0.0/8") == (10 << 24, 11 << 24)
    # host bits zeroed (ES accepts 10.0.0.1/8)
    assert cidr_bounds("10.0.0.1/8") == (10 << 24, 11 << 24)
    assert cidr_bounds("0.0.0.0/0") == (0, U32)
    assert cidr_bounds("1.2.3.4/32") == (ip_to_u32("1.2.3.4"),
                                         ip_to_u32("1.2.3.4") + 1)
    with pytest.raises(ValueError):
        cidr_bounds("1.2.3.4/33")


def test_ip_bound_and_scripts():
    assert ip_bound(None) is None
    assert ip_bound("128.0.0.0") == float(1 << 31)
    assert ip_bound(7) == 7.0
    s = ip_prefix_script("ip_u32", 8)
    assert s.startswith("script:") and "doc['ip_u32']" in s
    assert "16777216.0" in s  # 2^24 step
    assert "16777216.0" in ip_prefix_sql("x", 8)
    with pytest.raises(ValueError):
        ip_prefix_script("f", 40)
