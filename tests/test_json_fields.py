"""JSON dynamic-field extraction: fast-lane/exact-lane equivalence vs a
json.loads oracle over adversarial shapes."""

import json

import pyarrow as pa

from elasticsearch_assets_ray.ops.json_fields import (
    extract_json_number,
    extract_json_string,
)

ROWS = [
    '{"k": 87}', '{"k": 0, "s": "x"}', '{"other": 1}', None,
    '{"k": -3.5}', '{"s": "he said \\"k\\": 9"}', '{"k": 1e3}',
    '{"nested": {"k": 5}}',           # nested key must NOT leak
    'not json', '{"s": "a\\\\b"}',
    '{"k": 2, "nested": {"k": 5}}',   # top-level wins via exact lane
    '{"s": ""}', '{"k": null}', '{"k": true}', '{"k": "7"}', "{}",
    '{  "k"  :   42  }', '{"kk": 1}',  # whitespace; key-prefix trap
]


def _oracle():
    want_n, want_s = [], []
    for v in ROWS:
        try:
            o = json.loads(v) if v is not None else None
        except ValueError:
            o = None
        kn = o.get("k") if isinstance(o, dict) else None
        ok = (isinstance(kn, (int, float)) and not isinstance(kn, bool))
        want_n.append(float(kn) if ok else None)
        ks = o.get("s") if isinstance(o, dict) else None
        want_s.append(ks if isinstance(ks, str) else None)
    return want_n, want_s


def test_extract_matches_json_loads():
    col = pa.array(ROWS)
    want_n, want_s = _oracle()
    got_n = [None if x is None else float(x)
             for x in extract_json_number(col, "k").to_pylist()]
    assert got_n == want_n
    assert extract_json_string(col, "s").to_pylist() == want_s


def test_int_dtype_kept_when_all_ints():
    arr = extract_json_number(pa.array(['{"k": 1}', '{"k": -2}']), "k")
    assert arr.type == pa.int64()
