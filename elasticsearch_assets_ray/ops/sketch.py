"""Mergeable sketches — approximate distinct counting at corpus scale.

HyperLogLog with the standard bias-corrected estimator (Flajolet et al.;
the small-range linear-counting correction included).  Built Ray-Data
shaped: ``map_batches`` produces one register-array partial per batch
(the combiner), partials OR-merge associatively on the driver or in a
tree — the exchange moves ``2^p`` bytes per partial regardless of input
size, which is the whole point at 10^12 rows.

Deterministic: element hashes are md5-based (process-stable), so the
estimate is reproducible run to run.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


class HyperLogLog:
    """Fixed-seed HLL over arbitrary values (hashed via md5 of repr bytes)."""

    def __init__(self, p: int = 14):
        if not 4 <= p <= 18:
            raise ValueError("p must be in [4, 18]")
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def _hash64(self, values) -> np.ndarray:
        """Per-value 64-bit md5 (nulls excluded by add_many — COUNT
        DISTINCT semantics; a length prefix keeps bytes b"None" and the
        string "None" from colliding with an actual null)."""
        out = np.empty(len(values), dtype=np.uint64)
        for i, v in enumerate(values):
            b = v if isinstance(v, bytes) else str(v).encode()
            out[i] = int.from_bytes(hashlib.md5(b).digest()[:8], "little")
        return out

    def add_many(self, values) -> "HyperLogLog":
        # COUNT(DISTINCT) semantics: nulls contribute nothing (previously
        # str(None) counted a phantom 'None' value and collided with the
        # literal string)
        values = [v for v in values if v is not None]
        if len(values) == 0:
            return self
        h = self._hash64(values)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        rest = h << np.uint64(self.p)  # remaining 64-p bits, left-aligned
        # rank = leading zeros of `rest` + 1, capped at 64-p+1
        probe = rest
        nonzero = probe != 0
        # vectorized leading-zero count via float64 exponent trick is
        # imprecise past 2^53; use a 6-step binary search instead
        lzc = np.zeros(len(h), dtype=np.uint8)
        x = probe.copy()
        for shift in (32, 16, 8, 4, 2, 1):
            mask = (x >> np.uint64(64 - shift)) == 0
            lzc[mask] += shift
            x[mask] = x[mask] << np.uint64(shift)
        lzc = np.minimum(lzc, 64 - self.p)
        rank = np.where(nonzero, lzc + 1, 64 - self.p + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)
        return self

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        if other.p != self.p:
            raise ValueError("p mismatch")
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1.0 + 1.079 / m)
        est = alpha * m * m / np.sum(np.exp2(-self.registers.astype(np.float64)))
        if est <= 2.5 * m:
            zeros = int(np.count_nonzero(self.registers == 0))
            if zeros:
                est = m * np.log(m / zeros)  # linear counting
        return float(est)

    def to_bytes(self) -> bytes:
        return bytes([self.p]) + self.registers.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes) -> "HyperLogLog":
        h = cls(b[0])
        h.registers = np.frombuffer(b[1:], dtype=np.uint8).copy()
        return h


def approx_distinct(ds, col: str, p: int = 14) -> float:
    """Approximate COUNT(DISTINCT col) via HLL partials merged on the
    driver (each partial is 2^p bytes — constant-size exchange)."""

    def partial(batch: pa.Table) -> pa.Table:
        h = HyperLogLog(p).add_many(batch.column(col).to_pylist())
        return pa.table({"sketch": pa.array([h.to_bytes()], pa.large_binary())})

    merged = HyperLogLog(p)
    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    import ray

    for ref in parts.to_arrow_refs():
        t = ray.get(ref)
        for blob in t.column("sketch").to_pylist():
            merged.merge(HyperLogLog.from_bytes(blob))
    return merged.estimate()
