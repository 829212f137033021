"""Mergeable HyperLogLog with vectorized batch update.

The reference has no distinct-count sketch; this generalizes its
partial-build/OR-merge pattern (/root/reference/spark/main.py:139-164)
to register-max merge. Algorithm: Flajolet-Fuss-Gandouet-Meunier 2007
with the standard small-range linear-counting correction; 64-bit hash
(so no large-range correction is needed below ~1e12 distinct,
per Heule-Nunkesser-Hall "HyperLogLog in Practice", EDBT 2013).

State = 2^b uint8 registers. merge = elementwise max — associative,
commutative, idempotent, so merged bytes are order-independent.
"""

from __future__ import annotations

import numpy as np

from sketchlib.core import hashing
from sketchlib.core import serde
from sketchlib.core.params import hll_params


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


@serde.register_sketch(serde.TYPE_HLL)
class HyperLogLog:
    __slots__ = ("b", "m", "seed", "registers")

    def __init__(self, b: int = 12, seed: int = 0):
        if not (4 <= b <= 18):
            raise ValueError(f"register exponent b must be in [4,18], got {b}")
        self.b = int(b)
        self.m = 1 << self.b
        self.seed = int(seed)
        self.registers = np.zeros(self.m, dtype=np.uint8)

    @classmethod
    def from_rel_error(cls, rel_error: float, seed: int = 0) -> "HyperLogLog":
        return cls(hll_params(rel_error), seed)

    def rel_error(self) -> float:
        return 1.04 / np.sqrt(self.m)

    def update_batch(self, values) -> "HyperLogLog":
        if len(values) == 0:
            return self
        h = hashing.hash64(values, self.seed)
        reg = (h >> np.uint64(64 - self.b)).astype(np.int64)
        rest = (h << np.uint64(self.b)) | np.uint64(1 << (self.b - 1))
        # rho = 1 + count of leading zeros in the remaining 64-bit window.
        # bit_length of rest gives position of highest set bit; the OR'd
        # sentinel bit caps rho at 64-b+1 exactly as the spec requires.
        nbits = np.zeros(len(h), dtype=np.uint8)  # bit_length(rest) - 1
        x = rest.copy()
        for shift in (32, 16, 8, 4, 2, 1):
            s = np.uint64(shift)
            big = x >= (np.uint64(1) << s)
            nbits[big] += np.uint8(shift)
            x = np.where(big, x >> s, x)
        # leading zeros = 64 - bit_length = 63 - nbits; rho = lz + 1
        rho = np.uint8(64) - nbits
        np.maximum.at(self.registers, reg, rho)
        return self

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        if (other.b, other.seed) != (self.b, self.seed):
            raise ValueError("cannot merge HLLs with different (b,seed)")
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = self.m
        regs = self.registers.astype(np.float64)
        est = _alpha(m) * m * m / np.sum(np.exp2(-regs))
        if est <= 2.5 * m:
            zeros = int(np.count_nonzero(self.registers == 0))
            if zeros > 0:
                return m * np.log(m / zeros)
        return float(est)

    def to_bytes(self) -> bytes:
        """Canonical serialization; sparse (reg_idx u32, val u8) when
        most registers are zero (partial states from small groups)."""
        header = {"b": self.b, "seed": self.seed}
        nz = np.flatnonzero(self.registers)
        if len(nz) * 5 < self.m:
            header["enc"] = "sparse"
            payload = nz.astype(np.uint32).tobytes() + self.registers[nz].tobytes()
        else:
            header["enc"] = "dense"
            payload = self.registers.tobytes()
        return serde.pack(serde.TYPE_HLL, header, payload)

    @classmethod
    def _from_parts(cls, header: dict, payload: bytes) -> "HyperLogLog":
        h = cls(header["b"], header["seed"])
        if header.get("enc", "dense") == "sparse":
            n = len(payload) // 5
            idx = np.frombuffer(payload[:4 * n], dtype=np.uint32).astype(np.int64)
            vals = np.frombuffer(payload[4 * n:], dtype=np.uint8)
            h.registers[idx] = vals
        else:
            h.registers = np.frombuffer(payload, dtype=np.uint8).copy()
        return h

    @classmethod
    def from_bytes(cls, data: bytes) -> "HyperLogLog":
        type_id, header, payload = serde.unpack(data)
        if type_id != serde.TYPE_HLL:
            raise ValueError("not an HLL blob")
        return cls._from_parts(header, payload)

    def __eq__(self, other) -> bool:
        return (isinstance(other, HyperLogLog)
                and (self.b, self.seed) == (other.b, other.seed)
                and np.array_equal(self.registers, other.registers))

    def __repr__(self) -> str:
        return f"HyperLogLog(b={self.b}, est={self.estimate():.1f})"
